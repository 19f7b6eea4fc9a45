"""Dense multilinear-polynomial kernels for the Spartan prover.

Reconstructs the role of Spartan's ``dense_mlpoly.rs`` (SURVEY.md §2.2
Spartan row) as batched limb-vector ops.  A dense MLE over mu variables is
a ``[2^mu, N_LIMBS]`` int32 array of evaluations on the Boolean hypercube
(index bit i = variable x_i, MSB = x_0, matching Spartan's convention of
binding variables front-first).

Hot ops (all jit-friendly, static shapes):
  * ``eq_table(r)``     — the 2^mu evaluations of eq(r, x), built by mu
                          rounds of doubling outer products.
  * ``bind_top(poly, r)``— fold the top variable: p'(x) = (1-r)*lo + r*hi,
                          halving the table (one sumcheck round's update).
  * ``evaluate(poly, r)``— full evaluation via eq-table inner product.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..field import ops as F
from ..field.fields import SCALAR


def _eq_table_impl(r_limbs: jax.Array) -> jax.Array:
    mu = r_limbs.shape[0]
    tbl = F.ones(SCALAR, (1,))
    for j in range(mu):
        rj = r_limbs[j]
        # shared-scalar mul: MXU Toeplitz path for the large doublings
        hi = F.mul_scalar(SCALAR, tbl, rj)
        lo = F.sub(SCALAR, tbl, hi)  # tbl * (1 - r_j)
        # new index: old index * 2 + x_j  -> interleave lo/hi
        tbl = jnp.stack([lo, hi], axis=1).reshape(-1, lo.shape[-1])
    return tbl


@functools.lru_cache(maxsize=None)
def _eq_table_jit(mu: int):
    return jax.jit(_eq_table_impl)


def eq_table(r_limbs: jax.Array) -> jax.Array:
    """[mu, N_LIMBS] challenges -> [2^mu, N_LIMBS] table of eq(r, x).

    x index interpretation: bit (mu-1-j) of the row index is variable j,
    i.e. row index = x_0 x_1 ... x_{mu-1} as a binary string (x_0 = MSB).
    Jit-cached per mu (safe to call from host-driven loops).
    """
    return _eq_table_jit(r_limbs.shape[0])(r_limbs)


def bind_top(poly: jax.Array, r: jax.Array) -> jax.Array:
    """Bind the *top* (first) variable to r: [2n, L] -> [n, L].

    With x_0 the MSB of the index, lo = poly[:n] (x_0=0), hi = poly[n:].
    p' = lo + r*(hi - lo).
    """
    n = poly.shape[0] // 2
    lo, hi = poly[:n], poly[n:]
    return F.add(SCALAR, lo, F.mul_scalar(SCALAR, F.sub(SCALAR, hi, lo), r))


def evaluate(poly: jax.Array, r_limbs: jax.Array) -> jax.Array:
    """Evaluate a [2^mu, L] MLE at point r ([mu, L]) -> [L]."""
    chis = eq_table(r_limbs)
    return F.dot(SCALAR, chis, poly, axis=0)


def sum_all(poly: jax.Array) -> jax.Array:
    """Field sum over the hypercube (vectorized lazy accumulation)."""
    return F.sum_reduce(SCALAR, poly, axis=0)


def pad_pow2(values: jax.Array, target: int) -> jax.Array:
    """Zero-pad the leading axis to ``target`` (a power of two)."""
    n = values.shape[0]
    assert n <= target
    if n == target:
        return values
    pad = jnp.zeros((target - n,) + values.shape[1:], values.dtype)
    return jnp.concatenate([values, pad], axis=0)
