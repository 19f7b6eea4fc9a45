"""Sumcheck prover/verifier (Spartan phases 1 & 2) — TPU kernels + host FS.

Reconstructs Spartan's ``sumcheck.rs`` role (SURVEY.md §3.5 steps 3-4):
  * phase 1: cubic  sum_x eq(tau,x) * (Az(x)*Bz(x) - Cz(x)) = 0
  * phase 2: quadratic sum_y M(y) * Z(y) = claim

Design: the per-round table folds and evaluation sums are batched device
kernels (cached per table size — sizes halve every round); the Fiat-Shamir
transcript is host-side (Merlin), with one device->host sync of 3 (or 2)
field elements per round — the "sequential transcript" boundary called out
in SURVEY.md §3.5/§7.4.  Claims and interpolation are exact host big-int
math (cheap, O(1) per round).

The round polynomial is sent as its evaluations at 0..degree; p(1) is
implied by p(0) + p(1) = claim, and the verifier recomputes next claims by
Lagrange interpolation, mirroring Spartan's compressed UniPoly encoding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..field import ops as F
from ..field.fields import SCALAR, int_to_limbs
from ..transcript.merlin import Transcript

MOD = SCALAR.modulus


def _to_dev(x: int) -> jax.Array:
    return jnp.asarray(int_to_limbs(x % MOD))


def _scalar_bytes(x: int) -> bytes:
    return (x % MOD).to_bytes(32, "little")


def lagrange_eval(evals: list, r: int) -> int:
    """Evaluate the degree-(len-1) poly with values ``evals`` at 0..d, at r."""
    d = len(evals) - 1
    total = 0
    for t in range(d + 1):
        num, den = 1, 1
        for s in range(d + 1):
            if s == t:
                continue
            num = num * ((r - s) % MOD) % MOD
            den = den * ((t - s) % MOD) % MOD
        total = (total + evals[t] * num % MOD * pow(den, MOD - 2, MOD)) % MOD
    return total


# ---------------------------------------------------------------------------
# Device kernels — fixed-shape, mask-active design: the tables keep their
# full padded size across all rounds and the active prefix length shrinks
# (a traced scalar), so each phase needs exactly ONE compiled kernel per
# instance size instead of one per round size.  ~2x redundant element work
# in exchange for O(log n) fewer XLA compilations — a large win both for
# XLA:CPU tests and for the remote-compile TPU path.
# ---------------------------------------------------------------------------

def _ext(tbl: jax.Array, t: int) -> jax.Array:
    """Evaluate each (lo, hi) pair at X = t: lo + t*(hi - lo) (static split;
    used by the single-shot paths, e.g. __graft_entry__)."""
    n2 = tbl.shape[0] // 2
    lo, hi = tbl[:n2], tbl[n2:]
    if t == 0:
        return lo
    d = F.sub(SCALAR, hi, lo)
    return F.add(SCALAR, lo, F.mul_small(SCALAR, d, t))


def _ext_masked(tbl: jax.Array, t: int, active_half: jax.Array) -> jax.Array:
    """lo/hi pair eval at X=t where lo = tbl[:ah], hi = tbl[ah:2ah] with a
    *traced* active length; lanes >= ah carry garbage (masked by caller)."""
    half = tbl.shape[0] // 2
    lo = tbl[:half]
    hi = jax.lax.dynamic_slice_in_dim(tbl, active_half, half, axis=0)
    if t == 0:
        return lo
    d = F.sub(SCALAR, hi, lo)
    return F.add(SCALAR, lo, F.mul_small(SCALAR, d, t))


@functools.lru_cache(maxsize=None)
def _round_cubic_kernel(n: int):
    half = n // 2

    @jax.jit
    def k(eq, pa, pb, pc, active_half):
        mask = jnp.arange(half) < active_half
        outs = []
        for t in (0, 2, 3):
            eqt, at, bt, ct = (
                _ext_masked(x, t, active_half) for x in (eq, pa, pb, pc)
            )
            w = F.sub(SCALAR, F.mul(SCALAR, at, bt), ct)
            w = F.select(mask, w, jnp.zeros_like(w))
            outs.append(F.canon(SCALAR, F.dot(SCALAR, eqt, w)))
        return tuple(outs)

    return k


@functools.lru_cache(maxsize=None)
def _round_quad_kernel(n: int):
    half = n // 2

    @jax.jit
    def k(pm, pz, active_half):
        mask = jnp.arange(half) < active_half
        outs = []
        for t in (0, 2):
            mt = _ext_masked(pm, t, active_half)
            zt = _ext_masked(pz, t, active_half)
            zt = F.select(mask, zt, jnp.zeros_like(zt))
            outs.append(F.canon(SCALAR, F.dot(SCALAR, mt, zt)))
        return tuple(outs)

    return k


@functools.lru_cache(maxsize=None)
def _bind_kernel(n: int, k_tables: int):
    half = n // 2

    @jax.jit
    def k(r, active_half, *tables):
        out = []
        for tbl in tables:
            lo = tbl[:half]
            hi = jax.lax.dynamic_slice_in_dim(tbl, active_half, half, axis=0)
            bound = F.add(
                SCALAR, lo, F.mul(SCALAR, r[None, :], F.sub(SCALAR, hi, lo))
            )
            out.append(jax.lax.dynamic_update_slice_in_dim(tbl, bound, 0, axis=0))
        return tuple(out)

    return k


def _limb_to_int(x) -> int:
    from ..field.fields import limbs_to_int
    import numpy as np

    return limbs_to_int(np.asarray(jax.device_get(x))) % MOD


# ---------------------------------------------------------------------------
# Prover / verifier
# ---------------------------------------------------------------------------

def prove_cubic(claim: int, eq, pa, pb, pc, transcript: Transcript, label: bytes):
    """Phase-1 sumcheck.  Returns (round_evals, r_points, final_vals).

    round_evals: per round [p(0), p(1), p(2), p(3)] ints (p(1) implied on
    the wire but returned for tests); final_vals: (eq, Az, Bz, Cz) at r.
    """
    n = eq.shape[0]
    kernel = _round_cubic_kernel(n)
    binder = _bind_kernel(n, 4)
    rounds = []
    rs = []
    e = claim % MOD
    active = n
    while active > 1:
        ah = jnp.int32(active // 2)
        e0, e2, e3 = (_limb_to_int(v) for v in kernel(eq, pa, pb, pc, ah))
        e1 = (e - e0) % MOD
        transcript.append_scalar(label + b"/e0", _scalar_bytes(e0))
        transcript.append_scalar(label + b"/e2", _scalar_bytes(e2))
        transcript.append_scalar(label + b"/e3", _scalar_bytes(e3))
        r = transcript.challenge_scalar(label + b"/r")
        rs.append(r)
        rounds.append([e0, e1, e2, e3])
        eq, pa, pb, pc = binder(_to_dev(r), ah, eq, pa, pb, pc)
        e = lagrange_eval([e0, e1, e2, e3], r)
        active //= 2
    finals = tuple(_limb_to_int(t[0]) for t in (eq, pa, pb, pc))
    return rounds, rs, finals, e


def prove_quad(claim: int, pm, pz, transcript: Transcript, label: bytes):
    """Phase-2 sumcheck.  Returns (round_evals, r_points, final_vals, e)."""
    n = pm.shape[0]
    kernel = _round_quad_kernel(n)
    binder = _bind_kernel(n, 2)
    rounds, rs = [], []
    e = claim % MOD
    active = n
    while active > 1:
        ah = jnp.int32(active // 2)
        e0, e2 = (_limb_to_int(v) for v in kernel(pm, pz, ah))
        e1 = (e - e0) % MOD
        transcript.append_scalar(label + b"/e0", _scalar_bytes(e0))
        transcript.append_scalar(label + b"/e2", _scalar_bytes(e2))
        r = transcript.challenge_scalar(label + b"/r")
        rs.append(r)
        rounds.append([e0, e1, e2])
        pm, pz = binder(_to_dev(r), ah, pm, pz)
        e = lagrange_eval([e0, e1, e2], r)
        active //= 2
    finals = (_limb_to_int(pm[0]), _limb_to_int(pz[0]))
    return rounds, rs, finals, e


def verify_rounds(
    claim: int, round_polys: list, degree: int, transcript: Transcript, label: bytes
):
    """Replay the FS schedule; returns (final_claim, r_points) or raises."""
    e = claim % MOD
    rs = []
    for evals in round_polys:
        if degree == 3:
            e0, e2, e3 = evals[0], evals[2], evals[3]
            e1 = (e - e0) % MOD
            if evals[1] != e1:
                raise ValueError("sumcheck: p(0)+p(1) != claim")
            transcript.append_scalar(label + b"/e0", _scalar_bytes(e0))
            transcript.append_scalar(label + b"/e2", _scalar_bytes(e2))
            transcript.append_scalar(label + b"/e3", _scalar_bytes(e3))
        else:
            e0, e2 = evals[0], evals[2]
            e1 = (e - e0) % MOD
            if evals[1] != e1:
                raise ValueError("sumcheck: p(0)+p(1) != claim")
            transcript.append_scalar(label + b"/e0", _scalar_bytes(e0))
            transcript.append_scalar(label + b"/e2", _scalar_bytes(e2))
        r = transcript.challenge_scalar(label + b"/r")
        rs.append(r)
        e = lagrange_eval(evals, r)
    return e, rs
