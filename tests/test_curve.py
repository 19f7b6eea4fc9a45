"""edwards25519 batched kernels vs. the RFC-based host reference."""

import functools
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otti_tpu.curve import edwards as E
from otti_tpu.field import fields, ops as F
from otti_tpu.field.fields import BASE, SCALAR
from otti_tpu.refimpl import numeric as ref


def rand_ref_points(n, seed=0):
    r = random.Random(seed)
    return [ref.EdPoint.base() * r.randrange(1, ref.L) for _ in range(n)]


def dev_points(pts):
    return E.stack([E.from_ref(p) for p in pts])


@functools.lru_cache(maxsize=None)
def jadd():
    return jax.jit(E.add)


@functools.lru_cache(maxsize=None)
def jdouble():
    return jax.jit(E.double)


def assert_points_equal(dev_batch, ref_pts):
    n = len(ref_pts)
    cj = F.canon_jit(BASE)
    xs = fields.limbs_to_ints(cj(dev_batch["x"]))
    ys = fields.limbs_to_ints(cj(dev_batch["y"]))
    zs = fields.limbs_to_ints(cj(dev_batch["z"]))
    for i in range(n):
        ax, ay = ref_pts[i].affine()
        zinv = pow(zs[i], ref.P - 2, ref.P)
        assert (xs[i] * zinv) % ref.P == ax, f"x mismatch at {i}"
        assert (ys[i] * zinv) % ref.P == ay, f"y mismatch at {i}"


def test_add_double_vs_ref():
    ps = rand_ref_points(8, 1)
    qs = rand_ref_points(8, 2)
    dp, dq = dev_points(ps), dev_points(qs)
    got_add = jadd()(dp, dq)
    assert_points_equal(got_add, [p + q for p, q in zip(ps, qs)])
    got_dbl = jdouble()(dp)
    assert_points_equal(got_dbl, [p.double() for p in ps])


def test_identity_and_negation():
    ps = rand_ref_points(4, 3)
    dp = dev_points(ps)
    ident = E.identity((4,))
    assert_points_equal(jadd()(dp, ident), ps)
    got = jadd()(dp, jax.jit(E.negate)(dp))
    eqid = jax.jit(E.eq)(got, E.identity((4,)))
    assert bool(np.asarray(eqid).all())


def test_add_is_complete_on_edge_cases():
    """P+P, P+(-P), id+id must all be correct with the same code path."""
    p = ref.EdPoint.base() * 7
    dp = dev_points([p, p, ref.EdPoint.identity()])
    dq = dev_points([p, -p, ref.EdPoint.identity()])
    got = jadd()(dp, dq)
    assert_points_equal(got, [p + p, ref.EdPoint.identity(), ref.EdPoint.identity()])


def test_scalar_mul():
    r = random.Random(4)
    ks = [0, 1, 2, r.randrange(ref.L), ref.L - 1, r.randrange(ref.L)]
    p = ref.EdPoint.base() * 12345
    dp = dev_points([p] * len(ks))
    k_limbs = jnp.asarray(fields.ints_to_limbs(ks))
    got = jax.jit(E.scalar_mul)(dp, k_limbs)
    assert_points_equal(got, [p * k for k in ks])


def test_sum_points():
    for n in (1, 2, 5, 8):
        ps = rand_ref_points(n, 10 + n)
        got = jax.jit(E.sum_points)(dev_points(ps))
        want = functools.reduce(lambda a, b: a + b, ps)
        got_batched = jax.tree.map(lambda a: a[None], got)
        assert_points_equal(got_batched, [want])
