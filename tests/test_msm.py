"""Pippenger MSM vs host reference (SURVEY.md §7.2 step 3)."""

import functools
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otti_tpu.curve import edwards as E
from otti_tpu.field import fields, ops as F
from otti_tpu.field.fields import BASE
from otti_tpu.msm import pippenger
from otti_tpu.refimpl import numeric as ref


def setup_case(n, seed):
    r = random.Random(seed)
    ks = [r.randrange(ref.L) for _ in range(n)]
    pts_ref = [ref.EdPoint.base() * r.randrange(1, ref.L) for _ in range(n)]
    want = ref.EdPoint.identity()
    for k, p in zip(ks, pts_ref):
        want = want + p * k
    dev_pts = E.stack([E.from_ref(p) for p in pts_ref])
    dev_ks = jnp.asarray(fields.ints_to_limbs(ks))
    return dev_pts, dev_ks, want


def check_equal(dev_point, want_ref):
    got = E.to_ref(dev_point)
    assert got == want_ref


@pytest.mark.parametrize("n,window", [(5, 2), (16, 3), (50, 4)])
def test_msm_matches_reference(n, window):
    pts, ks, want = setup_case(n, 100 + n)
    got = jax.jit(functools.partial(pippenger.msm, window=window))(pts, ks)
    check_equal(got, want)


def test_msm_auto_window_and_edge_scalars():
    n = 12
    r = random.Random(7)
    ks = [0, 1, ref.L - 1, 2**252] + [r.randrange(ref.L) for _ in range(n - 4)]
    pts_ref = [ref.EdPoint.base() * r.randrange(1, ref.L) for _ in range(n)]
    want = ref.EdPoint.identity()
    for k, p in zip(ks, pts_ref):
        want = want + p * (k % ref.L)
    dev_pts = E.stack([E.from_ref(p) for p in pts_ref])
    dev_ks = jnp.asarray(fields.ints_to_limbs(ks))
    got = jax.jit(pippenger.msm)(dev_pts, dev_ks)
    check_equal(got, want)


def test_msm_bitserial_agrees():
    pts, ks, want = setup_case(6, 42)
    got = jax.jit(pippenger.msm_bitserial)(pts, ks)
    check_equal(got, want)


def test_msm_shared_bases():
    import jax.numpy as jnp

    r = random.Random(9)
    rows, cols = 3, 4
    pts_ref = [ref.EdPoint.base() * r.randrange(1, ref.L) for _ in range(cols)]
    ks = [[r.randrange(ref.L) for _ in range(cols)] for _ in range(rows)]
    pts = E.stack([E.from_ref(p) for p in pts_ref])
    mat = jnp.stack([jnp.asarray(fields.ints_to_limbs(row)) for row in ks])
    got = jax.jit(pippenger.msm_shared_bases)(pts, mat)
    for i in range(rows):
        want = ref.EdPoint.identity()
        for k, p in zip(ks[i], pts_ref):
            want = want + p * k
        check_equal(jax.tree.map(lambda a: a[i], got), want)


@pytest.mark.parametrize("n", [32, 64, 256])
def test_msm_two_level_scan_sizes(n):
    """Sizes that take the TWO-LEVEL segmented scan (n % 16 == 0,
    n/16 >= 2).  Pins the r05 carry-mask fix: the HS guard flags plant a
    virtual boundary at every chunk's column 0, so the carry mask and
    chunk flags must come from the pure OR-scan of the true run-start
    marks — a run ending at a chunk's first element lost its carry."""
    pts, ks, want = setup_case(n, 900 + n)
    got = jax.jit(pippenger.msm)(pts, ks)
    check_equal(got, want)


def test_segment_scan_two_level_vs_naive():
    r = random.Random(17)
    n, w = 64, 4
    pts_ref = [ref.EdPoint.base() * r.randrange(1, ref.L) for _ in range(n)]
    digs = sorted(r.randrange(1 << w) for _ in range(n))
    want = [ref.EdPoint.identity() for _ in range(1 << w)]
    for d, p in zip(digs, pts_ref):
        want[d] = want[d] + p
    dev_pts = E.stack([E.from_ref(p) for p in pts_ref])
    got = jax.jit(
        lambda p, d: pippenger._segment_scan_bucket_sums(p, d, w)
    )(dev_pts, jnp.asarray(digs, jnp.int32))
    for b in range(1 << w):
        assert E.to_ref(jax.tree.map(lambda a: a[b], got)) == want[b], b
