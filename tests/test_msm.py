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
