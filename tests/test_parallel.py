"""Sharded kernels vs single-chip ground truth on the 8-device CPU mesh."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from otti_tpu import runtime
from otti_tpu.curve import edwards as E
from otti_tpu.field import fields, ops as F
from otti_tpu.field.fields import SCALAR
from otti_tpu.msm import pippenger
from otti_tpu.parallel import sharded
from otti_tpu.refimpl import numeric as ref
from otti_tpu.spartan import sumcheck

# persist the multi-device executables (safe per the runtime probe) so
# warm reruns of this module are loads, not recompiles
runtime.allow_multidevice_cache()

MOD = SCALAR.modulus


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return sharded.make_mesh(8, dp=1)


def _dev_vec(xs):
    return jnp.asarray(fields.ints_to_limbs([x % MOD for x in xs]))


@pytest.mark.heavy  # ~4 min cold XLA:CPU compile; the sharded round math
# is covered end-to-end by test_hybrid_sharded.py's psum'd prover rounds
def test_sharded_round_totals_match(mesh):
    r = random.Random(5)
    n = 32
    tbls = [
        _dev_vec([r.randrange(MOD) for _ in range(n)]) for _ in range(4)
    ]
    put = lambda x: jax.device_put(x, NamedSharding(mesh, P("sp", None)))
    eq, pa, pb, pc = (put(t) for t in tbls)
    e0, e2, e3 = sharded.round_cubic_sharded(mesh, eq, pa, pb, pc)
    # p(0) + p(1) must equal the full-cube sum regardless of bind order
    w = F.sub(SCALAR, F.mul(SCALAR, tbls[1], tbls[2]), tbls[3])
    total = sumcheck._limb_to_int(
        jax.jit(lambda a, b: F.canon(SCALAR, F.dot(SCALAR, a, b)))(tbls[0], w)
    )
    # reconstruct p(1) from the sharded tables after LSB-binding with r=1:
    # p(1) = total - p(0)
    p0 = sumcheck._limb_to_int(e0)
    lo = tbls[0][0::2]
    hi_eq = tbls[0][1::2]
    # direct check of p(0): sum over even-index pairs at X=0
    w_lo = F.sub(
        SCALAR,
        F.mul(SCALAR, tbls[1][0::2], tbls[2][0::2]),
        tbls[3][0::2],
    )
    p0_direct = sumcheck._limb_to_int(
        jax.jit(lambda a, b: F.canon(SCALAR, F.dot(SCALAR, a, b)))(lo, w_lo)
    )
    assert p0 == p0_direct
    # and binding at X=1 gives the complementary half
    w_hi = F.sub(
        SCALAR,
        F.mul(SCALAR, tbls[1][1::2], tbls[2][1::2]),
        tbls[3][1::2],
    )
    p1_direct = sumcheck._limb_to_int(
        jax.jit(lambda a, b: F.canon(SCALAR, F.dot(SCALAR, a, b)))(hi_eq, w_hi)
    )
    assert (p0_direct + p1_direct) % MOD == total


def test_sharded_bind_matches_local(mesh):
    r = random.Random(6)
    n = 16
    tbl = _dev_vec([r.randrange(MOD) for _ in range(n)])
    rr = r.randrange(MOD)
    put = lambda x: jax.device_put(x, NamedSharding(mesh, P("sp", None)))
    (bound,) = sharded.bind_sharded(mesh, _dev_vec([rr])[0], put(tbl))
    # reference LSB bind
    lo, hi = tbl[0::2], tbl[1::2]
    want = F.add(
        SCALAR,
        lo,
        F.mul(SCALAR, _dev_vec([rr])[0][None, :], F.sub(SCALAR, hi, lo)),
    )
    got = fields.limbs_to_ints(F.canon_jit(SCALAR)(bound))
    expect = fields.limbs_to_ints(F.canon_jit(SCALAR)(want))
    assert got == expect


def test_sharded_msm_matches(mesh):
    r = random.Random(7)
    n = 16
    ks = [r.randrange(ref.L) for _ in range(n)]
    pts_ref = [ref.EdPoint.base() * r.randrange(1, ref.L) for _ in range(n)]
    pts = E.stack([E.from_ref(p) for p in pts_ref])
    scs = _dev_vec(ks)
    pt_sh = NamedSharding(mesh, P("sp", None))
    pts_s = jax.tree.map(lambda a: jax.device_put(a, pt_sh), pts)
    scs_s = jax.device_put(scs, pt_sh)
    got = sharded.msm_sharded(mesh, pts_s, scs_s, window=2)
    want = ref.EdPoint.identity()
    for k, p in zip(ks, pts_ref):
        want = want + p * k
    assert E.to_ref(got) == want


def test_sharded_matvec_matches(mesh):
    from tests.test_nizk import random_instance

    shape, zvars, inputs = random_instance(8, 6, 2, seed=9)
    dev = shape.to_device()
    from otti_tpu.spartan import r1cs as dr

    nvp = dev.num_vars
    z = dr.assemble_z(
        _dev_vec(zvars + [0] * (nvp - len(zvars))), _dev_vec(inputs), nvp
    )
    want = fields.limbs_to_ints(F.canon_jit(SCALAR)(dev.matvec(0, z)))
    rows, cols, vals = dev.mats[0]
    pad = (-rows.shape[0]) % 8
    if pad:
        rows = jnp.concatenate([rows, jnp.zeros(pad, rows.dtype)])
        cols = jnp.concatenate([cols, jnp.zeros(pad, cols.dtype)])
        vals = jnp.concatenate([vals, jnp.zeros((pad, vals.shape[1]), vals.dtype)])
    rows = jax.device_put(rows, NamedSharding(mesh, P("sp")))
    cols = jax.device_put(cols, NamedSharding(mesh, P("sp")))
    vals = jax.device_put(vals, NamedSharding(mesh, P("sp", None)))
    got_dev = sharded.matvec_sharded(mesh, rows, cols, vals, z, dev.num_cons)
    got = fields.limbs_to_ints(F.canon_jit(SCALAR)(got_dev))
    assert got == want
