"""Segmented multi-chip provers vs single-chip: byte-identical proofs.

parallel/hybrid_sharded.py decomposes the sharded prover into per-shape
segment kernels (compile-light — the multichip dryrun path); the cyclic
layout + psum'd round evals + single-chip tail kernels mean every absorbed
transcript byte matches the single-chip provers.  Runs on the 8-virtual-
device CPU mesh from conftest.
"""

import dataclasses
import random

import jax
import pytest

from otti_tpu import runtime
from otti_tpu.field.fields import SCALAR
from otti_tpu.parallel import hybrid_sharded
from otti_tpu.spartan import hybrid, nizk, zknizk
from otti_tpu.spartan.r1cs import R1CSShape

# persist the sharded kernels too (safe on this jaxlib per the probe), so
# warm reruns of this module are executable loads, not recompiles
runtime.allow_multidevice_cache()

MOD = SCALAR.modulus


def _random_r1cs(n_cons, n_vars, n_inputs, seed):
    r = random.Random(seed)
    zvars = [r.randrange(MOD) for _ in range(n_vars)]
    inputs = [r.randrange(1, 1000) for _ in range(n_inputs)]
    full = zvars + [1] + inputs
    A, B, C = [], [], []
    for row in range(n_cons):
        ca, cb = r.randrange(len(full)), r.randrange(len(full))
        va, vb = r.randrange(1, 99), r.randrange(1, 99)
        A.append((row, ca, va))
        B.append((row, cb, vb))
        C.append((row, n_vars, va * full[ca] % MOD * (vb * full[cb] % MOD) % MOD))
    return R1CSShape.from_logical(n_cons, n_vars, n_inputs, A, B, C), zvars, inputs


def _deep_eq(a, b):
    if dataclasses.is_dataclass(a):
        return type(a) is type(b) and all(
            _deep_eq(getattr(a, f.name), getattr(b, f.name))
            for f in dataclasses.fields(a)
        )
    if isinstance(a, (list, tuple)):
        return len(a) == len(b) and all(_deep_eq(x, y) for x, y in zip(a, b))
    return a == b


@pytest.mark.parametrize(
    "k", [pytest.param(2, marks=pytest.mark.heavy), 8]
)
def test_segmented_sharded_matches_single_chip(k):
    if len(jax.devices()) < k:
        pytest.skip("needs %d devices" % k)
    # 130 cons pads to 256 => multiple local rounds per shard; 90 vars pads
    # to 128 => the Hyrax row grid exceeds k so the commit path shards
    shape, zvars, inputs = _random_r1cs(130, 90, 5, seed=130 + k)
    dev = shape.to_device()

    # hybrid.prove is the compile-light single-chip reference; its own
    # byte-equality to nizk.prove/fused.prove is pinned by test_hybrid.py
    p1 = hybrid.prove(dev, zvars, inputs)
    pk = hybrid_sharded.prove(dev, zvars, inputs, k=k)

    assert pk.comm_vars == p1.comm_vars
    assert pk.phase1_polys == p1.phase1_polys
    assert pk.claims_abc == p1.claims_abc
    assert pk.phase2_polys == p1.phase2_polys
    assert pk.bullet == p1.bullet
    assert pk.claim_w == p1.claim_w
    assert nizk.verify(dev, inputs, pk)


@pytest.mark.parametrize("k", [8])
def test_segmented_zk_sharded_matches_zknizk(k):
    """Sharded segmented ZK prover: byte-identical to zknizk.prove with
    the same blind seed (the CLI's default mode under --mesh)."""
    if len(jax.devices()) < k:
        pytest.skip("needs %d devices" % k)
    shape, zvars, inputs = _random_r1cs(72, 40, 4, seed=600 + k)
    dev = shape.to_device()
    seed = bytes([k]) * 32

    # hybrid.prove_zk: compile-light single-chip reference (byte-equality
    # to zknizk.prove is pinned by test_hybrid.py)
    p_ref = hybrid.prove_zk(dev, zvars, inputs, seed=seed)
    p_k = hybrid_sharded.prove_zk(dev, zvars, inputs, k=k, seed=seed)

    assert _deep_eq(p_ref, p_k)
    assert zknizk.verify(dev, inputs, p_k)


@pytest.mark.heavy
def test_sharded_zk_suite_scale():
    """Suite-scale sharding stays byte-identical (VERDICT r04 next #5):
    a 2^14-cons instance at k=8 exercises multiple segments per phase and
    a sharded Hyrax commit grid — the shapes the full LP/SDP suites hit.
    (The committed brandy record at 2^15 comes from
    scripts/mesh_suite_record.py.)"""
    k = 8
    if len(jax.devices()) < k:
        pytest.skip("needs %d devices" % k)
    shape, zvars, inputs = _random_r1cs(9000, 6000, 8, seed=77)
    dev = shape.to_device()
    assert shape.num_cons_padded >= (1 << 14)
    seed = b"\x33" * 32
    p_ref = hybrid.prove_zk(dev, zvars, inputs, seed=seed)
    p_k = hybrid_sharded.prove_zk(dev, zvars, inputs, k=k, seed=seed)
    assert _deep_eq(p_ref, p_k)
    assert zknizk.verify(dev, inputs, p_k)
