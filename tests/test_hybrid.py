"""Hybrid (multi-dispatch, device-transcript) provers: byte-equality.

The hybrid provers are the large-shape path (VERDICT r02 next #1): the
sumcheck phases run as one device dispatch each with zero mid-phase host
syncs, and every kernel is cached by padded table size so instances that
share a size class share compilations.  The wire format must stay
byte-identical to the classic provers.
"""

import pytest
import dataclasses

from otti_tpu.spartan import hybrid, nizk, zknizk
from tests.test_fused import _random_r1cs
from tests.test_nizk import random_instance, toy_instance
from tests.test_zkfused import _proofs_equal

MOD = zknizk.L


def test_hybrid_matches_classic():
    for args in ((16, 8, 3), (33, 20, 2)):
        shape, zvars, inputs = _random_r1cs(*args, seed=args[0])
        dev = shape.to_device()
        p_classic = nizk.prove(dev, zvars, inputs)
        p_hybrid = hybrid.prove(dev, zvars, inputs)
        assert _proofs_equal(p_classic, p_hybrid)
        assert nizk.verify(dev, inputs, p_hybrid)


def test_hybrid_zk_matches_zknizk_toy():
    shape, vars_, ios = toy_instance()
    dev = shape.to_device()
    seed = b"\x31" * 32
    p_ref = zknizk.prove(dev, vars_, ios, seed=seed)
    p_hybrid = hybrid.prove_zk(dev, vars_, ios, seed=seed)
    assert _proofs_equal(p_ref, p_hybrid)
    assert zknizk.verify(dev, ios, p_hybrid)


@pytest.mark.heavy
def test_hybrid_zk_multirow_hyrax():
    shape, zvars, inputs = random_instance(12, 11, 2, seed=4321)
    dev = shape.to_device()
    seed = b"\x32" * 32
    p_ref = zknizk.prove(dev, zvars, inputs, seed=seed)
    p_hybrid = hybrid.prove_zk(dev, zvars, inputs, seed=seed)
    assert _proofs_equal(p_ref, p_hybrid)
    assert zknizk.verify(dev, inputs, p_hybrid)
    assert not zknizk.verify(dev, [(x + 1) % MOD for x in inputs], p_hybrid)


def test_hybrid_zk_sound():
    shape, vars_, ios = toy_instance()
    dev = shape.to_device()
    p1 = hybrid.prove_zk(dev, vars_, ios, seed=b"\x41" * 32)
    bad = dataclasses.replace(
        p1,
        bullet=dataclasses.replace(p1.bullet, z1=(p1.bullet.z1 + 1) % MOD),
    )
    assert not zknizk.verify(dev, ios, bad)
