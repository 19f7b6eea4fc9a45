"""Fused (single-dispatch) ZK prover: byte-equality vs zknizk + e2e."""

import pytest
import dataclasses

from otti_tpu.spartan import zkfused, zknizk
from tests.test_nizk import random_instance, toy_instance

MOD = zknizk.L


def _proofs_equal(a, b) -> bool:
    """Recursive dataclass/field equality over the proof trees."""
    if dataclasses.is_dataclass(a):
        return type(a) is type(b) and all(
            _proofs_equal(getattr(a, f.name), getattr(b, f.name))
            for f in dataclasses.fields(a)
        )
    if isinstance(a, (list, tuple)):
        return len(a) == len(b) and all(
            _proofs_equal(x, y) for x, y in zip(a, b)
        )
    return a == b


def test_zkfused_matches_zknizk_toy():
    shape, vars_, ios = toy_instance()
    dev = shape.to_device()
    seed = b"\x11" * 32
    p_ref = zknizk.prove(dev, vars_, ios, seed=seed)
    p_fused = zkfused.prove(dev, vars_, ios, seed=seed)
    assert _proofs_equal(p_ref, p_fused)
    assert zknizk.verify(dev, ios, p_fused)


@pytest.mark.heavy
def test_zkfused_multirow_hyrax():
    shape, zvars, inputs = random_instance(12, 11, 2, seed=1234)
    dev = shape.to_device()
    seed = b"\x12" * 32
    p_ref = zknizk.prove(dev, zvars, inputs, seed=seed)
    p_fused = zkfused.prove(dev, zvars, inputs, seed=seed)
    assert _proofs_equal(p_ref, p_fused)
    assert zknizk.verify(dev, inputs, p_fused)
    assert not zknizk.verify(dev, [(x + 1) % MOD for x in inputs], p_fused)


def test_zkfused_randomized_and_sound():
    shape, vars_, ios = toy_instance()
    dev = shape.to_device()
    p1 = zkfused.prove(dev, vars_, ios, seed=b"\x21" * 32)
    p2 = zkfused.prove(dev, vars_, ios, seed=b"\x22" * 32)
    assert p1.comm_vars != p2.comm_vars
    assert zknizk.verify(dev, ios, p1) and zknizk.verify(dev, ios, p2)
    bad = dataclasses.replace(
        p1,
        bullet=dataclasses.replace(p1.bullet, z1=(p1.bullet.z1 + 1) % MOD),
    )
    assert not zknizk.verify(dev, ios, bad)
