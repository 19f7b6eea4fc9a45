"""Zero-knowledge Spartan NIZK end-to-end (completeness + soundness + ZK)."""

import dataclasses

import pytest

from otti_tpu.spartan import zknizk
from tests.test_nizk import random_instance, toy_instance

MOD = zknizk.L


def test_zk_completeness_toy():
    shape, vars_, ios = toy_instance()
    dev = shape.to_device()
    proof = zknizk.prove(dev, vars_, ios, seed=b"\x01" * 32)
    assert zknizk.verify(dev, ios, proof)


def test_zk_multirow_hyrax():
    """nvp >= 16 so the Hyrax matrix has multiple rows AND multiple cols —
    exercises the eq-weight bit-order convention end-to-end."""
    shape, zvars, inputs = random_instance(12, 11, 2, seed=99)
    dev = shape.to_device()
    proof = zknizk.prove(dev, zvars, inputs, seed=b"\x02" * 32)
    assert zknizk.verify(dev, inputs, proof)
    assert not zknizk.verify(dev, [(x + 1) % MOD for x in inputs], proof)


def test_zk_soundness_tampered():
    shape, vars_, ios = toy_instance()
    dev = shape.to_device()
    proof = zknizk.prove(dev, vars_, ios, seed=b"\x03" * 32)
    # tamper a sumcheck round commitment
    bad = dataclasses.replace(
        proof,
        sc1=dataclasses.replace(
            proof.sc1, comm_polys=[proof.sc1.comm_polys[-1]] + proof.sc1.comm_polys[1:]
        ),
    )
    assert not zknizk.verify(dev, ios, bad)
    # tamper the witness-eval commitment
    bad2 = dataclasses.replace(proof, comm_w=proof.comm_vars[0])
    assert not zknizk.verify(dev, ios, bad2)
    # tamper the bullet opening response
    bad3 = dataclasses.replace(
        proof,
        bullet=dataclasses.replace(
            proof.bullet, z1=(proof.bullet.z1 + 1) % MOD
        ),
    )
    assert not zknizk.verify(dev, ios, bad3)
    # tamper the dual-base tie
    bad4 = dataclasses.replace(
        proof,
        base_eq=dataclasses.replace(
            proof.base_eq, z=(proof.base_eq.z + 1) % MOD
        ),
    )
    assert not zknizk.verify(dev, ios, bad4)


def test_zk_proofs_are_randomized():
    """Different blind seeds -> different proofs for the same statement
    (necessary condition for zero-knowledge)."""
    shape, vars_, ios = toy_instance()
    dev = shape.to_device()
    p1 = zknizk.prove(dev, vars_, ios, seed=b"\x04" * 32)
    p2 = zknizk.prove(dev, vars_, ios, seed=b"\x05" * 32)
    assert p1.comm_vars != p2.comm_vars  # blinded row commitments differ
    assert p1.sc1.comm_polys != p2.sc1.comm_polys
    assert zknizk.verify(dev, ios, p1) and zknizk.verify(dev, ios, p2)
