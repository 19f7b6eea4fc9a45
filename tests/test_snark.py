"""SNARK mode: SPARK sparse-matrix commitments + succinct matrix evals."""

import dataclasses

from otti_tpu.spartan import nizk, snark, spark
from tests.test_nizk import random_instance, toy_instance

MOD = nizk.MOD


def test_snark_completeness_toy():
    shape, vars_, ios = toy_instance()
    dev = shape.to_device()
    comm = spark.commit(dev)
    proof = snark.prove(dev, comm, vars_, ios)
    assert snark.verify(dev, comm, ios, proof)


def test_snark_random_and_soundness():
    shape, zvars, inputs = random_instance(12, 9, 2, seed=21)
    dev = shape.to_device()
    comm = spark.commit(dev)
    proof = snark.prove(dev, comm, zvars, inputs)
    assert snark.verify(dev, comm, inputs, proof)
    # wrong inputs fail
    assert not snark.verify(dev, comm, [(x + 1) % MOD for x in inputs], proof)
    # tampered matrix evaluation claim fails (the SPARK tie-in)
    ea, eb, ec = proof.evals_abc
    bad = dataclasses.replace(proof, evals_abc=((ea + 1) % MOD, eb, ec))
    assert not snark.verify(dev, comm, inputs, bad)
    # tampered logup sum fails
    sp0 = dataclasses.replace(
        proof.spark_proof, s_R_row=(proof.spark_proof.s_R_row + 1) % MOD
    )
    assert not snark.verify(
        dev, comm, inputs, dataclasses.replace(proof, spark_proof=sp0)
    )
    # tampered opening fails (bullet z1 response off by one — r05: the
    # RLC openings are log-sized bullet arguments, u is never revealed)
    bullet0 = proof.spark_proof.entry_opening
    sp1 = dataclasses.replace(
        proof.spark_proof,
        entry_opening=dataclasses.replace(bullet0, z1=(bullet0.z1 + 1) % MOD),
    )
    assert not snark.verify(
        dev, comm, inputs, dataclasses.replace(proof, spark_proof=sp1)
    )
    # tampered per-matrix claim: eB off by one while eA, eC intact (the
    # block selector must bind each block's sum separately)
    bad_b = dataclasses.replace(proof, evals_abc=(ea, (eb + 1) % MOD, ec))
    assert not snark.verify(dev, comm, inputs, bad_b)
