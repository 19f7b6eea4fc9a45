"""End-to-end Spartan NIZK prove/verify on small R1CS instances.

Completeness + soundness property tests (SURVEY.md §4 implication (b)):
satisfied instances verify; tampered proofs/witnesses/inputs don't.
"""

import dataclasses
import random

import pytest

from otti_tpu.spartan import nizk, r1cs
from otti_tpu.spartan.r1cs import R1CSShape

MOD = nizk.MOD


def toy_instance():
    """x0*x0 = x1, x1*x0 = x2, (x2 + x0)*1 = io0  with io public.

    Logical cols: 0..2 = vars, 3 = const 1, 4 = io0.
    """
    A = [(0, 0, 1), (1, 1, 1), (2, 2, 1), (2, 0, 1)]
    B = [(0, 0, 1), (1, 0, 1), (2, 3, 1)]
    C = [(0, 1, 1), (1, 2, 1), (2, 4, 1)]
    shape = R1CSShape.from_logical(3, 3, 1, A, B, C)
    x0 = 7
    vars_ = [x0, x0 * x0 % MOD, x0 * x0 * x0 % MOD]
    ios = [(vars_[2] + x0) % MOD]
    return shape, vars_, ios


def random_instance(n_cons, n_vars, n_inputs, seed):
    """Random satisfiable R1CS: pick z, then rows (a.z)*(b.z) = (c.z) with
    c chosen to make the row hold."""
    r = random.Random(seed)
    zvars = [r.randrange(MOD) for _ in range(n_vars)]
    inputs = [r.randrange(MOD) for _ in range(n_inputs)]
    full = zvars + [1] + inputs  # logical z
    A, B, C = [], [], []
    for row in range(n_cons):
        acols = r.sample(range(len(full)), min(3, len(full)))
        bcols = r.sample(range(len(full)), min(2, len(full)))
        av = [(c, r.randrange(1, 1000)) for c in acols]
        bv = [(c, r.randrange(1, 1000)) for c in bcols]
        a_dot = sum(v * full[c] for c, v in av) % MOD
        b_dot = sum(v * full[c] for c, v in bv) % MOD
        target = a_dot * b_dot % MOD
        # c row: target * 1 (use the constant-one column with coeff target)
        A += [(row, c, v) for c, v in av]
        B += [(row, c, v) for c, v in bv]
        C += [(row, n_vars, target)]
    shape = R1CSShape.from_logical(n_cons, n_vars, n_inputs, A, B, C)
    return shape, zvars, inputs


def test_host_satisfiability_oracle():
    shape, vars_, ios = toy_instance()
    assert shape.is_satisfied(vars_, ios)
    bad = list(vars_)
    bad[1] = (bad[1] + 1) % MOD
    assert not shape.is_satisfied(bad, ios)


def test_nizk_completeness_toy():
    shape, vars_, ios = toy_instance()
    dev = shape.to_device()
    proof = nizk.prove(dev, vars_, ios)
    assert nizk.verify(dev, ios, proof)


def test_nizk_soundness_bad_input():
    shape, vars_, ios = toy_instance()
    dev = shape.to_device()
    proof = nizk.prove(dev, vars_, ios)
    assert not nizk.verify(dev, [(ios[0] + 1) % MOD], proof)


def test_nizk_soundness_tampered_proof():
    shape, vars_, ios = toy_instance()
    dev = shape.to_device()
    proof = nizk.prove(dev, vars_, ios)
    # tamper with a sumcheck round polynomial
    bad = dataclasses.replace(
        proof,
        phase1_polys=[[(e + (1 if i == j == 0 else 0)) % MOD for i, e in enumerate(p)]
                      for j, p in enumerate(proof.phase1_polys)],
    )
    assert not nizk.verify(dev, ios, bad)
    # tamper with claimed evaluation
    bad2 = dataclasses.replace(proof, claim_w=(proof.claim_w + 1) % MOD)
    assert not nizk.verify(dev, ios, bad2)
    # tamper with the bullet opening argument
    bad3 = dataclasses.replace(
        proof,
        bullet=dataclasses.replace(
            proof.bullet, z1=(proof.bullet.z1 + 1) % MOD
        ),
    )
    assert not nizk.verify(dev, ios, bad3)


@pytest.mark.parametrize("n_cons,n_vars,n_inputs", [(10, 8, 2), (17, 5, 3)])
def test_nizk_random_instances(n_cons, n_vars, n_inputs):
    shape, zvars, inputs = random_instance(n_cons, n_vars, n_inputs, n_cons)
    assert shape.is_satisfied(zvars, inputs)
    dev = shape.to_device()
    proof = nizk.prove(dev, zvars, inputs)
    assert nizk.verify(dev, inputs, proof)
    # proof for different inputs must not verify
    other = [(x + 1) % MOD for x in inputs]
    assert not nizk.verify(dev, other, proof)
