"""Fused (single-dispatch, device-transcript) prover vs the classic prover.

The fused path must produce *byte-identical* proofs: same transcript
schedule, same challenges, same round polynomials — so nizk.verify accepts
them interchangeably and the wire format is unchanged.
"""

import random

import pytest

from otti_tpu.field.fields import SCALAR
from otti_tpu.spartan import fused, nizk
from otti_tpu.spartan.r1cs import R1CSShape

MOD = SCALAR.modulus


def _random_r1cs(n_cons, n_vars, n_inputs, seed):
    r = random.Random(seed)
    zvars = [r.randrange(MOD) for _ in range(n_vars)]
    inputs = [r.randrange(1, 1000) for _ in range(n_inputs)]
    # z layout: (vars | 1 | inputs); column index for input i is n_vars+1+i
    full = zvars + [1] + inputs
    A, B, C = [], [], []
    for row in range(n_cons):
        ca = r.randrange(len(full))
        cb = r.randrange(len(full))
        va, vb = r.randrange(1, 99), r.randrange(1, 99)
        target = va * full[ca] % MOD * (vb * full[cb] % MOD) % MOD
        A.append((row, ca, va))
        B.append((row, cb, vb))
        C.append((row, n_vars, target * pow(1, 1, MOD)))
    shape = R1CSShape.from_logical(n_cons, n_vars, n_inputs, A, B, C)
    return shape, zvars, inputs


@pytest.mark.parametrize(
    "n_cons,n_vars,n_inputs", [(8, 4, 0), (16, 8, 3), (33, 20, 2)]
)
def test_fused_matches_classic(n_cons, n_vars, n_inputs):
    shape, zvars, inputs = _random_r1cs(n_cons, n_vars, n_inputs, n_cons)
    assert shape.is_satisfied(zvars, inputs)
    dev = shape.to_device()

    p_classic = nizk.prove(dev, zvars, inputs)
    p_fused = fused.prove(dev, zvars, inputs)

    assert p_fused.comm_vars == p_classic.comm_vars
    assert p_fused.phase1_polys == p_classic.phase1_polys
    assert p_fused.claims_abc == p_classic.claims_abc
    assert p_fused.phase2_polys == p_classic.phase2_polys
    assert p_fused.bullet == p_classic.bullet
    assert p_fused.claim_w == p_classic.claim_w

    assert nizk.verify(dev, inputs, p_fused)


def test_fused_soundness_tamper():
    shape, zvars, inputs = _random_r1cs(16, 8, 2, 99)
    dev = shape.to_device()
    proof = fused.prove(dev, zvars, inputs)
    proof.claims_abc = (
        (proof.claims_abc[0] + 1) % MOD,
        proof.claims_abc[1],
        proof.claims_abc[2],
    )
    assert not nizk.verify(dev, inputs, proof)
