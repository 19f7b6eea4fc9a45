"""SDPA parser + interior-point oracle + SDP certificate R1CS."""

import numpy as np
import pytest

from otti_tpu.codegen import sdp_cert
from otti_tpu.io import sdpa
from otti_tpu.oracle import sdp_oracle

TOY = "/root/reference/datasets/SDP/small/sdpa_example.dat-s"


def test_parse_toy_dats():
    p = sdpa.parse_dats(TOY)
    assert p.m >= 1 and p.n >= 2
    assert p.C.shape == (p.n, p.n)
    assert len(p.A) == p.m
    assert np.allclose(p.C, p.C.T)
    for Ai in p.A:
        assert np.allclose(Ai, Ai.T)


def test_oracle_on_random_problem():
    prob, X0 = sdpa.random_problem(3, 4, seed=1)
    X, y, S = sdp_oracle.solve(prob)
    # primal feasibility
    for Ai, bi in zip(prob.A, prob.b):
        assert abs((Ai * X).sum() - bi) < 1e-4 * (1 + abs(bi))
    # dual slack PSD + complementarity
    w = np.linalg.eigvalsh(S)
    assert w.min() > -1e-7
    assert abs((X * S).sum()) < 1e-3


def test_oracle_on_toy_instance():
    p = sdpa.parse_dats(TOY)
    X, y, S = sdp_oracle.solve(p)
    assert abs((X * S).sum()) < 1e-3
    for Ai, bi in zip(p.A, p.b):
        assert abs((Ai * X).sum() - bi) < 1e-3 * (1 + abs(bi))


def test_sdp_certificate_r1cs_toy():
    p = sdpa.parse_dats(TOY)
    X, y, S = sdp_oracle.solve(p)
    Lx = sdp_oracle.cholesky_witness(X)
    Ls = sdp_oracle.cholesky_witness(S)
    shape, vars_, inputs = sdp_cert.build(p, X, y, Lx, Ls)
    assert inputs == []
    assert shape.is_satisfied(vars_, inputs)


def test_sdp_circuit_canonical_across_witnesses():
    """Same instance + different honest witnesses -> identical R1CS digest
    (canonical circuits, VERDICT round-1 weak #2)."""
    p = sdpa.parse_dats(TOY)
    X, y, S = sdp_oracle.solve(p)
    Lx = sdp_oracle.cholesky_witness(X)
    Ls = sdp_oracle.cholesky_witness(S)
    shape1, v1, _ = sdp_cert.build(p, X, y, Lx, Ls)
    eps = 1e-6
    X2 = X + eps * np.eye(p.n)
    Lx2 = sdp_oracle.cholesky_witness(X2)
    shape2, v2, _ = sdp_cert.build(p, X2, y, Lx2, Ls)
    assert v1 != v2
    assert shape1.digest() == shape2.digest()
    assert shape2.is_satisfied(v2, [])


def test_sdp_certificate_rejects_infeasible():
    p = sdpa.parse_dats(TOY)
    X, y, S = sdp_oracle.solve(p)
    Lx = sdp_oracle.cholesky_witness(X)
    Ls = sdp_oracle.cholesky_witness(S)
    with pytest.raises(AssertionError):
        sdp_cert.build(p, X + 1.0, y, Lx, Ls)  # breaks A.X=b / X=LL^T
