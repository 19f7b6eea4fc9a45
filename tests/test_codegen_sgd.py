"""Builder gadgets + SGD certificate -> R1CS -> NIZK end-to-end."""

import numpy as np
import pytest

from otti_tpu.codegen import sgd_cert
from otti_tpu.codegen.builder import Builder, MOD, ONE
from otti_tpu.io import pmlb_local
from otti_tpu.oracle import sgd_oracle
from otti_tpu.spartan import nizk


def test_builder_gadgets():
    b = Builder("t")
    x = b.var(6)
    y = b.var(7)
    z = b.mul(x, y)
    b.assert_eq(z, x * 7)
    b.bits(x, 3)
    b.assert_in_pm(x - y, 5, 4)
    b.dge(x * 10, y, 5, 7)  # 60 + 5 >= 7
    assert b.sanity_check()
    shape, vars_, inputs = b.finalize()
    assert shape.is_satisfied(vars_, inputs)


def test_builder_detects_bad_witness():
    b = Builder("t")
    x = b.var(3)
    b.constrain(x, x, x)  # 9 != 3 -> unsatisfied
    assert not b.sanity_check()


def test_builder_range_check_rejects():
    b = Builder("t")
    x = b.var(9)
    with pytest.raises(AssertionError):
        b.bits(x, 3)  # 9 needs 4 bits


def test_sgd_certificate_pipeline():
    X, y, src = pmlb_local.fetch("iris", 0, 1, seed=3)
    # iris is REAL benchmark data embedded in-repo (the canonical UCI
    # iris, = PMLB's iris; reference trains on it via pmlb fetch_data)
    assert src == "pmlb_cache"
    assert X.shape == (100, 4)
    w = sgd_oracle.solve(X, y, seed=3)
    assert np.all(y * (X @ w) >= 1)
    shape, vars_, inputs = sgd_cert.build(X, y, w)
    assert shape.is_satisfied(vars_, inputs)
    # public inputs are |w|
    assert inputs == [int(abs(v)) for v in w]


def test_sgd_certificate_rejects_bad_weights():
    X, y, src = pmlb_local.fetch("iris", 0, 1, seed=3)
    w = sgd_oracle.solve(X, y, seed=3)
    bad_w = np.array(w)
    bad_w[0] += 1000  # breaks at least one margin on typical data
    if np.all(y * (X @ bad_w) >= 1):  # extremely unlikely; make it fail
        bad_w = -w
    with pytest.raises((AssertionError, RuntimeError)):
        sgd_cert.build(X, y, bad_w)


def test_sgd_prob_mode_half_samples():
    X, y, src = pmlb_local.fetch("iris", 0, 1, seed=3)
    w = sgd_oracle.solve(X, y, seed=3)
    full, _, _ = sgd_cert.build(X, y, w)
    half, _, _ = sgd_cert.build(X, y, w, prob=True)
    assert half.num_cons < full.num_cons


def test_sgd_nizk_end_to_end_small():
    """The minimum end-to-end slice (SURVEY.md §7.3) on a tiny dataset."""
    rng = np.random.default_rng(0)
    X = rng.integers(-5, 6, size=(8, 3))
    w_true = np.array([2, -1, 3])
    y = np.where(X @ w_true >= 0, 1, -1)
    # adjust to exact separability with margin 1
    for i in range(len(y)):
        while y[i] * (X[i] @ w_true) < 1:
            X[i] += y[i] * np.sign(w_true)
    w = sgd_oracle.solve(X, y)
    shape, vars_, inputs = sgd_cert.build(X, y, w)
    dev = shape.to_device()
    proof = nizk.prove(dev, vars_, inputs)
    assert nizk.verify(dev, inputs, proof)
    # flipping a public weight must break verification
    bad = [(inputs[0] + 1) % MOD] + inputs[1:]
    assert not nizk.verify(dev, bad, proof)


def test_real_data_wine_certificate():
    """wine_recognition (real UCI data, datasets/pmlb_cache) admits an
    integer certificate after decimal-preserving x10 scaling — the
    scaled-rounded-SVC oracle fallback (r05, VERDICT r04 next #3)."""
    X, y, src = pmlb_local.fetch("wine_recognition", 0, 1, 220, scale=10)
    assert src == "pmlb_cache"
    w = sgd_oracle.solve(X, y, seed=220, eta0=1.0, maxiter=80000, tol=1e-3)
    assert np.all(y * (X @ w) >= 1)
    shape, vars_, inputs = sgd_cert.build(X, y, w)
    assert shape.num_cons > 0


def test_real_data_breast_cancer_prob_half():
    """breast_cancer_wisconsin is NOT separable on the full sample (no
    zero-subgradient certificate exists) but IS on the prob-mode half."""
    X, y, src = pmlb_local.fetch("breast_cancer_wisconsin", 0, 1, 220, scale=10)
    assert src == "pmlb_cache"
    n = len(y) // 2
    w = sgd_oracle.solve(X[:n], y[:n], seed=220, eta0=1.0, maxiter=80000,
                         tol=1e-3)
    assert np.all(y[:n] * (X[:n] @ w) >= 1)
    shape, vars_, inputs = sgd_cert.build(X, y, w, prob=True)
    assert shape.num_cons > 0
