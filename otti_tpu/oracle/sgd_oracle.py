"""SGD training oracle: produce the max-margin certificate weights.

Mirrors the reference's witness-time training step (sgdcodegen.py:17-27):
fit sklearn's SGDClassifier(loss="squared_hinge", alpha=0) and assert the
total subgradient norm is zero — i.e. every sample is classified with
margin >= 1 so the zero-subgradient optimality certificate exists.  The
solver runs *outside* the proof (SURVEY.md §0: witness oracle); soundness
never depends on it.

Falls back to a deterministic perceptron-style integer solver when
sklearn fails to converge to an exact certificate on integer data (the
synthetic datasets are constructed separable, so this always succeeds).
"""

from __future__ import annotations

import numpy as np


def _subgrad_ok(w: np.ndarray, X: np.ndarray, y: np.ndarray) -> bool:
    """Zero total squared-hinge subgradient == all margins >= 1
    (sgdcodegen.py:10-15 grad: nonzero only when y*(w.x) < 1)."""
    return bool(np.all(y * (X @ w) >= 1))


def _perceptron_int(X: np.ndarray, y: np.ndarray, max_epochs: int = 2000):
    """Integer margin perceptron: guaranteed on separable integer data."""
    n, d = X.shape
    w = np.zeros(d, dtype=np.int64)
    for _ in range(max_epochs):
        updated = False
        for i in range(n):
            if y[i] * (X[i] @ w) < 1:
                w = w + y[i] * X[i]
                updated = True
        if not updated:
            return w
    # scale-up trick: a separable dataset always admits an integer
    # certificate; scaling any real separator works too
    raise RuntimeError("SGD oracle: could not find integer certificate")


def solve(X: np.ndarray, y: np.ndarray, seed=0, eta0=0.1, maxiter=1000, tol=1e-4):
    """-> integer weight vector w with y_i * (w . x_i) >= 1 for all i.

    Tries the reference's sklearn recipe first (same hyperparameters as
    datasets/SGD/pmlb-*.json), then the deterministic integer fallback.
    """
    try:
        from sklearn.linear_model import SGDClassifier

        clf = SGDClassifier(
            loss="squared_hinge",
            alpha=0.0,
            eta0=eta0,
            learning_rate="adaptive",
            random_state=seed,
            max_iter=maxiter,
            tol=tol,
            fit_intercept=True,
        )
        clf.fit(X, y)
        w = np.asarray([int(v) for v in clf.coef_.flatten()], dtype=np.int64)
        if _subgrad_ok(w, X, y):
            return w
    except Exception:
        pass
    w = _perceptron_int(X, y)
    assert _subgrad_ok(w, X, y)
    return w
