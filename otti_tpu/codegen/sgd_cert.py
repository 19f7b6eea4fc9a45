"""SGD training-optimality certificate -> R1CS (reference sgdcodegen parity).

Statement (sgdcodegen.py:85-126, SURVEY.md §3.3): given *public* integer
weights w_0..w_{d-1} and the (constant, baked-in) integer dataset (X, y),
every sample satisfies the unit margin  y_i * (w . x_i) >= 1 — the
zero-subgradient certificate for squared-hinge SGD with alpha=0.  The
reference's negative-weight trick (witness carries |w_j|, the circuit
multiplies by the constant neg = 1-2 where the trained weight is negative;
sgdcodegen.py:105-110, sgd_temp.c:5) is preserved: signs are constants of
the statement, absolute values are the public inputs.

Probabilistic mode checks only the first floor(n/2) samples
(sgdcodegen.py:77-81).

Each margin check lowers to one range check: t_i = y_i*(w.x_i) - 1 in
[0, 2^bits); bits is sized from the data so the honest witness always
fits.  Roughly (bits+2) constraints per sample — a few hundred thousand
for the largest PMLB sets, versus the reference's CirC blowup.
"""

from __future__ import annotations

import numpy as np

from .builder import Builder


def margin_bits(X: np.ndarray, w_abs: np.ndarray) -> int:
    """Bits needed for max |y*(w.x)| + 1 over the dataset."""
    bound = int(np.max(np.abs(X) @ np.abs(w_abs))) + 2 if X.size else 2
    return max(2, bound.bit_length())


def build(X: np.ndarray, y: np.ndarray, w: np.ndarray, prob: bool = False):
    """-> (R1CSShape, vars, inputs) proving margins for weights w.

    Public inputs: |w_j| (the reference publishes the weights,
    sgdcodegen.py:114 __attribute__((public(0)))); signs are circuit
    constants.  Witness: the bit decompositions of the margins.
    """
    X = np.asarray(X, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    w = np.asarray(w, dtype=np.int64)
    n, d = X.shape
    if prob:
        n = n // 2
        X, y = X[:n], y[:n]

    b = Builder("sgd")
    w_abs = np.abs(w)
    signs = np.where(w < 0, -1, 1)
    w_in = [b.public_input(int(v)) for v in w_abs]
    # signed weights as linear combos: sign * |w| — the neg = 1-2 trick
    w_signed = [w_in[j] * (1 if signs[j] > 0 else -1) for j in range(d)]

    nbits = margin_bits(X, w_abs)
    for i in range(n):
        dot = None
        for j in range(d):
            if X[i, j] == 0:
                continue
            term = w_signed[j] * int(X[i, j])
            dot = term if dot is None else dot + term
        if dot is None:
            from .builder import ZERO

            dot = ZERO
        margin = dot * int(y[i])
        b.assert_nonneg(margin - 1, nbits)

    shape, vars_, inputs = b.finalize()
    assert b.sanity_check(), "sgd circuit: witness does not satisfy"
    return shape, vars_, inputs
