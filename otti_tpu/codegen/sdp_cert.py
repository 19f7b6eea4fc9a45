"""SDP optimality certificate -> R1CS (reference sdpcodegen parity).

Statement (sdpcodegen template, SURVEY.md §3.2): witness (X, y, Lx, Ls)
satisfies, within epsilon = 1.0e-2 (sdpcodegen.py:98),
  * primal feasibility:   <A_i, X> = b_i                 (dot_calc / a_x)
  * primal PSD witness:   X = Lx Lx^T, Lx lower-tri      (chol1)
  * dual slack:           S := C - sum_i y_i A_i          (s_mat, linear)
  * dual PSD witness:     S = Ls Ls^T, Ls lower-tri      (chol2)
  * complementary slack:  <S, X> = 0                      (gap)
The reference unrolls all of this into O(N^3) scalar C statements that
CirC bit-blasts; here each product is one R1CS mul gate and each epsilon
comparison one or two range checks.

Fixed-point scales: inputs (C, A, b) and witness entries carry scale
S = 2^frac_bits; matrix products live at S^2 and the gap at S^3, with the
tolerance scaled to match — the *same* certificate, exactly checked over
integers (SURVEY.md §7.4 item 3).
"""

from __future__ import annotations

import math

import numpy as np

from ..io.sdpa import SDPProblem
from .builder import Builder, LinComb, ZERO

EPSILON = 1.0e-2  # sdpcodegen.py:98
DEFAULT_FRAC_BITS = 20


def _sc(v: float, S: int) -> int:
    return int(round(v * S))


def pick_frac_bits(prob: SDPProblem, X, y, Lx, Ls, epsilon: float) -> int:
    """Adaptive fixed-point precision: the S^3-scale gap sum accumulates
    ~n^2 products whose quantization error is ~(|s|+|x|) * vmax * 2^-f;
    pick f so the total stays under epsilon/8 (cap 50 to keep float64
    scaling exact)."""
    import math as _m

    n = prob.n
    vmax = max(
        1.0,
        float(np.abs(X).max()),
        float(np.abs(y).max() if len(y) else 1.0),
        float(np.abs(Lx).max()),
        float(np.abs(Ls).max()),
        float(np.abs(prob.C).max()),
        max((float(np.abs(Ai).max()) for Ai in prob.A), default=1.0),
        float(np.abs(prob.b).max() if len(prob.b) else 1.0),
    )
    sens = 16.0 * (n * n + 1) * vmax * vmax * (1 + float(np.abs(y).sum()))
    f = int(_m.ceil(_m.log2(sens / epsilon)))
    return min(50, max(DEFAULT_FRAC_BITS, f))


def build(
    prob: SDPProblem,
    X: np.ndarray,
    y: np.ndarray,
    Lx: np.ndarray,
    Ls: np.ndarray,
    frac_bits: int | None = None,
    epsilon: float = EPSILON,
):
    if frac_bits is None:
        frac_bits = pick_frac_bits(prob, X, y, Lx, Ls, epsilon)
    """-> (R1CSShape, vars, inputs).  All-existential (no public inputs),
    matching the reference main() (sdpcodegen $xvars/$yvars/$lvars)."""
    n, m = prob.n, prob.m
    S = 1 << frac_bits
    S2, S3 = S * S, S * S * S
    eps2 = _sc(epsilon, S) * S
    eps3 = _sc(epsilon, S) * S * S

    b = Builder(f"sdp:{prob.name}")
    xv = [[b.var(_sc(X[i, j], S)) for j in range(n)] for i in range(n)]
    yv = [b.var(_sc(y[i], S)) for i in range(m)]
    lx = [[b.var(_sc(Lx[i, j], S)) if i >= j else ZERO for j in range(n)] for i in range(n)]
    ls = [[b.var(_sc(Ls[i, j], S)) if i >= j else ZERO for j in range(n)] for i in range(n)]

    # range-check sizing from witness magnitudes (headroom x8)
    mags = [
        float(np.abs(X).max()),
        float(np.abs(y).max() if m else 1.0),
        float(np.abs(Lx).max()),
        float(np.abs(Ls).max()),
        float(np.abs(prob.C).max()),
        max(float(np.abs(Ai).max()) for Ai in prob.A) if m else 1.0,
        float(np.abs(prob.b).max() if m else 1.0),
        1.0,
    ]
    vmax = max(mags)
    bound3 = (vmax**3) * (n * n) * 8 + 1
    nbits = int(math.ceil(math.log2(bound3 * S3))) + 2

    # --- primal feasibility <A_i, X> = b_i  (S^2 scale) -------------------
    for i in range(m):
        acc = ZERO
        Ai = prob.A[i]
        for r in range(n):
            for c in range(n):
                a = _sc(Ai[r, c], S)
                if a:
                    acc = acc + xv[r][c] * a
        b.deq(acc, LinComb((), (_sc(prob.b[i], S) * S) % _mod()), eps2, nbits)

    # --- X = Lx Lx^T  (xm at S^2 vs x*S) ----------------------------------
    def psd_products(L):
        """(r, c, sum_k L[r,k]*L[c,k]) for the lower-tri Cholesky witness."""
        for r in range(n):
            for c in range(n):
                acc = ZERO
                for k in range(min(r, c) + 1):
                    acc = acc + b.mul(L[r][k], L[c][k])
                yield r, c, acc

    for r, c, acc in psd_products(lx):
        b.deq(xv[r][c] * S, acc, eps2, nbits)

    # --- dual slack S = C - sum y_i A_i  (linear, S^2 scale) --------------
    s_lc = [[None] * n for _ in range(n)]
    for r in range(n):
        for c in range(n):
            acc = LinComb((), (_sc(prob.C[r, c], S) * S) % _mod())
            for i in range(m):
                a = _sc(prob.A[i][r, c], S)
                if a:
                    acc = acc - yv[i] * a
            s_lc[r][c] = acc

    # --- S = Ls Ls^T  (sm at S^2 vs s at S^2) -----------------------------
    for r, c, acc in psd_products(ls):
        b.deq(s_lc[r][c], acc, eps2, nbits)

    # --- gap <S, X> = 0  (S^3 scale) --------------------------------------
    gap = ZERO
    for r in range(n):
        for c in range(n):
            gap = gap + b.mul(s_lc[r][c], xv[r][c])
    b.deq(gap, ZERO, eps3, nbits)

    shape, vars_, inputs = b.finalize()
    assert b.sanity_check(), f"sdp circuit unsatisfied: {prob.name}"
    return shape, vars_, inputs


def _mod() -> int:
    from .builder import MOD

    return MOD
