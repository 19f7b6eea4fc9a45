"""LP optimality certificate -> R1CS (reference lpcodegen parity).

Statement (lpcodegen.generate, SURVEY.md §3.1): the witness (X, Y)
satisfies
  * every primal row:  sum_j a_ij X_j  {=, <=, >=}  b_i   within delta,
  * the sign constraint for every explicitly-bounded variable,
  * zero duality gap:  deq(c . X, b . Y, delta),
with delta = 0.01 (lpcodegen.py:6 — a first-class statement parameter,
SURVEY.md §5.6).  Dual feasibility rows are intentionally NOT emitted, for
parity (SURVEY.md §3.1 NOTE); pass ``full_dual=True`` for the
strengthened certificate.

Fixed-point lowering: values are scaled by S = 2^frac_bits; a row
comparison over coeff*var products lives at scale S^2 and each delta
comparator becomes one or two range checks (builder.bits), sized from the
witness with headroom.  This replaces CirC's FP bit-blasting — the 200GB
bottleneck — with ~(bits+2) constraints per comparison.
"""

from __future__ import annotations

import math

import numpy as np

from ..io.mps import LPProblem, sign_constraints
from .builder import Builder, LinComb, ZERO

DELTA = 0.01  # lpcodegen.py:6
DEFAULT_FRAC_BITS = 24


def _scaled(v: float, S: int) -> int:
    return int(round(v * S))


def pick_frac_bits(prob: LPProblem, x, y, delta: float) -> int:
    """Adaptive fixed-point precision: rounding error of a scaled row is
    bounded by ~2^-f * L1 where L1 = max over checks of sum(|coeff|+|var|);
    choose f so the error is < delta/8 (the tolerance must dominate the
    quantization noise, not vice versa)."""
    l1 = 1.0
    for i in range(prob.n_rows):
        l1 = max(l1, float(np.abs(prob.A[i]).sum() + np.abs(x).sum()) + abs(prob.rhs[i]))
    l1 = max(
        l1,
        float(np.abs(prob.c).sum() + np.abs(x).sum()),
        float(np.abs(prob.rhs).sum() + np.abs(y).sum()),
    )
    import math as _m

    return max(DEFAULT_FRAC_BITS, int(_m.ceil(_m.log2(8.0 * l1 / delta))))


def build(
    prob: LPProblem,
    x: np.ndarray,
    y: np.ndarray,
    frac_bits: int | None = None,
    delta: float = DELTA,
    full_dual: bool = False,
):
    """-> (R1CSShape, vars, inputs).  No public inputs: the instance is the
    statement, (X, Y) are existential (lpcodegen cvargen/__GADGET_exist)."""
    if frac_bits is None:
        frac_bits = pick_frac_bits(prob, x, y, delta)
    S = 1 << frac_bits
    S2 = S * S
    d_s2 = _scaled(delta, S) * S  # delta at S^2 scale
    d_s1 = _scaled(delta, S)  # delta at S scale

    b = Builder(f"lp:{prob.name}")
    X = [b.var(_scaled(v, S)) for v in x]
    Y = [b.var(_scaled(v, S)) for v in y]

    # range-check sizing: margins are bounded by the actual witness values
    # plus generous headroom (x4); honest witnesses always fit.
    max_row = 0.0
    for i in range(prob.n_rows):
        mag = float(np.abs(prob.A[i]) @ np.abs(x)) + abs(prob.rhs[i]) + delta
        max_row = max(max_row, mag)
    obj_mag = float(np.abs(prob.c) @ np.abs(x)) + float(np.abs(prob.rhs) @ np.abs(y))
    bound = (max(max_row, obj_mag, 1.0) * 4 + 1) * S2
    nbits = int(math.ceil(math.log2(bound))) + 1

    def row_lc(coeffs, vars_, scale_consts=True) -> LinComb:
        acc = ZERO
        for j, a in enumerate(coeffs):
            if a == 0.0:
                continue
            acc = acc + vars_[j] * _scaled(a, S)
        return acc

    # primal rows (Constraint.show_delta semantics)
    for i in range(prob.n_rows):
        if not prob.A[i].any():
            continue  # is_zero rows skipped (lpcodegen.py:144)
        lhs = row_lc(prob.A[i], X)
        rhs = _scaled(prob.rhs[i], S) * S  # S^2 scale
        sense = prob.row_senses[i]
        if sense == "E":
            b.deq(lhs, LinComb((), rhs % b_mod()), d_s2, nbits)
        elif sense == "G":
            b.dge(lhs, LinComb((), rhs % b_mod()), d_s2, nbits)
        else:
            b.dle(lhs, LinComb((), rhs % b_mod()), d_s2, nbits)

    # sign constraints (RangeConstraint.show_delta semantics, S scale)
    sgn = sign_constraints(prob)
    sbits = max(2, nbits - frac_bits + 4)
    for j, s in sgn.items():
        mag_bits = max(sbits, int(abs(_scaled(x[j], S))).bit_length() + 3)
        if s == "+":
            b.dge(X[j], ZERO, d_s1, mag_bits)
        else:
            b.dle(X[j], ZERO, d_s1, mag_bits)

    # duality gap: deq(c.X, rhs.Y, delta) at S^2 scale
    pobj = row_lc(prob.c, X)
    dobj = row_lc(prob.rhs, Y)
    b.deq(pobj, dobj, d_s2, nbits)

    if full_dual:
        # strengthened mode (beyond reference parity): dual feasibility
        # rows  sum_i a_ij Y_i {<=,=,>=} c_j, with the sense taken from the
        # variable's *solver* bounds (x>=0 by MPS default -> A^T y <= c);
        # variables with other finite bounds carry bound-dual terms the
        # row-only certificate cannot see, so they are skipped.
        from ..io.mps import scipy_bounds

        sb = scipy_bounds(prob)
        for j in range(prob.n_vars):
            col = prob.A[:, j]
            if not col.any() and prob.c[j] == 0.0:
                continue
            lo, hi = sb[j]
            lhs = row_lc(col, Y)
            rhs_j = _scaled(prob.c[j], S) * S
            if lo == 0.0 and hi is None:
                b.dle(lhs, LinComb((), rhs_j % b_mod()), d_s2, nbits)
            elif hi == 0.0 and lo is None:
                b.dge(lhs, LinComb((), rhs_j % b_mod()), d_s2, nbits)
            elif lo is None and hi is None:
                b.deq(lhs, LinComb((), rhs_j % b_mod()), d_s2, nbits)
            # else: finite/shifted bounds -> skip (bound duals not modeled)

    shape, vars_, inputs = b.finalize()
    assert b.sanity_check(), f"lp circuit unsatisfied: {prob.name}"
    return shape, vars_, inputs


def b_mod() -> int:
    from .builder import MOD

    return MOD
