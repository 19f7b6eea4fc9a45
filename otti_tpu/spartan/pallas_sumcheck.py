"""Fused VMEM-resident sumcheck-round Pallas kernel (SURVEY.md §7.4-1).

One ``pallas_call`` performs the whole cubic sumcheck round that the XLA
path (sumcheck._step_cubic_kernel) expresses as a fused-op graph: bind
the previous challenge into all four tables AND compute the three round
evaluations — with every intermediate resident in VMEM, in limb-major
layout ([N_LIMBS, n]: elements ride the 128-wide lane axis, limbs ride
sublanes, so no lane padding waste on the 22-limb axis).

Design notes (see /opt/skills/guides/pallas_guide.md):
  * grid over quarter-range chunks; the dynamic active size ``ah`` (the
    masked-fixed-shape design of sumcheck.py — ONE compile per table
    size, active prefix shrinking each round) enters as a prefetched
    SMEM scalar that both the BlockSpec index maps (dynamic views at
    offsets 0 / ah2 / ah / ah+ah2) and per-step @pl.when masking read.
  * inactive chunks clamp their index maps to the last active block and
    skip accumulation, so writes stay idempotent and the grid is static.
  * the three eval outputs accumulate as wide per-lane partials in a
    revisited [3, N_LIMBS, CHUNK] block (zeroed at step 0); the final
    cross-lane reduction runs in XLA (one tiny reduce_wide).
  * field mul = unrolled schoolbook conv + carry chains + fold, the
    mul_pallas recipe (field/pallas_kernels.py), applied to the bind
    products and the eq*(a*b - c) eval terms.

MEASURED RESULT (2026-08-20, real TPU v5e, n = 2^18, full active):
  XLA step kernel:    0.1 ms/round  (~3.0 G hypercube points/s — at the
                      HBM bandwidth limit for the 92 MB of table reads)
  this Pallas kernel: 145.7 ms/round (~1.8 M points/s), compile 14 s
Both produce bit-identical evals + bound tables (validated on-chip).
The XLA path wins by ~1000x: its fusion already keeps the bind+eval
chain in registers and saturates HBM, while this kernel pays (a) 16
small [22, 512] block DMAs per grid step with a 22-sublane layout that
wastes 8-sublane tiling, and (b) long scalar carry/fold dependency
chains for the in-kernel lane reduction that serialize the VPU.  The
XLA kernels therefore REMAIN THE DEFAULT everywhere; this module is
kept as the measured record of the attempt (VERDICT round-1 item 10)
and as a starting point should a future layout change (limb-major
tables end-to-end, 8-padded sublanes, wide accumulator registers) close
the gap.  ``step_cubic_pallas`` stays a correct drop-in while
``ah2 >= CHUNK``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..field.fields import (
    CONV_LIMBS,
    FOLD_LIMB,
    LIMB_BITS,
    LIMB_MASK,
    N_LIMBS,
    SCALAR,
)

CHUNK = 512  # lanes per grid step (multiple of 128)

ENABLED = os.environ.get("OTTI_PALLAS_SUMCHECK", "0") == "1"

_SPEC = SCALAR
_FOLD_MAT = [[int(v) for v in row] for row in _SPEC.fold_matrix]
_MOD_LIMBS = [int(v) for v in _SPEC.modulus_limbs]
_TAIL_LIMBS = [int(v) for v in _SPEC.tail_limbs]
# limbs of 2m (normalized, top limb carries the rest)
_tm = 2 * _SPEC.modulus
_TWO_M = []
for _i in range(N_LIMBS - 1):
    _TWO_M.append(_tm & LIMB_MASK)
    _tm >>= LIMB_BITS
_TWO_M.append(_tm)


def _carry_rows(x_rows, n_out):
    """List of [B] int32 rows -> carried rows, top row unmasked."""
    carry = None
    rows = []
    for i in range(n_out - 1):
        v = x_rows[i] if i < len(x_rows) else jnp.zeros_like(x_rows[0])
        if carry is not None:
            v = v + carry
        limb = v & LIMB_MASK
        carry = (v - limb) >> LIMB_BITS
        rows.append(limb)
    v = x_rows[n_out - 1] if n_out - 1 < len(x_rows) else jnp.zeros_like(x_rows[0])
    if carry is not None:
        v = v + carry
    for j in range(n_out, len(x_rows)):
        v = v + (x_rows[j] << (LIMB_BITS * (j - (n_out - 1))))
    rows.append(v)
    return rows


def _fold_final_rows(rows):
    """23ish carried rows -> N_LIMBS semi rows (scalar field)."""
    h0 = rows[FOLD_LIMB] if len(rows) > FOLD_LIMB else None
    h1 = rows[FOLD_LIMB + 1] if len(rows) > FOLD_LIMB + 1 else None
    out = []
    for l in range(N_LIMBS):
        acc = jnp.full_like(rows[0], _MOD_LIMBS[l])
        if l < FOLD_LIMB:
            acc = acc + rows[l]
        if h0 is not None and l < 11:
            acc = acc - _TAIL_LIMBS[l] * h0
        if h1 is not None and 1 <= l < 12:
            acc = acc - _TAIL_LIMBS[l - 1] * h1
        out.append(acc)
    return _carry_rows(out, N_LIMBS)


def _mul_rows(a_rows, b_rows):
    """Semi-normalized limb rows -> semi product rows (unrolled conv)."""
    conv = []
    for k in range(CONV_LIMBS):
        acc = None
        for i in range(max(0, k - (N_LIMBS - 1)), min(N_LIMBS - 1, k) + 1):
            term = a_rows[i] * b_rows[k - i]
            acc = term if acc is None else acc + term
        conv.append(acc)
    c = _carry_rows(conv, CONV_LIMBS + 1)
    # fold high limbs via the precomputed matrix
    n_high = CONV_LIMBS + 1 - FOLD_LIMB
    folded = []
    for l in range(N_LIMBS):
        acc = c[l] if l < FOLD_LIMB else jnp.zeros_like(c[0])
        for h in range(n_high):
            w = _FOLD_MAT[h][l]
            if w:
                acc = acc + w * c[FOLD_LIMB + h]
        folded.append(acc)
    return _fold_final_rows(_carry_rows(folded, FOLD_LIMB + 2))


def _sub_rows(a_rows, b_rows):
    """(a - b) in semi form: a + (2m - b), carried + folded."""
    out = [a_rows[l] + _TWO_M[l] - b_rows[l] for l in range(N_LIMBS)]
    return _fold_final_rows(_carry_rows(out, N_LIMBS + 1))


def _add_small_mul(a_rows, d_rows, t: int):
    """a + t*d (t in {2, 3}), renormalized."""
    out = [a_rows[l] + t * d_rows[l] for l in range(N_LIMBS)]
    return _fold_final_rows(_carry_rows(out, N_LIMBS + 1))


def _conv_reduce_lanes(a_rows, b_rows):
    """sum_lane a*b as semi scalar rows [N_LIMBS].

    Conv coefficients are < 2^29 per lane, so a direct cross-lane int32
    sum would overflow; each coefficient splits into (lo16, hi13), both
    lane-reduced safely (2^16*512 = 2^25 / 2^13*512 = 2^22), then the hi
    halves re-enter one limb up with weight 2^16 = 16 * 2^12 before the
    scalar carry + fold to semi form."""
    slo, shi = [], []
    for k in range(CONV_LIMBS):
        acc = None
        for i in range(max(0, k - (N_LIMBS - 1)), min(N_LIMBS - 1, k) + 1):
            term = a_rows[i] * b_rows[k - i]
            acc = term if acc is None else acc + term
        lo = acc & 0xFFFF
        hi = acc >> 16
        slo.append(jnp.sum(lo))
        shi.append(jnp.sum(hi))
    combined = []
    for k in range(CONV_LIMBS + 2):
        v = slo[k] if k < CONV_LIMBS else jnp.zeros_like(slo[0])
        if 1 <= k <= CONV_LIMBS:
            v = v + 16 * shi[k - 1]
        combined.append(v)
    # carry to 44 rows (the unmasked top row absorbs the 45th limb's
    # small residual) so the 23-row fold matrix covers all high limbs
    c = _carry_rows(combined, CONV_LIMBS + 1)
    n_high = CONV_LIMBS + 1 - FOLD_LIMB
    folded = []
    for l in range(N_LIMBS):
        acc = c[l] if l < FOLD_LIMB else jnp.zeros_like(c[0])
        for h in range(n_high):
            w = _FOLD_MAT[h][l]
            if w:
                acc = acc + w * c[FOLD_LIMB + h]
        folded.append(acc)
    return _fold_final_rows(_carry_rows(folded, FOLD_LIMB + 2))


def _round_kernel(ah_ref, r_ref, *refs):
    """Grid step: bind r into 4 tables (both active quarters) + eval
    partials at t in {0, 2, 3}.

    refs = 16 input views (4 per table at offsets 0/ah2/ah/ah+ah2),
    then outputs: 4 bound-lo views, 4 bound-hi views, evals accumulator.
    """
    from jax.experimental import pallas as pl

    g = pl.program_id(0)
    ah2_blocks = ah_ref[1] // CHUNK  # number of active quarter chunks
    ins = refs[:16]
    outs_lo = refs[16:20]
    outs_hi = refs[20:24]
    ev_ref = refs[24]

    r_rows = [r_ref[l, 0] for l in range(N_LIMBS)]
    r_bcast = [jnp.broadcast_to(v[None], (CHUNK,)) for v in r_rows]

    bound_lo, bound_hi = [], []
    for tbl in range(4):
        v0 = [ins[4 * tbl + 0][l, :] for l in range(N_LIMBS)]
        v1 = [ins[4 * tbl + 1][l, :] for l in range(N_LIMBS)]
        v2 = [ins[4 * tbl + 2][l, :] for l in range(N_LIMBS)]
        v3 = [ins[4 * tbl + 3][l, :] for l in range(N_LIMBS)]
        lo = _add_rows(v0, _mul_rows(r_bcast, _sub_rows(v2, v0)))
        hi = _add_rows(v1, _mul_rows(r_bcast, _sub_rows(v3, v1)))
        bound_lo.append(lo)
        bound_hi.append(hi)
        outs_lo[tbl][:, :] = jnp.stack(lo)
        outs_hi[tbl][:, :] = jnp.stack(hi)

    # eval partials on the bound tables (pairs are (lo, hi) by construction)
    @pl.when(jnp.logical_and(g == 0, True))
    def _init():
        ev_ref[:, :, :] = jnp.zeros_like(ev_ref)

    @pl.when(g < ah2_blocks)
    def _accum():
        for ti, t in enumerate((0, 2, 3)):
            exts = []
            for tbl in range(4):
                if t == 0:
                    exts.append(bound_lo[tbl])
                else:
                    d = _sub_rows(bound_hi[tbl], bound_lo[tbl])
                    exts.append(_add_small_mul(bound_lo[tbl], d, t))
            eqt, at, bt, ct = exts
            w = _sub_rows(_mul_rows(at, bt), ct)
            part = _conv_reduce_lanes(eqt, w)  # [N_LIMBS] scalar rows
            lanes = ev_ref.shape[-1]
            add = jnp.stack(
                [jnp.broadcast_to(p[None], (lanes,)) for p in part]
            )
            cur = ev_ref[ti, :, :]
            ev_ref[ti, :, :] = cur + add


def _add_rows(a_rows, b_rows):
    out = [a_rows[l] + b_rows[l] for l in range(N_LIMBS)]
    return _fold_final_rows(_carry_rows(out, N_LIMBS + 1))


@functools.lru_cache(maxsize=None)
def _step_call(n: int, interpret: bool):
    """Compiled fused round for limb-major tables [N_LIMBS, n]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    quarter_blocks = max(n // 4 // CHUNK, 1)

    def in_map(q):
        # view q of a table: block index (0, clamped col block at offset)
        def m(g, ah_ref):
            ah2b = jnp.maximum(ah_ref[1] // CHUNK, 1)
            gb = jnp.minimum(g, ah2b - 1)
            base = {
                0: 0,
                1: ah_ref[1] // CHUNK,
                2: ah_ref[0] // CHUNK,
                3: (ah_ref[0] + ah_ref[1]) // CHUNK,
            }[q]
            return (0, base + gb)

        return m

    def out_lo_map(g, ah_ref):
        ah2b = jnp.maximum(ah_ref[1] // CHUNK, 1)
        return (0, jnp.minimum(g, ah2b - 1))

    def out_hi_map(g, ah_ref):
        ah2b = jnp.maximum(ah_ref[1] // CHUNK, 1)
        return (0, ah_ref[1] // CHUNK + jnp.minimum(g, ah2b - 1))

    tbl_spec = lambda q: pl.BlockSpec(
        (N_LIMBS, CHUNK), in_map(q), memory_space=pltpu.VMEM
    )
    out_spec_lo = pl.BlockSpec(
        (N_LIMBS, CHUNK), out_lo_map, memory_space=pltpu.VMEM
    )
    out_spec_hi = pl.BlockSpec(
        (N_LIMBS, CHUNK), out_hi_map, memory_space=pltpu.VMEM
    )
    ev_spec = pl.BlockSpec(
        (3, N_LIMBS, CHUNK // 4), lambda g, ah_ref: (0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    r_spec = pl.BlockSpec((N_LIMBS, 128), lambda g, ah_ref: (0, 0),
                          memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(quarter_blocks,),
        in_specs=[r_spec] + [tbl_spec(q) for _ in range(4) for q in range(4)],
        out_specs=[out_spec_lo] * 4 + [out_spec_hi] * 4 + [ev_spec],
    )
    out_shapes = [jax.ShapeDtypeStruct((N_LIMBS, n), jnp.int32)] * 8 + [
        jax.ShapeDtypeStruct((3, N_LIMBS, CHUNK // 4), jnp.int32)
    ]

    def kernel(ah_ref, r_ref, *refs):
        _round_kernel(ah_ref, r_ref, *refs)

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )

    def run(ah_arr, r_lm, eq, pa, pb, pc):
        views = []
        for t in (eq, pa, pb, pc):
            views += [t, t, t, t]
        outs = call(ah_arr, r_lm, *views)
        lo, hi, ev = outs[:4], outs[4:8], outs[8]
        # stitch bound tables: cols [0, ah2) from lo, [ah2, ah) from hi.
        # both were written at their true offsets, so lo/hi already hold
        # the right cols; merge by range select.
        ah2 = ah_arr[1]
        idx = jnp.arange(n)[None, :]
        bound = [
            jnp.where(idx < ah2, l, h) for l, h in zip(lo, hi)
        ]
        return ev, tuple(bound)

    return jax.jit(run)


def step_cubic_pallas(r_prev, prev_active_half, eq, pa, pb, pc,
                      interpret: bool = False):
    """Drop-in analog of sumcheck._step_cubic_kernel on limb-major tables.

    Tables: [N_LIMBS, n].  Returns (evals [3, N_LIMBS] wide-partial rows
    to be reduce_wide'd, bound tables).  Caller guarantees
    prev_active_half // 2 >= CHUNK and divisibility by CHUNK.
    """
    n = eq.shape[1]
    ah = prev_active_half
    ah2 = ah // 2
    ah_arr = jnp.asarray([ah, ah2], jnp.int32)
    r_lm = jnp.broadcast_to(r_prev.reshape(N_LIMBS, 1), (N_LIMBS, 128))
    ev, bound = _step_call(n, interpret)(ah_arr, r_lm, eq, pa, pb, pc)
    # per-step partials are already lane-reduced (every lane duplicates
    # the scalar); fold the accumulated semi sums in XLA (tiny)
    from ..field import ops as F

    evals = F.canon(SCALAR, F.reduce_wide(SCALAR, ev[:, :, 0]))
    return evals, bound
