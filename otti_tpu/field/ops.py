"""Batched field arithmetic as JAX int32 ops (see fields.py for the design).

Every function takes arrays shaped ``[..., N_LIMBS]`` (int32 limbs) and is
pure/jit-safe with static shapes; batch dimensions are arbitrary.  These are
the primitive kernels everything else (curve, MSM, sumcheck, commitments) is
built from, so they are written to fuse well under XLA: short chains of
elementwise int32 multiply/add/shift plus one tiny matmul for the modular
fold.

Replaces the reference's curve25519-dalek scalar/field arithmetic
(SURVEY.md §2.2 "Spartan" row; §7.1 field/ row) with a TPU-native design.

Range discipline
----------------
"semi" form: normalized limbs (each in [0, 2^12), top limb may carry a small
residual) with value < 2^253 (SCALAR) / < 2^256 (BASE).  All API functions
take and return semi form; ``canon`` produces the unique representative in
[0, m).  Intermediate int32 magnitudes are proven < 2^31 in the comments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .fields import (
    CONV_LIMBS,
    FOLD_LIMB,
    LIMB_BITS,
    LIMB_MASK,
    N_LIMBS,
    FieldSpec,
    int_to_limbs,
    limbs_to_int,
    _pow_bits,
)

I32 = jnp.int32


# ---------------------------------------------------------------------------
# Limb-level primitives
# ---------------------------------------------------------------------------

def carry_exact(x: jax.Array, n_out: int) -> jax.Array:
    """FULLY propagate (signed) carries: limbs 0..n_out-2 land in [0, 2^12).

    The top output limb keeps the full residual (not masked) — in
    particular its SIGN reflects the sign of the whole value, which is what
    ``canon``'s conditional subtract relies on.  lax.scan over the limb
    axis: O(1) HLO ops, but ~n_out sequential steps at run time — use only
    where exact normalization matters (canon); arithmetic uses ``carry``.
    """
    n_in = x.shape[-1]
    batch = x.shape[:-1]
    if n_in < n_out:
        x = jnp.concatenate(
            [x, jnp.zeros(batch + (n_out - n_in,), I32)], axis=-1
        )
    body_limbs = jnp.moveaxis(x[..., : n_out - 1], -1, 0)

    def body(c, xi):
        v = xi + c
        limb = v & LIMB_MASK
        return (v - limb) >> LIMB_BITS, limb

    # init derived from x so its vma/sharding type matches the carry under
    # shard_map (a plain zeros() is 'replicated' and trips the scan typer)
    c0 = x[..., 0] & 0
    c, limbs = jax.lax.scan(body, c0, body_limbs)
    top = x[..., n_out - 1] + c
    for j in range(n_out, n_in):
        top = top + (x[..., j] << (LIMB_BITS * (j - (n_out - 1))))
    out = jnp.concatenate(
        [jnp.moveaxis(limbs, 0, -1), top[..., None]], axis=-1
    )
    return out


def carry(x: jax.Array, n_out: int, passes: int = 4) -> jax.Array:
    """PARTIALLY propagate carries: limbs 0..n_out-2 land in [0, 2^12 + 3].

    Flat (loop-free) parallel carry: each pass splits every limb into its
    low 12 bits and a signed residual (arithmetic shift; works for negative
    intermediates) and adds the residual one limb up; the top limb is never
    split (it keeps the unmasked residual, same contract as carry_exact).
    With |input limbs| < 2^30, four passes contract the residuals to <= 3
    (2^30 -> 2^12+2^18 -> 2^12+67 -> 2^12+3 fixpoint), which satisfies the
    semi-form precondition of ``conv`` (22 * (2^12+3)^2 < 2^29).

    Why not the scan: every sequential loop step costs ~micro-seconds of
    launch latency on small tensors, and the nested while-regions made the
    ZK round kernels take ~1000 s to compile and ~300 ms/round to RUN on
    TPU (profiled r03); the flat form is ~7 fused elementwise ops per pass
    with no control flow, and vectorizes identically over any batch.
    """
    n_in = x.shape[-1]
    batch = x.shape[:-1]
    if n_in < n_out:
        x = jnp.concatenate(
            [x, jnp.zeros(batch + (n_out - n_in,), I32)], axis=-1
        )
    elif n_in > n_out:
        top = x[..., n_out - 1]
        for j in range(n_out, n_in):
            top = top + (x[..., j] << (LIMB_BITS * (j - (n_out - 1))))
        x = jnp.concatenate([x[..., : n_out - 1], top[..., None]], axis=-1)
    for _ in range(passes):
        lo = x & LIMB_MASK  # two's complement: in [0, 2^12) even for x < 0
        hi = (x - lo) >> LIMB_BITS  # exact signed residual
        body = jnp.concatenate([lo[..., :-1], x[..., -1:]], axis=-1)
        x = body + jnp.concatenate(
            [jnp.zeros(batch + (1,), I32), hi[..., :-1]], axis=-1
        )
    return x


def conv(a: jax.Array, b: jax.Array) -> jax.Array:
    """Schoolbook limb convolution: [..., 22] x [..., 22] -> [..., 43].

    Inputs must be semi form (limbs <= 2^12 + 3) so every coefficient stays
    < 22 * (2^12+3)^2 < 2^29.  Flat form: 22 shifted partial products
    summed by a balanced tree — ~45 fused elementwise HLO ops, zero control
    flow (the earlier fori_loop version cost ~22 sequential dispatch steps
    per multiply, which dominated all small-batch group math on TPU).
    """
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    nb = len(batch)
    a = jnp.broadcast_to(a, batch + (N_LIMBS,))
    b = jnp.broadcast_to(b, batch + (N_LIMBS,))
    terms = [
        jnp.pad(
            a[..., i : i + 1] * b,
            [(0, 0)] * nb + [(i, CONV_LIMBS - N_LIMBS - i)],
        )
        for i in range(N_LIMBS)
    ]
    while len(terms) > 1:  # balanced add tree
        nxt = [
            terms[j] + terms[j + 1] for j in range(0, len(terms) - 1, 2)
        ]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def _fold_high(spec: FieldSpec, x: jax.Array) -> jax.Array:
    """Fold limbs >= FOLD_LIMB of a normalized 44-limb value -> 23 limbs.

    Uses the precomputed matrix R[j] = limbs(2^(12*(21+j)) mod m); the high
    coefficients are < 2^12 so the matmul accumulates to < 23*2^24 + 2^12.
    """
    n = x.shape[-1]
    n_high = n - FOLD_LIMB
    R = jnp.asarray(spec.fold_matrix[:n_high], I32)  # [n_high, 22]
    low = x[..., :FOLD_LIMB]
    high = x[..., FOLD_LIMB:]
    folded = jnp.einsum(
        "...h,hl->...l", high, R, preferred_element_type=I32
    )
    folded = folded.at[..., :FOLD_LIMB].add(low)
    return carry(folded, FOLD_LIMB + 2)  # value < 2^269 -> 23 limbs


def _fold_final(spec: FieldSpec, x: jax.Array) -> jax.Array:
    """Final modulus-specific fold of a normalized <=23-limb value -> semi.

    SCALAR (ell = 2^252 + c):  V = (x mod 2^252) - c*(x >> 252) + ell
      in (ell - 2^150, 2^252 + ell): positive, < 2^253.01.
    BASE   (p = 2^255 - 19):   V = (x mod 2^255) + 19*(x >> 255) < 2^255 + 2^31.
    """
    n = x.shape[-1]
    if spec.kind == "scalar":
        h0 = x[..., FOLD_LIMB]
        h1 = x[..., FOLD_LIMB + 1] if n > FOLD_LIMB + 1 else jnp.zeros_like(h0)
        cl = jnp.asarray(spec.tail_limbs, I32)  # 11 limbs of c
        m = jnp.asarray(spec.modulus_limbs, I32)
        out = jnp.zeros(x.shape[:-1] + (N_LIMBS,), I32) + m
        out = out.at[..., :FOLD_LIMB].add(x[..., :FOLD_LIMB])
        out = out.at[..., 0:11].add(-h0[..., None] * cl)
        out = out.at[..., 1:12].add(-h1[..., None] * cl)
        return carry(out, N_LIMBS)
    else:
        h = x[..., FOLD_LIMB] >> 3
        for j in range(FOLD_LIMB + 1, n):
            h = h + (x[..., j] << (LIMB_BITS * (j - FOLD_LIMB) - 3))
        out = jnp.zeros(x.shape[:-1] + (N_LIMBS,), I32)
        out = out.at[..., :FOLD_LIMB].add(x[..., :FOLD_LIMB])
        out = out.at[..., FOLD_LIMB].add(x[..., FOLD_LIMB] & 7)
        out = out.at[..., 0].add(19 * h)
        return carry(out, N_LIMBS)


def reduce_wide(spec: FieldSpec, x: jax.Array) -> jax.Array:
    """Reduce a (possibly unnormalized) wide limb vector to semi form.

    Input width must be <= CONV_LIMBS (43): the carry extends by one limb
    and the fold matrix covers exactly 23 high rows."""
    assert x.shape[-1] <= CONV_LIMBS, "reduce_wide: input too wide"
    n = max(x.shape[-1], FOLD_LIMB + 2)
    x = carry(x, n + 1)
    if x.shape[-1] > FOLD_LIMB + 2:
        x = _fold_high(spec, x)
    return _fold_final(spec, x)


# ---------------------------------------------------------------------------
# Field API (inputs/outputs in semi-reduced normalized form)
# ---------------------------------------------------------------------------

def zeros(shape=()) -> jax.Array:
    return jnp.zeros(tuple(shape) + (N_LIMBS,), I32)


def ones(spec: FieldSpec, shape=()) -> jax.Array:
    one = np.zeros((N_LIMBS,), np.int32)
    one[0] = 1
    return jnp.broadcast_to(jnp.asarray(one), tuple(shape) + (N_LIMBS,))


def const(spec: FieldSpec, value: int, shape=()) -> jax.Array:
    limbs = jnp.asarray(int_to_limbs(value % spec.modulus), I32)
    return jnp.broadcast_to(limbs, tuple(shape) + (N_LIMBS,))


def add(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    # a+b limbs <= 2*(2^12+24) < 2^13+48, non-negative: ONE carry pass
    # lands every limb in [0, 2^12+1] (residual <= 2), which _fold_final
    # accepts (it only needs per-limb magnitude < 2^13 for its int32
    # bounds).  r05: passes 4 -> 1.
    return _fold_final(spec, carry(a + b, N_LIMBS + 1, passes=1))


def sub(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    two_m = jnp.asarray(int_to_limbs(2 * spec.modulus, N_LIMBS), I32)
    # limbs in (-(2^12+24), 3*2^12+24): two signed passes contract the
    # residual to [-1, 1], limbs to [-1, 2^12+1] — _fold_final tolerates
    # the possible -1 (signed h0; its own carry renormalizes).
    return _fold_final(spec, carry(a + two_m - b, N_LIMBS + 1, passes=2))


def neg(spec: FieldSpec, a: jax.Array) -> jax.Array:
    return sub(spec, zeros(a.shape[:-1]), a)


def mul(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    # Semi-form limbs are <= 2^12+24 (see carry docstring), so conv
    # coefficients are <= 22*(2^12+24)^2 < 2^28.5, non-negative.  Two
    # carry passes contract them to <= 2^12+24 (pass 1: residual <=
    # 2^16.5; pass 2: residual <= 24) — the fixpoint the bound above
    # already assumes.  r05: passes 4 -> 2 (carry was ~35% of mul).
    c = conv(a, b)
    c = carry(c, CONV_LIMBS + 1, passes=2)
    c = _fold_high(spec, c)
    return _fold_final(spec, c)


def square(spec: FieldSpec, a: jax.Array) -> jax.Array:
    return mul(spec, a, a)


def mul_small(spec: FieldSpec, a: jax.Array, k: int) -> jax.Array:
    """Multiply by a small non-negative python int (k < 2^18)."""
    assert 0 <= k < (1 << 18)
    return reduce_wide(spec, a * jnp.int32(k))


def pow_fixed(spec: FieldSpec, x: jax.Array, e: int) -> jax.Array:
    """x^e for a fixed python-int exponent e >= 1, via an MSB-first scan."""
    bits = _pow_bits(e)
    if len(bits) == 1:
        return x

    bits_arr = jnp.asarray(np.asarray(bits[1:], np.int32))

    def body(acc, bit):
        acc = square(spec, acc)
        acc_mul = mul(spec, acc, x)
        acc = jnp.where((bit == 1)[..., None], acc_mul, acc)
        return acc, None

    acc, _ = jax.lax.scan(body, x, bits_arr)
    return acc


def inv(spec: FieldSpec, x: jax.Array) -> jax.Array:
    """Fermat inverse x^(m-2); maps 0 -> 0."""
    return pow_fixed(spec, x, spec.modulus - 2)


def batch_inv(spec: FieldSpec, x: jax.Array) -> jax.Array:
    """Montgomery batch inversion over the leading axis (0 -> 0).

    One Fermat exponentiation + 3n muls instead of n exponentiations.  The
    scan is sequential in n — use for small n or host-latency-bound paths;
    for large device batches plain ``inv`` (252-step scan, batch-parallel)
    is faster.
    """
    zero_mask = is_zero(spec, x)
    x_safe = jnp.where(zero_mask[..., None], jnp.broadcast_to(ones(spec), x.shape), x)

    def fwd(acc, xi):
        return mul(spec, acc, xi), acc  # carry running product, emit prefix

    acc0 = ones(spec, x.shape[1:-1])
    total, prefix = jax.lax.scan(fwd, acc0, x_safe)
    total_inv = inv(spec, total)

    def bwd(acc, inp):
        xi, pi = inp
        out = mul(spec, acc, pi)
        return mul(spec, acc, xi), out

    _, invs = jax.lax.scan(bwd, total_inv, (x_safe, prefix), reverse=True)
    return jnp.where(zero_mask[..., None], jnp.zeros_like(invs), invs)


def canon(spec: FieldSpec, x: jax.Array) -> jax.Array:
    """Canonical representative in [0, m): at most two conditional subtracts.

    Uses the EXACT scan carry: the conditional subtract reads the sign off
    the fully-propagated top limb, which the flat partial carry does not
    guarantee."""
    m = jnp.asarray(spec.modulus_limbs, I32)
    x = carry_exact(x, N_LIMBS)
    for _ in range(2):
        d = carry_exact(x - m, N_LIMBS)
        nonneg = d[..., -1] >= 0  # top limb unmasked -> sign of whole diff
        x = jnp.where(nonneg[..., None], d, x)
    return x


def eq(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.all(canon(spec, a) == canon(spec, b), axis=-1)


def is_zero(spec: FieldSpec, a: jax.Array) -> jax.Array:
    return jnp.all(canon(spec, a) == 0, axis=-1)


def select(mask: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """where(mask, a, b) with mask shaped [...] over limb vectors [..., 22]."""
    return jnp.where(mask[..., None], a, b)


def sum_reduce(spec: FieldSpec, x: jax.Array, axis: int = 0) -> jax.Array:
    """Field sum of *normalized semi* elements along ``axis``, vectorized.

    Normalized limbs are < 2^12, so up to 2^18 elements can be summed as
    plain int32 before one deferred modular reduction; larger axes use a
    two-level (still fully vectorized) reduction.
    """
    x = jnp.moveaxis(x, axis, 0)
    chunk = 1 << 18
    while x.shape[0] > 1:
        n = x.shape[0]
        if n <= chunk:
            return reduce_wide(spec, jnp.sum(x, axis=0))
        pad = (-n) % chunk
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
        x = reduce_wide(
            spec, jnp.sum(x.reshape(-1, chunk, *x.shape[1:]), axis=1)
        )
    return reduce_wide(spec, x[0])


def dot(spec: FieldSpec, a: jax.Array, b: jax.Array, axis: int = 0) -> jax.Array:
    """Inner product sum_i a_i * b_i along ``axis`` (lazy-accumulated).

    Large flat inputs take the MXU path (``dot_mxu``: one int8 limb-cross
    matmul per 2^18 chunk — measured 4.3x the VPU path, r05); everything
    else uses the VPU conv with 4-term lazy accumulation.
    """
    if axis == 0 and a.ndim == 2 and b.ndim == 2 and a.shape[0] >= 256:
        return dot_mxu(spec, a, b)
    c = conv(a, b)
    c = jnp.moveaxis(c, axis, 0)
    n = c.shape[0]
    pad = (-n) % 4
    if pad:
        c = jnp.concatenate([c, jnp.zeros((pad,) + c.shape[1:], c.dtype)], 0)
    partial = reduce_wide(spec, jnp.sum(c.reshape(-1, 4, *c.shape[1:]), axis=1))
    return sum_reduce(spec, partial, axis=0)


# ---------------------------------------------------------------------------
# MXU kernels (r05).  Pairwise elementwise modmul cannot use the MXU (no
# shared operand -> no matmul contraction; measured negative results in
# scripts/probe_mxu_field.py), but two load-bearing SHAPES can:
#   * scalar-shared mul  c[i] = r * d[i]  — the limb convolution against a
#     FIXED r is a Toeplitz matmul  d6 [N,44] @ T(r6) [44,88]  in int8
#     (6-bit half-limbs; products <= 65*65, row sums <= 44*65*65 < 2^18 —
#     exact in the MXU's int32 accumulator).  Measured 2.7x the VPU path.
#   * inner product  sum_i a[i]*b[i]  — the limb cross-product matrix
#     M[p,q] = sum_i a6[i,p]*b6[i,q] is ONE [44,N]@[N,44] int8 matmul;
#     the per-element conv never materializes.  Measured 4.3x.
# ---------------------------------------------------------------------------

N_HALF = 2 * N_LIMBS  # 44 six-bit half-limbs
DOT_MXU_CHUNK = 1 << 18  # int32 accumulator bound: chunk * 65 * 65 < 2^31


def split6(x: jax.Array) -> jax.Array:
    """Semi-form limbs [..., 22] -> interleaved 6-bit half-limbs [..., 44]
    as int8.  Semi limbs are <= 2^12+24, so hi = limb >> 6 <= 65 — still
    int8.  Exact: limb = lo + 64*hi."""
    lo = x & 0x3F
    hi = x >> 6
    return (
        jnp.stack([lo, hi], axis=-1)
        .reshape(x.shape[:-1] + (N_HALF,))
        .astype(jnp.int8)
    )


def _recombine6(c6: jax.Array) -> jax.Array:
    """87/88-coeff base-2^6 vector (int32) -> 44-coeff base-2^12 grid."""
    n = c6.shape[-1]
    if n % 2:
        c6 = jnp.concatenate(
            [c6, jnp.zeros(c6.shape[:-1] + (1,), c6.dtype)], axis=-1
        )
    ev = c6[..., 0::2]
    od = c6[..., 1::2]
    return ev + (od << 6)


def mul_scalar(spec: FieldSpec, d: jax.Array, r: jax.Array) -> jax.Array:
    """r * d[i] for a SHARED scalar r (semi form) over a batch d [..., 22].

    MXU path: conv against the Toeplitz matrix of r's 6-bit half-limbs.
    Falls back to plain mul for tiny batches (matmul setup not worth it).
    """
    if d.ndim < 2 or d.shape[:-1] == () or d.size // N_LIMBS < 512:
        return mul(spec, d, jnp.broadcast_to(r, d.shape))
    r6 = split6(r)  # [44] int8
    # T[i, k] = r6[k - i] for 0 <= k-i < 44 (constant index matrix)
    ii = jnp.arange(N_HALF)[:, None]
    kk = jnp.arange(2 * N_HALF)[None, :]
    j = kk - ii
    T = jnp.where(
        (j >= 0) & (j < N_HALF), r6[jnp.clip(j, 0, N_HALF - 1)], 0
    ).astype(jnp.int8)
    d6 = split6(d)
    batch = d.shape[:-1]
    wide6 = jax.lax.dot_general(
        d6.reshape(-1, N_HALF),
        T,
        (((1,), (0,)), ((), ())),
        preferred_element_type=I32,
    ).reshape(batch + (2 * N_HALF,))
    w12 = _recombine6(wide6)  # [..., 44], coeffs < 2^24.1
    # same reduction tail as mul(): 2-pass carry (non-negative, < 2^24.1)
    # then the high fold + final fold
    c = carry(w12, CONV_LIMBS + 1, passes=2)
    c = _fold_high(spec, c)
    return _fold_final(spec, c)


def dot_mxu(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    """Inner product sum_i a[i]*b[i] over the LEADING axis via ONE int8
    MXU matmul per <=2^18 chunk (int32 accumulator bound: chunk*65*65 <
    2^31).  Returns a single semi-form element.

    The [44,44] limb cross matrix is folded along anti-diagonals in two
    16-bit halves (diagonal sums of raw chunks can exceed int32), each
    reduced with reduce_wide, then recombined as lo + 2^16*hi.
    """
    n = a.shape[0]
    CHUNK = DOT_MXU_CHUNK
    a6 = split6(a).reshape(n, -1)  # [n, 44] int8 (flatten any mid dims)
    b6 = split6(b).reshape(n, -1)
    idx = jnp.arange(N_HALF)[:, None] + jnp.arange(N_HALF)[None, :]  # i+j
    parts = []
    for s in range(0, n, CHUNK):
        m6 = jax.lax.dot_general(
            a6[s : s + CHUNK],
            b6[s : s + CHUNK],
            (((0,), (0,)), ((), ())),
            preferred_element_type=I32,
        )  # [44, 44], entries < chunk * 65 * 65
        lo16 = m6 & 0xFFFF
        hi16 = m6 >> 16
        c_lo = jnp.zeros((2 * N_HALF,), I32).at[idx].add(lo16)
        c_hi = jnp.zeros((2 * N_HALF,), I32).at[idx].add(hi16)

        def _reduce44(w12):
            # 44-coeff base-2^12 grid, |coeff| < 2^27.6: same chain as
            # mul() (reduce_wide would extend past the fold matrix)
            c = carry(w12, CONV_LIMBS + 1, passes=2)
            c = _fold_high(spec, c)
            return _fold_final(spec, c)

        v_lo = _reduce44(_recombine6(c_lo))
        v_hi = _reduce44(_recombine6(c_hi))
        parts.append(add(spec, v_lo, mul_small(spec, v_hi, 1 << 16)))
    if len(parts) == 1:
        return parts[0]
    return sum_reduce(spec, jnp.stack(parts), axis=0)


def parallel_batch_inv(spec: FieldSpec, x: jax.Array) -> jax.Array:
    """Batch inversion over the leading axis via parallel prefix/suffix
    products: 2*log2(n)+2 full-width muls + ONE single-element Fermat
    exponentiation, all batch-parallel (no sequential scan over n).

    inv_i = inv(prod_all) * prefix_{i-1} * suffix_{i+1}.  Inputs must be
    nonzero (curve Z coordinates are); zero inputs produce garbage, not
    zero — use ``batch_inv`` where the 0 -> 0 map matters.  ~10x cheaper
    than per-element Fermat at n = 2^16 (32 vs ~380 muls per element).
    """
    n = x.shape[0]
    N = 1 << max(1, (n - 1).bit_length())
    one = jnp.broadcast_to(ones(spec), (1,) + x.shape[1:])
    if N > n:
        x_p = jnp.concatenate(
            [x, jnp.broadcast_to(one, (N - n,) + x.shape[1:])], axis=0
        )
    else:
        x_p = x
    iota = jnp.arange(N)

    def scan_prod(vals, reverse: bool):
        for j in range(N.bit_length() - 1):
            d = 1 << j
            if reverse:
                pred = jnp.roll(vals, -d, axis=0)
                valid = iota < N - d
            else:
                pred = jnp.roll(vals, d, axis=0)
                valid = iota >= d
            pred = jnp.where(
                valid.reshape((N,) + (1,) * (vals.ndim - 1)), pred, one
            )
            vals = mul(spec, vals, pred)
        return vals

    pre = scan_prod(x_p, reverse=False)  # pre[i] = prod_{0..i}
    suf = scan_prod(x_p, reverse=True)  # suf[i] = prod_{i..N-1}
    tinv = inv(spec, pre[-1])
    pre_s = jnp.concatenate([one, pre[:-1]], axis=0)
    suf_s = jnp.concatenate([suf[1:], one], axis=0)
    out = mul(spec, mul(spec, pre_s, suf_s), tinv[None])
    return out[:n]


# ---------------------------------------------------------------------------
# Packed 8-word codecs (32 B per canonical element; for gather-bound
# paths: fixed-base comb tables, per-window MSM point permutes)
# ---------------------------------------------------------------------------

PACK_WORDS = 8  # 8 x 32-bit words = 256 bits >= 255-bit canonical values


def pack_words(x: jax.Array) -> jax.Array:
    """CANONICAL limbs [..., 22] int32 -> packed [..., 8] uint32.

    Bit-exact little-endian repack: word w holds bits [32w, 32w+32).
    Caller must canon() first — limbs must be in [0, 2^12)."""
    xu = x.astype(jnp.uint32)
    words = []
    for w in range(PACK_WORDS):
        acc = None
        for i in range(N_LIMBS):
            lo_bit = LIMB_BITS * i - 32 * w
            if lo_bit <= -LIMB_BITS or lo_bit >= 32:
                continue
            part = (
                xu[..., i] << lo_bit if lo_bit >= 0 else xu[..., i] >> -lo_bit
            )
            acc = part if acc is None else acc | part
        words.append(acc)
    return jnp.stack(words, axis=-1)


def unpack_words(w: jax.Array) -> jax.Array:
    """Packed [..., 8] uint32 -> canonical limbs [..., 22] int32."""
    wu = w.astype(jnp.uint32)
    limbs = []
    for i in range(N_LIMBS):
        bit = LIMB_BITS * i
        j, off = bit >> 5, bit & 31
        v = wu[..., j] >> off
        if off > 32 - LIMB_BITS and j + 1 < PACK_WORDS:
            v = v | (wu[..., j + 1] << (32 - off))
        limbs.append(v & LIMB_MASK)
    return jnp.stack(limbs, axis=-1).astype(I32)


# ---------------------------------------------------------------------------
# Host codecs (canonical little-endian 32-byte strings, dalek-compatible)
# ---------------------------------------------------------------------------

import functools


@functools.lru_cache(maxsize=None)
def canon_jit(spec: FieldSpec):
    """Cached jitted canonicalizer (eager dispatch is slow in this env)."""
    return jax.jit(lambda x: canon(spec, x))


def to_int(spec: FieldSpec, x: jax.Array) -> int:
    return limbs_to_int(np.asarray(jax.device_get(canon_jit(spec)(x)))) % spec.modulus


def to_bytes(spec: FieldSpec, x: jax.Array) -> bytes:
    return to_int(spec, x).to_bytes(32, "little")


def from_int(spec: FieldSpec, v: int, shape=()) -> jax.Array:
    return const(spec, v % spec.modulus, shape)


def from_bytes(spec: FieldSpec, b: bytes) -> jax.Array:
    return const(spec, int.from_bytes(b, "little") % spec.modulus)


def pack_ints(spec: FieldSpec, x: jax.Array) -> np.ndarray:
    """Device batch -> numpy object array of canonical python ints (host)."""
    arr = np.asarray(jax.device_get(canon_jit(spec)(x))).astype(object)
    n = arr.shape[-1]
    acc = np.zeros(arr.shape[:-1], dtype=object)
    for i in range(n - 1, -1, -1):
        acc = (acc << LIMB_BITS) + arr[..., i]
    return acc % spec.modulus
