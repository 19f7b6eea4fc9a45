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
    """Reduce a (possibly unnormalized) wide limb vector to semi form."""
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

    The 43 wide coefficients of each limb-product are < 2^29, so 4 terms
    can be pre-summed in int32 before the (batched) modular reduction; the
    partial sums are then normalized and folded with ``sum_reduce``.  All
    steps are vectorized — no per-element Python loops.
    """
    c = conv(a, b)
    c = jnp.moveaxis(c, axis, 0)
    n = c.shape[0]
    pad = (-n) % 4
    if pad:
        c = jnp.concatenate([c, jnp.zeros((pad,) + c.shape[1:], c.dtype)], 0)
    partial = reduce_wide(spec, jnp.sum(c.reshape(-1, 4, *c.shape[1:]), axis=1))
    return sum_reduce(spec, partial, axis=0)


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
