"""Batched edwards25519 group ops in extended coordinates (TPU-native).

Replaces curve25519-dalek's point arithmetic (SURVEY.md §2.2 Spartan row,
§7.1 curve/ row).  Design: *complete* (branch-free) unified add/double
formulas for the a=-1 twisted Edwards curve so every lane of a batch takes
the identical instruction stream — no exceptional cases, no data-dependent
control flow, exactly what the VPU/XLA want (SURVEY.md §7.4 item 4).

A point batch is a pytree dict {"x","y","z","t"} of limb arrays
[..., N_LIMBS] over GF(2^255-19).  Formulas: add-2008-hwcd-3 (9M) and
dbl-2008-hwcd (4M+4S), both complete on the prime-order ristretto subgroup.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..field import ops as F
from ..field.fields import BASE
from ..refimpl import numeric as ref

# curve constants as canonical ints
D_INT = ref.D
D2_INT = (2 * ref.D) % ref.P


def pt(x, y, z, t):
    return {"x": x, "y": y, "z": z, "t": t}


def identity(shape=()):
    return pt(
        F.zeros(shape), F.ones(BASE, shape), F.ones(BASE, shape), F.zeros(shape)
    )


def match_vma(p, ref_p):
    """Coerce constant point(s) ``p`` to the vma/sharding type of ``ref_p``
    by adding a data-derived zero — needed when constants seed loop carries
    inside shard_map-manual code (replicated vs varying type mismatch)."""
    vz = jax.tree.leaves(ref_p)[0].reshape(-1)[0] & 0
    return jax.tree.map(lambda a: a + vz, p)


def base_point(shape=()):
    return from_affine_ints(ref.BASE_X, ref.BASE_Y, shape)


def from_affine_ints(x: int, y: int, shape=()):
    return pt(
        F.const(BASE, x, shape),
        F.const(BASE, y, shape),
        F.ones(BASE, shape),
        F.const(BASE, (x * y) % ref.P, shape),
    )


def add(p, q):
    """Unified extended-coordinate addition (complete; 9 field muls)."""
    a = F.mul(BASE, F.sub(BASE, p["y"], p["x"]), F.sub(BASE, q["y"], q["x"]))
    b = F.mul(BASE, F.add(BASE, p["y"], p["x"]), F.add(BASE, q["y"], q["x"]))
    c = F.mul(BASE, F.mul(BASE, p["t"], F.const(BASE, D2_INT, ())), q["t"])
    d = F.mul(BASE, F.add(BASE, p["z"], p["z"]), q["z"])
    e = F.sub(BASE, b, a)
    f = F.sub(BASE, d, c)
    g = F.add(BASE, d, c)
    h = F.add(BASE, b, a)
    return pt(
        F.mul(BASE, e, f),
        F.mul(BASE, g, h),
        F.mul(BASE, f, g),
        F.mul(BASE, e, h),
    )


def double(p):
    """Extended-coordinate doubling (4M + 4S, a = -1)."""
    a = F.square(BASE, p["x"])
    b = F.square(BASE, p["y"])
    c = F.mul_small(BASE, F.square(BASE, p["z"]), 2)
    h = F.add(BASE, a, b)
    e = F.sub(BASE, h, F.square(BASE, F.add(BASE, p["x"], p["y"])))
    g = F.sub(BASE, a, b)
    f = F.add(BASE, c, g)
    return pt(
        F.mul(BASE, e, f),
        F.mul(BASE, g, h),
        F.mul(BASE, f, g),
        F.mul(BASE, e, h),
    )


def negate(p):
    return pt(F.neg(BASE, p["x"]), p["y"], p["z"], F.neg(BASE, p["t"]))


def select(mask, p, q):
    """where(mask, p, q) lane-wise over point batches."""
    return jax.tree.map(lambda a, b: F.select(mask, a, b), p, q)


def cadd(mask, p, q):
    """p + q where mask else p (constant control flow)."""
    return select(mask, add(p, q), p)


def eq(p, q):
    """Projective equality: X1*Z2 == X2*Z1 and Y1*Z2 == Y2*Z1."""
    ex = F.eq(BASE, F.mul(BASE, p["x"], q["z"]), F.mul(BASE, q["x"], p["z"]))
    ey = F.eq(BASE, F.mul(BASE, p["y"], q["z"]), F.mul(BASE, q["y"], p["z"]))
    return jnp.logical_and(ex, ey)


def scalar_mul_bits(p, bits):
    """p * k where ``bits`` is [..., n_bits] int32 LSB-first (branch-free).

    Double-and-always-add ladder via lax.scan over the bit index: the batch
    stays fully vectorized; per-lane bits select whether the add lands.
    """
    n_bits = bits.shape[-1]

    def body(carry, i):
        acc, cur = carry
        bit = bits[..., i]
        acc = cadd(bit == 1, acc, cur)
        cur = double(cur)
        return (acc, cur), None

    batch = bits.shape[:-1]
    init = match_vma(identity(batch), p)
    (acc, _), _ = jax.lax.scan(body, (init, p), jnp.arange(n_bits))
    return acc


def scalars_to_bits(scalars_limbs: jax.Array, n_bits: int = 256) -> jax.Array:
    """Scalar-field limb vectors -> [..., n_bits] bit array (LSB-first).

    Canonicalizes first: bit extraction by per-limb shifts is only correct
    on fully-normalized limbs, and semi-form limbs may carry residuals
    (flat partial carry).  Reducing mod ell is value-changing as an
    integer but group-equivalent for scalar multiplication (the ristretto
    subgroup has order ell).  Vectorized — no per-bit graph ops.
    """
    import numpy as np

    from ..field.fields import LIMB_BITS, N_LIMBS, SCALAR

    scalars_limbs = F.canon(SCALAR, scalars_limbs)
    pos = np.arange(n_bits)
    limb_idx = np.minimum(pos // LIMB_BITS, N_LIMBS - 1)
    offs = pos % LIMB_BITS
    valid = (pos // LIMB_BITS) < N_LIMBS
    gathered = scalars_limbs[..., jnp.asarray(limb_idx)]
    bits = (gathered >> jnp.asarray(offs)) & 1
    return jnp.where(jnp.asarray(valid), bits, 0)


def scalar_mul(p, k_limbs):
    """p * k with k given as canonical scalar-field limbs."""
    return scalar_mul_bits(p, scalars_to_bits(k_limbs, 253))


def sum_points(p, axis: int = 0):
    """Tree-reduce a batch of points along ``axis`` with point addition.

    Statically unrolled halving: log2(n) point-add callsites (~1k HLO ops
    each — acceptable compile) doing the work-optimal 2n total adds.  The
    earlier fixed-shape fori_loop variant had ONE callsite but n*log(n)
    work, which made large commitments compute-bound (e.g. 7x slower
    Hyrax commits at nvp=32k).
    """
    p = jax.tree.map(lambda a: jnp.moveaxis(a, axis, 0), p)
    n = p["x"].shape[0]
    if n == 1:
        return jax.tree.map(lambda a: a[0], p)
    N = 1 << (n - 1).bit_length()
    if N > n:
        id_block = match_vma(identity((N - n,) + p["x"].shape[1:-1]), p)
        p = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), p, id_block
        )
        n = N
    while n > 1:
        half = n // 2
        lo = jax.tree.map(lambda a: a[:half], p)
        hi = jax.tree.map(lambda a: a[half:], p)
        p = add(lo, hi)
        n = half
    return jax.tree.map(lambda a: a[0], p)


def sum_points_compact(p, axis: int = 0):
    """Tree-reduce with ONE point-add callsite (fori_loop over levels).

    n*log2(n) work instead of sum_points' 2n, but O(1) HLO — for SMALL
    reductions inside compile-sensitive kernels (the per-round ZK
    commitments: the unrolled tree put ~18k HLO per commit callsite into
    the round body and pushed the phase-kernel compile to ~15 min on the
    tunnel).  Large device commitments keep the work-optimal sum_points.
    """
    p = jax.tree.map(lambda a: jnp.moveaxis(a, axis, 0), p)
    n = p["x"].shape[0]
    if n == 1:
        return jax.tree.map(lambda a: a[0], p)
    N = 1 << (n - 1).bit_length()
    if N > n:
        id_block = match_vma(identity((N - n,) + p["x"].shape[1:-1]), p)
        p = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), p, id_block
        )
    levels = N.bit_length() - 1
    iota = jnp.arange(N)

    nb = p["x"].ndim - 2  # batch dims between the reduce axis and limbs

    def body(k, q):
        offset = jnp.int32(N) >> (k + 1)
        partner = jax.tree.map(lambda a: jnp.roll(a, -offset, axis=0), q)
        s = add(q, partner)
        keep = (iota < offset).reshape((N,) + (1,) * nb)
        return select(keep, s, q)

    q = jax.lax.fori_loop(0, levels, body, p)
    return jax.tree.map(lambda a: a[0], q)


def to_affine_pack(p) -> jax.Array:
    """Point batch [n] -> packed affine [n, 16] uint32 (x | y, 32 B each).

    Normalizes z -> 1 with ONE parallel batch inversion (~32 muls/point at
    n = 2^16) and packs the canonical coordinates 4x denser than the
    4-coordinate limb layout (64 vs 352 B/point).  This is the storage
    format for every gather-bound MSM path: the r04 fixed-base comb was
    HBM-bandwidth-bound on its 352 B gathers (42.9k pts/s ~= 1.5 GB per
    2^16-point commit at ~800 GB/s)."""
    zinv = F.parallel_batch_inv(BASE, p["z"])
    xa = F.canon(BASE, F.mul(BASE, p["x"], zinv))
    ya = F.canon(BASE, F.mul(BASE, p["y"], zinv))
    return jnp.concatenate(
        [F.pack_words(xa), F.pack_words(ya)], axis=-1
    )


def from_affine_pack(packed: jax.Array):
    """Packed affine [..., 16] uint32 -> extended point (z=1, t=x*y).

    z is built as ones + (x & 0) so its vma/sharding type matches the
    data — a plain replicated constant breaks loop-carry typing when the
    result seeds a scan under shard_map (see match_vma)."""
    x = F.unpack_words(packed[..., :8])
    y = F.unpack_words(packed[..., 8:])
    z = jnp.broadcast_to(F.ones(BASE), x.shape) + (x & 0)
    return pt(x, y, z, F.mul(BASE, x, y))


# ---------------------------------------------------------------------------
# Host codecs
# ---------------------------------------------------------------------------

def to_ref(p) -> ref.EdPoint:
    """Single (unbatched) device point -> host reference point."""
    return ref.EdPoint(
        F.to_int(BASE, p["x"]),
        F.to_int(BASE, p["y"]),
        F.to_int(BASE, p["z"]),
        F.to_int(BASE, p["t"]),
    )


def from_ref(q: ref.EdPoint, shape=()):
    return pt(
        F.const(BASE, q.X, shape),
        F.const(BASE, q.Y, shape),
        F.const(BASE, q.Z, shape),
        F.const(BASE, q.T, shape),
    )


def stack(points):
    """List of same-shape point pytrees -> batched point."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *points)
