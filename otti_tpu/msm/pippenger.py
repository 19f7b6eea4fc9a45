"""Multi-scalar multiplication (Pippenger) as batched JAX kernels.

Replaces curve25519-dalek's Pippenger MSM (SURVEY.md §2.2 Spartan row:
"Pedersen vector commitments => MSM-dominated"; §7.1 msm/ row).  This is
the throughput workhorse of the prover: Hyrax commitments and the inner-
product argument are all MSMs.

TPU-native design (no data-dependent branching, static shapes):
  * windows of ``w`` bits; per window the points are *sorted by digit*
    (cheap int32 argsort + gather) and bucket sums are formed with a
    **segmented inclusive scan** whose combiner is the complete Edwards
    addition — ``jax.lax.associative_scan`` gives the log-depth,
    fully-batched reduction the VPU wants.
  * bucket aggregation sum_b b*S_b is done bit-serially over the window:
    w masked tree-reductions + a w-step Horner double-and-add, again all
    batched adds.
  * window combination is the usual MSB->LSB double-w-times-and-add.

Work: ~2N scan adds + O(2^w) per window, ~ceil(253/w) windows — the same
asymptotics as a CPU/GPU Pippenger but with every addition a lane of a
batched kernel.  A simple bit-serial fallback (``msm_bitserial``) covers
tiny inputs.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from ..curve import edwards as E
from ..field.fields import LIMB_BITS, N_LIMBS

SCALAR_BITS = 253


def _digits(scalars: jax.Array, window: int) -> jax.Array:
    """[N, N_LIMBS] limb scalars -> [n_windows, N] int32 window digits.

    Digits are extracted LSB-window-first then reversed (row 0 = MSB window).
    """
    n_windows = math.ceil(SCALAR_BITS / window)
    bits = []
    for b in range(n_windows * window):
        limb, off = divmod(b, LIMB_BITS)
        if limb >= N_LIMBS:
            bits.append(jnp.zeros(scalars.shape[:-1], jnp.int32))
        else:
            bits.append((scalars[..., limb] >> off) & 1)
    rows = []
    for j in range(n_windows):
        d = jnp.zeros(scalars.shape[:-1], jnp.int32)
        for t in range(window):
            d = d + (bits[j * window + t] << t)
        rows.append(d)
    return jnp.stack(rows[::-1], axis=0)


def _segment_scan_bucket_sums(points, digits_sorted, window: int):
    """Sorted-by-digit points -> [2^w] bucket sums (identity for empties)."""
    n = digits_sorted.shape[0]
    starts = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (digits_sorted[1:] != digits_sorted[:-1]).astype(jnp.int32)]
    )

    def combine(a, b):
        flag = a["f"] | b["f"]
        summed = E.add(a["p"], b["p"])
        pt = E.select(b["f"] == 1, b["p"], summed)
        return {"f": flag, "p": pt}

    scanned = jax.lax.associative_scan(
        combine, {"f": starts, "p": points}, axis=0
    )
    ends = jnp.concatenate(
        [(digits_sorted[1:] != digits_sorted[:-1]).astype(jnp.int32), jnp.ones((1,), jnp.int32)]
    )
    n_buckets = 1 << window
    # scatter segment tails into their bucket slot (dump empties to slot n_buckets)
    idx = jnp.where(ends == 1, digits_sorted, n_buckets)
    ident = E.identity((n_buckets + 1,))
    buckets = jax.tree.map(
        lambda dst, src: dst.at[idx].set(src), ident, scanned["p"]
    )
    return jax.tree.map(lambda a: a[:n_buckets], buckets)


def _aggregate_buckets(buckets, window: int):
    """sum_b b * S_b via w masked tree-sums + Horner doubling."""
    n_buckets = 1 << window
    bucket_ids = jnp.arange(n_buckets, dtype=jnp.int32)
    parts = []
    for t in range(window):
        mask = ((bucket_ids >> t) & 1) == 1
        sel = E.select(mask, buckets, E.identity((n_buckets,)))
        parts.append(E.sum_points(sel))
    acc = parts[-1]
    for t in range(window - 2, -1, -1):
        acc = E.double(acc)
        acc = E.add(acc, parts[t])
    return acc


def pick_window(n: int) -> int:
    if n <= 16:
        return 2
    return max(2, min(12, int(math.log2(n)) - 3))


def msm(points, scalars: jax.Array, window: int | None = None):
    """sum_i scalars[i] * points[i] (batched device Pippenger).

    points: point pytree with leading axis N; scalars: [N, N_LIMBS] limbs.
    Returns a single (unbatched) point.
    """
    n = scalars.shape[0]
    w = window or pick_window(n)
    digits = _digits(scalars, w)  # [n_win, N], MSB window first
    n_win = digits.shape[0]

    def one_window(total, dig):
        order = jnp.argsort(dig)
        dig_sorted = dig[order]
        pts_sorted = jax.tree.map(lambda a: a[order], points)
        buckets = _segment_scan_bucket_sums(pts_sorted, dig_sorted, w)
        win_sum = _aggregate_buckets(buckets, w)
        for _ in range(w):
            total = E.double(total)
        return E.add(total, win_sum), None

    total, _ = jax.lax.scan(one_window, E.identity(()), digits)
    return total


def msm_bitserial(points, scalars: jax.Array):
    """Simple MSB->LSB bit-serial MSM: 253 masked tree-sums.  O(253 N) adds
    but trivially correct; used for tiny N and as a test cross-check."""
    bits = E.scalars_to_bits(scalars, SCALAR_BITS)  # [N, 253]

    def body(acc, t):
        acc = E.double(acc)
        mask = bits[:, SCALAR_BITS - 1 - t] == 1
        sel = E.select(mask, points, E.identity((scalars.shape[0],)))
        return E.add(acc, E.sum_points(sel)), None

    acc, _ = jax.lax.scan(body, E.identity(()), jnp.arange(SCALAR_BITS))
    return acc


@functools.lru_cache(maxsize=None)
def msm_jit(n: int, window: int | None = None):
    """Cached jitted MSM for a fixed size n."""
    return jax.jit(lambda pts, sc: msm(pts, sc, window))
