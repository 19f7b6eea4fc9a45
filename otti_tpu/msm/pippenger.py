"""Multi-scalar multiplication (Pippenger) as batched JAX kernels.

Replaces curve25519-dalek's Pippenger MSM (SURVEY.md §2.2 Spartan row:
"Pedersen vector commitments => MSM-dominated"; §7.1 msm/ row).  This is
the throughput workhorse of the prover: Hyrax commitments and the inner-
product argument are all MSMs.

TPU-native design (no data-dependent branching, static shapes):
  * windows of ``w`` bits; per window the points are *sorted by digit*
    (cheap int32 argsort + gather) and bucket sums are formed with a
    **segmented inclusive scan** (Hillis-Steele over a fori_loop) whose
    combiner is the complete Edwards addition — log-depth, fully batched,
    and only ONE point-add instantiation in the compiled graph.
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
    from ..field import ops as F
    from ..field.fields import SCALAR

    scalars = F.canon(SCALAR, scalars)  # bit extraction needs exact limbs
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


def _scatter_run_ends(points, digits_sorted, vals, window: int):
    """Place each run's inclusive total (at its run-end position) into the
    [2^w] bucket array (identity for empty buckets)."""
    ends = jnp.concatenate(
        [
            (digits_sorted[1:] != digits_sorted[:-1]).astype(jnp.int32),
            jnp.ones((1,), jnp.int32),
        ]
    )
    n_buckets = 1 << window
    idx = jnp.where(ends == 1, digits_sorted, n_buckets)
    ident = E.match_vma(E.identity((n_buckets + 1,)), points)
    buckets = jax.tree.map(lambda dst, src: dst.at[idx].set(src), ident, vals)
    return jax.tree.map(lambda a: a[:n_buckets], buckets)


def _segment_scan_1level(points, digits_sorted, window: int):
    """Single-level Hillis-Steele segmented scan: log2(n) full-width
    masked point-adds.  Used for small n (the two-level variant needs
    n divisible into chunks); graph is O(log n) — the obvious
    jax.lax.associative_scan alternative inlines ~2n combiner bodies and
    makes XLA:CPU compile for minutes."""
    n = digits_sorted.shape[0]
    starts = jnp.concatenate(
        [
            jnp.ones((1,), jnp.int32),
            (digits_sorted[1:] != digits_sorted[:-1]).astype(jnp.int32),
        ]
    )
    iota = jnp.arange(n)
    ident_all = E.match_vma(E.identity((n,)), points)
    steps = max(1, (n - 1).bit_length())

    def hs_body(j, carry):
        flags, vals = carry
        d = jnp.int32(1) << j
        predv = jax.tree.map(lambda a: jnp.roll(a, d, axis=0), vals)
        predf = jnp.roll(flags, d)
        valid = iota >= d
        predv = E.select(valid, predv, ident_all)
        predf = jnp.where(valid, predf, 1)
        summed = E.add(vals, predv)
        take_sum = flags == 0
        vals = E.select(take_sum, summed, vals)
        flags = flags | predf
        return flags, vals

    _, vals = jax.lax.fori_loop(0, steps, hs_body, (starts, points))
    return _scatter_run_ends(points, digits_sorted, vals, window)


SCAN_CHUNK = 16


def _segment_scan_bucket_sums(points, digits_sorted, window: int):
    """Sorted-by-digit points -> [2^w] bucket sums (identity for empties).

    TWO-LEVEL segmented scan (r05): chunk the sorted array [n] -> [m, C]
    (C = SCAN_CHUNK) and run the Hillis-Steele segmented scan along the
    chunk axis (log2 C full-width masked adds), then a second segmented
    scan over the m chunk TAILS (log2 m adds at width m = n/C) to build
    the cross-chunk run carries, applied with ONE more full-width masked
    add.  Point-add lanes: n*(log2 C + 1) + (n/C)*log2 m ~ 5.75n at
    n = 2^16, vs 16n for the single-level scan — the schedule was the #2
    cost in the r04 MSM (VERDICT r04 weak #2).

    Correctness: the carry-application mask and the level-2 chunk flags
    must come from the PURE inclusive-OR scan of the true run-start
    marks (``or_flags``), NOT from the HS guard flags — the guard
    formulation plants a virtual boundary at every chunk's column 0
    (predf forced to 1 when col < d), which is exactly what makes the
    level-1 value scan a correct *within-chunk* segmented scan, but
    leaves the final guard flags polluted: flags[:, 0] is always 1 and
    the pollution spreads to even columns, so a run ending at a chunk's
    first element silently lost its carry (r05 fix; caught by the
    vs-host oracle at every n with n % 16 == 0, n >= 32).  The level-2
    scan over (tail_flag, tail_sum) is the segmented-scan combiner over
    whole chunks, where index-0-as-boundary is genuinely true.
    """
    n = digits_sorted.shape[0]
    C = SCAN_CHUNK
    if n % C or n // C < 2:
        return _segment_scan_1level(points, digits_sorted, window)
    m = n // C
    starts = jnp.concatenate(
        [
            jnp.ones((1,), jnp.int32),
            (digits_sorted[1:] != digits_sorted[:-1]).astype(jnp.int32),
        ]
    )
    s2 = starts.reshape(m, C)
    # true "a run-start lies in [chunk_start..i]" indicator (no virtual
    # boundaries) — for the carry mask and the level-2 chunk flags
    or_flags = (jnp.cumsum(s2, axis=1) > 0).astype(jnp.int32)
    p2 = jax.tree.map(lambda a: a.reshape((m, C) + a.shape[1:]), points)
    ident2 = E.match_vma(E.identity((m, C)), points)
    col = jnp.arange(C)

    def hs1_body(j, carry):
        flags, vals = carry
        d = jnp.int32(1) << j
        predv = jax.tree.map(lambda a: jnp.roll(a, d, axis=1), vals)
        predf = jnp.roll(flags, d, axis=1)
        valid = jnp.broadcast_to((col >= d)[None, :], (m, C))
        predv = E.select(valid, predv, ident2)
        predf = jnp.where(valid, predf, 1)
        summed = E.add(vals, predv)
        vals = E.select(flags == 0, summed, vals)
        return flags | predf, vals

    flags, vals = jax.lax.fori_loop(
        0, C.bit_length() - 1, hs1_body, (s2, p2)
    )

    # level 2: segmented scan over chunk tails
    tail_f = or_flags[:, -1]
    tail_v = jax.tree.map(lambda a: a[:, -1], vals)
    ident_m = E.match_vma(E.identity((m,)), points)
    iota_m = jnp.arange(m)

    def hs2_body(j, carry):
        f2, v2 = carry
        d = jnp.int32(1) << j
        predv = jax.tree.map(lambda a: jnp.roll(a, d, axis=0), v2)
        predf = jnp.roll(f2, d)
        valid = iota_m >= d
        predv = E.select(valid, predv, ident_m)
        predf = jnp.where(valid, predf, 1)
        summed = E.add(v2, predv)
        v2 = E.select(f2 == 0, summed, v2)
        return f2 | predf, v2

    f2, v2 = jax.lax.fori_loop(
        0, max(1, m.bit_length() - 1), hs2_body, (tail_f, tail_v)
    )

    # cross-chunk carry-in for chunk c = inclusive tail scan of chunk c-1
    ident_1 = E.match_vma(E.identity((1,)), points)
    carry_in = jax.tree.map(
        lambda a, i: jnp.concatenate([i, a[:-1]], axis=0),
        v2,
        ident_1,
    )
    carry_b = jax.tree.map(
        lambda a: jnp.broadcast_to(a[:, None], (m, C) + a.shape[1:]),
        carry_in,
    )
    with_carry = E.add(vals, carry_b)
    vals = E.select(or_flags == 0, with_carry, vals)

    flat = jax.tree.map(lambda a: a.reshape((n,) + a.shape[2:]), vals)
    return _scatter_run_ends(points, digits_sorted, flat, window)


def _aggregate_buckets(buckets, window: int):
    """sum_b b * S_b via SUFFIX sums: T_j = sum_{b>=j} S_b (Hillis-Steele,
    log2(2^w) full-width masked adds), then sum_{j>=1} T_j = the weighted
    total (one tree-sum).  ~2x the adds of the old per-bit Horner but
    ~6x fewer SEQUENTIAL kernel steps (24 vs ~150) — the r05 profile
    showed aggregation at 43 ms/window was dispatch-latency-bound, the
    single largest cost in the 2^16 MSM (0.95 of 1.50 s)."""
    n_buckets = 1 << window
    iota = jnp.arange(n_buckets)
    ident = E.match_vma(E.identity((n_buckets,)), buckets)

    def suffix_body(j, vals):
        d = jnp.int32(1) << j
        nxt = jax.tree.map(lambda a: jnp.roll(a, -d, axis=0), vals)
        valid = iota < n_buckets - d
        nxt = E.select(valid, nxt, ident)
        return E.add(vals, nxt)

    T = jax.lax.fori_loop(0, window, suffix_body, buckets)
    # drop bucket 0 (weight 0) and tree-sum the suffixes
    T1 = E.select(iota >= 1, T, ident)
    return E.sum_points(T1)


def pick_window(n: int) -> int:
    if n <= 16:
        return 2
    return max(2, min(12, int(math.log2(n)) - 3))


def msm(
    points,
    scalars: jax.Array,
    window: int | None = None,
    win_group: int | None = None,
):
    """sum_i scalars[i] * points[i] (batched device Pippenger).

    points: point pytree with leading axis N; scalars: [N, N_LIMBS] limbs.
    Returns a single (unbatched) point.

    The ~20 windows are processed in vmapped GROUPS (``win_group`` at a
    time) rather than sequentially: every sort/scan/aggregate step then
    runs group x n lanes wide, which is what actually fills the VPU — the
    r03 sequential-window variant measured 13.9k pts/s because each step
    was only n lanes wide (BENCH_r03 extras; VERDICT r03 weak #5).
    ``win_group`` trades HBM for width: the sorted point copies are
    [group, n] per coordinate."""
    n = scalars.shape[0]
    w = window or pick_window(n)
    digits = _digits(scalars, w)  # [n_win, N], MSB window first
    n_win = digits.shape[0]
    if win_group is None:
        # cap the per-op gather at ~2^17 point-rows (the r04 slow-gather
        # cliff was measured on 352 B rows; the packed 64 B rows tolerate
        # 2x the row count — win_group=2 at n=2^16 halves the sequential
        # group steps and doubles every kernel's width, r05)
        win_group = max(1, min(8, (1 << 17) // max(n, 1)))
    win_group = min(win_group, n_win)
    # pad with zero windows at the MSB end to a multiple of the group
    # (digit 0 -> bucket 0 -> weight 0 in aggregation -> identity window
    # sum, and identity MSB windows leave the Horner total untouched)
    pad = (-n_win) % win_group
    if pad:
        digits = jnp.concatenate(
            [jnp.zeros((pad,) + digits.shape[1:], digits.dtype), digits]
        )
    n_groups = digits.shape[0] // win_group
    dg_stacked = digits.reshape(n_groups, win_group, n)

    scan_fn = jax.vmap(_segment_scan_bucket_sums, in_axes=(0, 0, None))
    agg_fn = jax.vmap(_aggregate_buckets, in_axes=(0, None))

    # normalize+pack the points ONCE (64 B/point): every per-window
    # permute then gathers 5.5x fewer bytes than the 4x22-limb layout —
    # the r04 path was moving ~350 B/point/window through HBM (r05)
    packed = E.to_affine_pack(points)  # [N, 16] uint32

    def one_group(_, dg):
        order = jnp.argsort(dg, axis=1)
        dig_sorted = jnp.take_along_axis(dg, order, axis=1)
        pts_sorted = E.from_affine_pack(packed[order])  # [G, N] points
        return None, scan_fn(pts_sorted, dig_sorted, w)  # [G, 2^w] points

    # bucket arrays for ALL windows first, ONE vmapped aggregation after:
    # inside the group loop the 24 aggregation steps ran at width
    # G x 2^w with 10+ sequential repetitions; hoisted, the same steps
    # run once at width n_win x 2^w (~250 ms saved at n=2^16, r05)
    _, bks = jax.lax.scan(one_group, None, dg_stacked)  # [n_groups, G, 2^w]
    bks = jax.tree.map(
        lambda a: a.reshape((n_groups * win_group,) + a.shape[2:]), bks
    )
    wins = agg_fn(bks, w)  # [n_win_padded] points

    # Horner MSB->LSB over the stacked window sums
    def horner(total, ws):
        total = jax.lax.fori_loop(0, w, lambda _, t: E.double(t), total)
        return E.add(total, ws), None

    total, _ = jax.lax.scan(
        horner, E.match_vma(E.identity(()), points), wins
    )
    return total


def msm_bitserial(points, scalars: jax.Array):
    """Simple MSB->LSB bit-serial MSM: 253 masked tree-sums.  O(253 N) adds
    but trivially correct; used for tiny N and as a test cross-check."""
    bits = E.scalars_to_bits(scalars, SCALAR_BITS)  # [N, 253]

    ident_n = E.match_vma(E.identity((scalars.shape[0],)), points)

    def body(acc, t):
        acc = E.double(acc)
        mask = bits[:, SCALAR_BITS - 1 - t] == 1
        sel = E.select(mask, points, ident_n)
        return E.add(acc, E.sum_points(sel)), None

    acc, _ = jax.lax.scan(
        body, E.match_vma(E.identity(()), points), jnp.arange(SCALAR_BITS)
    )
    return acc


def msm_shared_bases(points, scalar_matrix: jax.Array):
    """Batched MSM with shared bases: [cols] points, [rows, cols, L]
    scalars -> [rows] points (one MSM result per row).

    This is the Hyrax row-commitment shape (SURVEY.md §3.5 step 2: "sqrt-N
    row matrix of MSMs").  MSB-first bit-serial over a lax.scan — the
    graph is one small round body (double + masked tree reduction), so it
    compiles in seconds regardless of matrix size, and all rows process in
    the same batched kernel.
    """
    rows, cols = scalar_matrix.shape[0], scalar_matrix.shape[1]
    bits = E.scalars_to_bits(scalar_matrix, SCALAR_BITS)  # [rows, cols, 253]
    g_b = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (rows,) + a.shape), points
    )
    ident_rc = E.match_vma(E.identity((rows, cols)), points)

    def body(acc, t):
        acc = E.double(acc)
        mask = bits[:, :, SCALAR_BITS - 1 - t] == 1
        sel = E.select(mask, g_b, ident_rc)
        rowsum = E.sum_points(sel, axis=1)
        return E.add(acc, rowsum), None

    acc, _ = jax.lax.scan(
        body, E.match_vma(E.identity((rows,)), points), jnp.arange(SCALAR_BITS)
    )
    return acc


FIXED_BASE_WINDOW = 8


@functools.lru_cache(maxsize=None)
def _comb_build_jit(n_win: int, n_d: int, window: int):
    """Device comb-table builder: [G] generator points ->
    {coord: [G * n_win * n_d, L]} with T[j, win, d] = d * 2^(w*win) * G_j.

    lax.scan over windows; the body forms the n_d running multiples (n_d-1
    batched adds over all generators) and w batched doublings — ~1k
    batched point-ops total, milliseconds on device.  (The previous
    host-side build did G*n_win*n_d PURE-PYTHON point additions — ~60 s
    per process for the 512-generator Hyrax tables, profiled r03.)"""

    def build(pts):
        ident = E.match_vma(E.identity((pts["x"].shape[0],)), pts)

        def body(cur, _):
            # running multiples 0..n_d-1 of cur via an inner scan (ONE add
            # callsite: the unrolled variant compiled for minutes per
            # generator-count shape through the tunnel)
            def mult_body(acc, _):
                nxt = E.add(acc, cur)
                return nxt, acc

            _, mults = jax.lax.scan(
                mult_body, ident, None, length=n_d
            )  # [n_d, G, L]

            def dbl_body(_i, p):
                return E.double(p)

            cur_next = jax.lax.fori_loop(0, window, dbl_body, cur)
            return cur_next, mults

        _, wins = jax.lax.scan(body, pts, None, length=n_win)
        # [n_win, n_d, G, L] -> [G, n_win, n_d, L] -> [G*n_win*n_d, L]
        return jax.tree.map(
            lambda a: jnp.transpose(a, (2, 0, 1, 3)).reshape(
                -1, a.shape[-1]
            ),
            wins,
        )

    return jax.jit(build)


@functools.lru_cache(maxsize=None)
def fixed_base_tables(
    n_gens: int,
    label: bytes,
    window: int = FIXED_BASE_WINDOW,
    with_blind: bool = False,
):
    """Comb tables for FIXED generators: T[j, win, d] = d * 2^(w*win) * G_j.

    With the tables precomputed (ON DEVICE, cached per process), a
    commitment needs NO doublings — just one gather per (gen, window)
    digit and a balanced tree of batched adds.  ~w x fewer point ops than
    bit-serial and perfectly batched; the classic fixed-base comb method,
    laid out for TPU gathers.
    """
    import hashlib
    import os

    import numpy as np

    from ..spartan.commitments import gen_points_host

    n_win = -(-SCALAR_BITS // window)
    n_d = 1 << window

    # the tables are deterministic pure data: persist them as npz so the
    # (compile-heavy through the tunnel) device build runs once per VM,
    # not once per process — loading arrays beats loading executables.
    # v2 format (r05): PACKED AFFINE — one uint32 [T, 16] array, 64 B per
    # entry vs the 352 B extended-limb layout.  The r04 comb was
    # HBM-bandwidth-bound on its gathers; this is a 5.5x traffic cut.
    cache_dir = os.environ.get(
        "OTTI_JAX_CACHE",
        os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"),
    )
    key = hashlib.sha256(
        b"combtbl-v2|%d|%d|%d|%s" % (n_gens, window, with_blind, label)
    ).hexdigest()[:24]
    path = os.path.join(cache_dir, f"combtbl-{key}.npz")
    try:
        with np.load(path) as f:
            tbl = {"p": jnp.asarray(f["p"])}
        return tbl, n_win, n_d
    except Exception:
        pass

    gens, h = gen_points_host(n_gens, label)
    gens = list(gens) + ([h] if with_blind else [])
    with jax.ensure_compile_time_eval():
        pts = E.stack([E.from_ref(p) for p in gens])
        ext = _comb_build_jit(n_win, n_d, window)(pts)
        ext = jax.tree.map(lambda a: a.block_until_ready(), ext)
    # affine-normalize + pack in CHUNKS with the table slices as explicit
    # jit ARGUMENTS: a whole-table pack at w=8 (4M+ entries) allocates
    # ~10 full-size intermediates inside parallel_batch_inv and OOMs the
    # 16 GB HBM (r05 measured; and under ensure_compile_time_eval the
    # slices were captured as 13 GB of lowering constants)
    n_rows_tbl = ext["x"].shape[0]
    CH = 1 << 19
    pack_jit = jax.jit(E.to_affine_pack)
    parts = []
    for s in range(0, n_rows_tbl, CH):
        sl = jax.tree.map(lambda a: a[s : s + CH], ext)
        parts.append(np.asarray(pack_jit(sl)))
    packed = jnp.asarray(np.concatenate(parts, axis=0))
    tbl = {"p": packed}
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as fh:
            np.savez(fh, p=np.asarray(packed))
        os.replace(tmp, path)
    except Exception:
        pass
    return tbl, n_win, n_d


def _window_digits(scalars: jax.Array, window: int, n_win: int) -> jax.Array:
    """[..., L] limb scalars -> [..., n_win] int32 window digits (LSB win 0)."""
    bits = E.scalars_to_bits(scalars, n_win * window)  # [..., n_win*w]
    shaped = bits.reshape(bits.shape[:-1] + (n_win, window))
    weights = jnp.asarray([1 << t for t in range(window)], jnp.int32)
    return jnp.sum(shaped * weights, axis=-1)


def msm_fixed_base(
    n_gens: int,
    label: bytes,
    scalar_matrix: jax.Array,
    window: int = FIXED_BASE_WINDOW,
    with_blind: bool = False,
    tbl: dict | None = None,
):
    """Batched fixed-base MSM: [rows, cols, L] scalars over the comb tables
    of generators (cols <= n_gens [+1 blind col]) -> [rows] points.

    ``tbl``: pass the (traced) comb tables explicitly when calling from
    inside a jitted kernel — a closed-over concrete table is baked into
    the compiled program as a multi-MB constant, which multiplied TPU
    compile times ~2x and defeats executable reuse (measured r03)."""
    if tbl is None:
        tbl, _, _ = fixed_base_tables(n_gens, label, window, with_blind)
    n_win = -(-SCALAR_BITS // window)
    n_d = 1 << window
    rows, cols = scalar_matrix.shape[0], scalar_matrix.shape[1]
    digits = _window_digits(scalar_matrix, window, n_win)  # [rows, cols, n_win]
    gen_idx = jnp.arange(cols, dtype=jnp.int32)[None, :, None]
    if with_blind:  # the blind scalar is the LAST column -> generator H
        gen_idx = jnp.concatenate(
            [
                jnp.arange(cols - 1, dtype=jnp.int32),
                jnp.asarray([n_gens], jnp.int32),
            ]
        )[None, :, None]
    win_idx = jnp.arange(n_win, dtype=jnp.int32)[None, None, :]
    flat = (gen_idx * n_win + win_idx) * n_d + digits  # [rows, cols, n_win]
    flat = flat.reshape(rows, cols * n_win)
    gathered = E.from_affine_pack(tbl["p"][flat])  # 64 B/row gather
    if cols * n_win <= 2048:
        # small reduction (per-round sigma commitments): one-callsite
        # masked reduction keeps the compile graph tiny
        return E.sum_points_compact(gathered, axis=1)
    return E.sum_points(gathered, axis=1)


@functools.lru_cache(maxsize=None)
def msm_jit(n: int, window: int | None = None):
    """Cached jitted MSM for a fixed size n."""
    return jax.jit(lambda pts, sc: msm(pts, sc, window))
