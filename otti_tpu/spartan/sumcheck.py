"""Sumcheck prover/verifier (Spartan phases 1 & 2) — TPU kernels + host FS.

Reconstructs Spartan's ``sumcheck.rs`` role (SURVEY.md §3.5 steps 3-4):
  * phase 1: cubic  sum_x eq(tau,x) * (Az(x)*Bz(x) - Cz(x)) = 0
  * phase 2: quadratic sum_y M(y) * Z(y) = claim

Design: the per-round table folds and evaluation sums are batched device
kernels (cached per table size — sizes halve every round); the Fiat-Shamir
transcript is host-side (Merlin), with one device->host sync of 3 (or 2)
field elements per round — the "sequential transcript" boundary called out
in SURVEY.md §3.5/§7.4.  Claims and interpolation are exact host big-int
math (cheap, O(1) per round).

The round polynomial is sent as its evaluations at 0..degree; p(1) is
implied by p(0) + p(1) = claim, and the verifier recomputes next claims by
Lagrange interpolation, mirroring Spartan's compressed UniPoly encoding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..field import ops as F
from ..field.fields import SCALAR, int_to_limbs
from ..transcript.merlin import Transcript

MOD = SCALAR.modulus


def _to_dev(x: int) -> jax.Array:
    return jnp.asarray(int_to_limbs(x % MOD))


def _scalar_bytes(x: int) -> bytes:
    return (x % MOD).to_bytes(32, "little")


def lagrange_eval(evals: list, r: int) -> int:
    """Evaluate the degree-(len-1) poly with values ``evals`` at 0..d, at r."""
    d = len(evals) - 1
    total = 0
    for t in range(d + 1):
        num, den = 1, 1
        for s in range(d + 1):
            if s == t:
                continue
            num = num * ((r - s) % MOD) % MOD
            den = den * ((t - s) % MOD) % MOD
        total = (total + evals[t] * num % MOD * pow(den, MOD - 2, MOD)) % MOD
    return total


# ---------------------------------------------------------------------------
# Device kernels — fixed-shape, mask-active design: the tables keep their
# full padded size across all rounds and the active prefix length shrinks
# (a traced scalar), so each phase needs exactly ONE compiled kernel per
# instance size instead of one per round size.  ~2x redundant element work
# in exchange for O(log n) fewer XLA compilations — a large win both for
# XLA:CPU tests and for the remote-compile TPU path.
# ---------------------------------------------------------------------------

def _ext(tbl: jax.Array, t: int) -> jax.Array:
    """Evaluate each (lo, hi) pair at X = t: lo + t*(hi - lo) (static split;
    used by the single-shot paths, e.g. __graft_entry__)."""
    n2 = tbl.shape[0] // 2
    lo, hi = tbl[:n2], tbl[n2:]
    if t == 0:
        return lo
    d = F.sub(SCALAR, hi, lo)
    return F.add(SCALAR, lo, F.mul_small(SCALAR, d, t))


def _ext_masked(tbl: jax.Array, t: int, active_half: jax.Array) -> jax.Array:
    """lo/hi pair eval at X=t where lo = tbl[:ah], hi = tbl[ah:2ah] with a
    *traced* active length; lanes >= ah carry garbage (masked by caller)."""
    half = tbl.shape[0] // 2
    lo = tbl[:half]
    hi = jax.lax.dynamic_slice_in_dim(tbl, active_half, half, axis=0)
    if t == 0:
        return lo
    d = F.sub(SCALAR, hi, lo)
    return F.add(SCALAR, lo, F.mul_small(SCALAR, d, t))


def _cubic_evals(eq, pa, pb, pc, active_half):
    half = eq.shape[0] // 2
    mask = jnp.arange(half) < active_half
    outs = []
    for t in (0, 2, 3):
        eqt, at, bt, ct = (
            _ext_masked(x, t, active_half) for x in (eq, pa, pb, pc)
        )
        w = F.sub(SCALAR, F.mul(SCALAR, at, bt), ct)
        w = F.select(mask, w, jnp.zeros_like(w))
        outs.append(F.canon(SCALAR, F.dot(SCALAR, eqt, w)))
    return jnp.stack(outs)  # [3, L] — one transfer


def _quad_evals(pm, pz, active_half):
    half = pm.shape[0] // 2
    mask = jnp.arange(half) < active_half
    outs = []
    for t in (0, 2):
        mt = _ext_masked(pm, t, active_half)
        zt = _ext_masked(pz, t, active_half)
        zt = F.select(mask, zt, jnp.zeros_like(zt))
        outs.append(F.canon(SCALAR, F.dot(SCALAR, mt, zt)))
    return jnp.stack(outs)  # [2, L]


def _bind_tables(r, active_half, tables):
    out = []
    for tbl in tables:
        half = tbl.shape[0] // 2
        lo = tbl[:half]
        hi = jax.lax.dynamic_slice_in_dim(tbl, active_half, half, axis=0)
        # r is SHARED across the fold: MXU Toeplitz mul (F.mul_scalar)
        bound = F.add(SCALAR, lo, F.mul_scalar(SCALAR, F.sub(SCALAR, hi, lo), r))
        out.append(jax.lax.dynamic_update_slice_in_dim(tbl, bound, 0, axis=0))
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _round_cubic_kernel(n: int):
    return jax.jit(_cubic_evals)


@functools.lru_cache(maxsize=None)
def _round_quad_kernel(n: int):
    return jax.jit(_quad_evals)


@functools.lru_cache(maxsize=None)
def _step_cubic_kernel(n: int):
    """Fused bind(prev challenge) + next-round evals: ONE device call (and
    so ~one host<->device round trip) per sumcheck round — the transcript
    is the serialization point (SURVEY.md §3.5), so latency per round is
    what matters on the tunneled TPU."""

    @jax.jit
    def k(r_prev, prev_active_half, eq, pa, pb, pc):
        eq, pa, pb, pc = _bind_tables(r_prev, prev_active_half, (eq, pa, pb, pc))
        evals = _cubic_evals(eq, pa, pb, pc, prev_active_half // 2)
        return evals, (eq, pa, pb, pc)

    return k


@functools.lru_cache(maxsize=None)
def _step_quad_kernel(n: int):
    @jax.jit
    def k(r_prev, prev_active_half, pm, pz):
        pm, pz = _bind_tables(r_prev, prev_active_half, (pm, pz))
        evals = _quad_evals(pm, pz, prev_active_half // 2)
        return evals, (pm, pz)

    return k


# ---------------------------------------------------------------------------
# Generic custom-combination sumcheck (used by the SPARK layer): the round
# combination function is looked up in a registry by key so kernels stay
# lru-cacheable per (n, key, degree).
# ---------------------------------------------------------------------------

_COMB_REGISTRY: dict = {}


def register_comb(key: str, fn):
    """fn(consts: tuple[limb vectors], exts: tuple[[half, L] arrays]) ->
    [half, L] combined per-point values (degree <= ``degree`` per var)."""
    _COMB_REGISTRY[key] = fn


def _eval_points(degree: int):
    return (0,) + tuple(range(2, degree + 1))


@functools.lru_cache(maxsize=None)
def _custom_eval_kernel(n: int, key: str, degree: int, k_tables: int, k_consts: int):
    comb = _COMB_REGISTRY[key]
    half = n // 2

    @jax.jit
    def k(active_half, consts, *tables):
        mask = jnp.arange(half) < active_half
        outs = []
        for t in _eval_points(degree):
            exts = tuple(_ext_masked(tbl, t, active_half) for tbl in tables)
            vals = comb(consts, exts)
            vals = F.select(mask, vals, jnp.zeros_like(vals))
            outs.append(F.canon(SCALAR, F.sum_reduce(SCALAR, vals, axis=0)))
        return jnp.stack(outs)

    return k


@functools.lru_cache(maxsize=None)
def _custom_step_kernel(n: int, key: str, degree: int, k_tables: int, k_consts: int):
    comb = _COMB_REGISTRY[key]
    half = n // 2

    @jax.jit
    def k(r_prev, prev_active_half, consts, *tables):
        tables = _bind_tables(r_prev, prev_active_half, tables)
        ah = prev_active_half // 2
        mask = jnp.arange(half) < ah
        outs = []
        for t in _eval_points(degree):
            exts = tuple(_ext_masked(tbl, t, ah) for tbl in tables)
            vals = comb(consts, exts)
            vals = F.select(mask, vals, jnp.zeros_like(vals))
            outs.append(F.canon(SCALAR, F.sum_reduce(SCALAR, vals, axis=0)))
        return jnp.stack(outs), tables

    return k


def prove_custom(
    claim: int,
    tables: tuple,
    consts: tuple,
    key: str,
    degree: int,
    transcript: Transcript,
    label: bytes,
):
    """Host-driven sumcheck with a registered round combination.

    Wire format matches the standard rounds (evals at 0..degree with p(1)
    implied); returns (rounds, rs, final table values, final claim).
    """
    n = tables[0].shape[0]
    kt, kc = len(tables), len(consts)
    evalk = _custom_eval_kernel(n, key, degree, kt, kc)
    stepk = _custom_step_kernel(n, key, degree, kt, kc)
    bindk = _bind_kernel(n, kt)
    e = claim % MOD
    rounds, rs = [], []
    active = n
    evals_dev = evalk(jnp.int32(active // 2), consts, *tables)
    while active > 1:
        ev = _limbs_rows_to_ints(evals_dev)
        e0 = ev[0]
        e1 = (e - e0) % MOD
        evals = [e0, e1] + ev[1:]
        transcript.append_scalar(label + b"/e0", _scalar_bytes(e0))
        for j, v in enumerate(ev[1:]):
            transcript.append_scalar(
                label + b"/e%d" % (j + 2), _scalar_bytes(v)
            )
        r = transcript.challenge_scalar(label + b"/r")
        rounds.append(evals)
        rs.append(r)
        e = lagrange_eval(evals, r)
        if active > 2:
            evals_dev, tables = stepk(
                _to_dev(r), jnp.int32(active // 2), consts, *tables
            )
        else:
            tables = bindk(_to_dev(r), jnp.int32(active // 2), *tables)
        active //= 2
    finals = tuple(_limb_to_int(t[0]) for t in tables)
    return rounds, rs, finals, e


@functools.lru_cache(maxsize=None)
def _custom_seg_kernel(
    n: int, key: str, degree: int, label: bytes, rounds: int, final: bool
):
    """``rounds`` device-FS custom sumcheck rounds on size-n tables.

    Same masked fixed-shape design as the hybrid NIZK phase kernels
    (spartan/hybrid.py): the sponge rides the carry at the static
    post-challenge offsets, so every round of every segment shares ONE
    scan body; segments shrink the tables physically between kernels.
    Wire format is byte-identical to prove_custom's host loop."""
    from ..transcript.device import DeviceStrobe, DeviceTranscript
    from .fused import _POST_CHALLENGE

    comb = _COMB_REGISTRY[key]
    half = n // 2
    pts = _eval_points(degree)
    labels = [label + (b"/e%d" % p if p else b"/e0") for p in pts]

    @jax.jit
    def k(state, consts, *tables):
        def body(carry, _):
            state, ah, tables = carry
            mask = jnp.arange(half) < ah
            outs = []
            for tt in pts:
                exts = tuple(_ext_masked(tbl, tt, ah) for tbl in tables)
                vals = comb(consts, exts)
                vals = F.select(mask, vals, jnp.zeros_like(vals))
                outs.append(F.canon(SCALAR, F.sum_reduce(SCALAR, vals, axis=0)))
            evals = jnp.stack(outs)
            t = DeviceTranscript(
                _strobe=DeviceStrobe.from_state(state, *_POST_CHALLENGE)
            )
            for i, lbl in enumerate(labels):
                t.append_scalar_limbs(lbl, evals[i])
            r = t.challenge_scalar_limbs(label + b"/r")
            tables = _bind_tables(r, ah, tables)
            return (t.strobe.state, ah // 2, tables), evals

        carry = (state, jnp.int32(n // 2), tuple(tables))
        carry, evals = jax.lax.scan(body, carry, None, length=rounds)
        state, _, tables = carry
        if final:
            finals = jnp.stack([F.canon(SCALAR, t_[0]) for t_ in tables])
            return state, evals, finals
        return state, tables, evals

    return k


_CUSTOM_SEG = 8


def prove_custom_device(
    claim: int,
    tables: tuple,
    consts: tuple,
    key: str,
    degree: int,
    transcript: Transcript,
    label: bytes,
):
    """Device-FS variant of prove_custom: ALL rounds run in segmented
    device scans (device Merlin transcript) with ONE fetch at the end —
    zero per-round host round trips (VERDICT r04 next #4: the SPARK
    sumchecks were the last host-driven rounds in the stack).

    The host transcript must sit at the post-challenge offsets (true at
    every SPARK call site: each sumcheck follows a challenge_vector).
    After the fetch the host replays the rounds into ``transcript`` —
    byte-identical to the host loop, so verify_custom is unchanged."""
    from .hybrid import _check_handoff, _shrink_kernel

    n = tables[0].shape[0]
    mu = (n - 1).bit_length()
    state = _check_handoff(transcript.strobe)
    offs, cur_n = 0, n
    evals_parts = []
    finals_dev = None
    while True:
        rounds = min(_CUSTOM_SEG, mu - offs)
        final = offs + rounds >= mu
        out = _custom_seg_kernel(cur_n, key, degree, label, rounds, final)(
            state, consts, *tables
        )
        if final:
            state, evals, finals_dev = out
        else:
            state, tables, evals = out
        evals_parts.append(evals)
        offs += rounds
        if final:
            break
        next_n = max(cur_n >> rounds, 2)
        if next_n < cur_n:
            tables = _shrink_kernel(cur_n, next_n, len(tables))(*tables)
            cur_n = next_n
    evals_all = (
        evals_parts[0]
        if len(evals_parts) == 1
        else jnp.concatenate(evals_parts, axis=0)
    )
    evals_np, finals_np = jax.device_get((evals_all, finals_dev))

    # host replay: identical absorb/challenge stream as prove_custom
    e = claim % MOD
    rounds_out, rs = [], []
    for j in range(mu):
        ev = [_row_to_int(evals_np[j, i]) for i in range(evals_np.shape[1])]
        e0 = ev[0]
        e1 = (e - e0) % MOD
        evals = [e0, e1] + ev[1:]
        transcript.append_scalar(label + b"/e0", _scalar_bytes(e0))
        for jj, v in enumerate(ev[1:]):
            transcript.append_scalar(
                label + b"/e%d" % (jj + 2), _scalar_bytes(v)
            )
        r = transcript.challenge_scalar(label + b"/r")
        rounds_out.append(evals)
        rs.append(r)
        e = lagrange_eval(evals, r)
    finals = tuple(_row_to_int(row) for row in finals_np)
    return rounds_out, rs, finals, e


def _row_to_int(row) -> int:
    from ..field.fields import limbs_to_int

    return limbs_to_int(row) % MOD


def verify_custom(
    claim: int, round_polys: list, degree: int, transcript: Transcript, label: bytes
):
    """Replay; returns (final_claim, rs) or raises ValueError."""
    e = claim % MOD
    rs = []
    for evals in round_polys:
        if len(evals) != degree + 1:
            raise ValueError("sumcheck: wrong round poly size")
        e0 = evals[0]
        if evals[1] != (e - e0) % MOD:
            raise ValueError("sumcheck: p(0)+p(1) != claim")
        transcript.append_scalar(label + b"/e0", _scalar_bytes(e0))
        for j, v in enumerate(evals[2:]):
            transcript.append_scalar(label + b"/e%d" % (j + 2), _scalar_bytes(v))
        r = transcript.challenge_scalar(label + b"/r")
        rs.append(r)
        e = lagrange_eval(evals, r)
    return e, rs


@functools.lru_cache(maxsize=None)
def _bind_kernel(n: int, k_tables: int):
    half = n // 2

    @jax.jit
    def k(r, active_half, *tables):
        out = []
        for tbl in tables:
            lo = tbl[:half]
            hi = jax.lax.dynamic_slice_in_dim(tbl, active_half, half, axis=0)
            bound = F.add(
                SCALAR, lo, F.mul_scalar(SCALAR, F.sub(SCALAR, hi, lo), r)
            )
            out.append(jax.lax.dynamic_update_slice_in_dim(tbl, bound, 0, axis=0))
        return tuple(out)

    return k


def _limb_to_int(x) -> int:
    from ..field.fields import limbs_to_int
    import numpy as np

    return limbs_to_int(np.asarray(jax.device_get(x))) % MOD


def _limbs_rows_to_ints(x) -> list:
    """[k, L] canonical limb rows -> k ints, in ONE device transfer."""
    from ..field.fields import limbs_to_int
    import numpy as np

    arr = np.asarray(jax.device_get(x))
    return [limbs_to_int(row) % MOD for row in arr]


# ---------------------------------------------------------------------------
# Prover / verifier
# ---------------------------------------------------------------------------

def prove_cubic(claim: int, eq, pa, pb, pc, transcript: Transcript, label: bytes):
    """Phase-1 sumcheck.  Returns (round_evals, r_points, final_vals).

    round_evals: per round [p(0), p(1), p(2), p(3)] ints (p(1) implied on
    the wire but returned for tests); final_vals: (eq, Az, Bz, Cz) at r.
    """
    n = eq.shape[0]
    step = _step_cubic_kernel(n)
    binder = _bind_kernel(n, 4)
    rounds = []
    rs = []
    e = claim % MOD
    tables = (eq, pa, pb, pc)
    active = n
    evals_dev = _round_cubic_kernel(n)(*tables, jnp.int32(active // 2))
    while active > 1:
        ev = _limbs_rows_to_ints(evals_dev)
        e0, e2, e3 = ev
        e1 = (e - e0) % MOD
        transcript.append_scalar(label + b"/e0", _scalar_bytes(e0))
        transcript.append_scalar(label + b"/e2", _scalar_bytes(e2))
        transcript.append_scalar(label + b"/e3", _scalar_bytes(e3))
        r = transcript.challenge_scalar(label + b"/r")
        rs.append(r)
        rounds.append([e0, e1, e2, e3])
        e = lagrange_eval([e0, e1, e2, e3], r)
        if active > 2:
            evals_dev, tables = step(_to_dev(r), jnp.int32(active // 2), *tables)
        else:
            tables = binder(_to_dev(r), jnp.int32(active // 2), *tables)
        active //= 2
    finals = tuple(_limb_to_int(t[0]) for t in tables)
    return rounds, rs, finals, e


def prove_quad(claim: int, pm, pz, transcript: Transcript, label: bytes):
    """Phase-2 sumcheck.  Returns (round_evals, r_points, final_vals, e)."""
    n = pm.shape[0]
    step = _step_quad_kernel(n)
    binder = _bind_kernel(n, 2)
    rounds, rs = [], []
    e = claim % MOD
    tables = (pm, pz)
    active = n
    evals_dev = _round_quad_kernel(n)(*tables, jnp.int32(active // 2))
    while active > 1:
        e0, e2 = _limbs_rows_to_ints(evals_dev)
        e1 = (e - e0) % MOD
        transcript.append_scalar(label + b"/e0", _scalar_bytes(e0))
        transcript.append_scalar(label + b"/e2", _scalar_bytes(e2))
        r = transcript.challenge_scalar(label + b"/r")
        rs.append(r)
        rounds.append([e0, e1, e2])
        e = lagrange_eval([e0, e1, e2], r)
        if active > 2:
            evals_dev, tables = step(_to_dev(r), jnp.int32(active // 2), *tables)
        else:
            tables = binder(_to_dev(r), jnp.int32(active // 2), *tables)
        active //= 2
    finals = (_limb_to_int(tables[0][0]), _limb_to_int(tables[1][0]))
    return rounds, rs, finals, e


def verify_rounds(
    claim: int, round_polys: list, degree: int, transcript: Transcript, label: bytes
):
    """Replay the FS schedule; returns (final_claim, r_points) or raises."""
    e = claim % MOD
    rs = []
    for evals in round_polys:
        if degree == 3:
            e0, e2, e3 = evals[0], evals[2], evals[3]
            e1 = (e - e0) % MOD
            if evals[1] != e1:
                raise ValueError("sumcheck: p(0)+p(1) != claim")
            transcript.append_scalar(label + b"/e0", _scalar_bytes(e0))
            transcript.append_scalar(label + b"/e2", _scalar_bytes(e2))
            transcript.append_scalar(label + b"/e3", _scalar_bytes(e3))
        else:
            e0, e2 = evals[0], evals[2]
            e1 = (e - e0) % MOD
            if evals[1] != e1:
                raise ValueError("sumcheck: p(0)+p(1) != claim")
            transcript.append_scalar(label + b"/e0", _scalar_bytes(e0))
            transcript.append_scalar(label + b"/e2", _scalar_bytes(e2))
        r = transcript.challenge_scalar(label + b"/r")
        rs.append(r)
        e = lagrange_eval(evals, r)
    return e, rs
