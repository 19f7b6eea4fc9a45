"""Hybrid multi-dispatch device-FS Spartan provers (large-shape path).

The single-dispatch provers (fused.py / zkfused.py) compile the ENTIRE
argument into one XLA program per instance shape.  Through the axon
tunnel that compile is minutes even at 2^12 constraints, is never
disk-cached (the axon PJRT backend does not serialize executables), and
grows super-linearly with shape — which is why round 2 gated them to
<= 2^14 padded vars and full-suite instances fell back to the per-round
host-transcript prover at ~100 ms of tunnel latency PER SUMCHECK ROUND
(VERDICT r02 weak #4: modszk1 spent >95% of its 19.6 s prove in
transcript round trips).

This module decomposes the same device-Fiat-Shamir computation into a
handful of MEDIUM-GRAINED kernels, each cached by a shape key that
repeats across instances:

  * ``_phase1_kernel(n)``   — ALL mu = log2(n) rounds of sumcheck phase 1
    as one ``lax.scan`` (device transcript), plus the vA/vB/vC absorbs and
    the phase-2 challenges.  Keyed by the padded constraint count only.
  * ``_phase2_kernel(n)``   — all rounds of phase 2, keyed by num_z.
  * the existing matvec / eq-table / m-table / opening kernels, already
    keyed by their own shapes.

Because every inter-kernel dependency lives on device, the host enqueues
the whole chain WITHOUT blocking and pays exactly TWO transfers per
proof: the witness-commitment encodings (which it must absorb to derive
tau) and the final fetch of the round materials.  Sumcheck rounds cost
zero round trips, like the fused path — but the per-shape compile is one
small scan body, and instances sharing a padded size share every kernel.

Wire format: byte-identical to nizk.prove / zknizk.prove (asserted by
tests/test_hybrid.py); verification uses the standard verifiers.

Reference roles: Spartan NIZK prover structure per SURVEY.md §3.5; the
host/device boundary discipline of SURVEY.md §5.8.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..field import ops as F
from ..field.fields import SCALAR, ints_to_limbs, limbs_to_int
from ..transcript.device import DeviceStrobe, DeviceTranscript, export_host_strobe
from ..transcript.merlin import Transcript
from . import commitments, mle, r1cs, sumcheck
from .fused import _POST_CHALLENGE, _round_scan, assemble_plain_proof
from .nizk import GENS_LABEL, _hyrax_dims, _sb

MOD = SCALAR.modulus


def _sync_point(name, x):
    """Block on a stage's outputs, attributing its device time to a
    metric (enabled by OTTI_SYNC_METRICS=1; costs pipeline overlap).

    Forces completion by FETCHING one element: on the axon backend
    block_until_ready returns at enqueue-acknowledgement, not completion
    (r03 finding), so a real transfer is the only honest barrier."""
    from .. import metrics

    with metrics.timed(name):
        leaf = jax.tree.leaves(x)[0]
        jax.device_get(leaf.reshape(-1)[:1])
    return x


_PACK_I32 = jax.jit(lambda *xs: jnp.concatenate([x.reshape(-1) for x in xs]))
_PACK_U8 = jax.jit(lambda *xs: jnp.concatenate([x.reshape(-1) for x in xs]))


def _fetch_packed(int_arrs: list, u8_arrs: list):
    """Fetch many device arrays as TWO flat transfers.

    Through the axon tunnel each fetched LEAF costs a ~80 ms round trip
    regardless of size (r03: a 14-leaf fetch measured 1.13 s for ~300 KB),
    so the arrays are concatenated on device and split back on host."""
    packed_i = _PACK_I32(*int_arrs) if int_arrs else None
    packed_u = _PACK_U8(*u8_arrs) if u8_arrs else None
    flat_i, flat_u = jax.device_get((packed_i, packed_u))

    def unsplit(flat, arrs):
        outs = []
        off = 0
        for a in arrs:
            n = int(np.prod(a.shape))
            outs.append(np.asarray(flat[off : off + n]).reshape(a.shape))
            off += n
        return outs

    return (
        unsplit(flat_i, int_arrs) if int_arrs else [],
        unsplit(flat_u, u8_arrs) if u8_arrs else [],
    )


def _check_handoff(strobe):
    """The phase kernels resume the sponge at the static post-challenge
    offsets; assert the host transcript is exactly there."""
    st, pos, pos_begin, flags = export_host_strobe(strobe)
    assert (pos, pos_begin, flags) == _POST_CHALLENGE, (
        "host transcript not at the post-challenge offsets"
    )
    return jnp.asarray(st)


# ---------------------------------------------------------------------------
# Plain NIZK phase kernels (shape-keyed, shared across instances)
# ---------------------------------------------------------------------------


def _phase1_impl(n: int):
    """All log2(n) rounds of the cubic phase + vA/vB/vC absorbs + phase-2
    challenges, one dispatch.  carry-in state must be post-challenge."""
    mu = (n - 1).bit_length()

    def k(state, eq, az, bz, cz):
        carry = (state, jnp.int32(n // 2), (eq, az, bz, cz))
        carry, (rounds, rxs) = jax.lax.scan(
            _round_scan(b"sc1", 3), carry, None, length=mu
        )
        state1, _, tables = carry
        vA = F.canon(SCALAR, tables[1][0])
        vB = F.canon(SCALAR, tables[2][0])
        vC = F.canon(SCALAR, tables[3][0])
        t = DeviceTranscript(
            _strobe=DeviceStrobe.from_state(state1, *_POST_CHALLENGE)
        )
        t.append_scalar_limbs(b"vA", vA)
        t.append_scalar_limbs(b"vB", vB)
        t.append_scalar_limbs(b"vC", vC)
        r_a = t.challenge_scalar_limbs(b"challenge_Az")
        r_b = t.challenge_scalar_limbs(b"challenge_Bz")
        r_c = t.challenge_scalar_limbs(b"challenge_Cz")
        return (
            t.strobe.state,
            rounds,
            rxs,
            jnp.stack([vA, vB, vC]),
            jnp.stack([r_a, r_b, r_c]),
        )

    return k


@functools.lru_cache(maxsize=None)
def _phase1_kernel(n: int):
    return jax.jit(_phase1_impl(n))


@functools.lru_cache(maxsize=None)
def _phase1_batched(n: int):
    return jax.jit(jax.vmap(_phase1_impl(n)))


def _phase2_impl(n: int):
    mu = (n - 1).bit_length()

    def k(state, m_table, z):
        carry = (state, jnp.int32(n // 2), (m_table, z))
        carry, (rounds, rys) = jax.lax.scan(
            _round_scan(b"sc2", 2), carry, None, length=mu
        )
        return carry[0], rounds, rys

    return k


@functools.lru_cache(maxsize=None)
def _phase2_kernel(n: int):
    return jax.jit(_phase2_impl(n))


@functools.lru_cache(maxsize=None)
def _phase2_batched(n: int):
    return jax.jit(jax.vmap(_phase2_impl(n)))


def _opening_impl(num_vars: int, mu_rows: int, mu_cols: int):
    """Hyrax opening materials u = L^T W and claim_w = W(ry[1:])."""

    def k(z, rys):
        r_w = rys[1:]
        W = z[:num_vars].reshape(1 << mu_rows, 1 << mu_cols, -1)
        if mu_rows:
            eq_L = mle._eq_table_impl(r_w[:mu_rows])
        else:
            eq_L = F.ones(SCALAR, (1,))
        u = F.canon(
            SCALAR,
            F.sum_reduce(SCALAR, F.mul(SCALAR, eq_L[:, None, :], W), axis=0),
        )
        eq_w = mle._eq_table_impl(r_w)
        claim_w = F.canon(SCALAR, F.dot(SCALAR, eq_w, z[:num_vars]))
        return u, claim_w

    return k


@functools.lru_cache(maxsize=None)
def _opening_kernel(num_vars: int, mu_rows: int, mu_cols: int):
    return jax.jit(_opening_impl(num_vars, mu_rows, mu_cols))


@functools.lru_cache(maxsize=None)
def _opening_batched(num_vars: int, mu_rows: int, mu_cols: int):
    return jax.jit(jax.vmap(_opening_impl(num_vars, mu_rows, mu_cols)))


def prove(
    dev: r1cs.R1CSDevice,
    vars_ints: list,
    inputs_ints: list,
    proto: bytes = None,
):
    """Drop-in replacement for nizk.prove producing byte-identical proofs;
    ~2 host<->device transfers regardless of instance size."""
    from .. import metrics
    from . import nizk

    t = Transcript(proto or nizk.PROTO)
    t.append_message(b"R1CS", dev.digest)
    t.append_u64(b"num_inputs", len(inputs_ints))
    for x in inputs_ints:
        t.append_scalar(b"input", _sb(x))

    nvp = dev.num_vars
    metrics.add("constraints", dev.num_cons)
    metrics.add("msm_points", nvp)
    mu_rows, mu_cols = _hyrax_dims(nvp)
    mu_x = (dev.num_cons - 1).bit_length()
    vars_padded = list(vars_ints) + [0] * (nvp - len(vars_ints))

    # ---- commitment (device MSM) + its encodings (host sync #1) ------------
    W = nizk._dev_vec(vars_padded).reshape(1 << mu_rows, 1 << mu_cols, -1)
    with metrics.timed("commit"):
        comm_rows = commitments.commit_rows(W, [0] * (1 << mu_rows), GENS_LABEL)
        comm_enc = commitments.encode_points(comm_rows)
    # advance a scratch replica past the commitment to tau, leaving ``t``
    # pristine for assemble_plain_proof's replay
    t2 = _fork(t)
    for enc in comm_enc:
        t2.append_point(b"poly_commitment", enc)
    tau = t2.challenge_vector(b"challenge_tau", mu_x)

    # ---- enqueue the full device chain (no host syncs) ---------------------
    with metrics.timed("device_chain"):
        state = _check_handoff(t2.strobe)
        z = r1cs.assemble_z(
            nizk._dev_vec(vars_padded),
            nizk._dev_vec(inputs_ints) if inputs_ints else None,
            nvp,
        )
        eq_tau = mle.eq_table(nizk._dev_vec(tau))
        az, bz, cz = dev.matvecs(z)
        state1, rounds1, rxs, vabc, rabc = _phase1_kernel(dev.num_cons)(
            state, eq_tau, az, bz, cz
        )
        e_rx = mle.eq_table(rxs)
        m_table = dev.matvec_T_weighted((rabc[0], rabc[1], rabc[2]), e_rx)
        state2, rounds2, rys = _phase2_kernel(dev.num_z)(state1, m_table, z)
        u, claim_w = _opening_kernel(nvp, mu_rows, mu_cols)(z, rys)

        # ---- host sync #2: everything the proof needs ----------------------
        r1_np, vabc_np, r2_np, u_np, cw_np = jax.device_get(
            (rounds1, vabc, rounds2, u, claim_w)
        )
    metrics.add("sumcheck_rounds", mu_x)

    with metrics.timed("host_tail"):
        proof = assemble_plain_proof(
            t, comm_enc, r1_np, vabc_np, r2_np, u_np, cw_np,
            mu_x, mu_rows, mu_cols,
        )
    return proof


def _fork(t: Transcript) -> Transcript:
    """Independent copy of a host transcript (pure-Python strobe)."""
    from ..transcript.merlin import transcript_from_strobe_state

    st, pos, pos_begin, flags = export_host_strobe(t.strobe)
    return transcript_from_strobe_state(st.tobytes(), pos, pos_begin, flags)


# ---------------------------------------------------------------------------
# ZK hybrid prover (default CLI mode at full-suite shapes)
# ---------------------------------------------------------------------------


def _zk_phase1_impl(n: int):
    """All rounds of the ZK cubic phase + the inter-phase sigma section
    (claim commitments, product/eq1 proofs, phase-2 challenges).  The comb
    tables arrive as arguments (not baked constants)."""
    from .zkfused import _mid_zk, _zk_round_scan

    mu = (n - 1).bit_length()

    def k(
        state, tau, eq, az, bz, cz, sc1_blinds, abc_blinds, prod_blinds,
        eq1_a, tbl_sc1, tbl_mid,
    ):
        carry = (
            state,
            jnp.int32(n // 2),
            (eq, az, bz, cz),
            F.zeros(()),
            F.zeros(()),
        )
        carry, (sc1_encs, sc1_z, sc1_zdb, rxs) = jax.lax.scan(
            _zk_round_scan(b"sc1", 3, tbl_sc1), carry, sc1_blinds, length=mu
        )
        state1, _, tables1, e1, be1 = carry
        vA = F.canon(SCALAR, tables1[1][0])
        vB = F.canon(SCALAR, tables1[2][0])
        vC = F.canon(SCALAR, tables1[3][0])
        state_mid, mid_encs, mid_z, rabc, claim2, bclaim2 = _mid_zk(
            state1, tau, rxs, vA, vB, vC, abc_blinds, prod_blinds, eq1_a,
            e1, be1, tbl_mid,
        )
        return (
            state_mid,
            sc1_encs,
            sc1_z,
            sc1_zdb,
            rxs,
            mid_encs,
            mid_z,
            rabc,
            claim2,
            bclaim2,
        )

    return k


@functools.lru_cache(maxsize=None)
def _zk_phase1_kernel(n: int):
    return jax.jit(_zk_phase1_impl(n))


@functools.lru_cache(maxsize=None)
def _zk_phase1_batched(n: int):
    # comb tables (last two args) are shared across the batch
    return jax.jit(
        jax.vmap(_zk_phase1_impl(n), in_axes=(0,) * 10 + (None, None))
    )


def _zk_phase2_impl(n: int):
    from .zkfused import _zk_round_scan

    mu = (n - 1).bit_length()

    def k(state, m_table, z, claim2, bclaim2, sc2_blinds, tbl_sc2):
        carry = (state, jnp.int32(n // 2), (m_table, z), claim2, bclaim2)
        carry, (sc2_encs, sc2_z, sc2_zdb, rys) = jax.lax.scan(
            _zk_round_scan(b"sc2", 2, tbl_sc2), carry, sc2_blinds, length=mu
        )
        state2, _, _, e2, be2 = carry
        return (
            state2,
            sc2_encs,
            sc2_z,
            sc2_zdb,
            rys,
            F.canon(SCALAR, e2),
            F.canon(SCALAR, be2),
        )

    return k


@functools.lru_cache(maxsize=None)
def _zk_phase2_kernel(n: int):
    return jax.jit(_zk_phase2_impl(n))


@functools.lru_cache(maxsize=None)
def _zk_phase2_batched(n: int):
    return jax.jit(
        jax.vmap(_zk_phase2_impl(n), in_axes=(0,) * 6 + (None,))
    )


def _zk_opening_impl(num_vars: int, mu_rows: int, mu_cols: int):
    """u = L^T W, b_u = <L, row_blinds>, w_eval = W(ry[1:]), and
    v_m = r_a*ea + r_b*eb + r_c*ec (matrix evals passed in)."""

    def k(z, row_blinds, rys, eabc, rabc):
        r_w = rys[1:]
        W = z[:num_vars].reshape(1 << mu_rows, 1 << mu_cols, -1)
        if mu_rows:
            eq_L = mle._eq_table_impl(r_w[:mu_rows])
        else:
            eq_L = F.ones(SCALAR, (1,))
        u = F.canon(
            SCALAR,
            F.sum_reduce(SCALAR, F.mul(SCALAR, eq_L[:, None, :], W), axis=0),
        )
        b_u = F.canon(SCALAR, F.dot(SCALAR, eq_L, row_blinds))
        eq_w = mle._eq_table_impl(r_w)
        w_eval = F.canon(SCALAR, F.dot(SCALAR, eq_w, z[:num_vars]))
        v_m = F.canon(
            SCALAR,
            F.add(
                SCALAR,
                F.add(
                    SCALAR,
                    F.mul(SCALAR, rabc[0], eabc[0]),
                    F.mul(SCALAR, rabc[1], eabc[1]),
                ),
                F.mul(SCALAR, rabc[2], eabc[2]),
            ),
        )
        return u, jnp.stack([b_u, w_eval, v_m])

    return k


@functools.lru_cache(maxsize=None)
def _zk_opening_kernel(num_vars: int, mu_rows: int, mu_cols: int):
    return jax.jit(_zk_opening_impl(num_vars, mu_rows, mu_cols))


@functools.lru_cache(maxsize=None)
def _zk_opening_batched(num_vars: int, mu_rows: int, mu_cols: int):
    return jax.jit(jax.vmap(_zk_opening_impl(num_vars, mu_rows, mu_cols)))


# ---------------------------------------------------------------------------
# Segmented ZK phases: the masked fixed-shape round kernels do FULL-size
# folds every round (mu * n work instead of ~2n — ~100 ms/round at 2^17,
# r03 profile), so phases run in segments of SEG rounds with a physical
# table shrink between segments: work drops to ~SEG*n*(1+2^-SEG+...) while
# the segment kernels stay shared across instances (keyed by table size).
# ---------------------------------------------------------------------------

_SEG = 8


@functools.lru_cache(maxsize=None)
def _zk_seg_kernel(n: int, degree: int, label: bytes, rounds: int, final: bool):
    """``rounds`` ZK sumcheck rounds on size-n tables (device FS).

    ``final`` additionally emits the canonical finals the next section
    needs (vA/vB/vC for the cubic phase, canon(e)/canon(be) for the
    quadratic one) so no extra kernels touch the tables."""
    from .zkfused import _zk_round_scan

    @jax.jit
    def k(state, tables, blinds, tbl, e, be):
        carry = (state, jnp.int32(n // 2), tuple(tables), e, be)
        carry, (encs, z, zdb, rs) = jax.lax.scan(
            _zk_round_scan(label, degree, tbl), carry, blinds, length=rounds
        )
        state, _, tables, e, be = carry
        if final and degree == 3:
            vabc = jnp.stack(
                [F.canon(SCALAR, tables[i][0]) for i in (1, 2, 3)]
            )
            return state, e, be, encs, z, zdb, rs, vabc
        if final:
            return (
                state,
                F.canon(SCALAR, e),
                F.canon(SCALAR, be),
                encs, z, zdb, rs,
            )
        return state, tables, e, be, encs, z, zdb, rs

    return k


@functools.lru_cache(maxsize=None)
def _shrink_kernel(n_from: int, n_to: int, k_tables: int):
    @jax.jit
    def k(*tables):
        return tuple(t[:n_to] for t in tables)

    return k


def _zk_phase_segmented(state, tables, blinds, tbl, e, be, label, degree):
    """Chain segment kernels over a whole phase; the round stream is
    byte-identical to the monolithic phase scan (same blind order).

    Returns (state, e_fin, be_fin, encs, z, zdb, rs[, vabc]) with the
    finals canonicalized per _zk_seg_kernel(final=True)."""
    n = tables[0].shape[0]
    mu = (n - 1).bit_length()
    offs = 0
    cur_n = n
    encs_l, z_l, zdb_l, rs_l = [], [], [], []
    while True:
        rounds = min(_SEG, mu - offs)
        final = offs + rounds >= mu
        blinds_seg = jax.tree.map(
            lambda a: a[offs : offs + rounds], blinds
        )
        out = _zk_seg_kernel(cur_n, degree, label, rounds, final)(
            state, tables, blinds_seg, tbl, e, be
        )
        if final:
            state, e, be, encs, z, zdb, rs = out[0], out[1], out[2], out[3], out[4], out[5], out[6]
            vabc = out[7] if degree == 3 else None
        else:
            state, tables, e, be, encs, z, zdb, rs = out
        encs_l.append(encs)
        z_l.append(z)
        zdb_l.append(zdb)
        rs_l.append(rs)
        offs += rounds
        if final:
            break
        next_n = max(cur_n >> rounds, 2)
        if next_n < cur_n:
            tables = _shrink_kernel(cur_n, next_n, len(tables))(*tables)
            cur_n = next_n

    def cat(parts):
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)

    res = (state, e, be, cat(encs_l), cat(z_l), cat(zdb_l), cat(rs_l))
    return res + ((vabc,) if degree == 3 else ())


@functools.lru_cache(maxsize=None)
def _zk_seg_batched(n: int, degree: int, label: bytes, rounds: int, final: bool):
    """Batched (vmapped) variant of _zk_seg_kernel: B instances' sponge
    states/tables/blinds advance together; comb tables shared.  Used by
    spartan/batched.py — the monolithic vmapped phase kernels did mu*n
    masked work per instance, which at the hinf class (B=9, 2^17) made a
    batch take ~12x the sequential segmented prover (r04 measurement)."""
    from .zkfused import _zk_round_scan

    def one(state, tables, blinds, tbl, e, be):
        carry = (state, jnp.int32(n // 2), tuple(tables), e, be)
        carry, (encs, z, zdb, rs) = jax.lax.scan(
            _zk_round_scan(label, degree, tbl), carry, blinds, length=rounds
        )
        state, _, tables, e, be = carry
        if final and degree == 3:
            vabc = jnp.stack(
                [F.canon(SCALAR, tables[i][0]) for i in (1, 2, 3)]
            )
            return state, e, be, encs, z, zdb, rs, vabc
        if final:
            return (
                state,
                F.canon(SCALAR, e),
                F.canon(SCALAR, be),
                encs, z, zdb, rs,
            )
        return state, tables, e, be, encs, z, zdb, rs

    return jax.jit(jax.vmap(one, in_axes=(0, 0, 0, None, 0, 0)))


@functools.lru_cache(maxsize=None)
def _shrink_batched(n_to: int, k_tables: int):
    @jax.jit
    def k(*tables):
        return tuple(t[:, :n_to] for t in tables)

    return k


def _zk_phase_segmented_batched(
    states, tables, blinds, tbl, e, be, label, degree
):
    """Batched analogue of _zk_phase_segmented: tables [B, n, L]; blinds
    leaves [B, mu, ...]; per-instance round streams byte-identical to the
    monolithic batched scan (same blind order)."""
    n = tables[0].shape[1]
    mu = (n - 1).bit_length()
    offs = 0
    cur_n = n
    encs_l, z_l, zdb_l, rs_l = [], [], [], []
    while True:
        rounds = min(_SEG, mu - offs)
        final = offs + rounds >= mu
        blinds_seg = jax.tree.map(
            lambda a: a[:, offs : offs + rounds], blinds
        )
        out = _zk_seg_batched(cur_n, degree, label, rounds, final)(
            states, tables, blinds_seg, tbl, e, be
        )
        if final:
            states, e, be, encs, z, zdb, rs = out[:7]
            vabc = out[7] if degree == 3 else None
        else:
            states, tables, e, be, encs, z, zdb, rs = out
        encs_l.append(encs)
        z_l.append(z)
        zdb_l.append(zdb)
        rs_l.append(rs)
        offs += rounds
        if final:
            break
        next_n = max(cur_n >> rounds, 2)
        if next_n < cur_n:
            tables = _shrink_batched(next_n, len(tables))(*tables)
            cur_n = next_n

    def cat(parts):
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 1)

    res = (states, e, be, cat(encs_l), cat(z_l), cat(zdb_l), cat(rs_l))
    return res + ((vabc,) if degree == 3 else ())


@functools.lru_cache(maxsize=None)
def _zk_mid_batched(mu_x: int):
    """Batched inter-phase sigma section (comb tables shared)."""
    from .zkfused import _mid_zk

    @jax.jit
    def k(
        state1, tau, rxs, vabc, abc_blinds, prod_blinds, eq1_a, e1, be1,
        tbl_mid,
    ):
        def one(s, t, r, v, a, p, q, e, b):
            return _mid_zk(
                s, t, r, v[0], v[1], v[2], a, p, q, e, b, tbl_mid
            )

        return jax.vmap(one)(
            state1, tau, rxs, vabc, abc_blinds, prod_blinds, eq1_a, e1, be1
        )

    return k


@functools.lru_cache(maxsize=None)
def _zk_mid_kernel(mu_x: int):
    """Inter-phase sigma section as its own kernel, keyed by mu_x only —
    shared by every instance with the same phase-1 round count."""
    from .zkfused import _mid_zk

    @jax.jit
    def k(
        state1, tau, rxs, vabc, abc_blinds, prod_blinds, eq1_a, e1, be1,
        tbl_mid,
    ):
        return _mid_zk(
            state1, tau, rxs, vabc[0], vabc[1], vabc[2], abc_blinds,
            prod_blinds, eq1_a, e1, be1, tbl_mid,
        )

    return k


def prove_zk(
    dev: r1cs.R1CSDevice,
    vars_ints: list,
    inputs_ints: list,
    seed: bytes | None = None,
):
    """Drop-in replacement for zknizk.prove (same seed -> byte-identical
    proof); ~2 host<->device transfers regardless of instance size."""
    from .. import metrics
    from . import nizk
    from .pedersen_host import BlindSource
    from .zkfused import _devs, assemble_zk_proof
    from .zknizk import PROTO as ZK_PROTO

    rng = BlindSource(seed or os.urandom(32))
    nvp = dev.num_vars
    mu_rows, mu_cols = _hyrax_dims(nvp)
    mu_x = (dev.num_cons - 1).bit_length()
    mu_y = (dev.num_z - 1).bit_length()

    # draw every blind in zknizk.prove's exact order
    row_blinds = rng.scalars(1 << mu_rows)

    def sc_draws(n_rounds, degree):
        bp, bn, dd, rd, rb = [], [], [], [], []
        for _ in range(n_rounds):
            bp.append(rng.scalar())
            bn.append(rng.scalar())
            dd.append(rng.scalars(degree + 1))
            rd.append(rng.scalar())
            rb.append(rng.scalar())
        return (
            _devs(bp),
            _devs(bn),
            jnp.asarray([ints_to_limbs(d) for d in dd]),
            _devs(rd),
            _devs(rb),
        )

    sc1_blinds = sc_draws(mu_x, 3)
    abc = rng.scalars(3) + [rng.scalar()]  # bA, bB, bC, b_ab
    prod = rng.scalars(5)
    eq1_a = rng.scalar()
    sc2_blinds = sc_draws(mu_y, 2)
    # opening/eq2 blinds are drawn inside the shared host tail

    t = Transcript(ZK_PROTO)
    t.append_message(b"R1CS", dev.digest)
    t.append_u64(b"num_inputs", len(inputs_ints))
    for x in inputs_ints:
        t.append_scalar(b"input", _sb(x))

    metrics.add("constraints", dev.num_cons)
    metrics.add("msm_points", nvp)
    vars_padded = list(vars_ints) + [0] * (nvp - len(vars_ints))

    # ---- blinded commitment + encodings (host sync #1) ---------------------
    W = nizk._dev_vec(vars_padded).reshape(1 << mu_rows, 1 << mu_cols, -1)
    with metrics.timed("commit"):
        comm_rows = commitments.commit_rows(W, row_blinds, GENS_LABEL)
        comm_enc = commitments.encode_points(comm_rows)
    for enc in comm_enc:
        t.append_point(b"poly_commitment", enc)
    tau = t.challenge_vector(b"challenge_tau", mu_x)

    # ---- enqueue the full device chain (no host syncs) ---------------------
    # OTTI_SYNC_METRICS=1 blocks after every stage so the per-stage
    # metrics attribute device time to the kernel that spent it
    sync = _sync_point if os.environ.get("OTTI_SYNC_METRICS") else (
        lambda name, x: x
    )
    with metrics.timed("device_chain"):
        state = _check_handoff(t.strobe)
        z = r1cs.assemble_z(
            nizk._dev_vec(vars_padded),
            nizk._dev_vec(inputs_ints) if inputs_ints else None,
            nvp,
        )
        tau_dev = nizk._dev_vec(tau)
        eq_tau = mle.eq_table(tau_dev)
        az, bz, cz = sync("matvecs", dev.matvecs(z))
        from .zkfused import _mid_tables, _round_tables

        mu_x = (dev.num_cons - 1).bit_length()
        (
            state1, e1, be1, sc1_encs, sc1_z, sc1_zdb, rxs, vabc,
        ) = sync(
            "zk_phase1",
            _zk_phase_segmented(
                state, (eq_tau, az, bz, cz), sc1_blinds, _round_tables(3),
                F.zeros(()), F.zeros(()), b"sc1", 3,
            ),
        )
        state_mid, mid_encs, mid_z, rabc, claim2, bclaim2 = sync(
            "zk_mid",
            _zk_mid_kernel(mu_x)(
                state1, tau_dev, rxs, vabc, _devs(abc), _devs(prod),
                jnp.asarray(ints_to_limbs([eq1_a]))[0], e1, be1,
                _mid_tables(),
            ),
        )
        e_rx = mle.eq_table(rxs)
        m_table = sync(
            "m_table",
            dev.matvec_T_weighted((rabc[0], rabc[1], rabc[2]), e_rx),
        )
        state2, e2, be2, sc2_encs, sc2_z, sc2_zdb, rys = sync(
            "zk_phase2",
            _zk_phase_segmented(
                state_mid, (m_table, z), sc2_blinds, _round_tables(2),
                claim2, bclaim2, b"sc2", 2,
            ),
        )
        e_ry = mle.eq_table(rys)
        eabc = sync("eval_at", jnp.stack(dev.eval_at(e_rx, e_ry)))
        u, buwv = sync(
            "opening",
            _zk_opening_kernel(nvp, mu_rows, mu_cols)(
                z, _devs(row_blinds), rys, eabc, rabc
            ),
        )

        # ---- host sync #2: TWO packed transfers ----------------------------
        with metrics.timed("fetch"):
            ints, u8s = _fetch_packed(
                [sc1_z, sc1_zdb, mid_z, sc2_z, sc2_zdb, u, buwv, rys, e2, be2],
                [state2, sc1_encs, mid_encs, sc2_encs],
            )
            (
                sc1_z, sc1_zdb, mid_z, sc2_z, sc2_zdb, u_np, buwv_np,
                rys_np, e2_np, be2_np,
            ) = ints
            state2_np, sc1_encs, mid_encs, sc2_encs = u8s
    metrics.add("sumcheck_rounds", mu_x)

    with metrics.timed("host_tail"):
        tail_vals = np.stack(
            [buwv_np[0], buwv_np[1], buwv_np[2], e2_np, be2_np]
        )
        proof = assemble_zk_proof(
            dev, rng, comm_enc, state2_np,
            sc1_encs, sc1_z, sc1_zdb, mid_encs, mid_z,
            sc2_encs, sc2_z, sc2_zdb, u_np, tail_vals, rys_np,
        )
    return proof
