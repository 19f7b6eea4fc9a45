"""Multi-chip single-dispatch Spartan prover (shard_map + device transcript).

Combines the two headline designs into one program (SURVEY.md §2.3, §5.7):
the fused device-resident-transcript prover (spartan/fused.py) sharded
over a ``jax.sharding.Mesh`` "sp" axis, so N chips execute the WHOLE
prover — commitment MSM, both sumcheck phases, opening — in one XLA
dispatch with one psum of 2-3 scalars per sumcheck round riding ICI.

Cyclic layout makes MSB-first binding shard-local
-------------------------------------------------
Spartan binds the top (MSB) variable each round: pairs (i, i + n/2).  A
block distribution would put the pair halves on different chips every
round.  Instead elements are laid out cyclically: logical index
i = j*k + s lives on shard s = i mod k at local slot j = i div k.  Then
i and i + n/2 share s (k | n/2), so every fold is local, and the bound
table inherits the cyclic layout.  The eq/Az/Bz/Cz tables are *produced*
directly in cyclic layout:

  * eq:  i's low log2(k) bits are exactly s, so the local table is the
    eq-table of the high mu-log2(k) variables times a per-shard scalar
    computed from axis_index bits;
  * Az/Bz/Cz: the COO nonzeros are pre-partitioned by row mod k (phase 1)
    and col mod k (phase 2) on the host, so each shard's segment-sum
    lands in its cyclic slice with NO communication.

Once a phase's local table reaches one element, the k survivors are
all_gather'ed (k field elements — trivial) and the last log2(k) rounds
run replicated.  Round evaluations are psum'ed partial dot products, so
every absorbed byte — and therefore every challenge and the final proof —
is IDENTICAL to the single-chip fused prover (tests/test_fused_sharded.py).

The per-round communication is one psum of 3 (or 2) field scalars: the
ring/Ulysses-style decomposition of the 2^mu hypercube promised in
SURVEY.md §5.7, with the transcript replicated on every chip instead of
serializing on the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..curve import ristretto
from ..field import ops as F
from ..field.fields import SCALAR, ints_to_limbs
from ..spartan import commitments, mle, nizk, r1cs, sumcheck
from ..spartan.fused import _POST_CHALLENGE, _ints
from ..transcript.device import DeviceStrobe, DeviceTranscript, export_host_strobe
from ..transcript.merlin import Transcript

MOD = SCALAR.modulus


# ---------------------------------------------------------------------------
# Host-side R1CS re-partitioning (cyclic by row / by col)
# ---------------------------------------------------------------------------

_PART_CACHE: dict = {}


def partition_r1cs(dev: r1cs.R1CSDevice, k: int):
    """Two COO copies per matrix: grouped by row mod k (phase-1 matvec)
    and col mod k (phase-2 transpose matvec), each shard's segment padded
    to a common length with zero-value entries.  Returns flat arrays
    shaped [k*m] / [k*m, L] for shard_map in_specs P("sp")."""
    key = (dev.digest, k)
    if key in _PART_CACHE:
        return _PART_CACHE[key]

    def _group(rows, cols, vals, by_col: bool):
        rows = np.asarray(rows)
        cols = np.asarray(cols)
        vals = np.asarray(vals)
        keyv = cols if by_col else rows
        m = 0
        groups = []
        for s in range(k):
            idx = np.nonzero(keyv % k == s)[0]
            groups.append(idx)
            m = max(m, len(idx))
        m = max(m, 1)
        R = np.zeros((k, m), np.int32)
        C = np.zeros((k, m), np.int32)
        V = np.zeros((k, m, vals.shape[-1]), np.int32)
        for s, idx in enumerate(groups):
            R[s, : len(idx)] = rows[idx] // k if not by_col else rows[idx]
            C[s, : len(idx)] = cols[idx] if not by_col else cols[idx] // k
            V[s, : len(idx)] = vals[idx]
        return (
            jnp.asarray(R.reshape(-1)),
            jnp.asarray(C.reshape(-1)),
            jnp.asarray(V.reshape(k * m, -1)),
        )

    by_row, by_col = [], []
    for rows, cols, vals in dev.mats:
        by_row.append(_group(rows, cols, vals, False))
        by_col.append(_group(rows, cols, vals, True))
    out = (tuple(by_row), tuple(by_col))
    _PART_CACHE[key] = out
    return out


# ---------------------------------------------------------------------------
# In-kernel helpers (run inside shard_map)
# ---------------------------------------------------------------------------

def _psum_canon(x):
    """Canonical field value of a psum of semi-form local partials."""
    return F.canon(SCALAR, F.reduce_wide(SCALAR, jax.lax.psum(x, "sp")))


def _eq_shard_factor(tau_low, log_k: int):
    """prod over low vars of (tau_v if bit else 1-tau_v) for this shard."""
    s = jax.lax.axis_index("sp")
    acc = F.ones(SCALAR)
    for b in range(log_k):
        # variable order: tau_low[v] binds bit (log_k-1-v) of s
        bit = (s >> (log_k - 1 - b)) & 1
        tv = tau_low[b]
        acc = F.mul(
            SCALAR,
            acc,
            F.select(bit == 1, tv, F.sub(SCALAR, F.ones(SCALAR), tv)),
        )
    return acc


def _local_evals_raw(tables, ah, pts):
    """Per-point local partial dots (semi form, pre-psum)."""
    half = tables[0].shape[0] // 2
    mask = jnp.arange(half) < ah
    outs = []
    for t in pts:
        exts = [sumcheck._ext_masked(x, t, ah) for x in tables]
        if len(tables) == 4:
            eqt, at, bt, ct = exts
            w = F.sub(SCALAR, F.mul(SCALAR, at, bt), ct)
            w = F.select(mask, w, jnp.zeros_like(w))
            outs.append(F.dot(SCALAR, eqt, w))
        else:
            mt, zt = exts
            zt = F.select(mask, zt, jnp.zeros_like(zt))
            outs.append(F.dot(SCALAR, mt, zt))
    return outs


def _sharded_phase(state, tables, n_local: int, log_k: int, label, degree):
    """All mu rounds of one phase: scan over the shard-local rounds, then
    all_gather + replicated tail.  Returns (state, final replicated
    tables, stacked eval rows [mu, deg, L], stacked challenges [mu, L])."""
    pts = (0, 2, 3) if degree == 3 else (0, 2)
    labels = [label + b"/e%d" % p for p in pts]
    local_rounds = max(n_local.bit_length() - 1, 0)  # log2(n_local)

    def body(carry, _):
        st, ah, tbls = carry
        raw = _local_evals_raw(tbls, ah, pts)
        evals = jnp.stack([_psum_canon(x) for x in raw])
        t = DeviceTranscript(_strobe=DeviceStrobe.from_state(st, *_POST_CHALLENGE))
        for i, lbl in enumerate(labels):
            t.append_scalar_limbs(lbl, evals[i])
        r = t.challenge_scalar_limbs(label + b"/r")
        tbls = sumcheck._bind_tables(r, ah, tbls)
        return (t.strobe.state, ah // 2, tbls), (evals, r)

    carry = (state, jnp.int32(n_local // 2), tuple(tables))
    (state, _, tables), (rounds_l, rs_l) = jax.lax.scan(
        body, carry, None, length=local_rounds
    )

    # gather the k survivors (cyclic layout => shard s holds logical s)
    gathered = [
        jax.lax.all_gather(tbl[0], "sp", tiled=False) for tbl in tables
    ]
    rounds_t, rs_t = [], []
    for _ in range(log_k):
        evals = []
        for t_pt in pts:
            exts = [sumcheck._ext(x, t_pt) for x in gathered]
            if degree == 3:
                eqt, at, bt, ct = exts
                w = F.sub(SCALAR, F.mul(SCALAR, at, bt), ct)
                evals.append(F.canon(SCALAR, F.dot(SCALAR, eqt, w)))
            else:
                mt, zt = exts
                evals.append(F.canon(SCALAR, F.dot(SCALAR, mt, zt)))
        t = DeviceTranscript(
            _strobe=DeviceStrobe.from_state(state, *_POST_CHALLENGE)
        )
        for i, lbl in enumerate(labels):
            t.append_scalar_limbs(lbl, evals[i])
        r = t.challenge_scalar_limbs(label + b"/r")
        state = t.strobe.state
        gathered = [mle.bind_top(x, r) for x in gathered]
        rounds_t.append(jnp.stack(evals))
        rs_t.append(r)

    rounds = jnp.concatenate(
        [rounds_l] + ([jnp.stack(rounds_t)] if rounds_t else []), axis=0
    )
    rs = jnp.concatenate([rs_l] + ([jnp.stack(rs_t)] if rs_t else []), axis=0)
    return state, gathered, rounds, rs


# ---------------------------------------------------------------------------
# The fused sharded prover core
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _core(
    num_cons: int,
    num_z: int,
    num_vars: int,
    mu_rows: int,
    mu_cols: int,
    handoff: tuple,
    k: int,
    mesh_devs: tuple,
):
    mesh = Mesh(np.asarray(jax.devices())[list(mesh_devs)].reshape(k), ("sp",))
    mu_x = (num_cons - 1).bit_length()
    log_k = k.bit_length() - 1
    nl1 = num_cons // k
    nl2 = num_z // k
    assert nl1 >= 1 and nl2 >= 2, "instance too small for this mesh"
    n_rows = 1 << mu_rows
    rows_local = max(n_rows // k, 1)

    def kernel(state, z, tbl_commit, row_parts, col_parts):
        s = jax.lax.axis_index("sp")

        # ---- commitment: block-sharded Hyrax rows ---------------------------
        W = z[:num_vars].reshape(n_rows, 1 << mu_cols, -1)
        if n_rows >= k:
            W_loc = jax.lax.dynamic_slice_in_dim(W, s * rows_local, rows_local, 0)
            comm = commitments.commit_rows(
                W_loc, [0] * rows_local, nizk.GENS_LABEL, tbl=tbl_commit
            )
            enc_loc = ristretto.encode(comm)  # [rows_local, 32]
            enc = jax.lax.all_gather(enc_loc, "sp", tiled=True)  # [n_rows, 32]
        else:
            comm = commitments.commit_rows(
                W, [0] * n_rows, nizk.GENS_LABEL, tbl=tbl_commit
            )
            enc = ristretto.encode(comm)

        t = DeviceTranscript(_strobe=DeviceStrobe.from_state(state, *handoff))
        for i in range(n_rows):
            t.append_message(b"poly_commitment", enc[i])

        # ---- phase 1 --------------------------------------------------------
        tau = t.challenge_vector_limbs(b"challenge_tau", mu_x)
        eq_hi = mle._eq_table_impl(tau[: mu_x - log_k]) if mu_x > log_k else F.ones(
            SCALAR, (1,)
        )
        eq_loc = F.mul(
            SCALAR, eq_hi, _eq_shard_factor(tau[mu_x - log_k :], log_k)[None, :]
        )

        azbzcz = []
        for rows_l, cols_l, vals_l in row_parts:
            prods = F.mul(SCALAR, vals_l, z[cols_l])
            acc = jax.ops.segment_sum(prods, rows_l, num_segments=nl1)
            azbzcz.append(F.reduce_wide(SCALAR, acc))
        az, bz, cz = azbzcz

        state1, tbl1, rounds1, rxs = _sharded_phase(
            t.strobe.state, (eq_loc, az, bz, cz), nl1, log_k, b"sc1", 3
        )
        vA = F.canon(SCALAR, tbl1[1][0])
        vB = F.canon(SCALAR, tbl1[2][0])
        vC = F.canon(SCALAR, tbl1[3][0])

        t = DeviceTranscript(
            _strobe=DeviceStrobe.from_state(state1, *_POST_CHALLENGE)
        )
        t.append_scalar_limbs(b"vA", vA)
        t.append_scalar_limbs(b"vB", vB)
        t.append_scalar_limbs(b"vC", vC)

        # ---- phase 2 --------------------------------------------------------
        r_a = t.challenge_scalar_limbs(b"challenge_Az")
        r_b = t.challenge_scalar_limbs(b"challenge_Bz")
        r_c = t.challenge_scalar_limbs(b"challenge_Cz")
        e_rx = mle._eq_table_impl(rxs)  # replicated [num_cons, L]
        weights = (r_a, r_b, r_c)
        m_loc = None
        for w_m, (rows_l, cols_l, vals_l) in zip(weights, col_parts):
            prods = F.mul(
                SCALAR, F.mul(SCALAR, vals_l, e_rx[rows_l]), w_m[None, :]
            )
            part = jax.ops.segment_sum(prods, cols_l, num_segments=nl2)
            part = F.reduce_wide(SCALAR, part)
            m_loc = part if m_loc is None else F.add(SCALAR, m_loc, part)

        z_loc = z[jnp.arange(nl2) * k + s]  # cyclic slice of replicated z
        state2, _, rounds2, rys = _sharded_phase(
            t.strobe.state, (m_loc, z_loc), nl2, log_k, b"sc2", 2
        )

        # ---- opening materials (replicated; O(num_vars) work per chip);
        # the log-sized bullet argument runs on the host tail ----------------
        r_w = rys[1:]
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

        return enc, rounds1, jnp.stack([vA, vB, vC]), rounds2, u, claim_w

    part_spec = (P("sp"), P("sp"), P("sp", None))
    fn = jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(), P(None, None), P(), (part_spec,) * 3, (part_spec,) * 3),
        out_specs=(P(), P(None, None, None), P(None, None), P(None, None, None), P(None, None), P(None)),
        check_vma=False,
    )
    return jax.jit(fn), mesh


def prove(
    dev: r1cs.R1CSDevice,
    vars_ints: list,
    inputs_ints: list,
    k: int = None,
    proto: bytes = nizk.PROTO,
) -> nizk.NIZKProof:
    """Multi-chip fused prover: byte-identical to spartan.fused.prove."""
    k = k or len(jax.devices())
    t = Transcript(proto)
    t.append_message(b"R1CS", dev.digest)
    t.append_u64(b"num_inputs", len(inputs_ints))
    for x in inputs_ints:
        t.append_scalar(b"input", nizk._sb(x))

    nvp = dev.num_vars
    mu_rows, mu_cols = nizk._hyrax_dims(nvp)
    vars_padded = list(vars_ints) + [0] * (nvp - len(vars_ints))
    st_np, pos, pos_begin, cur_flags = export_host_strobe(t.strobe)
    z = r1cs.assemble_z(
        nizk._dev_vec(vars_padded),
        nizk._dev_vec(inputs_ints) if inputs_ints else None,
        nvp,
    )
    row_parts, col_parts = partition_r1cs(dev, k)
    core, mesh = _core(
        dev.num_cons,
        dev.num_z,
        nvp,
        mu_rows,
        mu_cols,
        (pos, pos_begin, cur_flags),
        k,
        tuple(range(k)),
    )
    from ..msm import pippenger as _pip

    tbl_commit = _pip.fixed_base_tables(
        1 << mu_cols, nizk.GENS_LABEL, _pip.FIXED_BASE_WINDOW, False
    )[0]
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else _null():
        out = core(jnp.asarray(st_np), z, tbl_commit, row_parts, col_parts)
        enc_np, r1_np, vabc_np, r2_np, u_np, cw_np = jax.device_get(out)

    # ---- host transcript replay / proof assembly (shared with fused) -------
    from ..spartan.fused import assemble_plain_proof

    mu_x = (dev.num_cons - 1).bit_length()
    comm_enc = [bytes(row.tobytes()) for row in np.asarray(enc_np)]
    return assemble_plain_proof(
        t, comm_enc, r1_np, vabc_np, r2_np, u_np, cw_np, mu_x, mu_rows, mu_cols
    )


import contextlib


@contextlib.contextmanager
def _null():
    yield


# ---------------------------------------------------------------------------
# Sharded ZERO-KNOWLEDGE prover (VERDICT r02 next #4: "extend multi-chip to
# zk" — the CLI's default mode).  Same cyclic hypercube layout as the plain
# prover; each round's evals are psum'ed partial dots and the round's sigma
# logic (commitments, dot-product proof, transcript) runs REPLICATED on
# every chip from identical psum'ed values + replicated blinds, so all
# absorbed bytes — and the proof — are byte-identical to zknizk.prove with
# the same seed (tests/test_fused_sharded.py::test_zk_sharded_*).
# ---------------------------------------------------------------------------


def _sharded_zk_phase(
    state, tables, n_local: int, log_k: int, label, degree, blinds, tbl,
    e0, be0,
):
    """All mu rounds of one ZK phase: shard-local scan rounds (psum evals,
    replicated sigma math), then all_gather + replicated tail rounds.

    Returns (state, gathered tables, encs [mu,4,32], z [mu,deg+1,L],
    zdb [mu,2,L], rs [mu,L], e_final, be_final)."""
    from ..spartan.zkfused import _zk_round_from_evals

    pts = (0, 2, 3) if degree == 3 else (0, 2)
    local_rounds = max(n_local.bit_length() - 1, 0)

    def body(carry, xs):
        st, ah, tbls, e, be = carry
        raw = _local_evals_raw(tbls, ah, pts)
        evs = jnp.stack([_psum_canon(x) for x in raw])
        st, e_next, b_next, r, encs, zz, zdb = _zk_round_from_evals(
            label, degree, tbl, st, e, be, evs, xs
        )
        tbls = sumcheck._bind_tables(r, ah, tbls)
        return (st, ah // 2, tbls, e_next, b_next), (encs, zz, zdb, r)

    blinds_local = jax.tree.map(lambda a: a[:local_rounds], blinds)
    carry = (state, jnp.int32(n_local // 2), tuple(tables), e0, be0)
    (state, _, tables, e, be), (encs_l, z_l, zdb_l, rs_l) = jax.lax.scan(
        body, carry, blinds_local, length=local_rounds
    )

    gathered = [
        jax.lax.all_gather(tbl_[0], "sp", tiled=False) for tbl_ in tables
    ]
    encs_t, z_t, zdb_t, rs_t = [], [], [], []
    for j in range(log_k):
        xs_j = jax.tree.map(lambda a: a[local_rounds + j], blinds)
        evals = []
        for t_pt in pts:
            exts = [sumcheck._ext(x, t_pt) for x in gathered]
            if degree == 3:
                eqt, at, bt, ct = exts
                w = F.sub(SCALAR, F.mul(SCALAR, at, bt), ct)
                evals.append(F.canon(SCALAR, F.dot(SCALAR, eqt, w)))
            else:
                mt, zt = exts
                evals.append(F.canon(SCALAR, F.dot(SCALAR, mt, zt)))
        state, e, be, r, encs, zz, zdb = _zk_round_from_evals(
            label, degree, tbl, state, e, be, jnp.stack(evals), xs_j
        )
        gathered = [mle.bind_top(x, r) for x in gathered]
        encs_t.append(encs)
        z_t.append(zz)
        zdb_t.append(zdb)
        rs_t.append(r)

    def cat(lead, tail):
        return jnp.concatenate(
            [lead] + ([jnp.stack(tail)] if tail else []), axis=0
        )

    return (
        state,
        gathered,
        cat(encs_l, encs_t),
        cat(z_l, z_t),
        cat(zdb_l, zdb_t),
        cat(rs_l, rs_t),
        e,
        be,
    )


@functools.lru_cache(maxsize=None)
def _zk_core(
    num_cons: int,
    num_z: int,
    num_vars: int,
    mu_rows: int,
    mu_cols: int,
    handoff: tuple,
    k: int,
    mesh_devs: tuple,
):
    from ..spartan import zkfused

    mesh = Mesh(np.asarray(jax.devices())[list(mesh_devs)].reshape(k), ("sp",))
    mu_x = (num_cons - 1).bit_length()
    log_k = k.bit_length() - 1
    nl1 = num_cons // k
    nl2 = num_z // k
    assert nl1 >= 1 and nl2 >= 2, "instance too small for this mesh"
    n_rows = 1 << mu_rows
    rows_local = max(n_rows // k, 1)

    def kernel(
        state, z, row_blinds, sc1_blinds, abc_blinds, prod_blinds, eq1_a,
        sc2_blinds, tbls, row_parts, col_parts,
    ):
        tbl_commit, tbl_sc1, tbl_mid, tbl_sc2 = tbls
        s = jax.lax.axis_index("sp")

        # ---- blinded commitment: block-sharded Hyrax rows -------------------
        W = z[:num_vars].reshape(n_rows, 1 << mu_cols, -1)
        if n_rows >= k:
            W_loc = jax.lax.dynamic_slice_in_dim(W, s * rows_local, rows_local, 0)
            rb_loc = jax.lax.dynamic_slice_in_dim(
                row_blinds, s * rows_local, rows_local, 0
            )
            comm = zkfused._commit_rows_blinded(W_loc, rb_loc, tbl_commit)
            enc_loc = ristretto.encode(comm)
            enc = jax.lax.all_gather(enc_loc, "sp", tiled=True)
        else:
            comm = zkfused._commit_rows_blinded(W, row_blinds, tbl_commit)
            enc = ristretto.encode(comm)

        t = DeviceTranscript(_strobe=DeviceStrobe.from_state(state, *handoff))
        for i in range(n_rows):
            t.append_message(b"poly_commitment", enc[i])

        # ---- phase 1 (ZK, sharded) ------------------------------------------
        tau = t.challenge_vector_limbs(b"challenge_tau", mu_x)
        eq_hi = mle._eq_table_impl(tau[: mu_x - log_k]) if mu_x > log_k else F.ones(
            SCALAR, (1,)
        )
        eq_loc = F.mul(
            SCALAR, eq_hi, _eq_shard_factor(tau[mu_x - log_k :], log_k)[None, :]
        )
        azbzcz = []
        for rows_l, cols_l, vals_l in row_parts:
            prods = F.mul(SCALAR, vals_l, z[cols_l])
            acc = jax.ops.segment_sum(prods, rows_l, num_segments=nl1)
            azbzcz.append(F.reduce_wide(SCALAR, acc))
        az, bz, cz = azbzcz

        (
            state1, tbl1, sc1_encs, sc1_z, sc1_zdb, rxs, e1, be1,
        ) = _sharded_zk_phase(
            t.strobe.state, (eq_loc, az, bz, cz), nl1, log_k, b"sc1", 3,
            sc1_blinds, tbl_sc1, F.zeros(()), F.zeros(()),
        )
        vA = F.canon(SCALAR, tbl1[1][0])
        vB = F.canon(SCALAR, tbl1[2][0])
        vC = F.canon(SCALAR, tbl1[3][0])

        # ---- inter-phase sigma section (replicated) -------------------------
        state_mid, mid_encs, mid_z, rabc, claim2, bclaim2 = zkfused._mid_zk(
            state1, tau, rxs, vA, vB, vC, abc_blinds, prod_blinds, eq1_a,
            e1, be1, tbl_mid,
        )
        r_a, r_b, r_c = rabc[0], rabc[1], rabc[2]

        # ---- phase 2 (ZK, sharded) ------------------------------------------
        e_rx = mle._eq_table_impl(rxs)  # replicated [num_cons, L]
        weights = (r_a, r_b, r_c)
        m_loc = None
        for w_m, (rows_l, cols_l, vals_l) in zip(weights, col_parts):
            prods = F.mul(
                SCALAR, F.mul(SCALAR, vals_l, e_rx[rows_l]), w_m[None, :]
            )
            part = jax.ops.segment_sum(prods, cols_l, num_segments=nl2)
            part = F.reduce_wide(SCALAR, part)
            m_loc = part if m_loc is None else F.add(SCALAR, m_loc, part)
        z_loc = z[jnp.arange(nl2) * k + s]

        (
            state2, _, sc2_encs, sc2_z, sc2_zdb, rys, e2, be2,
        ) = _sharded_zk_phase(
            state_mid, (m_loc, z_loc), nl2, log_k, b"sc2", 2,
            sc2_blinds, tbl_sc2, claim2, bclaim2,
        )

        # ---- opening materials + v_m (replicated / psum) --------------------
        r_w = rys[1:]
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

        # v_m via the by-row partition: global row = local_slot * k + s
        e_ry = mle._eq_table_impl(rys)
        eabc = []
        for rows_l, cols_l, vals_l in row_parts:
            w = F.mul(
                SCALAR,
                F.mul(SCALAR, vals_l, e_rx[rows_l * k + s]),
                e_ry[cols_l],
            )
            eabc.append(_psum_canon(jnp.sum(w, axis=0)))
        v_m = F.canon(
            SCALAR,
            F.add(
                SCALAR,
                F.add(
                    SCALAR,
                    F.mul(SCALAR, r_a, eabc[0]),
                    F.mul(SCALAR, r_b, eabc[1]),
                ),
                F.mul(SCALAR, r_c, eabc[2]),
            ),
        )
        tail_vals = jnp.stack(
            [b_u, w_eval, v_m, F.canon(SCALAR, e2), F.canon(SCALAR, be2)]
        )
        return (
            state2, enc, sc1_encs, sc1_z, sc1_zdb, mid_encs, mid_z,
            sc2_encs, sc2_z, sc2_zdb, u, tail_vals, rys,
        )

    part_spec = (P("sp"), P("sp"), P("sp", None))
    fn = jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(
            P(), P(None, None), P(None, None), P(), P(), P(), P(), P(), P(),
            (part_spec,) * 3, (part_spec,) * 3,
        ),
        out_specs=(P(),) * 13,
        check_vma=False,
    )
    return jax.jit(fn), mesh


def prove_zk(
    dev: r1cs.R1CSDevice,
    vars_ints: list,
    inputs_ints: list,
    k: int = None,
    seed: bytes = None,
):
    """Multi-chip ZK prover: byte-identical to zknizk.prove (same seed)."""
    import os as _os

    from ..spartan import zkfused
    from ..spartan.pedersen_host import BlindSource
    from ..spartan.zknizk import PROTO as ZK_PROTO

    k = k or len(jax.devices())
    rng = BlindSource(seed or _os.urandom(32))
    nvp = dev.num_vars
    mu_rows, mu_cols = nizk._hyrax_dims(nvp)
    mu_x = (dev.num_cons - 1).bit_length()
    mu_y = (dev.num_z - 1).bit_length()

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
            zkfused._devs(bp),
            zkfused._devs(bn),
            jnp.asarray(
                [ints_to_limbs(d) for d in dd]
            ),
            zkfused._devs(rd),
            zkfused._devs(rb),
        )

    sc1_blinds = sc_draws(mu_x, 3)
    abc = rng.scalars(3) + [rng.scalar()]
    prod = rng.scalars(5)
    eq1_a = rng.scalar()
    sc2_blinds = sc_draws(mu_y, 2)

    t = Transcript(ZK_PROTO)
    t.append_message(b"R1CS", dev.digest)
    t.append_u64(b"num_inputs", len(inputs_ints))
    for x in inputs_ints:
        t.append_scalar(b"input", nizk._sb(x))

    vars_padded = list(vars_ints) + [0] * (nvp - len(vars_ints))
    st_np, pos, pos_begin, cur_flags = export_host_strobe(t.strobe)
    z = r1cs.assemble_z(
        nizk._dev_vec(vars_padded),
        nizk._dev_vec(inputs_ints) if inputs_ints else None,
        nvp,
    )
    row_parts, col_parts = partition_r1cs(dev, k)
    from ..msm import pippenger as _pip

    tbls = (
        _pip.fixed_base_tables(
            1 << mu_cols, nizk.GENS_LABEL, _pip.FIXED_BASE_WINDOW, True
        )[0],
        zkfused._round_tables(3),
        zkfused._mid_tables(),
        zkfused._round_tables(2),
    )
    core, mesh = _zk_core(
        dev.num_cons, dev.num_z, nvp, mu_rows, mu_cols,
        (pos, pos_begin, cur_flags), k, tuple(range(k)),
    )
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else _null():
        out = core(
            jnp.asarray(st_np), z, zkfused._devs(row_blinds), sc1_blinds,
            zkfused._devs(abc), zkfused._devs(prod), zkfused._dev(eq1_a),
            sc2_blinds, tbls, row_parts, col_parts,
        )
        (
            state2, enc_rows, sc1_encs, sc1_z, sc1_zdb, mid_encs, mid_z,
            sc2_encs, sc2_z, sc2_zdb, u_limb, tail_vals, rys_limb,
        ) = jax.device_get(out)

    comm_enc = [
        bytes(np.asarray(enc_rows[i]).tobytes())
        for i in range(enc_rows.shape[0])
    ]
    return zkfused.assemble_zk_proof(
        dev, rng, comm_enc, state2,
        sc1_encs, sc1_z, sc1_zdb, mid_encs, mid_z,
        sc2_encs, sc2_z, sc2_zdb, u_limb, tail_vals, rys_limb,
    )
