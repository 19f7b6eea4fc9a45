"""Batched proving: many same-shape instances proved concurrently.

The reference proves instances strictly sequentially in a Python loop
(run.py:32, SURVEY.md §2.3 DP row); here B instances with equal padded
dimensions run through the prover as ONE batched device program: stacked
sparse matrices (nnz padded), vmapped matvecs/eq-tables/sumcheck rounds /
binds, and row commitments flattened into a single shared-bases MSM.
Per-instance Merlin transcripts stay on the host — the per-round
device->host sync now carries B x 3 scalars instead of 3, so the FS
serialization cost is amortized across the batch (throughput mode,
BASELINE.json configs[4]).

Proofs are byte-identical to single-instance nizk.prove outputs (same
transcript schedule), so nizk.verify validates them individually.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import ops as F
from ..field.fields import SCALAR
from ..transcript.merlin import Transcript
from . import commitments, mle, r1cs, sumcheck
from .nizk import (
    GENS_LABEL,
    MOD,
    NIZKProof,
    PROTO,
    _dev_vec,
    _hyrax_dims,
    _mle_eval_host,
    _sb,
)


class BatchedR1CS:
    """B same-shape instances with stacked COO matrices."""

    def __init__(self, devs: list):
        d0 = devs[0]
        assert all(
            (d.num_cons, d.num_z, d.num_vars) == (d0.num_cons, d0.num_z, d0.num_vars)
            for d in devs
        ), "batched proving requires equal padded dimensions"
        self.devs = devs
        self.num_cons = d0.num_cons
        self.num_z = d0.num_z
        self.num_vars = d0.num_vars
        self.mats = []
        for m in range(3):
            nnz = max(d.mats[m][0].shape[0] for d in devs)
            rows = np.zeros((len(devs), nnz), np.int32)
            cols = np.zeros((len(devs), nnz), np.int32)
            vals = np.zeros((len(devs), nnz, d0.mats[m][2].shape[-1]), np.int32)
            for b, d in enumerate(devs):
                r, c, v = d.mats[m]
                k = r.shape[0]
                rows[b, :k] = np.asarray(r)
                cols[b, :k] = np.asarray(c)
                vals[b, :k] = np.asarray(v)  # padded entries have value 0
            self.mats.append((jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals)))

    def matvecs(self, zs: jax.Array) -> tuple:
        if not hasattr(self, "_mv_jit"):

            def one(rows, cols, vals, z):
                prods = F.mul(SCALAR, vals, z[cols])
                acc = jax.ops.segment_sum(prods, rows, num_segments=self.num_cons)
                return F.reduce_wide(SCALAR, acc)

            self._mv_jit = jax.jit(
                lambda zs: tuple(
                    jax.vmap(one, in_axes=(0, 0, 0, 0))(*self.mats[m], zs)
                    for m in range(3)
                )
            )
        return self._mv_jit(zs)

    def matvec_T_weighted(self, weights: jax.Array, e_rx: jax.Array) -> jax.Array:
        """weights: [B, 3, L]; e_rx: [B, n_cons, L] -> [B, num_z, L]."""
        if not hasattr(self, "_mtw_jit"):

            def one(wts, erx, *mats):
                acc = None
                for m in range(3):
                    rows, cols, vals = mats[3 * m : 3 * m + 3]
                    prods = F.mul(
                        SCALAR, F.mul(SCALAR, vals, erx[rows]), wts[m][None, :]
                    )
                    part = jax.ops.segment_sum(prods, cols, num_segments=self.num_z)
                    part = F.reduce_wide(SCALAR, part)
                    acc = part if acc is None else F.add(SCALAR, acc, part)
                return acc

            flat_mats = [x for m in range(3) for x in self.mats[m]]
            self._mtw_jit = jax.jit(
                lambda w, e: jax.vmap(
                    one, in_axes=(0, 0) + (0,) * 9
                )(w, e, *flat_mats)
            )
        return self._mtw_jit(weights, e_rx)


@functools.lru_cache(maxsize=None)
def _veq_jit(mu: int):
    return jax.jit(jax.vmap(mle._eq_table_impl))


@functools.lru_cache(maxsize=None)
def _vcubic_jit(n: int):
    half = n // 2

    def one(eq, pa, pb, pc, ah):
        mask = jnp.arange(half) < ah
        outs = []
        for t in (0, 2, 3):
            eqt, at, bt, ct = (
                sumcheck._ext_masked(x, t, ah) for x in (eq, pa, pb, pc)
            )
            w = F.sub(SCALAR, F.mul(SCALAR, at, bt), ct)
            w = F.select(mask, w, jnp.zeros_like(w))
            outs.append(F.canon(SCALAR, F.dot(SCALAR, eqt, w)))
        return tuple(outs)

    return jax.jit(jax.vmap(one, in_axes=(0, 0, 0, 0, None)))


@functools.lru_cache(maxsize=None)
def _vquad_jit(n: int):
    half = n // 2

    def one(pm, pz, ah):
        mask = jnp.arange(half) < ah
        outs = []
        for t in (0, 2):
            mt = sumcheck._ext_masked(pm, t, ah)
            zt = sumcheck._ext_masked(pz, t, ah)
            zt = F.select(mask, zt, jnp.zeros_like(zt))
            outs.append(F.canon(SCALAR, F.dot(SCALAR, mt, zt)))
        return tuple(outs)

    return jax.jit(jax.vmap(one, in_axes=(0, 0, None)))


@functools.lru_cache(maxsize=None)
def _vbind_jit(n: int, k_tables: int):
    half = n // 2

    def one(r, ah, *tables):
        out = []
        for tbl in tables:
            lo = tbl[:half]
            hi = jax.lax.dynamic_slice_in_dim(tbl, ah, half, axis=0)
            bound = F.add(
                SCALAR, lo, F.mul(SCALAR, r[None, :], F.sub(SCALAR, hi, lo))
            )
            out.append(jax.lax.dynamic_update_slice_in_dim(tbl, bound, 0, axis=0))
        return tuple(out)

    return jax.jit(jax.vmap(one, in_axes=(0, None) + (0,) * k_tables))


def _limbs_to_ints_batch(x) -> list:
    return [int(v) for v in F.pack_ints(SCALAR, x)]


def prove_many(devs: list, vars_list: list, inputs_list: list) -> list:
    """-> list of NIZKProof, one per instance (plain mode)."""
    B = len(devs)
    batched = BatchedR1CS(devs)
    nvp = batched.num_vars
    mu_rows, mu_cols = _hyrax_dims(nvp)
    mu_x = (batched.num_cons - 1).bit_length()

    transcripts = []
    for d, inputs in zip(devs, inputs_list):
        t = Transcript(PROTO)
        t.append_message(b"R1CS", d.digest)
        t.append_u64(b"num_inputs", len(inputs))
        for x in inputs:
            t.append_scalar(b"input", _sb(x))
        transcripts.append(t)

    vars_padded = [
        list(v) + [0] * (nvp - len(v)) for v in vars_list
    ]
    W = jnp.stack([_dev_vec(v) for v in vars_padded]).reshape(
        B * (1 << mu_rows), 1 << mu_cols, -1
    )
    comm_flat = commitments.commit_rows(W, [0] * (B * (1 << mu_rows)), GENS_LABEL)
    comm_enc_flat = commitments.encode_points(comm_flat)
    rows_per = 1 << mu_rows
    comm_encs = [
        comm_enc_flat[b * rows_per : (b + 1) * rows_per] for b in range(B)
    ]
    for t, encs in zip(transcripts, comm_encs):
        for enc in encs:
            t.append_point(b"poly_commitment", enc)

    taus = [t.challenge_vector(b"challenge_tau", mu_x) for t in transcripts]
    zs = jnp.stack(
        [
            r1cs.assemble_z(
                _dev_vec(v), _dev_vec(i) if i else None, nvp
            )
            for v, i in zip(vars_padded, inputs_list)
        ]
    )
    eq_tau = _veq_jit(mu_x)(jnp.stack([_dev_vec(tau) for tau in taus]))
    az, bz, cz = batched.matvecs(zs)

    # ---- batched phase-1 sumcheck ----------------------------------------
    def run_batched_sumcheck(cubic, tables, claims, label):
        n = tables[0].shape[1]
        kernel = (_vcubic_jit if cubic else _vquad_jit)(n)
        binder = _vbind_jit(n, len(tables))
        es = [c % MOD for c in claims]
        rounds = [[] for _ in range(B)]
        rss = [[] for _ in range(B)]
        active = n
        while active > 1:
            ah = jnp.int32(active // 2)
            outs = kernel(*tables, ah)
            cols = [_limbs_to_ints_batch(o) for o in outs]  # per eval point
            rs_round = []
            for b in range(B):
                t = transcripts[b]
                if cubic:
                    e0, e2, e3 = cols[0][b], cols[1][b], cols[2][b]
                    e1 = (es[b] - e0) % MOD
                    t.append_scalar(label + b"/e0", _sb(e0))
                    t.append_scalar(label + b"/e2", _sb(e2))
                    t.append_scalar(label + b"/e3", _sb(e3))
                    evals = [e0, e1, e2, e3]
                else:
                    e0, e2 = cols[0][b], cols[1][b]
                    e1 = (es[b] - e0) % MOD
                    t.append_scalar(label + b"/e0", _sb(e0))
                    t.append_scalar(label + b"/e2", _sb(e2))
                    evals = [e0, e1, e2]
                r = t.challenge_scalar(label + b"/r")
                rs_round.append(r)
                rounds[b].append(evals)
                rss[b].append(r)
                es[b] = sumcheck.lagrange_eval(evals, r)
            r_dev = jnp.stack([_dev_vec([r])[0] for r in rs_round])
            tables = binder(r_dev, ah, *tables)
            active //= 2
        finals = [_limbs_to_ints_batch(tbl[:, 0]) for tbl in tables]
        return rounds, rss, finals, es

    p1s, rxs, finals1, _ = run_batched_sumcheck(
        True, (eq_tau, az, bz, cz), [0] * B, b"sc1"
    )
    vAs, vBs, vCs = finals1[1], finals1[2], finals1[3]
    for b in range(B):
        t = transcripts[b]
        t.append_scalar(b"vA", _sb(vAs[b]))
        t.append_scalar(b"vB", _sb(vBs[b]))
        t.append_scalar(b"vC", _sb(vCs[b]))

    r_as = [t.challenge_scalar(b"challenge_Az") for t in transcripts]
    r_bs = [t.challenge_scalar(b"challenge_Bz") for t in transcripts]
    r_cs = [t.challenge_scalar(b"challenge_Cz") for t in transcripts]
    claims2 = [
        (r_as[b] * vAs[b] + r_bs[b] * vBs[b] + r_cs[b] * vCs[b]) % MOD
        for b in range(B)
    ]
    e_rx = _veq_jit(mu_x)(jnp.stack([_dev_vec(rx) for rx in rxs]))
    weights = jnp.stack(
        [
            jnp.stack([_dev_vec([r_as[b]])[0], _dev_vec([r_bs[b]])[0], _dev_vec([r_cs[b]])[0]])
            for b in range(B)
        ]
    )
    m_tables = batched.matvec_T_weighted(weights, e_rx)
    p2s, rys, _, _ = run_batched_sumcheck(
        False, (m_tables, zs), claims2, b"sc2"
    )

    # ---- openings --------------------------------------------------------
    proofs = []
    W_by_inst = W.reshape(B, 1 << mu_rows, 1 << mu_cols, -1)
    for b in range(B):
        ry = rys[b]
        r_w = ry[1:]
        eq_L = (
            mle.eq_table(_dev_vec(r_w[:mu_rows]))
            if mu_rows
            else F.ones(SCALAR, (1,))
        )
        from .nizk import _row_combine_jit

        u = _row_combine_jit((1 << mu_rows, 1 << mu_cols))(eq_L, W_by_inst[b])
        u_ints = [int(v) for v in F.pack_ints(SCALAR, u)]
        claim_w = _mle_eval_host(vars_padded[b], r_w)
        t = transcripts[b]
        t.append_scalar(b"claim_w", _sb(claim_w))
        from .nizk import _prove_opening

        proof_bullet = _prove_opening(t, mu_rows, mu_cols, r_w, u_ints, claim_w)
        proofs.append(
            NIZKProof(
                comm_vars=comm_encs[b],
                phase1_polys=p1s[b],
                claims_abc=(vAs[b], vBs[b], vCs[b]),
                phase2_polys=p2s[b],
                claim_w=claim_w,
                bullet=proof_bullet,
            )
        )
    return proofs
