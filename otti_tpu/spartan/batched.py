"""Batched proving: many same-shape instances proved concurrently.

The reference proves instances strictly sequentially in a Python loop
(run.py:32, SURVEY.md §2.3 DP row); here B instances with equal padded
dimensions run through the prover as ONE batched device program: stacked
sparse matrices (nnz padded), vmapped matvecs/eq-tables/sumcheck rounds /
binds, and row commitments flattened into a single shared-bases MSM.
Since round 3 the per-instance Fiat-Shamir transcripts run ON DEVICE as
a [B, 200] sponge-state matrix: the whole batch executes the vmapped
hybrid phase kernels (spartan/hybrid.py) with ZERO mid-proof host syncs,
in both plain and ZERO-KNOWLEDGE mode (VERDICT r02 next #5: --batch must
compose with zk).

Proofs are byte-identical to single-instance nizk.prove / zknizk.prove
outputs (same transcript schedule), so the standard verifiers validate
them individually.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import ops as F
from ..field.fields import SCALAR, ints_to_limbs
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
        # the stacked COO matrices are jit ARGUMENTS, not closed-over
        # constants: at suite scale (hinf1-9, ~0.5M nnz x 22 limbs x 9
        # instances) a baked constant blew the axon remote-compile
        # payload limit (HTTP 413, r04)
        flat = [x for m in range(3) for x in self.mats[m]]
        return _mv_jit(self.num_cons)(zs, *flat)

    def matvec_T_weighted(self, weights: jax.Array, e_rx: jax.Array) -> jax.Array:
        """weights: [B, 3, L]; e_rx: [B, n_cons, L] -> [B, num_z, L]."""
        flat = [x for m in range(3) for x in self.mats[m]]
        return _mtw_jit(self.num_z)(weights, e_rx, *flat)


@functools.lru_cache(maxsize=None)
def _veq_jit(mu: int):
    return jax.jit(jax.vmap(mle._eq_table_impl))


@functools.lru_cache(maxsize=None)
def _mv_jit(num_cons: int):
    def one(z, rows, cols, vals):
        prods = F.mul(SCALAR, vals, z[cols])
        acc = jax.ops.segment_sum(prods, rows, num_segments=num_cons)
        return F.reduce_wide(SCALAR, acc)

    def run(zs, *flat):
        return tuple(
            jax.vmap(one)(zs, *flat[3 * m : 3 * m + 3]) for m in range(3)
        )

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _mtw_jit(num_z: int):
    def one(wts, erx, *mats):
        acc = None
        for m in range(3):
            rows, cols, vals = mats[3 * m : 3 * m + 3]
            prods = F.mul(
                SCALAR, F.mul(SCALAR, vals, erx[rows]), wts[m][None, :]
            )
            part = jax.ops.segment_sum(prods, cols, num_segments=num_z)
            part = F.reduce_wide(SCALAR, part)
            acc = part if acc is None else F.add(SCALAR, acc, part)
        return acc

    return jax.jit(
        lambda w, e, *flat: jax.vmap(one, in_axes=(0, 0) + (0,) * 9)(
            w, e, *flat
        )
    )


@jax.jit
def _eval_at_jit(e_rx, e_ry, *flat):
    def one(erx, ery, *mats):
        outs = []
        for m in range(3):
            rows, cols, vals = mats[3 * m : 3 * m + 3]
            prods = F.mul(SCALAR, F.mul(SCALAR, vals, erx[rows]), ery[cols])
            outs.append(F.sum_reduce(SCALAR, prods, axis=0))
        return jnp.stack(outs)

    return jax.vmap(one, in_axes=(0, 0) + (0,) * 9)(e_rx, e_ry, *flat)


def eval_at_batched(batched: "BatchedR1CS", e_rx: jax.Array, e_ry: jax.Array):
    """Batched \tilde A/B/C(rx, ry): [B, 3, L] stacked evals."""
    flat = [x for m in range(3) for x in batched.mats[m]]
    return _eval_at_jit(e_rx, e_ry, *flat)


def _common_setup(devs, vars_list, inputs_list, proto, blinds_rows=None):
    """Shared front half: transcripts, batched commitment, taus, z stack.

    Returns (batched, transcripts [pristine], comm_encs, taus, zs,
    vars_padded, dims)."""
    from .fused import assemble_plain_proof  # noqa: F401 (doc pointer)

    B = len(devs)
    batched = BatchedR1CS(devs)
    nvp = batched.num_vars
    mu_rows, mu_cols = _hyrax_dims(nvp)
    mu_x = (batched.num_cons - 1).bit_length()

    transcripts = []
    for d, inputs in zip(devs, inputs_list):
        t = Transcript(proto)
        t.append_message(b"R1CS", d.digest)
        t.append_u64(b"num_inputs", len(inputs))
        for x in inputs:
            t.append_scalar(b"input", _sb(x))
        transcripts.append(t)

    vars_padded = [list(v) + [0] * (nvp - len(v)) for v in vars_list]
    W = jnp.stack([_dev_vec(v) for v in vars_padded]).reshape(
        B * (1 << mu_rows), 1 << mu_cols, -1
    )
    rows_per = 1 << mu_rows
    blinds = (
        [b for inst in blinds_rows for b in inst]
        if blinds_rows is not None
        else [0] * (B * rows_per)
    )
    from .. import metrics

    with metrics.timed("b_commit"):
        comm_flat = commitments.commit_rows(W, blinds, GENS_LABEL)
        comm_enc_flat = commitments.encode_points(comm_flat)
    comm_encs = [
        comm_enc_flat[b * rows_per : (b + 1) * rows_per] for b in range(B)
    ]
    # scratch forks advance to tau; the pristine transcripts replay later
    from .hybrid import _fork

    taus, states = [], []
    for t, encs in zip(transcripts, comm_encs):
        t2 = _fork(t)
        for enc in encs:
            t2.append_point(b"poly_commitment", enc)
        taus.append(t2.challenge_vector(b"challenge_tau", mu_x))
        from .hybrid import _check_handoff

        states.append(_check_handoff(t2.strobe))
    zs = jnp.stack(
        [
            r1cs.assemble_z(_dev_vec(v), _dev_vec(i) if i else None, nvp)
            for v, i in zip(vars_padded, inputs_list)
        ]
    )
    return (
        batched, transcripts, comm_encs, taus, jnp.stack(states), zs,
        vars_padded, (nvp, mu_rows, mu_cols, mu_x),
    )


def prove_many(devs: list, vars_list: list, inputs_list: list) -> list:
    """-> list of NIZKProof (plain mode), byte-identical to nizk.prove.

    The whole batch runs through the vmapped device-FS phase kernels:
    2 host syncs total regardless of B or instance size."""
    from . import hybrid
    from .fused import assemble_plain_proof

    B = len(devs)
    (
        batched, transcripts, comm_encs, taus, states, zs, vars_padded,
        (nvp, mu_rows, mu_cols, mu_x),
    ) = _common_setup(devs, vars_list, inputs_list, PROTO)

    eq_tau = _veq_jit(mu_x)(jnp.stack([_dev_vec(tau) for tau in taus]))
    az, bz, cz = batched.matvecs(zs)
    st1, rounds1, rxs, vabc, rabc = hybrid._phase1_batched(batched.num_cons)(
        states, eq_tau, az, bz, cz
    )
    e_rx = _veq_jit(mu_x)(rxs)
    m_tables = batched.matvec_T_weighted(rabc, e_rx)
    st2, rounds2, rys = hybrid._phase2_batched(batched.num_z)(
        st1, m_tables, zs
    )
    u, claim_w = hybrid._opening_batched(nvp, mu_rows, mu_cols)(zs, rys)

    r1_np, vabc_np, r2_np, u_np, cw_np = jax.device_get(
        (rounds1, vabc, rounds2, u, claim_w)
    )
    return [
        assemble_plain_proof(
            transcripts[b], comm_encs[b], r1_np[b], vabc_np[b], r2_np[b],
            u_np[b], cw_np[b], mu_x, mu_rows, mu_cols,
        )
        for b in range(B)
    ]


def _timed_get(tree):
    from .. import metrics

    with metrics.timed("b_fetch"):
        return jax.device_get(tree)


def prove_many_zk(
    devs: list, vars_list: list, inputs_list: list, seeds: list = None
) -> list:
    """-> list of ZKNIZKProof, byte-identical to zknizk.prove per instance
    with the same seed (batched ZERO-KNOWLEDGE proving — the CLI default
    mode composed with --batch, VERDICT r02 next #5)."""
    import os as _os

    from . import hybrid, zkfused
    from .pedersen_host import BlindSource
    from .zknizk import PROTO as ZK_PROTO

    B = len(devs)
    seeds = seeds or [_os.urandom(32) for _ in range(B)]
    d0 = devs[0]
    mu_rows, mu_cols = _hyrax_dims(d0.num_vars)
    mu_x = (d0.num_cons - 1).bit_length()
    mu_y = (d0.num_z - 1).bit_length()

    from .. import metrics

    rngs = [BlindSource(s) for s in seeds]
    with metrics.timed("b_blinds"):
        row_blinds = [rng.scalars(1 << mu_rows) for rng in rngs]

    def sc_draws(rng, n_rounds, degree):
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
            jnp.asarray([ints_to_limbs(d) for d in dd]),
            zkfused._devs(rd),
            zkfused._devs(rb),
        )

    sc1_blinds, abcs, prods, eq1_as, sc2_blinds = [], [], [], [], []
    _t_draw = metrics.timed("b_blinds2"); _t_draw.__enter__()
    for rng in rngs:
        sc1_blinds.append(sc_draws(rng, mu_x, 3))
        abcs.append(rng.scalars(3) + [rng.scalar()])
        prods.append(rng.scalars(5))
        eq1_as.append(rng.scalar())
        sc2_blinds.append(sc_draws(rng, mu_y, 2))
    _t_draw.__exit__(None, None, None)
    sc1_b = jax.tree.map(lambda *xs: jnp.stack(xs), *sc1_blinds)
    sc2_b = jax.tree.map(lambda *xs: jnp.stack(xs), *sc2_blinds)

    (
        batched, transcripts, comm_encs, taus, states, zs, vars_padded,
        (nvp, mu_rows, mu_cols, mu_x),
    ) = _common_setup(
        devs, vars_list, inputs_list, ZK_PROTO, blinds_rows=row_blinds
    )
    metrics.add("b_setup_done", 1)
    # NOTE: in zk mode the transcripts are not replayed (the device states
    # carry them); they only seeded the absorbs above.

    sync = hybrid._sync_point if _os.environ.get("OTTI_SYNC_METRICS") else (
        lambda name, x: x
    )
    tau_dev = jnp.stack([_dev_vec(tau) for tau in taus])
    eq_tau = _veq_jit(mu_x)(tau_dev)
    az, bz, cz = sync("b_matvecs", batched.matvecs(zs))
    B_ = zs.shape[0]
    # segmented batched phases (r04): same round stream as the monolithic
    # vmapped scans but ~2n instead of mu*n table work per instance
    (
        st1, e1, be1, sc1_encs, sc1_z, sc1_zdb, rxs, vabc,
    ) = sync("b_zk_phase1", hybrid._zk_phase_segmented_batched(
        states, (eq_tau, az, bz, cz), sc1_b, zkfused._round_tables(3),
        F.zeros((B_,)), F.zeros((B_,)), b"sc1", 3,
    ))
    (
        st_mid, mid_encs, mid_z, rabc, claim2, bclaim2,
    ) = sync("b_zk_mid", hybrid._zk_mid_batched(mu_x)(
        st1, tau_dev, rxs, vabc,
        jnp.stack([zkfused._devs(a) for a in abcs]),
        jnp.stack([zkfused._devs(pr) for pr in prods]),
        jnp.stack([zkfused._dev(e) for e in eq1_as]),
        e1, be1, zkfused._mid_tables(),
    ))
    e_rx = _veq_jit(mu_x)(rxs)
    m_tables = sync("b_m_table", batched.matvec_T_weighted(rabc, e_rx))
    (
        st2, e2, be2, sc2_encs, sc2_z, sc2_zdb, rys,
    ) = sync("b_zk_phase2", hybrid._zk_phase_segmented_batched(
        st_mid, (m_tables, zs), sc2_b, zkfused._round_tables(2),
        claim2, bclaim2, b"sc2", 2,
    ))
    mu_y2 = (batched.num_z - 1).bit_length()
    e_ry = _veq_jit(mu_y2)(rys)
    eabc = sync("b_eval_at", eval_at_batched(batched, e_rx, e_ry))
    u, buwv = sync("b_opening", hybrid._zk_opening_batched(nvp, mu_rows, mu_cols)(
        zs,
        jnp.stack([zkfused._devs(rb) for rb in row_blinds]),
        rys, eabc, rabc,
    ))

    (
        st2_np, sc1_encs, sc1_z, sc1_zdb, mid_encs, mid_z,
        sc2_encs, sc2_z, sc2_zdb, u_np, buwv_np, rys_np, e2_np, be2_np,
    ) = _timed_get(
        (
            st2, sc1_encs, sc1_z, sc1_zdb, mid_encs, mid_z,
            sc2_encs, sc2_z, sc2_zdb, u, buwv, rys, e2, be2,
        )
    )
    proofs = []
    _t_asm = metrics.timed("b_assemble"); _t_asm.__enter__()
    for b in range(B):
        tail_vals = np.stack(
            [buwv_np[b][0], buwv_np[b][1], buwv_np[b][2], e2_np[b], be2_np[b]]
        )
        proofs.append(
            zkfused.assemble_zk_proof(
                devs[b], rngs[b], comm_encs[b], st2_np[b],
                sc1_encs[b], sc1_z[b], sc1_zdb[b], mid_encs[b], mid_z[b],
                sc2_encs[b], sc2_z[b], sc2_zdb[b], u_np[b], tail_vals,
                rys_np[b],
            )
        )
    _t_asm.__exit__(None, None, None)
    return proofs
