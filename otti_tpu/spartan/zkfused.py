"""Single-dispatch zero-knowledge Spartan prover (device Fiat-Shamir).

zknizk.prove threads the Merlin transcript through every ZK sumcheck
round on the host, paying one device->host sync per round plus host
sigma-protocol group ops — ~3 s per small-LP proof through the axon
tunnel.  This module compiles the ENTIRE ZK argument (blinded Hyrax
commit, both ZK sumchecks with their per-round Pedersen commitments and
dot-product proofs, the product/equality sigma proofs, and the blinded
opening) into ONE XLA program, exactly like spartan/fused.py does for the
plain NIZK: the host draws the blinds, submits a single fused call, and
re-assembles the proof from a single fetch.

Correctness anchor: with the same blind seed, the proof is byte-identical
to zknizk.prove (tests/test_zkfused.py) and verifies with zknizk.verify —
the wire format does not change, only where it is computed.

The per-round commitments use the fixed-base comb tables of the shared
generators (msm/pippenger.py fixed_base_tables), so each lax.scan round
costs gathers + a balanced add tree and no doublings; the only variable-
base scalar-mul is the single Cx*b3 term of the product proof.

Reference roles covered: Spartan's zk sumcheck + nizk sigma toolbox
(SURVEY.md §3.5, §2.2 "Spartan" row), fused per §5.8's host/device
boundary discipline.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import edwards as E
from ..curve import ristretto
from ..field import ops as F
from ..field.fields import SCALAR, ints_to_limbs, limbs_to_int
from ..msm import pippenger
from ..transcript.device import DeviceStrobe, DeviceTranscript, export_host_strobe
from ..transcript.merlin import FLAG_A, FLAG_C, FLAG_I, Transcript
from . import mle, r1cs, sumcheck
from .nizk import GENS_LABEL, _hyrax_dims, _sb
from .pedersen_host import BlindSource
from .sigma import DotProductProof, EqualityProof, ProductProof
from .zknizk import PROTO, ZKNIZKProof
from .zksumcheck import ZKSumcheckProof

MOD = SCALAR.modulus

# sponge offsets at the start of every in-phase round (see fused.py)
_POST_CHALLENGE = (64, 0, FLAG_I | FLAG_A | FLAG_C)


def _dev(x: int) -> jax.Array:
    return jnp.asarray(ints_to_limbs([x % MOD]))[0]

def _devs(xs) -> jax.Array:
    return jnp.asarray(ints_to_limbs([x % MOD for x in xs]))


def _commit_rows_blinded(W: jax.Array, row_blinds: jax.Array, tbl=None):
    """Blinded Hyrax row commitments [rows, cols(,L)] + [rows, L] -> points.

    Same chunked fixed-base comb as commitments.commit_rows but with
    *traced* blinds (the host helper takes python ints).  ``tbl``: traced
    comb tables for the cols generators + H when called under jit."""
    rows, cols = W.shape[0], W.shape[1]
    mat = jnp.concatenate([W, row_blinds[:, None, :]], axis=1)
    n_win = -(-pippenger.SCALAR_BITS // pippenger.FIXED_BASE_WINDOW)
    blk = max(1, (1 << 18) // max(1, (cols + 1) * n_win))
    outs = []
    for s in range(0, rows, blk):
        chunk = mat[s : min(s + blk, rows)]
        outs.append(
            pippenger.msm_fixed_base(
                cols, GENS_LABEL, chunk, with_blind=True, tbl=tbl
            )
        )
    if len(outs) == 1:
        return outs[0]
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)


@functools.lru_cache(maxsize=None)
def _vandermonde_inv_limbs(degree: int):
    """M with coeffs = M @ evals for p(i) = evals[i], i = 0..degree.

    Exact inverse of the Vandermonde matrix mod ell, as limb constants."""
    d = degree
    # build V[i][j] = i^j, invert mod L by Gauss-Jordan over the field
    V = [[pow(i, j, MOD) for j in range(d + 1)] for i in range(d + 1)]
    I = [[1 if i == j else 0 for j in range(d + 1)] for i in range(d + 1)]
    for col in range(d + 1):
        piv = next(r for r in range(col, d + 1) if V[r][col] % MOD)
        V[col], V[piv] = V[piv], V[col]
        I[col], I[piv] = I[piv], I[col]
        inv_p = pow(V[col][col], MOD - 2, MOD)
        V[col] = [v * inv_p % MOD for v in V[col]]
        I[col] = [v * inv_p % MOD for v in I[col]]
        for r in range(d + 1):
            if r != col and V[r][col]:
                f = V[r][col]
                V[r] = [(v - f * w) % MOD for v, w in zip(V[r], V[col])]
                I[r] = [(v - f * w) % MOD for v, w in zip(I[r], I[col])]
    return np.asarray(
        [[np.asarray(ints_to_limbs([I[i][j]]))[0] for j in range(d + 1)]
         for i in range(d + 1)]
    )


def _round_tables(degree: int):
    """Comb tables for the per-round commitment generators G_0..G_degree, H
    (device arrays, cached) — passed INTO the jitted kernels as arguments
    so they are uploaded once instead of baked into every executable."""
    tbl, _, _ = pippenger.fixed_base_tables(
        degree + 1, GENS_LABEL, pippenger.FIXED_BASE_WINDOW, True
    )
    return tbl


def _mid_tables():
    tbl, _, _ = pippenger.fixed_base_tables(
        1, GENS_LABEL, pippenger.FIXED_BASE_WINDOW, True
    )
    return tbl


def _zk_round_from_evals(label: bytes, degree: int, tbl, state, e, be, evs, xs):
    """One ZK round's transcript + sigma logic, given the round evals.

    ``evs`` = [p(0), p(2), (p(3))] canonical evals (p(1) derived from the
    running claim ``e``); the table folding is the CALLER's job (local for
    the single-chip scan, cyclic-local for the sharded prover).  Returns
    (state', e_next, b_next, r, encs [4,32], z, zdb).

    The round's five Pedersen commitments are computed in THREE batched
    fixed-base MSMs grouped by Fiat-Shamir dependency ({C_poly, delta}
    before r; {C_eval} after r; {C_y, beta} after w0/w1), and their
    ristretto encodings in three batched calls — the absorb ORDER (and so
    the wire) is unchanged, but the compile graph carries 3 commit + 3
    encode callsites instead of 5 + 5."""
    Minv = _vandermonde_inv_limbs(degree)
    b_poly, b_next, d_vec, r_delta, r_beta = xs
    zero = F.zeros(())
    if degree == 3:
        ev = [evs[0], None, evs[1], evs[2]]
    else:
        ev = [evs[0], None, evs[1]]
    ev[1] = F.canon(SCALAR, F.sub(SCALAR, e, ev[0]))
    coeffs = []
    for i in range(degree + 1):
        acc = F.mul(SCALAR, jnp.asarray(Minv[i][0]), ev[0])
        for j in range(1, degree + 1):
            acc = F.add(
                SCALAR, acc, F.mul(SCALAR, jnp.asarray(Minv[i][j]), ev[j])
            )
        coeffs.append(acc)

    def _commit_batch(rows):
        """rows: list of scalar lists, each (degree+2) long with the blind
        last -> [len(rows)] points over G_0..G_degree, H."""
        mat = jnp.stack([jnp.stack(r) for r in rows])
        return pippenger.msm_fixed_base(
            degree + 1, GENS_LABEL, mat, with_blind=True, tbl=tbl
        )

    t = DeviceTranscript(
        _strobe=DeviceStrobe.from_state(state, *_POST_CHALLENGE)
    )
    # group 1 (independent of every challenge): C_poly and delta
    g1 = _commit_batch(
        [
            coeffs + [b_poly],
            [d_vec[k] for k in range(degree + 1)] + [r_delta],
        ]
    )
    enc_g1 = ristretto.encode(g1)
    enc_poly, enc_delta = enc_g1[0], enc_g1[1]
    t.append_message(label + b"/comm_poly", enc_poly)
    r = t.challenge_scalar_limbs(label + b"/r")

    e_next = coeffs[-1]  # Horner
    for c in reversed(coeffs[:-1]):
        e_next = F.add(SCALAR, c, F.mul(SCALAR, r, e_next))
    pad = [zero] * degree
    C_next = _commit_batch([[e_next] + pad + [b_next]])
    enc_next = ristretto.encode(jax.tree.map(lambda a: a[0], C_next))
    t.append_message(label + b"/comm_eval", enc_next)
    w0 = t.challenge_scalar_limbs(label + b"/w0")
    w1 = t.challenge_scalar_limbs(label + b"/w1")

    # weight vector a = w0*(2,1,..,1) + w1*(1, r, r^2, ...)
    a = []
    r_pow = F.ones(SCALAR, ())
    for k in range(degree + 1):
        base = F.add(SCALAR, w0, w0) if k == 0 else w0
        a.append(F.canon(SCALAR, F.add(SCALAR, base, F.mul(SCALAR, w1, r_pow))))
        if k < degree:
            r_pow = F.mul(SCALAR, r_pow, r)

    # DotProductProof: ties committed coeffs to committed claims
    t.append_message(b"protocol-name", b"dot product proof")
    t.append_message(b"Cx", enc_poly)
    y = F.add(SCALAR, F.mul(SCALAR, w0, e), F.mul(SCALAR, w1, e_next))
    ry_b = F.add(SCALAR, F.mul(SCALAR, w0, be), F.mul(SCALAR, w1, b_next))
    dy = F.dot(SCALAR, d_vec, jnp.stack(a))
    # group 3 (needs w0/w1): C_y and beta
    g3 = _commit_batch(
        [[y] + pad + [ry_b], [dy] + pad + [r_beta]]
    )
    enc_g3 = ristretto.encode(g3)
    t.append_message(b"Cy", enc_g3[0])
    enc_beta = enc_g3[1]
    for ak in a:
        t.append_scalar_limbs(b"a", ak)
    t.append_message(b"delta", enc_delta)
    t.append_message(b"beta", enc_beta)
    c = t.challenge_scalar_limbs(b"c")

    z = jnp.stack(
        [
            F.canon(
                SCALAR,
                F.add(SCALAR, F.mul(SCALAR, c, coeffs[k]), d_vec[k]),
            )
            for k in range(degree + 1)
        ]
    )
    z_delta = F.canon(
        SCALAR, F.add(SCALAR, F.mul(SCALAR, c, b_poly), r_delta)
    )
    z_beta = F.canon(SCALAR, F.add(SCALAR, F.mul(SCALAR, c, ry_b), r_beta))
    encs = jnp.stack([enc_poly, enc_next, enc_delta, enc_beta])  # [4, 32]
    return (
        t.strobe.state,
        e_next,
        b_next,
        r,
        encs,
        z,
        jnp.stack([z_delta, z_beta]),
    )


def _zk_round_scan(label: bytes, degree: int, tbl):
    """lax.scan body for one single-chip ZK sumcheck phase: masked local
    evals -> _zk_round_from_evals -> masked local bind.

    carry = (sponge state, active_half, tables, e, be); xs = per-round
    blinds (b_poly, b_next, d[degree+1], r_delta, r_beta) limb arrays.
    ``tbl``: traced comb tables for G_0..G_degree, H (see _round_tables).
    Mirrors zksumcheck.prove_zk + sigma.DotProductProof.prove message for
    message."""

    def body(carry, xs):
        state, ah, tables, e, be = carry
        if degree == 3:
            evs = sumcheck._cubic_evals(*tables, ah)
        else:
            evs = sumcheck._quad_evals(*tables, ah)
        state, e_next, b_next, r, encs, z, zdb = _zk_round_from_evals(
            label, degree, tbl, state, e, be, evs, xs
        )
        tables = sumcheck._bind_tables(r, ah, tables)
        out = (encs, z, zdb, r)
        return (state, ah // 2, tables, e_next, b_next), out

    return body


def _prod_eq(vals: jax.Array) -> jax.Array:
    """prod_i (a_i*b_i + (1-a_i)(1-b_i)) term array [mu, L] -> scalar."""
    acc = vals[0]
    for i in range(1, vals.shape[0]):
        acc = F.mul(SCALAR, acc, vals[i])
    return acc


def _mid_zk(
    state1, tau, rxs, vA, vB, vC, abc_blinds, prod_blinds, eq1_a, e1, be1,
    tbl_mid,
):
    """Inter-phase ZK section (device): claim commitments CA/CB/CC, the
    product sigma proof for vA*vB, the phase-1 equality proof, and the
    phase-2 challenges.  Shared by the single-dispatch core and the hybrid
    multi-dispatch prover (byte-identical schedule).  ``tbl_mid``: traced
    comb tables for (G_0, H).

    Returns (state, mid_encs [8, 32], mid_z [6, L], rabc [3, L], claim2,
    bclaim2)."""
    one = F.ones(SCALAR, ())
    zero = F.zeros(())
    t = DeviceTranscript(
        _strobe=DeviceStrobe.from_state(state1, *_POST_CHALLENGE)
    )
    bA, bB, bC, b_ab = (abc_blinds[i] for i in range(4))
    b1, b2, b3, b4, b5 = (prod_blinds[i] for i in range(5))
    v_ab = F.mul(SCALAR, vA, vB)
    eq_terms = F.add(
        SCALAR,
        F.mul(SCALAR, tau, rxs),
        F.mul(SCALAR, F.sub(SCALAR, one, tau), F.sub(SCALAR, one, rxs)),
    )
    eq_val = _prod_eq(eq_terms)
    r2_eq1 = F.mul(SCALAR, eq_val, F.sub(SCALAR, b_ab, bC))

    # every commitment in this section is challenge-independent, so the
    # whole set is ONE batched fixed-base MSM + ONE batched encode (plus
    # the single variable-base term CA*b3 of the product proof); the
    # absorb ORDER below is unchanged, so the wire stays byte-identical
    rows = [
        [vA, bA], [vB, bB], [vC, bC], [v_ab, b_ab],
        [b1, b2], [b3, b4], [zero, b5],
        [e1, be1], [e1, r2_eq1], [zero, eq1_a],
    ]
    batch = pippenger.msm_fixed_base(
        1, GENS_LABEL, jnp.stack([jnp.stack(r) for r in rows]),
        with_blind=True, tbl=tbl_mid,
    )
    CA = jax.tree.map(lambda a: a[0], batch)
    delta_p = E.add(
        E.scalar_mul(CA, b3), jax.tree.map(lambda a: a[6], batch)
    )
    all_pts = jax.tree.map(
        lambda b, d: jnp.concatenate([b, d[None]], axis=0), batch, delta_p
    )
    encs = ristretto.encode(all_pts)  # [11, 32]
    (
        enc_CA, enc_CB, enc_CC, enc_Cab, enc_alpha_p, enc_beta_p, _,
        enc_C1, enc_C2, enc_alpha_eq1, enc_delta_p,
    ) = (encs[i] for i in range(11))

    t.append_message(b"CA", enc_CA)
    t.append_message(b"CB", enc_CB)
    t.append_message(b"CC", enc_CC)

    # ProductProof(vA, bA, vB, bB, b_ab)  [sigma.py order]
    t.append_message(b"protocol-name", b"product proof")
    t.append_message(b"Cx", enc_CA)
    t.append_message(b"Cy", enc_CB)
    t.append_message(b"Cz", enc_Cab)
    t.append_message(b"alpha", enc_alpha_p)
    t.append_message(b"beta", enc_beta_p)
    t.append_message(b"delta", enc_delta_p)
    c = t.challenge_scalar_limbs(b"c")
    z1 = F.canon(SCALAR, F.add(SCALAR, b1, F.mul(SCALAR, c, vA)))
    z2 = F.canon(SCALAR, F.add(SCALAR, b2, F.mul(SCALAR, c, bA)))
    z3 = F.canon(SCALAR, F.add(SCALAR, b3, F.mul(SCALAR, c, vB)))
    z4 = F.canon(SCALAR, F.add(SCALAR, b4, F.mul(SCALAR, c, bB)))
    z5 = F.canon(
        SCALAR,
        F.add(
            SCALAR,
            b5,
            F.mul(SCALAR, c, F.sub(SCALAR, b_ab, F.mul(SCALAR, bA, vB))),
        ),
    )

    # EqualityProof: e1 vs eq(tau, rx) * (vAB - vC)
    t.append_message(b"protocol-name", b"equality proof")
    t.append_message(b"C1", enc_C1)
    t.append_message(b"C2", enc_C2)
    t.append_message(b"alpha", enc_alpha_eq1)
    c = t.challenge_scalar_limbs(b"c")
    z_eq1 = F.canon(
        SCALAR,
        F.add(SCALAR, F.mul(SCALAR, c, F.sub(SCALAR, be1, r2_eq1)), eq1_a),
    )

    # ---- phase-2 challenges + committed claim2 ----------------------------
    r_a = t.challenge_scalar_limbs(b"challenge_Az")
    r_b = t.challenge_scalar_limbs(b"challenge_Bz")
    r_c = t.challenge_scalar_limbs(b"challenge_Cz")
    claim2 = F.add(
        SCALAR,
        F.add(SCALAR, F.mul(SCALAR, r_a, vA), F.mul(SCALAR, r_b, vB)),
        F.mul(SCALAR, r_c, vC),
    )
    bclaim2 = F.add(
        SCALAR,
        F.add(SCALAR, F.mul(SCALAR, r_a, bA), F.mul(SCALAR, r_b, bB)),
        F.mul(SCALAR, r_c, bC),
    )
    mid_encs = jnp.stack(
        [
            enc_CA,
            enc_CB,
            enc_CC,
            enc_Cab,
            enc_alpha_p,
            enc_beta_p,
            enc_delta_p,
            enc_alpha_eq1,
        ]
    )
    mid_z = jnp.stack([z1, z2, z3, z4, z5, z_eq1])
    return (
        t.strobe.state,
        mid_encs,
        mid_z,
        jnp.stack([r_a, r_b, r_c]),
        claim2,
        bclaim2,
    )


@functools.lru_cache(maxsize=None)
def _core(
    num_cons: int,
    num_z: int,
    num_vars: int,
    mu_rows: int,
    mu_cols: int,
    handoff: tuple,
):
    mu_x = (num_cons - 1).bit_length()
    mu_y = (num_z - 1).bit_length()

    def run(
        state,
        z,
        row_blinds,  # [rows, L]
        sc1_blinds,  # (b_poly [mx,L], b_next [mx,L], d [mx,4,L], r_delta, r_beta)
        abc_blinds,  # [4, L]  (bA, bB, bC, b_ab)
        prod_blinds,  # [5, L]
        eq1_a,  # [L]
        sc2_blinds,
        tbls,  # (rows-commit tables, sc1 tables, mid tables, sc2 tables)
        *flat,
    ):
        tbl_commit, tbl_sc1, tbl_mid, tbl_sc2 = tbls
        t = DeviceTranscript(_strobe=DeviceStrobe.from_state(state, *handoff))

        # ---- blinded witness commitment -----------------------------------
        W = z[:num_vars].reshape(1 << mu_rows, 1 << mu_cols, -1)
        comm = _commit_rows_blinded(W, row_blinds, tbl_commit)
        enc_rows = ristretto.encode(comm)  # [rows, 32]
        for i in range(1 << mu_rows):
            t.append_message(b"poly_commitment", enc_rows[i])

        # ---- phase 1 (ZK) -------------------------------------------------
        tau = t.challenge_vector_limbs(b"challenge_tau", mu_x)
        eq = mle._eq_table_impl(tau)
        az, bz, cz = r1cs._matvecs_jit(num_cons)(z, *flat)
        carry = (
            t.strobe.state,
            jnp.int32(num_cons // 2),
            (eq, az, bz, cz),
            F.zeros(()),
            F.zeros(()),
        )
        carry, (sc1_encs, sc1_z, sc1_zdb, rxs) = jax.lax.scan(
            _zk_round_scan(b"sc1", 3, tbl_sc1), carry, sc1_blinds, length=mu_x
        )
        state1, _, tables1, e1, be1 = carry
        vA = F.canon(SCALAR, tables1[1][0])
        vB = F.canon(SCALAR, tables1[2][0])
        vC = F.canon(SCALAR, tables1[3][0])

        # ---- claim commitments + sigma proofs + phase-2 challenges --------
        state_mid, mid_encs, mid_z, rabc, claim2, bclaim2 = _mid_zk(
            state1, tau, rxs, vA, vB, vC, abc_blinds, prod_blinds, eq1_a,
            e1, be1, tbl_mid,
        )
        r_a, r_b, r_c = rabc[0], rabc[1], rabc[2]

        # ---- phase 2 (ZK) -------------------------------------------------
        e_rx = mle._eq_table_impl(rxs)
        m_table = r1cs._mtw_jit(num_z)((r_a, r_b, r_c), e_rx, *flat)
        carry = (
            state_mid,
            jnp.int32(num_z // 2),
            (m_table, z),
            claim2,
            bclaim2,
        )
        carry, (sc2_encs, sc2_z, sc2_zdb, rys) = jax.lax.scan(
            _zk_round_scan(b"sc2", 2, tbl_sc2), carry, sc2_blinds, length=mu_y
        )
        state2, _, _, e2, be2 = carry

        # ---- opening materials + final-relation values (device) ------------
        # the log-sized blinded bullet opening and the eq2 sigma proof run on
        # the host tail (zknizk._opening_and_final_zk), resuming the sponge
        # from state2 — only O(sqrt(n)) scalars cross the boundary.
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
        e_ry = mle._eq_table_impl(rys)
        ea, eb, ec = r1cs._eval_jit()(e_rx, e_ry, *flat)
        v_m = F.canon(
            SCALAR,
            F.add(
                SCALAR,
                F.add(SCALAR, F.mul(SCALAR, r_a, ea), F.mul(SCALAR, r_b, eb)),
                F.mul(SCALAR, r_c, ec),
            ),
        )

        tail_vals = jnp.stack(
            [b_u, w_eval, v_m, F.canon(SCALAR, e2), F.canon(SCALAR, be2)]
        )
        return (
            state2,
            enc_rows,
            sc1_encs,
            sc1_z,
            sc1_zdb,
            mid_encs,
            mid_z,
            sc2_encs,
            sc2_z,
            sc2_zdb,
            u,
            tail_vals,
            rys,
        )

    return jax.jit(run)


def _int(row: np.ndarray) -> int:
    return limbs_to_int(row) % MOD


def prove(
    dev: r1cs.R1CSDevice,
    vars_ints: list,
    inputs_ints: list,
    seed: bytes | None = None,
) -> ZKNIZKProof:
    """Drop-in replacement for zknizk.prove: same seed -> byte-identical
    proof, verified by zknizk.verify; ONE device dispatch + ONE fetch."""
    from .. import metrics

    rng = BlindSource(seed or os.urandom(32))
    nvp = dev.num_vars
    mu_rows, mu_cols = _hyrax_dims(nvp)
    mu_x = (dev.num_cons - 1).bit_length()
    mu_y = (dev.num_z - 1).bit_length()
    cols = 1 << mu_cols

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
    # opening/eq2 blinds are drawn by the shared host tail
    # (zknizk._opening_and_final_zk) — same rng position as zknizk.prove

    t = Transcript(PROTO)
    t.append_message(b"R1CS", dev.digest)
    t.append_u64(b"num_inputs", len(inputs_ints))
    for x in inputs_ints:
        t.append_scalar(b"input", _sb(x))

    metrics.add("constraints", dev.num_cons)
    metrics.add("msm_points", nvp)
    vars_padded = list(vars_ints) + [0] * (nvp - len(vars_ints))

    st_np, pos, pos_begin, cur_flags = export_host_strobe(t.strobe)
    z = r1cs.assemble_z(
        _devs(vars_padded), _devs(inputs_ints) if inputs_ints else None, nvp
    )
    core = _core(
        dev.num_cons, dev.num_z, nvp, mu_rows, mu_cols, (pos, pos_begin, cur_flags)
    )
    tbls = (
        pippenger.fixed_base_tables(
            1 << mu_cols, GENS_LABEL, pippenger.FIXED_BASE_WINDOW, True
        )[0],
        _round_tables(3),
        _mid_tables(),
        _round_tables(2),
    )
    with metrics.timed("zkfused_prove"):
        out = core(
            jnp.asarray(st_np),
            z,
            _devs(row_blinds),
            sc1_blinds,
            _devs(abc),
            _devs(prod),
            _dev(eq1_a),
            sc2_blinds,
            tbls,
            *dev._flat_mats(),
        )
        (
            state2,
            enc_rows,
            sc1_encs,
            sc1_z,
            sc1_zdb,
            mid_encs,
            mid_z,
            sc2_encs,
            sc2_z,
            sc2_zdb,
            u_limb,
            tail_vals,
            rys_limb,
        ) = jax.device_get(out)
    metrics.add("sumcheck_rounds", mu_x)
    comm_enc = [
        bytes(np.asarray(enc_rows[i]).tobytes())
        for i in range(enc_rows.shape[0])
    ]
    return assemble_zk_proof(
        dev, rng, comm_enc, state2,
        sc1_encs, sc1_z, sc1_zdb, mid_encs, mid_z,
        sc2_encs, sc2_z, sc2_zdb, u_limb, tail_vals, rys_limb,
    )


def assemble_zk_proof(
    dev, rng, comm_enc, state2,
    sc1_encs, sc1_z, sc1_zdb, mid_encs, mid_z,
    sc2_encs, sc2_z, sc2_zdb, u_limb, tail_vals, rys_limb,
):
    """Package device-produced ZK round materials into a ZKNIZKProof and
    run the host tail (blinded bullet opening + eq2), resuming the
    transcript from the device sponge state.  Shared by the single-
    dispatch and hybrid provers; ``rng`` must be positioned exactly after
    the sc2 blind draws (zknizk.prove's order).

    tail_vals = [b_u, w_eval, v_m, e2, be2] canonical limb rows."""
    nvp = dev.num_vars
    mu_rows, mu_cols = _hyrax_dims(nvp)
    mu_x = (dev.num_cons - 1).bit_length()
    mu_y = (dev.num_z - 1).bit_length()
    cols = 1 << mu_cols

    def enc(a) -> bytes:
        return bytes(np.asarray(a).tobytes())

    def sc_proof(encs, zz, zdb, n_rounds, degree) -> ZKSumcheckProof:
        comm_polys = [enc(encs[j, 0]) for j in range(n_rounds)]
        comm_evals = [enc(encs[j, 1]) for j in range(n_rounds)]
        dots = [
            DotProductProof(
                delta=enc(encs[j, 2]),
                beta=enc(encs[j, 3]),
                z=[_int(zz[j, k]) for k in range(degree + 1)],
                z_delta=_int(zdb[j, 0]),
                z_beta=_int(zdb[j, 1]),
            )
            for j in range(n_rounds)
        ]
        return ZKSumcheckProof(comm_polys, comm_evals, dots)

    # ---- host tail: log-sized blinded opening + eq2 ------------------------
    # resume the transcript from the device sponge state and run the SAME
    # tail as zknizk.prove (same rng position -> byte-identical proofs).
    # Sub-timers (r05, VERDICT r04 next #7): host_decode = limb->int
    # conversions of the fetched materials; host_sigma = the blinded
    # bullet opening + eq2 sigma protocols; host_serialize = proof-object
    # packaging (the sc_proof/enc conversions below).
    from .. import metrics
    from ..transcript.merlin import transcript_from_strobe_state
    from .zknizk import _opening_and_final_zk, _max_gens
    from .pedersen_host import Gens

    t_tail = transcript_from_strobe_state(
        np.asarray(state2).tobytes(), *_POST_CHALLENGE
    )
    gens = Gens(_max_gens(dev), GENS_LABEL)
    with metrics.timed("host_decode"):
        u_ints = [_int(u_limb[k]) for k in range(cols)]
        b_u, w_eval, v_m, e2, be2 = (_int(tail_vals[k]) for k in range(5))
        rys = [_int(rys_limb[k]) for k in range(mu_y)]
    r_w = rys[1:]
    from .nizk import _eq_weights

    with metrics.timed("host_sigma"):
        enc_w, enc_wq, base_eq, proof_bullet, eq2_proof = _opening_and_final_zk(
            t_tail, gens, mu_cols, u_ints, b_u, w_eval,
            _eq_weights(r_w[mu_rows:]), v_m, rys[0], e2, be2, rng,
        )

    with metrics.timed("host_serialize"):
        proof = _build_zk_proof_obj(
            comm_enc, sc_proof, enc, mid_encs, mid_z,
            sc1_encs, sc1_z, sc1_zdb, sc2_encs, sc2_z, sc2_zdb,
            mu_x, mu_y, enc_w, enc_wq, base_eq, proof_bullet, eq2_proof,
        )
    return proof


def _build_zk_proof_obj(
    comm_enc, sc_proof, enc, mid_encs, mid_z,
    sc1_encs, sc1_z, sc1_zdb, sc2_encs, sc2_z, sc2_zdb,
    mu_x, mu_y, enc_w, enc_wq, base_eq, proof_bullet, eq2_proof,
):
    return ZKNIZKProof(
        comm_vars=list(comm_enc),
        sc1=sc_proof(sc1_encs, sc1_z, sc1_zdb, mu_x, 3),
        comm_abc=(enc(mid_encs[0]), enc(mid_encs[1]), enc(mid_encs[2])),
        comm_ab=enc(mid_encs[3]),
        proof_ab=ProductProof(
            alpha=enc(mid_encs[4]),
            beta=enc(mid_encs[5]),
            delta=enc(mid_encs[6]),
            z=tuple(_int(mid_z[k]) for k in range(5)),
        ),
        eq1=EqualityProof(alpha=enc(mid_encs[7]), z=_int(mid_z[5])),
        sc2=sc_proof(sc2_encs, sc2_z, sc2_zdb, mu_y, 2),
        comm_w=enc_w,
        comm_wq=enc_wq,
        base_eq=base_eq,
        bullet=proof_bullet,
        eq2=eq2_proof,
    )
