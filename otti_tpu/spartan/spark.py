"""SPARK: sparse-matrix polynomial commitments (Spartan SNARK mode).

Reconstructs the role of Spartan's ``sparse_mlpoly.rs`` (SURVEY.md §2.2:
"in SNARK mode, SPARK sparse-poly commitments for A/B/C") with machinery
native to this framework: the per-entry eq-evaluation advice polynomials
are tied to the committed (row, col, val) description by a **logup
(log-derivative) lookup argument** instead of Spartan's grand-product
memory checking — the same statement (E_row[i] = eq(rx, row[i]) as a
multiset lookup into the eq table), proven with the sumcheck kernels this
framework already has, rather than a port of the reference's product
circuits.  Verification cost is O(log) field work + sqrt openings —
independent of nnz, which is the whole point of SNARK mode.

Combined-ABC layout (r04; VERDICT r03 next #4 "batch the SPARK openings"):
the three matrices live in ONE power-of-2 cube — each matrix's entries
padded to a common block size n_blk, blocks A|B|C|0 selected by the two
TOP (MSB-first) variables.  One entry-cube sumcheck proves all three
claimed evaluations at once through a block-selector table (multilinear:
sel(X) = sum_b c1_b * eq_b(X_top), evaluated in closed form by the
verifier), one logup per table side covers all three matrices' lookups
(multiplicities add across blocks), and ONE RLC-batched Hyrax opening
per cube replaces the nine of the per-matrix design — the r03 proof-size
regression (101 KB on afiro) drops to ~1/3.

Protocol over the combined cube (3 * nnz padded to 4 * n_blk = 2^mu_n):
  preprocessing: Hyrax-commit dense MLEs row_f, col_f, val (single
    commitment each; row_f/col_f carry the indices as field elements).
  eval proof for (eA, eB, eC) = (A~, B~, C~)(rx, ry):
    1. advice: E_row[i] = eq_rx[row[i]], E_col[i] = eq_ry[col[i]];
       combined multiplicities m_row[a], m_col[a].  Commit.
    2. challenges (gamma, tau) per side; inverse advice
       invR[i] = 1/(tau - row_f[i] - gamma*E_row[i]),
       invT[a] = 1/(tau - id(a)  - gamma*eq_rx[a]).  Commit.
    3. one combined degree-4 sumcheck over the entry cube proving
         sum sel*val*E_row*E_col = c1a*eA + c1b*eB + c1c*eC,
         both entry-side logup zero-checks, and the entry-side logup
         sums; one combined cubic sumcheck per table cube (rows / cols)
       proving the table-side zero-check and sum.  Logup identity:
         sum_i invR[i] == sum_a m[a] * invT[a].
    4. one RLC-batched Hyrax opening of the 7 entry-cube polys and one
       2-poly opening per table side; the verifier evaluates eq/id/sel
       MLEs in closed form.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..field import ops as F
from ..field.fields import SCALAR, int_to_limbs
from ..transcript.merlin import Transcript
from . import hyrax, mle, r1cs, sumcheck
from .nizk import _dev_scalar, _dev_vec, _eq_point, _sb

MOD = SCALAR.modulus
GENS = b"gens_spark"


def _next_pow2(n):
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


def _ones(n):
    return F.ones(SCALAR, (n,))


# ---------------------------------------------------------------------------
# round combinations (registered once)
# ---------------------------------------------------------------------------

def _comb_entry(consts, exts):
    c2, c3, c4, c5 = consts
    sel, val, er, ec, eqn, invr, gr, invc, gc = exts
    one = F.ones(SCALAR, val.shape[:-1])
    t1 = F.mul(SCALAR, F.mul(SCALAR, F.mul(SCALAR, sel, val), er), ec)
    t2 = F.mul(SCALAR, eqn, F.sub(SCALAR, F.mul(SCALAR, invr, gr), one))
    t3 = F.mul(SCALAR, eqn, F.sub(SCALAR, F.mul(SCALAR, invc, gc), one))
    out = F.add(SCALAR, t1, F.mul(SCALAR, t2, c2[None, :]))
    out = F.add(SCALAR, out, F.mul(SCALAR, t3, c3[None, :]))
    out = F.add(SCALAR, out, F.mul(SCALAR, invr, c4[None, :]))
    return F.add(SCALAR, out, F.mul(SCALAR, invc, c5[None, :]))


def _comb_table(consts, exts):
    c6, c7 = consts
    m, invt, eqx, gt = exts
    one = F.ones(SCALAR, m.shape[:-1])
    t1 = F.mul(SCALAR, m, invt)
    t2 = F.mul(SCALAR, eqx, F.sub(SCALAR, F.mul(SCALAR, invt, gt), one))
    out = F.mul(SCALAR, t1, c6[None, :])
    return F.add(SCALAR, out, F.mul(SCALAR, t2, c7[None, :]))


sumcheck.register_comb("spark_entry4", _comb_entry)
sumcheck.register_comb("spark_table", _comb_table)


# ---------------------------------------------------------------------------
# commitment (preprocessing) — one combined cube for A|B|C|0
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SparkCommitment:
    mu_n: int  # log2 of the combined cube (= mu_blk + 2)
    comm_row: list
    comm_col: list
    comm_val: list
    mu_x: int
    mu_y: int
    # prover-retained dense data (combined layout)
    row_idx: np.ndarray
    col_idx: np.ndarray
    row_f: jax.Array
    col_f: jax.Array
    val: jax.Array

    def transcript_bytes(self) -> bytes:
        out = b""
        for lst in (self.comm_row, self.comm_col, self.comm_val):
            for enc in lst:
                out += enc
        return out


def commit(dev: r1cs.R1CSDevice) -> SparkCommitment:
    """Commit A|B|C in one block-aligned cube: each matrix's entries are
    padded to n_blk = next_pow2(max nnz); block b = matrix b, block 3
    zero.  MSB-first variable order => the top two variables select the
    block, so per-matrix sums are recovered by the multilinear selector
    sel(X) = sum_b c_b eq_b(X_top) (closed form for the verifier)."""
    n_blk = _next_pow2(max(dev.mats[w][0].shape[0] for w in range(3)))
    n_tot = 4 * n_blk
    row_idx = np.zeros(n_tot, np.int32)
    col_idx = np.zeros(n_tot, np.int32)
    val_parts = []
    for which in range(3):
        rows, cols, vals = dev.mats[which]
        nnz = rows.shape[0]
        row_idx[which * n_blk : which * n_blk + nnz] = np.asarray(rows)
        col_idx[which * n_blk : which * n_blk + nnz] = np.asarray(cols)
        val_parts.append(vals)
        val_parts.append(jnp.zeros((n_blk - nnz, vals.shape[-1]), jnp.int32))
    val_parts.append(jnp.zeros((n_blk, val_parts[0].shape[-1]), jnp.int32))
    val = jnp.concatenate(val_parts)
    row_f = _int_vec_to_field(row_idx)
    col_f = _int_vec_to_field(col_idx)
    return SparkCommitment(
        mu_n=(n_tot - 1).bit_length(),
        comm_row=hyrax.commit_poly(row_f, GENS),
        comm_col=hyrax.commit_poly(col_f, GENS),
        comm_val=hyrax.commit_poly(val, GENS),
        mu_x=(dev.num_cons - 1).bit_length(),
        mu_y=(dev.num_z - 1).bit_length(),
        row_idx=row_idx,
        col_idx=col_idx,
        row_f=row_f,
        col_f=col_f,
        val=val,
    )


def _int_vec_to_field(idx: np.ndarray) -> jax.Array:
    """int32 indices -> limb vectors (values < 2^24 -> two limbs)."""
    out = np.zeros((len(idx), int_to_limbs(0).shape[0]), np.int32)
    out[:, 0] = idx & 0xFFF
    out[:, 1] = (idx >> 12) & 0xFFF
    out[:, 2] = idx >> 24
    return jnp.asarray(out)


# ---------------------------------------------------------------------------
# eval proof
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SparkSideProof:
    """Logup table side (rows or cols), covering all three matrices."""

    comm_m: list
    comm_invT: list
    s_T: int  # claimed sum m*invT
    rounds: list
    claim_m: int
    claim_invT: int
    opening: object  # BulletOpeningProof (r05: u no longer revealed)


@dataclasses.dataclass
class SparkEvalProof:
    """Combined A/B/C evaluation proof (one entry cube, one side each)."""

    comm_E_row: list
    comm_E_col: list
    comm_invR_row: list
    comm_invR_col: list
    s_R_row: int
    s_R_col: int
    entry_rounds: list
    entry_claims: dict  # val, e_row, e_col, inv_r_row, inv_r_col, row, col
    entry_opening: object  # BulletOpeningProof
    side_row: SparkSideProof
    side_col: SparkSideProof


_inv_jit_cache: dict = {}


def _batch_inv_dev(x: jax.Array) -> jax.Array:
    n = x.shape[0]
    if n not in _inv_jit_cache:
        _inv_jit_cache[n] = jax.jit(lambda v: F.inv(SCALAR, v))
    return _inv_jit_cache[n](x)


def _counts_to_field(idx: np.ndarray, size: int) -> jax.Array:
    counts = np.bincount(idx, minlength=size).astype(np.int64)
    out = np.zeros((size, int_to_limbs(0).shape[0]), np.int32)
    out[:, 0] = counts & 0xFFF
    out[:, 1] = (counts >> 12) & 0xFFF
    out[:, 2] = counts >> 24
    return jnp.asarray(out)


def _id_mle_eval(point: list, mu: int) -> int:
    """MLE of a -> a over the mu-cube, at ``point`` (MSB-first)."""
    acc = 0
    for j, p in enumerate(point):
        acc = (acc + p * (1 << (mu - 1 - j))) % MOD
    return acc


def _sel_mle_eval(weights: list, point2: list) -> int:
    """MLE of the block-selector table at the top-two-variable point:
    sum_b w_b * eq(bits(b), point2)."""
    acc = 0
    for b, w in enumerate(weights):
        hi, lo = (b >> 1) & 1, b & 1
        e = ((point2[0] if hi else (1 - point2[0])) % MOD) * (
            (point2[1] if lo else (1 - point2[1])) % MOD
        ) % MOD
        acc = (acc + w * e) % MOD
    return acc


def _sel_table(weights: list, n_blk: int) -> jax.Array:
    """[4*n_blk, L] block-constant selector table."""
    rows = []
    for w in weights:
        limb = _dev_scalar(w % MOD)
        rows.append(jnp.broadcast_to(limb[None, :], (n_blk, limb.shape[0])))
    return jnp.concatenate(rows)


def _gather_table(table: jax.Array, idx: np.ndarray) -> jax.Array:
    return table[jnp.asarray(idx)]


def prove_eval(
    comm: SparkCommitment,
    rx: list,
    ry: list,
    claimed: tuple,  # (eA, eB, eC)
    t: Transcript,
    label: bytes,
) -> SparkEvalProof:
    mu_x, mu_y = comm.mu_x, comm.mu_y
    n_blk = (1 << comm.mu_n) // 4
    eq_rx = mle.eq_table(_dev_vec(rx))
    eq_ry = mle.eq_table(_dev_vec(ry))
    e_row = _gather_table(eq_rx, comm.row_idx)
    e_col = _gather_table(eq_ry, comm.col_idx)
    m_row = _counts_to_field(comm.row_idx, 1 << mu_x)
    m_col = _counts_to_field(comm.col_idx, 1 << mu_y)

    comm_E_row = hyrax.commit_poly(e_row, GENS)
    comm_E_col = hyrax.commit_poly(e_col, GENS)
    comm_m_row = hyrax.commit_poly(m_row, GENS)
    comm_m_col = hyrax.commit_poly(m_col, GENS)
    for lbl, encs in (
        (b"E_row", comm_E_row),
        (b"E_col", comm_E_col),
        (b"m_row", comm_m_row),
        (b"m_col", comm_m_col),
    ):
        for enc in encs:
            t.append_point(label + b"/" + lbl, enc)

    gam_r = t.challenge_scalar(label + b"/gamma_row")
    tau_r = t.challenge_scalar(label + b"/tau_row")
    gam_c = t.challenge_scalar(label + b"/gamma_col")
    tau_c = t.challenge_scalar(label + b"/tau_col")

    def g_entry(row_f, e_tbl, gam, tau):
        gm = F.mul(SCALAR, _dev_scalar(gam)[None, :], e_tbl)
        s = F.add(SCALAR, row_f, gm)
        return F.sub(SCALAR, F.const(SCALAR, tau, (row_f.shape[0],)), s)

    g_row = g_entry(comm.row_f, e_row, gam_r, tau_r)
    g_col = g_entry(comm.col_f, e_col, gam_c, tau_c)
    inv_r_row = _batch_inv_dev(g_row)
    inv_r_col = _batch_inv_dev(g_col)

    # table side denominators
    idx_x = _int_vec_to_field(np.arange(1 << mu_x, dtype=np.int64))
    idx_y = _int_vec_to_field(np.arange(1 << mu_y, dtype=np.int64))
    gT_row = g_entry(idx_x, eq_rx, gam_r, tau_r)
    gT_col = g_entry(idx_y, eq_ry, gam_c, tau_c)
    invT_row = _batch_inv_dev(gT_row)
    invT_col = _batch_inv_dev(gT_col)

    comm_invR_row = hyrax.commit_poly(inv_r_row, GENS)
    comm_invR_col = hyrax.commit_poly(inv_r_col, GENS)
    comm_invT_row = hyrax.commit_poly(invT_row, GENS)
    comm_invT_col = hyrax.commit_poly(invT_col, GENS)
    for lbl, encs in (
        (b"invR_row", comm_invR_row),
        (b"invR_col", comm_invR_col),
        (b"invT_row", comm_invT_row),
        (b"invT_col", comm_invT_col),
    ):
        for enc in encs:
            t.append_point(label + b"/" + lbl, enc)

    # claimed logup sums
    s_R_row = _sum_host(inv_r_row)
    s_R_col = _sum_host(inv_r_col)
    s_T_row = _sum_host(F.mul(SCALAR, m_row, invT_row))
    s_T_col = _sum_host(F.mul(SCALAR, m_col, invT_col))
    for lbl, v in (
        (b"s_R_row", s_R_row),
        (b"s_R_col", s_R_col),
        (b"s_T_row", s_T_row),
        (b"s_T_col", s_T_col),
    ):
        t.append_scalar(label + b"/" + lbl, _sb(v))

    # ---- entry-side combined sumcheck (degree 4: sel*val*E_row*E_col) -----
    cs = [t.challenge_scalar(label + b"/c%d" % i) for i in range(1, 8)]
    c1a, c1b, c1c, c2, c3, c4, c5 = cs
    rho_n = t.challenge_vector(label + b"/rho_n", comm.mu_n)
    eq_n = mle.eq_table(_dev_vec(rho_n))
    eA, eB, eC = claimed
    claim_e = (
        c1a * eA + c1b * eB + c1c * eC + c4 * s_R_row + c5 * s_R_col
    ) % MOD
    sel = _sel_table([c1a, c1b, c1c, 0], n_blk)
    tables = (
        sel, comm.val, e_row, e_col, eq_n, inv_r_row, g_row, inv_r_col, g_col,
    )
    consts = tuple(_dev_scalar(c) for c in (c2, c3, c4, c5))
    entry_rounds, rho_star, finals, e_final = sumcheck.prove_custom_device(
        claim_e, tables, consts, "spark_entry4", 4, t, label + b"/entry"
    )
    claims = {
        "val": finals[1],
        "e_row": finals[2],
        "e_col": finals[3],
        "inv_r_row": finals[5],
        "inv_r_col": finals[7],
        "row": hyrax.eval_poly_host(comm.row_f, rho_star),
        "col": hyrax.eval_poly_host(comm.col_f, rho_star),
    }
    order = ["val", "e_row", "e_col", "inv_r_row", "inv_r_col", "row", "col"]
    for k in order:
        t.append_scalar(label + b"/claim_" + k.encode(), _sb(claims[k]))
    d = [t.challenge_scalar(label + b"/d%d" % i) for i in range(len(order))]
    entry_bullet = hyrax.open_rlc_bullet(
        [comm.val, e_row, e_col, inv_r_row, inv_r_col, comm.row_f, comm.col_f],
        d,
        rho_star,
        t,
        GENS,
    )

    # ---- table sides ------------------------------------------------------
    def table_side(side_lbl, mu_t, m_tbl, invT_tbl, comm_m, comm_invT, s_T):
        c6 = t.challenge_scalar(label + side_lbl + b"/c6")
        c7 = t.challenge_scalar(label + side_lbl + b"/c7")
        rho_t = t.challenge_vector(label + side_lbl + b"/rho", mu_t)
        eq_t = mle.eq_table(_dev_vec(rho_t))
        gt = gT_row if side_lbl == b"/row" else gT_col
        claim_t = c6 * s_T % MOD
        rounds, sigma, finals_t, _ = sumcheck.prove_custom_device(
            claim_t,
            (m_tbl, invT_tbl, eq_t, gt),
            (_dev_scalar(c6), _dev_scalar(c7)),
            "spark_table",
            3,
            t,
            label + side_lbl + b"/table",
        )
        cm, ci = finals_t[0], finals_t[1]
        t.append_scalar(label + side_lbl + b"/claim_m", _sb(cm))
        t.append_scalar(label + side_lbl + b"/claim_invT", _sb(ci))
        d2 = [
            t.challenge_scalar(label + side_lbl + b"/d%d" % i) for i in range(2)
        ]
        b2 = hyrax.open_rlc_bullet([m_tbl, invT_tbl], d2, sigma, t, GENS)
        return SparkSideProof(
            comm_m=comm_m,
            comm_invT=comm_invT,
            s_T=s_T,
            rounds=rounds,
            claim_m=cm,
            claim_invT=ci,
            opening=b2,
        )

    side_row = table_side(b"/row", mu_x, m_row, invT_row, comm_m_row, comm_invT_row, s_T_row)
    side_col = table_side(b"/col", mu_y, m_col, invT_col, comm_m_col, comm_invT_col, s_T_col)

    return SparkEvalProof(
        comm_E_row=comm_E_row,
        comm_E_col=comm_E_col,
        comm_invR_row=comm_invR_row,
        comm_invR_col=comm_invR_col,
        s_R_row=s_R_row,
        s_R_col=s_R_col,
        entry_rounds=entry_rounds,
        entry_claims=claims,
        entry_opening=entry_bullet,
        side_row=side_row,
        side_col=side_col,
    )


def _sum_host(x: jax.Array) -> int:
    return int(F.pack_ints(SCALAR, F.canon(SCALAR, F.sum_reduce(SCALAR, x, axis=0))))


def verify_eval(
    comm: "SparkCommitment",
    rx: list,
    ry: list,
    claimed: tuple,
    proof: SparkEvalProof,
    t: Transcript,
    label: bytes,
) -> bool:
    mu_x, mu_y = comm.mu_x, comm.mu_y
    for lbl, encs in (
        (b"E_row", proof.comm_E_row),
        (b"E_col", proof.comm_E_col),
        (b"m_row", proof.side_row.comm_m),
        (b"m_col", proof.side_col.comm_m),
    ):
        for enc in encs:
            t.append_point(label + b"/" + lbl, enc)
    gam_r = t.challenge_scalar(label + b"/gamma_row")
    tau_r = t.challenge_scalar(label + b"/tau_row")
    gam_c = t.challenge_scalar(label + b"/gamma_col")
    tau_c = t.challenge_scalar(label + b"/tau_col")
    for lbl, encs in (
        (b"invR_row", proof.comm_invR_row),
        (b"invR_col", proof.comm_invR_col),
        (b"invT_row", proof.side_row.comm_invT),
        (b"invT_col", proof.side_col.comm_invT),
    ):
        for enc in encs:
            t.append_point(label + b"/" + lbl, enc)
    for lbl, v in (
        (b"s_R_row", proof.s_R_row),
        (b"s_R_col", proof.s_R_col),
        (b"s_T_row", proof.side_row.s_T),
        (b"s_T_col", proof.side_col.s_T),
    ):
        t.append_scalar(label + b"/" + lbl, _sb(v))

    # logup sum identities
    if proof.s_R_row != proof.side_row.s_T or proof.s_R_col != proof.side_col.s_T:
        return False

    cs = [t.challenge_scalar(label + b"/c%d" % i) for i in range(1, 8)]
    c1a, c1b, c1c, c2, c3, c4, c5 = cs
    rho_n = t.challenge_vector(label + b"/rho_n", comm.mu_n)
    eA, eB, eC = claimed
    claim_e = (
        c1a * eA + c1b * eB + c1c * eC
        + c4 * proof.s_R_row + c5 * proof.s_R_col
    ) % MOD
    e_final, rho_star = sumcheck.verify_custom(
        claim_e, proof.entry_rounds, 4, t, label + b"/entry"
    )
    cl = proof.entry_claims
    order = ["val", "e_row", "e_col", "inv_r_row", "inv_r_col", "row", "col"]
    for k in order:
        t.append_scalar(label + b"/claim_" + k.encode(), _sb(cl[k]))
    d = [t.challenge_scalar(label + b"/d%d" % i) for i in range(len(order))]
    if not hyrax.verify_rlc_bullet(
        [comm.comm_val, proof.comm_E_row, proof.comm_E_col,
         proof.comm_invR_row, proof.comm_invR_col, comm.comm_row,
         comm.comm_col],
        d,
        rho_star,
        [cl[k] for k in order],
        proof.entry_opening,
        GENS,
        t,
    ):
        return False
    # final entry identity (sel evaluated in closed form on the top vars)
    eq_n_star = _eq_point(rho_n, rho_star)
    sel_star = _sel_mle_eval([c1a, c1b, c1c, 0], rho_star[:2])
    g_row_star = (tau_r - cl["row"] - gam_r * cl["e_row"]) % MOD
    g_col_star = (tau_c - cl["col"] - gam_c * cl["e_col"]) % MOD
    want = (
        sel_star * (cl["val"] * cl["e_row"] % MOD * cl["e_col"]) % MOD
        + c2 * eq_n_star % MOD * ((cl["inv_r_row"] * g_row_star - 1) % MOD)
        + c3 * eq_n_star % MOD * ((cl["inv_r_col"] * g_col_star - 1) % MOD)
        + c4 * cl["inv_r_row"]
        + c5 * cl["inv_r_col"]
    ) % MOD
    if want != e_final:
        return False

    # table sides
    def check_side(side_lbl, mu_t, sp, r_point, gam, tau):
        c6 = t.challenge_scalar(label + side_lbl + b"/c6")
        c7 = t.challenge_scalar(label + side_lbl + b"/c7")
        rho_t = t.challenge_vector(label + side_lbl + b"/rho", mu_t)
        claim_t = c6 * sp.s_T % MOD
        ef, sigma = sumcheck.verify_custom(
            claim_t, sp.rounds, 3, t, label + side_lbl + b"/table"
        )
        t.append_scalar(label + side_lbl + b"/claim_m", _sb(sp.claim_m))
        t.append_scalar(label + side_lbl + b"/claim_invT", _sb(sp.claim_invT))
        d2 = [
            t.challenge_scalar(label + side_lbl + b"/d%d" % i) for i in range(2)
        ]
        if not hyrax.verify_rlc_bullet(
            [sp.comm_m, sp.comm_invT],
            d2,
            sigma,
            [sp.claim_m, sp.claim_invT],
            sp.opening,
            GENS,
            t,
        ):
            return False
        id_star = _id_mle_eval(sigma, mu_t)
        eq_table_star = _eq_point(r_point, sigma)
        gT_star = (tau - id_star - gam * eq_table_star) % MOD
        eq_t_star = _eq_point(rho_t, sigma)
        want_t = (
            c6 * (sp.claim_m * sp.claim_invT) % MOD
            + c7 * eq_t_star % MOD * ((sp.claim_invT * gT_star - 1) % MOD)
        ) % MOD
        return want_t == ef

    if not check_side(b"/row", mu_x, proof.side_row, rx, gam_r, tau_r):
        return False
    if not check_side(b"/col", mu_y, proof.side_col, ry, gam_c, tau_c):
        return False
    return True
