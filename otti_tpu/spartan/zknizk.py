"""Zero-knowledge Spartan NIZK (full parity with the reference's NIZK mode).

Assembles the ZK sumchecks (zksumcheck.py), the sigma toolbox (sigma.py),
and blinded Hyrax row commitments into the complete argument of SURVEY.md
§3.5: nothing about the witness is revealed beyond R1CS satisfiability —
claims, matrix-evaluation values, and the opening combination all travel
as Pedersen commitments with Schnorr-style consistency proofs.

Protocol (labels are the canonical wire format of this framework):
  1. commit witness rows with blinds (device MSMs)  -> comm_vars
  2. tau <- FS;  ZK sumcheck #1 on eq*(Az*Bz - Cz), claim 0
  3. commit vA, vB, vC;  ProductProof for vA*vB;
     EqualityProof: e1_final == eq(tau, rx) * (vAB - vC)
  4. rA, rB, rC <- FS;  committed claim2 = rA*CA + rB*CB + rC*CC
     ZK sumcheck #2 on M * Z
  5. commit w_eval = W(ry[1:]);  DotProductProof: <u, eq_R> = w_eval
     against C_u = sum_i L_i * comm_vars_i  (Hyrax opening, blinds fold)
  6. EqualityProof: e2_final == M(ry) * ((1-ry0)*w_eval + ry0*v_io)
"""

from __future__ import annotations

import dataclasses
import os

from ..field import ops as F
from ..field.fields import SCALAR
from ..refimpl import numeric as ref
from ..transcript.merlin import Transcript
from . import commitments, mle, r1cs, sigma, zksumcheck
from .nizk import (
    GENS_LABEL,
    _dev_scalar,
    _dev_vec,
    _eq_point,
    _eq_weights,
    _hyrax_dims,
    _mle_eval_host,
    _row_combine_jit,
    _sb,
)
from .pedersen_host import BlindSource, Gens, commit, decode

L = ref.L
PROTO = b"otti-tpu Spartan zkNIZK v1"


@dataclasses.dataclass
class ZKNIZKProof:
    comm_vars: list  # blinded row commitments (bytes32)
    sc1: zksumcheck.ZKSumcheckProof
    comm_abc: tuple  # (CA, CB, CC) bytes32
    comm_ab: bytes  # commitment to vA*vB
    proof_ab: sigma.ProductProof
    eq1: sigma.EqualityProof
    sc2: zksumcheck.ZKSumcheckProof
    comm_w: bytes  # commitment to W(ry[1:]) under base G0 (for eq2)
    comm_wq: bytes  # same value under base Q (for the bullet opening)
    base_eq: sigma.DualBaseEqualityProof  # comm_w == comm_wq in value
    bullet: object  # log-sized blinded opening (bullet.BulletOpeningProof)
    eq2: sigma.EqualityProof

    def size_bytes(self) -> int:
        pts = (
            len(self.comm_vars)
            + len(self.sc1.comm_polys) * 2
            + len(self.sc2.comm_polys) * 2
            + 3
            + 1
            + 1
            + 3  # product proof points
            + 2  # equality alphas
            + 2  # comm_w + comm_wq
            + 2  # base_eq alpha/beta
        )
        scalars = (
            sum(len(d.z) + 2 for d in self.sc1.dot_proofs)
            + sum(len(d.z) + 2 for d in self.sc2.dot_proofs)
            + 5
            + 1
            + 3  # base_eq z's
            + 1
        )
        return 32 * (pts + scalars) + self.bullet.size_bytes()


def _max_gens(dev: r1cs.R1CSDevice) -> int:
    _, mu_cols = _hyrax_dims(dev.num_vars)
    return max(1 << mu_cols, 4)


def prove(
    dev: r1cs.R1CSDevice,
    vars_ints: list,
    inputs_ints: list,
    seed: bytes | None = None,
    wire=None,
) -> ZKNIZKProof:
    """``wire``: a wire.WireProfile (or name) selecting the transcript
    label schedule — "otti" (default) or "spartan" (upstream-compatible
    vocabulary; see spartan/wire.py and docs/PROTOCOL.md)."""
    from .wire import OTTI, PROFILES

    wire = PROFILES[wire] if isinstance(wire, str) else (wire or OTTI)
    rng = BlindSource(seed or os.urandom(32))
    gens = Gens(_max_gens(dev), GENS_LABEL)

    t = Transcript(wire.proto)
    t.append_message(wire.r1cs_digest, dev.digest)
    t.append_u64(b"num_inputs", len(inputs_ints))
    for x in inputs_ints:
        t.append_scalar(wire.input, _sb(x))

    nvp = dev.num_vars
    mu_rows, mu_cols = _hyrax_dims(nvp)
    vars_padded = list(vars_ints) + [0] * (nvp - len(vars_ints))
    W = _dev_vec(vars_padded).reshape(1 << mu_rows, 1 << mu_cols, -1)
    row_blinds = rng.scalars(1 << mu_rows)
    comm_rows = commitments.commit_rows(W, row_blinds, GENS_LABEL)
    comm_enc = commitments.encode_points(comm_rows)
    for enc in comm_enc:
        t.append_point(wire.poly_commitment, enc)

    # ---- phase 1 (ZK) -----------------------------------------------------
    mu_x = (dev.num_cons - 1).bit_length()
    tau = t.challenge_vector(wire.challenge_tau, mu_x)
    z = r1cs.assemble_z(
        _dev_vec(vars_padded), _dev_vec(inputs_ints) if inputs_ints else None, nvp
    )
    eq_tau = mle.eq_table(_dev_vec(tau))
    az, bz, cz = dev.matvecs(z)
    sc1, rx, (f_eq, vA, vB, vC), e1, be1 = zksumcheck.prove_zk(
        3, 0, 0, (eq_tau, az, bz, cz), t, b"sc1", gens, rng, wire=wire
    )

    # commitments to the matrix evaluations + product + final relation
    bA, bB, bC = rng.scalars(3)
    CA, CB, CC = (commit(v, b, gens) for v, b in ((vA, bA), (vB, bB), (vC, bC)))
    for lbl, C in ((wire.comm_A, CA), (wire.comm_B, CB), (wire.comm_C, CC)):
        t.append_point(lbl, C.ristretto_encode())
    b_ab = rng.scalar()
    if wire.name != "otti":
        # upstream absorbs the product-claim commitment explicitly
        # (r1csproof.rs comm_prod_Az_Bz_claims) before the product proof
        C_ab_pre = commit(vA * vB % L, b_ab, gens)
        t.append_point(wire.comm_AB, C_ab_pre.ristretto_encode())
    proof_ab, _, _, C_ab = sigma.ProductProof.prove(
        t, gens, vA, bA, vB, bB, b_ab, rng
    )
    # e1 == eq(tau, rx) * (vA*vB - vC)
    eq_val = _eq_point(tau, rx)
    # commitment to RHS: eq * (C_ab - CC); blind eq*(b_ab - bC)
    eq1_proof, _, _ = sigma.EqualityProof.prove(
        t, gens, e1, be1, eq_val * (b_ab - bC) % L, rng
    )

    # ---- phase 2 (ZK) -----------------------------------------------------
    r_a = t.challenge_scalar(wire.challenge_Az)
    r_b = t.challenge_scalar(wire.challenge_Bz)
    r_c = t.challenge_scalar(wire.challenge_Cz)
    claim2 = (r_a * vA + r_b * vB + r_c * vC) % L
    bclaim2 = (r_a * bA + r_b * bB + r_c * bC) % L
    e_rx = mle.eq_table(_dev_vec(rx))
    m_table = dev.matvec_T_weighted(
        (_dev_scalar(r_a), _dev_scalar(r_b), _dev_scalar(r_c)), e_rx
    )
    sc2, ry, (f_m, f_z), e2, be2 = zksumcheck.prove_zk(
        2, claim2, bclaim2, (m_table, z), t, b"sc2", gens, rng, wire=wire
    )

    # ---- Hyrax opening (ZK, log-sized) + final relation -------------------
    r_w = ry[1:]
    eq_L = mle.eq_table(_dev_vec(r_w[:mu_rows])) if mu_rows else F.ones(SCALAR, (1,))
    u = _row_combine_jit(W.shape[:2])(eq_L, W)
    u_ints = [int(v) for v in F.pack_ints(SCALAR, u)]
    L_weights = _eq_weights(r_w[:mu_rows])
    b_u = sum(li * bi for li, bi in zip(L_weights, row_blinds)) % L
    w_eval = _mle_eval_host(vars_padded, r_w)

    e_ry = mle.eq_table(_dev_vec(ry))
    ea, eb, ec = (int(F.pack_ints(SCALAR, v)) for v in dev.eval_at(e_rx, e_ry))
    v_m = (r_a * ea + r_b * eb + r_c * ec) % L

    enc_w, enc_wq, base_eq, proof_bullet, eq2_proof = _opening_and_final_zk(
        t, gens, mu_cols, u_ints, b_u, w_eval,
        _eq_weights(r_w[mu_rows:]), v_m, ry[0], e2, be2, rng,
    )

    return ZKNIZKProof(
        comm_vars=comm_enc,
        sc1=sc1,
        comm_abc=(
            CA.ristretto_encode(),
            CB.ristretto_encode(),
            CC.ristretto_encode(),
        ),
        comm_ab=C_ab.ristretto_encode(),
        proof_ab=proof_ab,
        eq1=eq1_proof,
        sc2=sc2,
        comm_w=enc_w,
        comm_wq=enc_wq,
        base_eq=base_eq,
        bullet=proof_bullet,
        eq2=eq2_proof,
    )


def _opening_and_final_zk(
    t, gens, mu_cols, u_ints, b_u, w_eval, R_weights, v_m, ry0, e2, be2, rng
):
    """Blinded log-sized opening + final-relation proof (host tail).

    Shared verbatim by zknizk.prove and zkfused.prove so both paths draw
    blinds in the same order and absorb byte-identical messages:
      1. commit w_eval under G0 (comm_w, feeds eq2) and under Q (comm_wq);
         DualBaseEqualityProof ties the two.
      2. bullet argument on P = C_u + comm_wq with blind b_u + b_wq:
         <u, eq_R> == w_eval, where C_u = sum_i L_i * comm_vars_i.
      3. EqualityProof: e2 == v_m * ((1-ry0)*w_eval + ry0*v_io).
    """
    from ..native import msm_host
    from . import bullet as bullet_mod

    Q = bullet_mod.q_point_host(GENS_LABEL)
    b_w = rng.scalar()
    b_wq = rng.scalar()
    C_w = commit(w_eval, b_w, gens)
    C_wq = msm_host([Q, gens.H], [w_eval % L, b_wq % L])
    base_eq, _, _ = sigma.DualBaseEqualityProof.prove(
        t, gens.G[0], Q, gens.H, w_eval, b_w, b_wq, rng
    )
    proof_bullet = bullet_mod.prove(
        t,
        list(gens.G[: 1 << mu_cols]),
        gens.H,
        Q,
        u_ints,
        R_weights,
        (b_u + b_wq) % L,
        rng,
    )
    coeff_w = v_m * (1 - ry0) % L
    eq2_proof, _, _ = sigma.EqualityProof.prove(
        t, gens, e2, be2, coeff_w * b_w % L, rng
    )
    return (
        C_w.ristretto_encode(),
        C_wq.ristretto_encode(),
        base_eq,
        proof_bullet,
        eq2_proof,
    )


def verify(
    dev: r1cs.R1CSDevice, inputs_ints: list, proof: ZKNIZKProof, wire=None
) -> bool:
    try:
        return _verify_inner(dev, inputs_ints, proof, wire)
    except (ValueError, AssertionError):
        return False


def _verify_inner(dev, inputs_ints, proof, wire=None) -> bool:
    from .wire import OTTI, PROFILES

    wire = PROFILES[wire] if isinstance(wire, str) else (wire or OTTI)
    gens = Gens(_max_gens(dev), GENS_LABEL)
    t = Transcript(wire.proto)
    t.append_message(wire.r1cs_digest, dev.digest)
    t.append_u64(b"num_inputs", len(inputs_ints))
    for x in inputs_ints:
        t.append_scalar(wire.input, _sb(x))
    for enc in proof.comm_vars:
        t.append_point(wire.poly_commitment, enc)

    nvp = dev.num_vars
    mu_rows, mu_cols = _hyrax_dims(nvp)
    if len(proof.comm_vars) != (1 << mu_rows):
        return False

    mu_x = (dev.num_cons - 1).bit_length()
    tau = t.challenge_vector(wire.challenge_tau, mu_x)

    # phase 1
    C_zero = commit(0, 0, gens)
    rx, C_e1 = zksumcheck.verify_zk(
        3, proof.sc1, C_zero, mu_x, t, b"sc1", gens, wire=wire
    )

    CA, CB, CC = (decode(b) for b in proof.comm_abc)
    for lbl, enc in zip(
        (wire.comm_A, wire.comm_B, wire.comm_C), proof.comm_abc
    ):
        t.append_point(lbl, enc)
    C_ab = decode(proof.comm_ab)
    if wire.name != "otti":
        t.append_point(wire.comm_AB, proof.comm_ab)
    if not proof.proof_ab.verify(t, gens, CA, CB, C_ab):
        return False
    eq_val = _eq_point(tau, rx)
    C_rhs = (C_ab + (-CC)) * eq_val
    if not proof.eq1.verify(t, gens, C_e1, C_rhs):
        return False

    r_a = t.challenge_scalar(wire.challenge_Az)
    r_b = t.challenge_scalar(wire.challenge_Bz)
    r_c = t.challenge_scalar(wire.challenge_Cz)
    C_claim2 = CA * r_a + CB * r_b + CC * r_c
    mu_y = (dev.num_z - 1).bit_length()
    ry, C_e2 = zksumcheck.verify_zk(
        2, proof.sc2, C_claim2, mu_y, t, b"sc2", gens, wire=wire
    )

    # Hyrax opening (log-sized): dual-base tie + bullet argument
    from ..native import msm_host
    from . import bullet as bullet_mod

    r_w = ry[1:]
    L_weights = _eq_weights(r_w[:mu_rows])
    rows_pts = [decode(enc) for enc in proof.comm_vars]
    C_u = msm_host(rows_pts, L_weights)
    C_w = decode(proof.comm_w)
    C_wq = decode(proof.comm_wq)
    Q = bullet_mod.q_point_host(GENS_LABEL)
    if not proof.base_eq.verify(t, gens.G[0], Q, gens.H, C_w, C_wq):
        return False
    R_weights = _eq_weights(r_w[mu_rows:])
    P = C_u + C_wq
    if not bullet_mod.verify(
        t, list(gens.G[: 1 << mu_cols]), gens.H, Q, R_weights, P, proof.bullet
    ):
        return False

    # final relation
    io = [1] + list(inputs_ints) + [0] * (nvp - 1 - len(inputs_ints))
    v_io = _mle_eval_host(io, r_w)
    ry0 = ry[0]
    e_rx = mle.eq_table(_dev_vec(rx))
    e_ry = mle.eq_table(_dev_vec(ry))
    ea, eb, ec = (int(F.pack_ints(SCALAR, v)) for v in dev.eval_at(e_rx, e_ry))
    v_m = (r_a * ea + r_b * eb + r_c * ec) % L
    coeff_w = v_m * (1 - ry0) % L
    const_term = v_m * ry0 % L * v_io % L
    C_rhs2 = C_w * coeff_w + gens.G[0] * const_term
    if not proof.eq2.verify(t, gens, C_e2, C_rhs2):
        return False
    return True
