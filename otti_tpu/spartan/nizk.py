"""Spartan NIZK for R1CS satisfiability — TPU-native prover.

End-to-end reconstruction of the reference proving path (SURVEY.md §3.5):
witness MLE commitment (Hyrax rows, batched MSM) -> sumcheck phase 1
(cubic, eq*(Az*Bz - Cz)) -> sumcheck phase 2 (quadratic, M*Z) -> Hyrax
polynomial-evaluation opening for the witness -> verifier evaluates the
sparse matrices itself (NIZK mode, no SPARK preprocessing).

All bulk math (matvecs, eq tables, round folds, MSMs) runs as batched
device kernels; the Merlin transcript and O(mu) bookkeeping run on the
host.  This module is the *argument-of-knowledge* core; zero-knowledge
blinding (sigma protocols / dot-product proofs) layers on top in zk.py.

The wire format and transcript schedule are this framework's canonical
ones (labels below); primitive encodings (ristretto compression, 32-byte
LE scalars, Merlin framing) are bit-compatible with the reference stack's
curve25519-dalek/merlin.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..field import ops as F
from ..field.fields import SCALAR, ints_to_limbs, int_to_limbs
from ..transcript.merlin import Transcript
from . import commitments, mle, r1cs, sumcheck

MOD = SCALAR.modulus
PROTO = b"otti-tpu Spartan NIZK v1"


def _sb(x: int) -> bytes:
    return (x % MOD).to_bytes(32, "little")


def _dev_scalar(x: int):
    return jnp.asarray(int_to_limbs(x % MOD))


def _dev_vec(xs):
    return jnp.asarray(ints_to_limbs([x % MOD for x in xs]))


def _eq_weights(r: list) -> list:
    """eq table of a challenge list as host ints, matching mle.eq_table's
    convention (r[0] = MSB of the index: each new variable interleaves as
    the LSB)."""
    out = [1]
    for rj in r:
        nxt = []
        for x in out:
            nxt.append(x * ((1 - rj) % MOD) % MOD)
            nxt.append(x * rj % MOD)
        out = nxt
    return out


def _eq_point(a: list, b: list) -> int:
    """eq(a, b) = prod_i (a_i b_i + (1-a_i)(1-b_i)) over ints."""
    acc = 1
    for x, y in zip(a, b):
        acc = acc * ((x * y + (1 - x) * (1 - y)) % MOD) % MOD
    return acc


def _mle_eval_host(vals: list, r: list) -> int:
    """Evaluate the MLE of ``vals`` (len 2^mu, MSB-first index) at r."""
    mu = len(r)
    assert len(vals) == 1 << mu
    cur = [v % MOD for v in vals]
    for j in range(mu):
        half = len(cur) // 2
        rj = r[j] % MOD
        cur = [
            (cur[i] + rj * (cur[half + i] - cur[i])) % MOD for i in range(half)
        ]
    return cur[0]


@dataclasses.dataclass
class NIZKProof:
    comm_vars: list  # row commitment encodings (bytes32 each)
    phase1_polys: list  # per-round [e0,e1,e2,e3]
    claims_abc: tuple  # (vA, vB, vC)
    phase2_polys: list  # per-round [e0,e1,e2]
    claim_w: int  # claimed W(ry[1:])
    bullet: object  # log-sized Hyrax opening (bullet.BulletOpeningProof)

    def size_bytes(self) -> int:
        n_scalars = (
            sum(len(p) for p in self.phase1_polys)
            + sum(len(p) for p in self.phase2_polys)
            + 4
        )
        return 32 * (n_scalars + len(self.comm_vars)) + self.bullet.size_bytes()


def _hyrax_dims(num_vars_padded: int):
    mu = (num_vars_padded - 1).bit_length() if num_vars_padded > 1 else 0
    mu_cols = (mu + 1) // 2
    mu_rows = mu - mu_cols
    return mu_rows, mu_cols


GENS_LABEL = b"gens_pc"


import functools


@functools.lru_cache(maxsize=None)
def _row_combine_jit(dims: tuple):
    """u[c] = sum_r L[r] * W[r, c] — jitted per Hyrax matrix shape."""

    def impl(eq_L, W):
        prods = F.mul(SCALAR, eq_L[:, None, :], W)
        return F.sum_reduce(SCALAR, prods, axis=0)

    return jax.jit(impl)


def prove(
    dev: r1cs.R1CSDevice,
    vars_ints: list,
    inputs_ints: list,
    proto: bytes = PROTO,
) -> NIZKProof:
    from .. import metrics

    t = Transcript(proto)
    t.append_message(b"R1CS", dev.digest)
    t.append_u64(b"num_inputs", len(inputs_ints))
    for x in inputs_ints:
        t.append_scalar(b"input", _sb(x))

    nvp = dev.num_vars
    metrics.add("constraints", dev.num_cons)
    mu_rows, mu_cols = _hyrax_dims(nvp)
    vars_padded = list(vars_ints) + [0] * (nvp - len(vars_ints))
    W = _dev_vec(vars_padded).reshape(1 << mu_rows, 1 << mu_cols, -1)
    with metrics.timed("commit"):
        comm_rows = commitments.commit_rows(W, [0] * (1 << mu_rows), GENS_LABEL)
        comm_enc = commitments.encode_points(comm_rows)
    metrics.add("msm_points", nvp)
    for enc in comm_enc:
        t.append_point(b"poly_commitment", enc)

    # ---- phase 1 ----------------------------------------------------------
    mu_x = (dev.num_cons - 1).bit_length()
    tau = t.challenge_vector(b"challenge_tau", mu_x)
    z = r1cs.assemble_z(
        _dev_vec(vars_padded),
        _dev_vec(inputs_ints) if inputs_ints else None,
        nvp,
    )
    eq_tau = mle.eq_table(_dev_vec(tau))
    with metrics.timed("matvec"):
        az, bz, cz = dev.matvecs(z)
    with metrics.timed("sumcheck1"):
        p1, rx, (f_eq, vA, vB, vC), e1 = sumcheck.prove_cubic(
            0, eq_tau, az, bz, cz, t, b"sc1"
        )
    metrics.add("sumcheck_rounds", mu_x)
    t.append_scalar(b"vA", _sb(vA))
    t.append_scalar(b"vB", _sb(vB))
    t.append_scalar(b"vC", _sb(vC))

    # ---- phase 2 ----------------------------------------------------------
    r_a = t.challenge_scalar(b"challenge_Az")
    r_b = t.challenge_scalar(b"challenge_Bz")
    r_c = t.challenge_scalar(b"challenge_Cz")
    claim2 = (r_a * vA + r_b * vB + r_c * vC) % MOD
    e_rx = mle.eq_table(_dev_vec(rx))
    m_table = dev.matvec_T_weighted(
        (_dev_scalar(r_a), _dev_scalar(r_b), _dev_scalar(r_c)), e_rx
    )
    with metrics.timed("sumcheck2"):
        p2, ry, (f_m, f_z), e2 = sumcheck.prove_quad(claim2, m_table, z, t, b"sc2")

    # ---- witness opening at ry[1:] ---------------------------------------
    # Z(y) = (1-y0) W(y_1..) + y0 IO(y_1..); prove W(ry[1:]) via Hyrax rows
    # + the log-sized bullet argument on the row combination u.
    r_w = ry[1:]
    eq_L = mle.eq_table(_dev_vec(r_w[:mu_rows])) if mu_rows else F.ones(SCALAR, (1,))
    # u = L^T @ W_matrix  (row combination)
    u = _row_combine_jit(W.shape[:2])(eq_L, W)
    u_ints = [int(v) for v in F.pack_ints(SCALAR, u)]
    claim_w = _mle_eval_host(vars_padded, r_w)
    t.append_scalar(b"claim_w", _sb(claim_w))
    proof_bullet = _prove_opening(t, mu_rows, mu_cols, r_w, u_ints, claim_w)

    return NIZKProof(
        comm_vars=comm_enc,
        phase1_polys=p1,
        claims_abc=(vA, vB, vC),
        phase2_polys=p2,
        claim_w=claim_w,
        bullet=proof_bullet,
    )


def _prove_opening(t, mu_rows, mu_cols, r_w, u_ints, claim_w):
    """Transparent log-sized opening: bullet argument for
    <u, eq_R(r_w)> == claim_w against P = C_u + claim_w*Q (all blinds 0).

    Shared by the classic, fused, batched, and sharded plain provers —
    each computes u on device, then runs this identical host tail so the
    transcript schedule (and thus the proofs) stay byte-identical."""
    from . import bullet

    R = _eq_weights(r_w[mu_rows:])
    G, H = commitments.gen_points_host(1 << mu_cols, GENS_LABEL)
    Q = bullet.q_point_host(GENS_LABEL)
    return bullet.prove(t, list(G), H, Q, u_ints, R, 0, rng=None)


def _verify_opening(t, mu_rows, mu_cols, r_w, comm_vars, claim_w, proof_bullet):
    """Verify the transparent bullet opening against the row commitments
    (shared by nizk.verify and snark.verify)."""
    from ..native import msm_host, ristretto_decode_host
    from . import bullet

    if len(comm_vars) != (1 << mu_rows):
        return False
    Lw = _eq_weights(r_w[:mu_rows])
    rows_pts = [ristretto_decode_host(enc) for enc in comm_vars]
    if any(p is None for p in rows_pts):
        return False
    G, H = commitments.gen_points_host(1 << mu_cols, GENS_LABEL)
    Q = bullet.q_point_host(GENS_LABEL)
    P = msm_host(rows_pts + [Q], Lw + [claim_w % MOD])
    R = _eq_weights(r_w[mu_rows:])
    return bullet.verify(t, list(G), H, Q, R, P, proof_bullet)


def verify(dev: r1cs.R1CSDevice, inputs_ints: list, proof: NIZKProof) -> bool:
    try:
        return _verify_inner(dev, inputs_ints, proof)
    except (ValueError, AssertionError):
        return False


def _verify_inner(dev: r1cs.R1CSDevice, inputs_ints: list, proof: NIZKProof) -> bool:
    t = Transcript(PROTO)
    t.append_message(b"R1CS", dev.digest)
    t.append_u64(b"num_inputs", len(inputs_ints))
    for x in inputs_ints:
        t.append_scalar(b"input", _sb(x))
    for enc in proof.comm_vars:
        t.append_point(b"poly_commitment", enc)

    mu_x = (dev.num_cons - 1).bit_length()
    tau = t.challenge_vector(b"challenge_tau", mu_x)

    # phase 1 replay
    e1, rx = sumcheck.verify_rounds(0, proof.phase1_polys, 3, t, b"sc1")
    vA, vB, vC = proof.claims_abc
    t.append_scalar(b"vA", _sb(vA))
    t.append_scalar(b"vB", _sb(vB))
    t.append_scalar(b"vC", _sb(vC))
    if _eq_point(tau, rx) * ((vA * vB - vC) % MOD) % MOD != e1:
        return False

    r_a = t.challenge_scalar(b"challenge_Az")
    r_b = t.challenge_scalar(b"challenge_Bz")
    r_c = t.challenge_scalar(b"challenge_Cz")
    claim2 = (r_a * vA + r_b * vB + r_c * vC) % MOD
    e2, ry = sumcheck.verify_rounds(claim2, proof.phase2_polys, 2, t, b"sc2")

    # replay opening messages
    t.append_scalar(b"claim_w", _sb(proof.claim_w))

    nvp = dev.num_vars
    mu_rows, mu_cols = _hyrax_dims(nvp)

    # Hyrax opening via the bullet argument:
    # P = sum_i L_i * C_i + claim_w * Q must open to <u, eq_R> = claim_w
    # (eq weights follow mle.eq_table's MSB-first convention)
    r_w = ry[1:]
    if not _verify_opening(
        t, mu_rows, mu_cols, r_w, proof.comm_vars, proof.claim_w, proof.bullet
    ):
        return False

    # (c) final phase-2 identity: e2 == M(ry) * Z(ry)
    io = [1] + list(inputs_ints) + [0] * (nvp - 1 - len(inputs_ints))
    v_io = _mle_eval_host(io, r_w)
    ry0 = ry[0]
    v_z = ((1 - ry0) * proof.claim_w + ry0 * v_io) % MOD
    e_rx = mle.eq_table(_dev_vec(rx))
    e_ry = mle.eq_table(_dev_vec(ry))
    ea, eb, ec = (
        int(F.pack_ints(SCALAR, v)) for v in dev.eval_at(e_rx, e_ry)
    )
    v_m = (r_a * ea + r_b * eb + r_c * ec) % MOD
    return (v_m * v_z) % MOD == e2
