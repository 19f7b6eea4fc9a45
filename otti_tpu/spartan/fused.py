"""Single-dispatch Spartan NIZK prover: sumcheck + opening fused on device.

The classic prover (nizk.py) syncs with the host once per sumcheck round
to thread the Fiat-Shamir transcript (SURVEY.md §3.5's serialization
point); through the axon tunnel each sync costs ~100 ms, which dominates
proving.  Here the Merlin transcript itself runs on device
(transcript/device.py), so BOTH sumcheck phases, every challenge, and the
Hyrax opening compile into ONE XLA program — the host submits a single
fused call and fetches the proof materials in a single transfer.

Compile-time design: a naive unroll of mu rounds recompiles every field
kernel per round (minutes of XLA time per instance shape).  Instead we
exploit a periodicity of the Merlin/STROBE duplex: every challenge ends
with the sponge at byte position 64 (a 64-byte PRF squeeze after a forced
permutation), so all rounds of a phase share IDENTICAL static transcript
offsets and the whole round — masked fixed-shape fold + evals + absorb +
challenge — is a single ``lax.scan`` body compiled once per phase.

Wire format and transcript schedule are byte-identical to nizk.prove —
tests/test_fused.py asserts proof equality; nizk.verify accepts either.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import ristretto
from ..field import ops as F
from ..field.fields import SCALAR, limbs_to_int
from ..transcript.device import DeviceStrobe, DeviceTranscript, export_host_strobe
from ..transcript.merlin import FLAG_A, FLAG_C, FLAG_I, Transcript
from . import commitments, mle, nizk, r1cs, sumcheck

MOD = SCALAR.modulus

# sponge offsets at the start of every in-phase round: each challenge ends
# with run_f (C-flag force) + a 64-byte squeeze => pos 64, fresh op frame
_POST_CHALLENGE = (64, 0, FLAG_I | FLAG_A | FLAG_C)


def _ints(arr: np.ndarray):
    """Canonical limb rows -> python ints (host, after the single fetch)."""
    if arr.ndim == 1:
        return limbs_to_int(arr) % MOD
    return [_ints(row) for row in arr]


def _round_scan(label: bytes, degree: int):
    """lax.scan body for one sumcheck phase (masked fixed-shape kernels).

    carry = (sponge state bytes, active_half, tables); emits the round's
    eval block [len(points), L] and the bound challenge r.
    """
    pts = (0, 2, 3) if degree == 3 else (0, 2)
    labels = [label + b"/e%d" % p if p else label + b"/e0" for p in pts]

    def body(carry, _):
        state, ah, tables = carry
        if degree == 3:
            evals = sumcheck._cubic_evals(*tables, ah)
        else:
            evals = sumcheck._quad_evals(*tables, ah)
        t = DeviceTranscript(
            _strobe=DeviceStrobe.from_state(state, *_POST_CHALLENGE)
        )
        for i, lbl in enumerate(labels):
            t.append_scalar_limbs(lbl, evals[i])
        r = t.challenge_scalar_limbs(label + b"/r")
        tables = sumcheck._bind_tables(r, ah, tables)
        return (t.strobe.state, ah // 2, tables), (evals, r)

    return body


@functools.lru_cache(maxsize=None)
def _core(
    num_cons: int,
    num_z: int,
    num_vars: int,
    mu_rows: int,
    mu_cols: int,
    handoff: tuple,
):
    """Fused prover core, cached per instance shape + transcript offsets.

    handoff = (pos, pos_begin, cur_flags) of the host strobe at the moment
    of handoff — static because the absorb schedule up to the commitment is
    shape-determined.
    """
    mu_x = (num_cons - 1).bit_length()
    mu_y = (num_z - 1).bit_length()

    def run(state, z, tbl_commit, *flat):
        t = DeviceTranscript(_strobe=DeviceStrobe.from_state(state, *handoff))

        # ---- witness commitment (Hyrax rows, fixed-base MSM); the comb
        # tables arrive as an argument — building them mid-trace leaked a
        # tracer into the lru cache (bench r03 snark_error) and baked
        # multi-MB constants into the executable ----------------------------
        W = z[:num_vars].reshape(1 << mu_rows, 1 << mu_cols, -1)
        comm = commitments.commit_rows(
            W, [0] * (1 << mu_rows), nizk.GENS_LABEL, tbl=tbl_commit
        )
        enc = ristretto.encode(comm)  # [rows, 32] uint8
        for i in range(1 << mu_rows):
            t.append_message(b"poly_commitment", enc[i])

        # ---- phase 1 ------------------------------------------------------
        tau = t.challenge_vector_limbs(b"challenge_tau", mu_x)
        eq = mle._eq_table_impl(tau)
        az, bz, cz = r1cs._matvecs_jit(num_cons)(z, *flat)

        carry = (t.strobe.state, jnp.int32(num_cons // 2), (eq, az, bz, cz))
        carry, (rounds1, rxs) = jax.lax.scan(
            _round_scan(b"sc1", 3), carry, None, length=mu_x
        )
        state1, _, tables1 = carry
        vA = F.canon(SCALAR, tables1[1][0])
        vB = F.canon(SCALAR, tables1[2][0])
        vC = F.canon(SCALAR, tables1[3][0])

        t = DeviceTranscript(
            _strobe=DeviceStrobe.from_state(state1, *_POST_CHALLENGE)
        )
        t.append_scalar_limbs(b"vA", vA)
        t.append_scalar_limbs(b"vB", vB)
        t.append_scalar_limbs(b"vC", vC)

        # ---- phase 2 ------------------------------------------------------
        r_a = t.challenge_scalar_limbs(b"challenge_Az")
        r_b = t.challenge_scalar_limbs(b"challenge_Bz")
        r_c = t.challenge_scalar_limbs(b"challenge_Cz")
        e_rx = mle._eq_table_impl(rxs)
        m_table = r1cs._mtw_jit(num_z)((r_a, r_b, r_c), e_rx, *flat)

        carry = (t.strobe.state, jnp.int32(num_z // 2), (m_table, z))
        carry, (rounds2, rys) = jax.lax.scan(
            _round_scan(b"sc2", 2), carry, None, length=mu_y
        )
        state2, _, _ = carry

        # ---- Hyrax opening materials (u, claim_w); the log-sized bullet
        # argument itself runs on the host tail (nizk._prove_opening) ------
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

        return enc, rounds1, jnp.stack([vA, vB, vC]), rounds2, u, claim_w

    return jax.jit(run)


def prove(
    dev: r1cs.R1CSDevice,
    vars_ints: list,
    inputs_ints: list,
    proto: bytes = nizk.PROTO,
) -> nizk.NIZKProof:
    """Drop-in replacement for nizk.prove producing byte-identical proofs.

    The ENTIRE prover — Hyrax commitment MSM, ristretto compression, both
    sumcheck phases, and the opening — is ONE device dispatch + ONE fetch;
    the host only initializes the transcript and replays it afterwards to
    assemble the proof object.
    """
    from .. import metrics

    t = Transcript(proto)
    t.append_message(b"R1CS", dev.digest)
    t.append_u64(b"num_inputs", len(inputs_ints))
    for x in inputs_ints:
        t.append_scalar(b"input", nizk._sb(x))

    nvp = dev.num_vars
    metrics.add("constraints", dev.num_cons)
    metrics.add("msm_points", nvp)
    mu_rows, mu_cols = nizk._hyrax_dims(nvp)
    vars_padded = list(vars_ints) + [0] * (nvp - len(vars_ints))

    # ---- single fused device call (commit + both phases + opening) ---------
    st_np, pos, pos_begin, cur_flags = export_host_strobe(t.strobe)
    z = r1cs.assemble_z(
        nizk._dev_vec(vars_padded),
        nizk._dev_vec(inputs_ints) if inputs_ints else None,
        nvp,
    )
    core = _core(
        dev.num_cons, dev.num_z, nvp, mu_rows, mu_cols, (pos, pos_begin, cur_flags)
    )
    from ..msm import pippenger

    tbl_commit = pippenger.fixed_base_tables(
        1 << mu_cols, nizk.GENS_LABEL, pippenger.FIXED_BASE_WINDOW, False
    )[0]
    with metrics.timed("fused_prove"):
        out = core(jnp.asarray(st_np), z, tbl_commit, *dev._flat_mats())
        enc_np, r1_np, vabc_np, r2_np, u_np, cw_np = jax.device_get(out)

    mu_x = (dev.num_cons - 1).bit_length()
    metrics.add("sumcheck_rounds", mu_x)

    # ---- host transcript replay / proof assembly ---------------------------
    comm_enc = [bytes(row.tobytes()) for row in np.asarray(enc_np)]
    return assemble_plain_proof(
        t, comm_enc, r1_np, vabc_np, r2_np, u_np, cw_np, mu_x, mu_rows, mu_cols
    )


def assemble_plain_proof(
    t, comm_enc, r1_np, vabc_np, r2_np, u_np, cw_np, mu_x, mu_rows, mu_cols
):
    """Replay the transcript over device-produced round materials and build
    the NIZKProof (shared by the single-dispatch and hybrid provers — the
    wire format and absorb schedule are identical to nizk.prove)."""
    comm_enc = list(comm_enc)
    for enc in comm_enc:
        t.append_point(b"poly_commitment", enc)
    r1_ints = _ints(np.asarray(r1_np))
    vA, vB, vC = _ints(np.asarray(vabc_np))
    r2_ints = _ints(np.asarray(r2_np))
    u_ints = _ints(np.asarray(u_np))
    claim_w = _ints(np.asarray(cw_np))

    t.challenge_vector(b"challenge_tau", mu_x)
    e = 0
    p1 = []
    for e0, e2, e3 in r1_ints:
        e1 = (e - e0) % MOD
        t.append_scalar(b"sc1/e0", nizk._sb(e0))
        t.append_scalar(b"sc1/e2", nizk._sb(e2))
        t.append_scalar(b"sc1/e3", nizk._sb(e3))
        r = t.challenge_scalar(b"sc1/r")
        p1.append([e0, e1, e2, e3])
        e = sumcheck.lagrange_eval([e0, e1, e2, e3], r)

    t.append_scalar(b"vA", nizk._sb(vA))
    t.append_scalar(b"vB", nizk._sb(vB))
    t.append_scalar(b"vC", nizk._sb(vC))
    r_a = t.challenge_scalar(b"challenge_Az")
    r_b = t.challenge_scalar(b"challenge_Bz")
    r_c = t.challenge_scalar(b"challenge_Cz")
    e = (r_a * vA + r_b * vB + r_c * vC) % MOD
    p2 = []
    ry = []
    for e0, e2 in r2_ints:
        e1 = (e - e0) % MOD
        t.append_scalar(b"sc2/e0", nizk._sb(e0))
        t.append_scalar(b"sc2/e2", nizk._sb(e2))
        r = t.challenge_scalar(b"sc2/r")
        p2.append([e0, e1, e2])
        ry.append(r)
        e = sumcheck.lagrange_eval([e0, e1, e2], r)

    t.append_scalar(b"claim_w", nizk._sb(claim_w))
    proof_bullet = nizk._prove_opening(
        t, mu_rows, mu_cols, ry[1:], u_ints, claim_w
    )
    return nizk.NIZKProof(
        comm_vars=comm_enc,
        phase1_polys=p1,
        claims_abc=(vA, vB, vC),
        phase2_polys=p2,
        claim_w=claim_w,
        bullet=proof_bullet,
    )
