"""Bulletproofs-style log-sized opening argument (spartan/bullet.py).

Covers the reference Spartan role of src/nizk/bullet.rs (SURVEY.md §3.5
step 5): completeness (plain + blinded), log proof size, and tamper
soundness.
"""

import pytest

from otti_tpu.refimpl import numeric as ref
from otti_tpu.spartan import bullet, commitments
from otti_tpu.spartan.pedersen_host import BlindSource
from otti_tpu.transcript.merlin import Transcript

L = ref.L
LABEL = b"test_bullet_gens"


def _setup(n, seed=7, blind=0):
    from otti_tpu.native import msm_host

    G, H = commitments.gen_points_host(n, LABEL)
    Q = bullet.q_point_host(LABEL)
    x = [(seed * 1000003 + i * i * 77 + 5) % L for i in range(n)]
    a = [(seed * 999983 + i * 31 + 3) % L for i in range(n)]
    y = sum(xi * ai for xi, ai in zip(x, a)) % L
    P = msm_host(list(G[:n]) + [Q, H], x + [y, blind])
    return list(G), H, Q, x, a, P


@pytest.mark.parametrize("n", [1, 2, 8, 64])
def test_complete_plain(n):
    G, H, Q, x, a, P = _setup(n)
    t = Transcript(b"bullet-test")
    proof = bullet.prove(t, G, H, Q, x, a, 0, rng=None)
    tv = Transcript(b"bullet-test")
    assert bullet.verify(tv, G, H, Q, a, P, proof)
    assert len(proof.L_vec) == max(n.bit_length() - 1, 0)


def test_complete_blinded():
    rng = BlindSource(b"\x01" * 32)
    r_P = rng.scalar()
    G, H, Q, x, a, P = _setup(16, blind=r_P)
    t = Transcript(b"bullet-test")
    proof = bullet.prove(t, G, H, Q, x, a, r_P, rng=rng)
    tv = Transcript(b"bullet-test")
    assert bullet.verify(tv, G, H, Q, a, P, proof)


def test_log_size():
    G, H, Q, x, a, P = _setup(64)
    t = Transcript(b"bullet-test")
    proof = bullet.prove(t, G, H, Q, x, a, 0, rng=None)
    # 2*log2(64) + 1 points + 2 scalars = 13+2 encodings
    assert proof.size_bytes() == 32 * (2 * 6 + 1 + 2)
    assert proof.size_bytes() < 64 * 32  # beats the revealed-u opening


def test_tamper():
    import dataclasses

    G, H, Q, x, a, P = _setup(8)
    t = Transcript(b"bullet-test")
    proof = bullet.prove(t, G, H, Q, x, a, 0, rng=None)

    bad = dataclasses.replace(proof, z1=(proof.z1 + 1) % L)
    assert not bullet.verify(Transcript(b"bullet-test"), G, H, Q, a, P, bad)

    bad = dataclasses.replace(
        proof, L_vec=[proof.L_vec[1], proof.L_vec[0], proof.L_vec[2]]
    )
    assert not bullet.verify(Transcript(b"bullet-test"), G, H, Q, a, P, bad)

    # wrong statement: P shifted by one generator
    from otti_tpu.native import msm_host

    P_bad = msm_host([P, G[0]], [1, 1])
    assert not bullet.verify(
        Transcript(b"bullet-test"), G, H, Q, a, P_bad, proof
    )

    # wrong weight vector
    a_bad = [a[0] + 1] + a[1:]
    assert not bullet.verify(
        Transcript(b"bullet-test"), G, H, Q, a_bad, P, proof
    )
