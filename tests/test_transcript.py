"""Keccak / STROBE / Merlin against published test vectors."""

import hashlib

from otti_tpu.transcript import keccak
from otti_tpu.transcript.merlin import Transcript


def test_sha3_known_answers():
    # FIPS-202 known answers (empty string)
    assert keccak.sha3_256(b"").hex() == (
        "a7ffc6f8bf1ed76651c14756a061d662f580ff4de43b49fa82d80a4b80f8434a"
    )
    for msg in [b"", b"abc", b"otti-tpu", bytes(range(200))]:
        assert keccak.sha3_256(msg) == hashlib.sha3_256(msg).digest()
        assert keccak.sha3_512(msg) == hashlib.sha3_512(msg).digest()
        assert keccak.shake256(msg, 64) == hashlib.shake_256(msg).digest(64)


def test_merlin_published_vector():
    """The `merlin` crate's equivalence test vector (tests in merlin 3.x)."""
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    cb = t.challenge_bytes(b"challenge", 32)
    assert cb.hex() == (
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"
    )


def test_merlin_determinism_and_divergence():
    a = Transcript(b"proto")
    b = Transcript(b"proto")
    a.append_message(b"x", b"1")
    b.append_message(b"x", b"1")
    assert a.challenge_bytes(b"c", 16) == b.challenge_bytes(b"c", 16)
    a.append_message(b"y", b"2")
    b.append_message(b"y", b"3")
    assert a.challenge_bytes(b"c", 16) != b.challenge_bytes(b"c", 16)


def test_merlin_long_absorb_crosses_rate_boundary():
    t = Transcript(b"proto")
    t.append_message(b"big", bytes(range(256)) * 3)
    out1 = t.challenge_bytes(b"c", 200)
    t2 = Transcript(b"proto")
    t2.append_message(b"big", bytes(range(256)) * 3)
    assert out1 == t2.challenge_bytes(b"c", 200)


def test_challenge_scalar_in_range():
    from otti_tpu.refimpl.numeric import L

    t = Transcript(b"proto")
    s = t.challenge_scalar(b"r")
    assert 0 <= s < L
