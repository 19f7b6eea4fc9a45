"""Device (JAX) Merlin/STROBE/Keccak vs the host reference implementation.

The host transcript (otti_tpu/transcript/merlin.py) is validated against
the published merlin crate vector in test_transcript.py; these tests prove
the device implementation is bit-identical to the host one, including a
mid-protocol host->device handoff (the fused-prover path).
"""

import numpy as np
import jax
import jax.numpy as jnp

from otti_tpu.field import ops as F
from otti_tpu.field.fields import SCALAR, int_to_limbs
from otti_tpu.transcript.keccak import keccak_f1600
from otti_tpu.transcript.merlin import Strobe128, Transcript
from otti_tpu.transcript import device as dev


def test_keccak_f1600_matches_host():
    rng = np.random.default_rng(0)
    st = rng.integers(0, 256, size=200, dtype=np.uint8)
    host = bytearray(st.tobytes())
    keccak_f1600(host)
    got = np.asarray(jax.jit(dev.keccak_f1600_bytes)(jnp.asarray(st)))
    assert got.tobytes() == bytes(host)


def test_keccak_f1600_twice():
    st = np.zeros(200, np.uint8)
    host = bytearray(st.tobytes())
    keccak_f1600(host)
    keccak_f1600(host)
    got = jax.jit(dev.keccak_f1600_bytes)(
        jax.jit(dev.keccak_f1600_bytes)(jnp.asarray(st))
    )
    assert np.asarray(got).tobytes() == bytes(host)


def _host_state(s: Strobe128) -> bytes:
    return bytes(s.state)


def test_strobe_ops_match_host():
    """Same op sequence on both sides, incl. rate-boundary crossings."""
    label = b"test protocol"
    h = Strobe128(label)
    d = dev.DeviceStrobe(label)
    rng = np.random.default_rng(1)
    for i, n in enumerate([3, 32, 64, 200, 166, 1, 165]):
        data = rng.integers(0, 256, size=n, dtype=np.uint8)
        if i % 2 == 0:
            h.meta_ad(b"lbl%d" % i, False)
            h.ad(data.tobytes(), False)
            d.meta_ad(b"lbl%d" % i, False)
            d.ad(jnp.asarray(data), False)
        else:
            h.ad(data.tobytes(), False)
            d.ad(jnp.asarray(data), False)
        out_h = h.prf(24, False)
        out_d = d.prf(24, False)
        assert np.asarray(out_d).tobytes() == out_h
        assert np.asarray(d.state).tobytes() == _host_state(h)
        assert (d.pos, d.pos_begin, d.cur_flags) == (
            h.pos,
            h.pos_begin,
            h.cur_flags,
        )


def test_transcript_matches_host_and_handoff():
    proto = b"otti-tpu device transcript test"
    h = Transcript(proto)
    # force the pure-python strobe for state access parity
    h.strobe = Strobe128(Transcript.MERLIN_LABEL)
    h.append_message(b"dom-sep", proto)

    h.append_message(b"R1CS", b"\x11" * 32)
    h.append_u64(b"num_inputs", 3)
    for i in range(3):
        h.append_scalar(b"input", (1000 + i).to_bytes(32, "little"))

    # hand off to device mid-protocol
    d = dev.DeviceTranscript.from_host(h)

    # identical continuations
    for t, obj in ((h, "host"), (d, "dev")):
        pass
    vals = [5, 2**200 + 17, SCALAR.modulus - 1]
    for v in vals:
        h.append_scalar(b"e0", v.to_bytes(32, "little"))
        d.append_scalar_limbs(
            b"e0", jnp.asarray(np.asarray(int_to_limbs(v), np.int32))
        )
    ch_h = h.challenge_scalar(b"r")
    ch_d = F.to_int(SCALAR, d.challenge_scalar_limbs(b"r"))
    assert ch_h == ch_d

    # more rounds after the challenge
    h.append_scalar(b"e2", (42).to_bytes(32, "little"))
    d.append_scalar_limbs(
        b"e2", jnp.asarray(np.asarray(int_to_limbs(42), np.int32))
    )
    assert h.challenge_scalar(b"r2") == F.to_int(
        SCALAR, d.challenge_scalar_limbs(b"r2")
    )


def test_challenge_vector_matches_host():
    proto = b"otti-tpu vec"
    h = Transcript(proto)
    d = dev.DeviceTranscript(proto)
    hv = h.challenge_vector(b"tau", 5)
    dvec = d.challenge_vector_limbs(b"tau", 5)
    got = [F.to_int(SCALAR, dvec[i]) for i in range(5)]
    assert got == hv


def test_limbs_to_bytes32_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(5):
        v = int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63)) % SCALAR.modulus
        limbs = jnp.asarray(np.asarray(int_to_limbs(v), np.int32))
        b = np.asarray(dev.limbs_to_bytes32(limbs))
        assert int.from_bytes(b.tobytes(), "little") == v


def test_bytes64_reduction():
    rng = np.random.default_rng(4)
    raw = rng.integers(0, 256, size=64, dtype=np.uint8)
    want = int.from_bytes(raw.tobytes(), "little") % SCALAR.modulus
    got = F.to_int(SCALAR, dev.bytes64_to_scalar_limbs(jnp.asarray(raw)))
    assert got == want


def test_device_transcript_under_jit():
    """The whole absorb/challenge schedule traces into one jitted fn."""
    proto = b"otti-tpu jit transcript"

    def run(state, e0_limbs):
        h_shell = Transcript(proto)
        h_shell.strobe = Strobe128(Transcript.MERLIN_LABEL)
        h_shell.append_message(b"dom-sep", proto)
        t = dev.DeviceTranscript.from_host(h_shell, state_dev=state)
        t.append_scalar_limbs(b"e0", e0_limbs)
        return t.challenge_scalar_limbs(b"r")

    h = Transcript(proto)
    h.strobe = Strobe128(Transcript.MERLIN_LABEL)
    h.append_message(b"dom-sep", proto)
    st0 = jnp.asarray(dev.export_host_strobe(h.strobe)[0])

    v = 123456789
    out = jax.jit(run)(st0, jnp.asarray(np.asarray(int_to_limbs(v), np.int32)))

    h.append_scalar(b"e0", v.to_bytes(32, "little"))
    assert F.to_int(SCALAR, out) == h.challenge_scalar(b"r")
