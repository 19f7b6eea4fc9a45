"""Native host library vs pure-Python reference (skip if no compiler)."""

import random

import pytest

from otti_tpu import native
from otti_tpu.refimpl import numeric as ref

pytestmark = pytest.mark.skipif(
    not native.HAVE_NATIVE, reason="native library unavailable"
)


def test_keccak_matches():
    import hashlib

    from otti_tpu.transcript import keccak as pykeccak

    st1 = bytearray(200)
    st2 = bytearray(200)
    st1[0] = st2[0] = 0x55
    native.keccak_f1600(st1)
    pykeccak.keccak_f1600(st2)
    assert bytes(st1) == bytes(st2)


def test_native_strobe_matches_python():
    from otti_tpu.transcript.merlin import Strobe128

    py = Strobe128(b"Merlin v1.0")
    nt = native.NativeStrobe(b"Merlin v1.0")
    for s, tag in ((py, "py"), (nt, "nt")):
        s.meta_ad(b"dom-sep", False)
        s.ad(b"hello world", False)
        s.meta_ad(b"more", False)
    assert py.prf(64, False) == nt.prf(64, False)


def test_scalar_mul_and_msm():
    r = random.Random(5)
    pts = [ref.EdPoint.base() * r.randrange(1, ref.L) for _ in range(20)]
    ks = [r.randrange(ref.L) for _ in range(20)] + []
    ks[0] = 0
    ks[1] = 1
    want = ref.EdPoint.identity()
    for k, p in zip(ks, pts):
        want = want + p * k
    got = native.msm_host(pts, ks)
    assert got.ristretto_eq(want)
    one = native.scalar_mul_host(pts[0], ks[5])
    assert one.ristretto_eq(pts[0] * ks[5])


def test_ristretto_codec():
    r = random.Random(6)
    for _ in range(5):
        p = ref.EdPoint.base() * r.randrange(1, ref.L)
        enc_native = native.ristretto_encode_host(p)
        assert enc_native == p.ristretto_encode()
        dec = native.ristretto_decode_host(enc_native)
        assert dec is not None and dec.ristretto_eq(p)
    # invalid encodings rejected
    assert native.ristretto_decode_host((ref.P + 1).to_bytes(32, "little")) is None
    assert native.ristretto_decode_host((1).to_bytes(32, "little")) is None


def test_scalar_field_ops():
    import ctypes

    lib = native._lib
    r = random.Random(7)
    for _ in range(50):
        a, b = r.randrange(ref.L), r.randrange(ref.L)
        out = ctypes.create_string_buffer(32)
        lib.otti_sc_mul(out, a.to_bytes(32, "little"), b.to_bytes(32, "little"))
        assert int.from_bytes(out.raw, "little") == a * b % ref.L
        lib.otti_sc_add(out, a.to_bytes(32, "little"), b.to_bytes(32, "little"))
        assert int.from_bytes(out.raw, "little") == (a + b) % ref.L
        lib.otti_sc_sub(out, a.to_bytes(32, "little"), b.to_bytes(32, "little"))
        assert int.from_bytes(out.raw, "little") == (a - b) % ref.L


def test_msm_small_n_fast_path():
    """n<=32 takes the shared-doubling branch (r05); must agree with the
    python reference across the cutover and at edge scalars."""
    r = random.Random(11)
    pts = [ref.EdPoint.base() * r.randrange(1, ref.L) for _ in range(33)]
    for n in (1, 2, 31, 32, 33):
        sc = [r.randrange(ref.L) for _ in range(n)]
        sc[0] = 0  # zero scalar edge
        if n > 2:
            sc[1] = ref.L - 1
        acc = ref.EdPoint.identity()
        for k, p in zip(sc, pts[:n]):
            acc = acc + p * k
        got = native.msm_host(pts[:n], sc)
        assert got.ristretto_eq(acc), n


def test_fold_pairs_host():
    """out[i] = sa*A[i] + sb*B[i] (the bullet generator fold)."""
    r = random.Random(12)
    A = [ref.EdPoint.base() * r.randrange(1, ref.L) for _ in range(7)]
    B = [ref.EdPoint.base() * r.randrange(1, ref.L) for _ in range(7)]
    sa, sb = r.randrange(ref.L), r.randrange(ref.L)
    out = native.fold_pairs_host(A, B, sa, sb)
    for i in range(7):
        assert out[i].ristretto_eq(A[i] * sa + B[i] * sb), i
