"""Host reference (RFC 7748/8032/9496) self-checks + published vectors."""

from otti_tpu.refimpl import numeric as ref


def test_curve_constants():
    # basepoint satisfies the curve equation -x^2 + y^2 = 1 + d x^2 y^2
    x, y, P, d = ref.BASE_X, ref.BASE_Y, ref.P, ref.D
    assert (-x * x + y * y) % P == (1 + d * x * x % P * y % P * y) % P
    assert pow(ref.SQRT_M1, 2, P) == P - 1


def test_group_law():
    B = ref.EdPoint.base()
    assert (B + B) == B.double()
    assert (B * 3) == (B + B + B)
    assert (B * ref.L) == ref.EdPoint.identity()
    assert (B + (-B)) == ref.EdPoint.identity()


def test_ristretto_generator_encoding():
    """RFC 9496 §A.1: encoding of the generator (= edwards basepoint)."""
    enc = ref.EdPoint.base().ristretto_encode()
    assert enc.hex() == (
        "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76"
    )
    # identity encodes to all zeros
    assert ref.EdPoint.identity().ristretto_encode() == bytes(32)


def test_ristretto_small_multiples_roundtrip():
    """RFC 9496 §A.1 small multiples; decode returns a (possibly different)
    representative of the same 4-torsion coset -> compare with ristretto_eq."""
    B = ref.EdPoint.base()
    known = {
        0: "0000000000000000000000000000000000000000000000000000000000000000",
        1: "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76",
        2: "6a493210f7499cd17fecb510ae0cea23a110e8d5b901f8acadd3095c73a3b919",
    }
    for k in range(16):
        P = B * k if k else ref.EdPoint.identity()
        enc = P.ristretto_encode()
        if k in known:
            assert enc.hex() == known[k], f"k={k}"
        dec = ref.EdPoint.ristretto_decode(enc)
        assert dec is not None
        assert dec.ristretto_eq(P)
        assert dec.ristretto_encode() == enc


def test_ristretto_decode_rejects_bad():
    # non-canonical field element (>= p)
    assert ref.EdPoint.ristretto_decode((ref.P + 1).to_bytes(32, "little")) is None
    # s = 1 decodes to a y == 0 point, which must be rejected (RFC 9496 §4.3.1)
    assert ref.EdPoint.ristretto_decode((1).to_bytes(32, "little")) is None
    # wrong length
    assert ref.EdPoint.ristretto_decode(b"\x00" * 31) is None


def test_from_uniform_bytes_deterministic_and_valid():
    e1 = ref.EdPoint.from_uniform_bytes(bytes(range(64)))
    e2 = ref.EdPoint.from_uniform_bytes(bytes(range(64)))
    assert e1 == e2
    enc = e1.ristretto_encode()
    dec = ref.EdPoint.ristretto_decode(enc)
    assert dec is not None and dec.ristretto_eq(e1)
    # as a ristretto element, L * e1 is the identity (coset-wise)
    assert (e1 * ref.L).ristretto_eq(ref.EdPoint.identity())
    # distinct inputs give distinct outputs
    e3 = ref.EdPoint.from_uniform_bytes(bytes(range(1, 65)))
    assert not e3.ristretto_eq(e1)
