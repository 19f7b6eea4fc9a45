"""Branch-free ristretto255 point compression on device (RFC 9496 §4.3.2).

Reconstructs curve25519-dalek's `RistrettoPoint::compress` (SURVEY.md §2.2
Spartan row) as batched JAX field ops so commitment encodings can be
absorbed into the *device-resident* Fiat-Shamir transcript — the last
piece needed to compile the whole Spartan prover into one XLA program
(spartan/fused.py).  The data-dependent branches of the reference
algorithm (rotation, sign fixes) become masked selects, the TPU-friendly
formulation called out in SURVEY.md §7.4 item 4.

Bit-exact vs the host oracle (refimpl.numeric.EdPoint.ristretto_encode,
itself validated against the RFC 9496 test vectors in tests/test_curve.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..field import ops as F
from ..field.fields import BASE
from ..refimpl import numeric as ref
from ..transcript.device import limbs_to_bytes32


def _c(v: int):
    return F.const(BASE, v % ref.P)


def _is_negative(x: jax.Array) -> jax.Array:
    """Canonical parity bit (RFC 9496 IS_NEGATIVE); x must be canonical."""
    return (x[..., 0] & 1) == 1


def sqrt_ratio_m1(u: jax.Array, v: jax.Array):
    """RFC 9496 §4.2 SQRT_RATIO_M1, batched.

    Returns (was_square mask, canonical nonnegative root of u/v or i*u/v).
    """
    v2 = F.square(BASE, v)
    v3 = F.mul(BASE, v2, v)
    v7 = F.mul(BASE, F.square(BASE, v3), v)
    r = F.mul(
        BASE,
        F.mul(BASE, u, v3),
        F.pow_fixed(BASE, F.mul(BASE, u, v7), (ref.P - 5) // 8),
    )
    check = F.mul(BASE, v, F.square(BASE, r))
    neg_u = F.neg(BASE, u)
    correct = F.eq(BASE, check, u)
    flipped = F.eq(BASE, check, neg_u)
    flipped_i = F.eq(BASE, check, F.mul(BASE, neg_u, _c(ref.SQRT_M1)))
    r = F.select(
        flipped | flipped_i, F.mul(BASE, r, _c(ref.SQRT_M1)), r
    )
    r = F.canon(BASE, r)
    r = F.canon(BASE, F.select(_is_negative(r), F.neg(BASE, r), r))
    return correct | flipped, r


def encode(p) -> jax.Array:
    """Batched extended points {x,y,z,t} -> uint8[..., 32] encodings."""
    X, Y, Z, T = p["x"], p["y"], p["z"], p["t"]
    u1 = F.mul(BASE, F.add(BASE, Z, Y), F.sub(BASE, Z, Y))
    u2 = F.mul(BASE, X, Y)
    _, invsqrt = sqrt_ratio_m1(
        F.ones(BASE, u1.shape[:-1]), F.mul(BASE, u1, F.square(BASE, u2))
    )
    den1 = F.mul(BASE, invsqrt, u1)
    den2 = F.mul(BASE, invsqrt, u2)
    z_inv = F.mul(BASE, F.mul(BASE, den1, den2), T)
    ix = F.mul(BASE, X, _c(ref.SQRT_M1))
    iy = F.mul(BASE, Y, _c(ref.SQRT_M1))
    enchanted = F.mul(BASE, den1, _c(ref.INVSQRT_A_MINUS_D))
    rotate = _is_negative(F.canon(BASE, F.mul(BASE, T, z_inv)))
    Xr = F.select(rotate, iy, X)
    Yr = F.select(rotate, ix, Y)
    den_inv = F.select(rotate, enchanted, den2)
    y_neg = _is_negative(F.canon(BASE, F.mul(BASE, Xr, z_inv)))
    Yf = F.select(y_neg, F.neg(BASE, Yr), Yr)
    s = F.canon(BASE, F.mul(BASE, den_inv, F.sub(BASE, Z, Yf)))
    s = F.canon(BASE, F.select(_is_negative(s), F.neg(BASE, s), s))
    if s.ndim == 1:
        return limbs_to_bytes32(s)
    return jax.vmap(limbs_to_bytes32)(s.reshape(-1, s.shape[-1])).reshape(
        s.shape[:-1] + (32,)
    )
