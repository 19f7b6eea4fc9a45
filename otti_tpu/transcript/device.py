"""Device-resident Merlin / STROBE-128 / Keccak-f[1600] transcript (JAX).

Why this exists: the Fiat-Shamir transcript is the serialization point of
the Spartan prover (SURVEY.md §3.5 — "Merlin transcript threads through
everything sequentially").  With a host transcript, every sumcheck round
costs a host<->device round trip; through the axon tunnel that is ~100 ms
per round and dominates proving time.  Running the transcript ON DEVICE
lets the entire sumcheck (all rounds of both phases) plus the polynomial
opening compile into ONE XLA program with zero mid-proof round trips.

Design
------
Byte positions inside the STROBE duplex depend only on the *lengths* of
absorbed/squeezed data.  In the Spartan schedule those lengths are static
per instance shape (fixed labels, 32-byte scalars, 64-byte challenges), so
``pos`` / ``pos_begin`` / ``cur_flags`` stay **Python ints at trace time**
and only the 200-byte sponge state is a traced ``uint8[200]`` array.  The
Keccak-f[1600] permutation runs as a ``lax.fori_loop`` over the 24 rounds
on (lo, hi) ``uint32[25]`` lane pairs — ~50 fused elementwise int ops per
round, negligible device work.

Bit-exactness: mirrors transcript/merlin.py (host), which is validated
against the published merlin crate test vector; tests/test_device_transcript.py
checks state equality after every operation kind, including a mid-protocol
host->device handoff.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..field import ops as F
from ..field.fields import SCALAR, int_to_limbs
from .keccak import _RC

U32 = jnp.uint32
U8 = jnp.uint8

_RATE = 166  # STROBE-128 rate in bytes

FLAG_I = 1
FLAG_A = 1 << 1
FLAG_C = 1 << 2
FLAG_T = 1 << 3
FLAG_M = 1 << 4
FLAG_K = 1 << 5


# ---------------------------------------------------------------------------
# Keccak-f[1600] on (lo, hi) uint32[25] lane pairs, flat index i = x + 5*y
# ---------------------------------------------------------------------------

def _pi_tables():
    src = np.arange(25)
    rot = np.zeros(25, np.int64)
    x, y = 1, 0
    for t in range(24):
        nx, ny = y, (2 * x + 3 * y) % 5
        src[nx + 5 * ny] = x + 5 * y
        rot[nx + 5 * ny] = ((t + 1) * (t + 2) // 2) % 64
        x, y = nx, ny
    return src, rot


_PI_SRC, _PI_ROT = _pi_tables()
_RC_LO = np.asarray([rc & 0xFFFFFFFF for rc in _RC], np.uint32)
_RC_HI = np.asarray([rc >> 32 for rc in _RC], np.uint32)


def _rotl64(lo, hi, n):
    """Per-lane 64-bit rotate-left; n is a static numpy int array."""
    n = np.asarray(n)
    swap = jnp.asarray(n >= 32)
    r = jnp.asarray((n % 32).astype(np.uint32))
    lo1 = jnp.where(swap, hi, lo)
    hi1 = jnp.where(swap, lo, hi)
    # (x >> (32 - r)) written as ((x >> (31 - r)) >> 1) so r = 0 is safe
    lo2 = (lo1 << r) | ((hi1 >> (np.uint32(31) - r)) >> np.uint32(1))
    hi2 = (hi1 << r) | ((lo1 >> (np.uint32(31) - r)) >> np.uint32(1))
    return lo2, hi2


def _rotl64_1(lo, hi):
    return (lo << np.uint32(1)) | (hi >> np.uint32(31)), (
        hi << np.uint32(1)
    ) | (lo >> np.uint32(31))


def keccak_f1600_lanes(lo: jax.Array, hi: jax.Array):
    """24 Keccak rounds on uint32[25] lane pairs (lax.fori_loop body)."""
    rc_lo = jnp.asarray(_RC_LO)
    rc_hi = jnp.asarray(_RC_HI)

    def rnd(i, lh):
        lo, hi = lh
        # theta
        a_lo = lo.reshape(5, 5)  # [y, x]
        a_hi = hi.reshape(5, 5)
        c_lo = a_lo[0] ^ a_lo[1] ^ a_lo[2] ^ a_lo[3] ^ a_lo[4]
        c_hi = a_hi[0] ^ a_hi[1] ^ a_hi[2] ^ a_hi[3] ^ a_hi[4]
        r_lo, r_hi = _rotl64_1(jnp.roll(c_lo, -1), jnp.roll(c_hi, -1))
        d_lo = jnp.roll(c_lo, 1) ^ r_lo
        d_hi = jnp.roll(c_hi, 1) ^ r_hi
        lo = (a_lo ^ d_lo[None, :]).reshape(25)
        hi = (a_hi ^ d_hi[None, :]).reshape(25)
        # rho + pi (static gather + static per-lane rotations)
        lo, hi = _rotl64(lo[_PI_SRC], hi[_PI_SRC], _PI_ROT)
        # chi
        b_lo = lo.reshape(5, 5)
        b_hi = hi.reshape(5, 5)
        lo = (
            b_lo ^ (~jnp.roll(b_lo, -1, axis=1) & jnp.roll(b_lo, -2, axis=1))
        ).reshape(25)
        hi = (
            b_hi ^ (~jnp.roll(b_hi, -1, axis=1) & jnp.roll(b_hi, -2, axis=1))
        ).reshape(25)
        # iota
        lo = lo.at[0].set(lo[0] ^ rc_lo[i])
        hi = hi.at[0].set(hi[0] ^ rc_hi[i])
        return lo, hi

    return jax.lax.fori_loop(0, 24, rnd, (lo, hi))


def _bytes_to_lanes(st: jax.Array):
    b = st.reshape(25, 8).astype(U32)
    lo = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)
    hi = b[:, 4] | (b[:, 5] << 8) | (b[:, 6] << 16) | (b[:, 7] << 24)
    return lo, hi


def _lanes_to_bytes(lo: jax.Array, hi: jax.Array) -> jax.Array:
    parts = [
        (lo >> 0),
        (lo >> 8),
        (lo >> 16),
        (lo >> 24),
        (hi >> 0),
        (hi >> 8),
        (hi >> 16),
        (hi >> 24),
    ]
    b = jnp.stack(parts, axis=1) & np.uint32(0xFF)
    return b.reshape(200).astype(U8)


def keccak_f1600_bytes(st: jax.Array) -> jax.Array:
    """Keccak-f[1600] on a traced uint8[200] state (little-endian lanes)."""
    lo, hi = _bytes_to_lanes(st)
    lo, hi = keccak_f1600_lanes(lo, hi)
    return _lanes_to_bytes(lo, hi)


# ---------------------------------------------------------------------------
# STROBE-128 with static byte positions (Python ints under trace)
# ---------------------------------------------------------------------------

def _as_u8(data) -> jax.Array:
    if isinstance(data, (bytes, bytearray)):
        return jnp.asarray(np.frombuffer(bytes(data), np.uint8))
    return data.astype(U8)


def _data_len(data) -> int:
    if isinstance(data, (bytes, bytearray)):
        return len(data)
    n = data.shape[0]
    assert isinstance(n, int), "absorb length must be static"
    return n


class DeviceStrobe:
    """STROBE-128 duplex whose state is a traced uint8[200] array.

    ``pos``/``pos_begin``/``cur_flags`` are Python ints — valid because the
    transcript schedule absorbs/squeezes statically-known byte counts.
    Mirrors transcript/merlin.py Strobe128 operation-for-operation.
    """

    def __init__(self, protocol_label: bytes = None, _raw=None):
        if _raw is not None:
            self.state, self.pos, self.pos_begin, self.cur_flags = _raw
            return
        # the initialization path is fully static: run it on host
        from .merlin import Strobe128

        h = Strobe128(protocol_label)
        self.state = jnp.asarray(np.frombuffer(bytes(h.state), np.uint8))
        self.pos = h.pos
        self.pos_begin = h.pos_begin
        self.cur_flags = h.cur_flags

    @classmethod
    def from_state(cls, state: jax.Array, pos: int, pos_begin: int, cur_flags: int):
        return cls(_raw=(state.astype(U8), int(pos), int(pos_begin), int(cur_flags)))

    # -- internals ----------------------------------------------------------
    def _run_f(self):
        st = self.state
        st = st.at[self.pos].set(st[self.pos] ^ np.uint8(self.pos_begin))
        st = st.at[self.pos + 1].set(st[self.pos + 1] ^ np.uint8(0x04))
        st = st.at[_RATE + 1].set(st[_RATE + 1] ^ np.uint8(0x80))
        self.state = keccak_f1600_bytes(st)
        self.pos = 0
        self.pos_begin = 0

    def _absorb(self, data):
        data = _as_u8(data)
        n = _data_len(data)
        i = 0
        while i < n:
            take = min(n - i, _RATE - self.pos)
            seg = self.state[self.pos : self.pos + take] ^ data[i : i + take]
            self.state = self.state.at[self.pos : self.pos + take].set(seg)
            self.pos += take
            i += take
            if self.pos == _RATE:
                self._run_f()

    def _overwrite(self, data):
        data = _as_u8(data)
        n = _data_len(data)
        i = 0
        while i < n:
            take = min(n - i, _RATE - self.pos)
            self.state = self.state.at[self.pos : self.pos + take].set(
                data[i : i + take]
            )
            self.pos += take
            i += take
            if self.pos == _RATE:
                self._run_f()

    def _squeeze(self, n: int) -> jax.Array:
        outs = []
        got = 0
        while got < n:
            take = min(n - got, _RATE - self.pos)
            outs.append(self.state[self.pos : self.pos + take])
            self.state = self.state.at[self.pos : self.pos + take].set(
                jnp.zeros((take,), U8)
            )
            self.pos += take
            got += take
            if self.pos == _RATE:
                self._run_f()
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs)

    def _begin_op(self, flags: int, more: bool):
        if more:
            assert self.cur_flags == flags, "STROBE op continuation mismatch"
            return
        assert flags & FLAG_T == 0, "transport not supported"
        old_begin = self.pos_begin
        self.pos_begin = self.pos + 1
        self.cur_flags = flags
        self._absorb(bytes([old_begin, flags]))
        if (flags & (FLAG_C | FLAG_K)) and self.pos != 0:
            self._run_f()

    # -- merlin operations ---------------------------------------------------
    def meta_ad(self, data, more: bool):
        self._begin_op(FLAG_M | FLAG_A, more)
        self._absorb(data)

    def ad(self, data, more: bool):
        self._begin_op(FLAG_A, more)
        self._absorb(data)

    def prf(self, n: int, more: bool) -> jax.Array:
        self._begin_op(FLAG_I | FLAG_A | FLAG_C, more)
        return self._squeeze(n)

    def key(self, data, more: bool):
        self._begin_op(FLAG_A | FLAG_C, more)
        self._overwrite(data)


# ---------------------------------------------------------------------------
# scalar <-> byte codecs on device (canonical 12-bit limbs <-> LE bytes)
# ---------------------------------------------------------------------------

def limbs_to_bytes32(c: jax.Array) -> jax.Array:
    """Canonical limbs int32[22] (each < 2^12) -> uint8[32] little-endian."""
    ce, co = c[0::2], c[1::2]  # 11 even, 11 odd limbs = 33 bytes
    b0 = ce & 0xFF
    b1 = (ce >> 8) | ((co & 0xF) << 4)
    b2 = co >> 4
    b = jnp.stack([b0, b1, b2], axis=-1).reshape(33)[:32]
    return b.astype(U8)


_POW8 = np.stack(
    [
        np.asarray(int_to_limbs(pow(2, 8 * i, SCALAR.modulus)), np.int32)
        for i in range(64)
    ]
)  # [64, 22]


def bytes64_to_scalar_limbs(b: jax.Array) -> jax.Array:
    """64 uniform LE bytes -> scalar-field limbs (reduction mod ell).

    value = sum_i b_i * 2^(8i); with POW8[i] = limbs(2^(8i) mod ell) the
    coefficients stay < 64 * 255 * 2^12 < 2^26, safely inside int32.
    """
    prods = b.astype(jnp.int32)[:, None] * jnp.asarray(_POW8)
    return F.reduce_wide(SCALAR, jnp.sum(prods, axis=0))


# ---------------------------------------------------------------------------
# Merlin transcript on device
# ---------------------------------------------------------------------------

def _le32(n: int) -> bytes:
    return n.to_bytes(4, "little")


def export_host_strobe(strobe) -> tuple:
    """(state uint8[200] np array, pos, pos_begin, cur_flags) from either
    the Python Strobe128 or the native C++ NativeStrobe."""
    if hasattr(strobe, "state"):
        return (
            np.frombuffer(bytes(strobe.state), np.uint8).copy(),
            strobe.pos,
            strobe.pos_begin,
            strobe.cur_flags,
        )
    raw = bytes(strobe._buf.raw)  # C layout: u8 st[200]; u8 pos, pos_begin, cur_flags
    return (np.frombuffer(raw[:200], np.uint8).copy(), raw[200], raw[201], raw[202])


class DeviceTranscript:
    """Merlin transcript with the Spartan append/challenge API, on device.

    Construct fresh with a protocol label, or hand off mid-protocol from a
    host transcript via ``from_host`` (static positions + traced state).
    """

    MERLIN_LABEL = b"Merlin v1.0"

    def __init__(self, label: bytes = None, _strobe: DeviceStrobe = None):
        if _strobe is not None:
            self.strobe = _strobe
            return
        self.strobe = DeviceStrobe(self.MERLIN_LABEL)
        self.append_message(b"dom-sep", label)

    @classmethod
    def from_host(cls, host_transcript, state_dev: jax.Array = None):
        """Continue a host Transcript on device.

        ``state_dev`` (traced uint8[200]) overrides the captured state bytes
        so the handoff can be a jit input; pos/flags stay static ints.
        """
        st, pos, pos_begin, cur_flags = export_host_strobe(host_transcript.strobe)
        if state_dev is None:
            state_dev = jnp.asarray(st)
        return cls(
            _strobe=DeviceStrobe.from_state(state_dev, pos, pos_begin, cur_flags)
        )

    def append_message(self, label: bytes, message):
        self.strobe.meta_ad(label, False)
        self.strobe.meta_ad(_le32(_data_len(message)), True)
        self.strobe.ad(message, False)

    def append_u64(self, label: bytes, value: int):
        self.append_message(label, value.to_bytes(8, "little"))

    def append_scalar_limbs(self, label: bytes, canon_limbs: jax.Array):
        """Absorb a *canonical* limb vector as its 32-byte LE encoding."""
        self.append_message(label, limbs_to_bytes32(canon_limbs))

    def append_point_bytes(self, label: bytes, enc32):
        self.append_message(label, enc32)

    def challenge_bytes(self, label: bytes, n: int) -> jax.Array:
        self.strobe.meta_ad(label, False)
        self.strobe.meta_ad(_le32(n), True)
        return self.strobe.prf(n, False)

    def challenge_scalar_limbs(self, label: bytes) -> jax.Array:
        """64-byte PRF reduced mod ell -> semi-reduced limb vector."""
        return bytes64_to_scalar_limbs(self.challenge_bytes(label, 64))

    def challenge_vector_limbs(self, label: bytes, n: int) -> jax.Array:
        return jnp.stack(
            [self.challenge_scalar_limbs(label) for _ in range(n)]
        )

    def export(self) -> tuple:
        """(traced state, pos, pos_begin, cur_flags) for resuming elsewhere."""
        s = self.strobe
        return s.state, s.pos, s.pos_begin, s.cur_flags
