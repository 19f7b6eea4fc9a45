// otti-tpu native host runtime: Keccak/STROBE transcript core + curve25519
// host arithmetic (field, scalar, edwards, ristretto, Pippenger MSM).
//
// Role: the reference stack's host-side native components (curve25519-dalek
// + merlin, SURVEY.md §2.2) — everything latency-bound that does NOT belong
// on the TPU: Fiat-Shamir permutations, sigma-protocol group ops, and the
// verifier's small MSMs.  Bulk prover math stays in JAX/Pallas kernels.
//
// Self-contained C++17, no deps; built by native/Makefile into
// libotti_host.so and loaded via ctypes (otti_tpu/native.py) with a pure
// Python fallback.  Written from the public specifications (FIPS-202,
// STROBE v1.0.2, RFC 7748/8032/9496).

#include <cstdint>
#include <cstring>
#include <cstddef>

typedef unsigned __int128 u128;
typedef __int128 i128;
typedef uint64_t u64;
typedef uint8_t u8;

// ===========================================================================
// Keccak-f[1600]
// ===========================================================================
static const u64 KECCAK_RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

static inline u64 rotl64(u64 x, int n) { return (x << n) | (x >> (64 - n)); }

extern "C" void otti_keccak_f1600(u8 *state) {
  u64 A[25];
  std::memcpy(A, state, 200);
  for (int rnd = 0; rnd < 24; ++rnd) {
    u64 C[5], D[5];
    for (int x = 0; x < 5; ++x)
      C[x] = A[x] ^ A[x + 5] ^ A[x + 10] ^ A[x + 15] ^ A[x + 20];
    for (int x = 0; x < 5; ++x)
      D[x] = C[(x + 4) % 5] ^ rotl64(C[(x + 1) % 5], 1);
    for (int i = 0; i < 25; ++i) A[i] ^= D[i % 5];
    // rho + pi walk
    int x = 1, y = 0;
    u64 cur = A[x + 5 * y];
    for (int t = 0; t < 24; ++t) {
      int nx = y, ny = (2 * x + 3 * y) % 5;
      u64 tmp = A[nx + 5 * ny];
      A[nx + 5 * ny] = rotl64(cur, ((t + 1) * (t + 2) / 2) % 64);
      cur = tmp;
      x = nx; y = ny;
    }
    for (int yy = 0; yy < 5; ++yy) {
      u64 row[5];
      for (int xx = 0; xx < 5; ++xx) row[xx] = A[xx + 5 * yy];
      for (int xx = 0; xx < 5; ++xx)
        A[xx + 5 * yy] = row[xx] ^ ((~row[(xx + 1) % 5]) & row[(xx + 2) % 5]);
    }
    A[0] ^= KECCAK_RC[rnd];
  }
  std::memcpy(state, A, 200);
}

// ===========================================================================
// STROBE-128 (merlin flavor: meta_AD / AD / PRF / KEY only)
// ===========================================================================
struct Strobe {
  u8 st[200];
  u8 pos, pos_begin, cur_flags;
};
static const int STROBE_R = 166;
enum { FLAG_I = 1, FLAG_A = 2, FLAG_C = 4, FLAG_T = 8, FLAG_M = 16, FLAG_K = 32 };

static void strobe_run_f(Strobe *s) {
  s->st[s->pos] ^= s->pos_begin;
  s->st[s->pos + 1] ^= 0x04;
  s->st[STROBE_R + 1] ^= 0x80;
  otti_keccak_f1600(s->st);
  s->pos = 0;
  s->pos_begin = 0;
}

static void strobe_absorb(Strobe *s, const u8 *d, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    s->st[s->pos] ^= d[i];
    if (++s->pos == STROBE_R) strobe_run_f(s);
  }
}

static void strobe_begin_op(Strobe *s, u8 flags, int more) {
  if (more) return;
  u8 hdr[2] = {s->pos_begin, flags};
  s->pos_begin = s->pos + 1;
  s->cur_flags = flags;
  strobe_absorb(s, hdr, 2);
  if ((flags & (FLAG_C | FLAG_K)) && s->pos != 0) strobe_run_f(s);
}

extern "C" void otti_strobe_init(Strobe *s, const u8 *label, size_t n) {
  std::memset(s, 0, sizeof(Strobe));
  const u8 hdr[6] = {1, STROBE_R + 2, 1, 0, 1, 96};
  std::memcpy(s->st, hdr, 6);
  std::memcpy(s->st + 6, "STROBEv1.0.2", 12);
  otti_keccak_f1600(s->st);
  // meta_ad(label, false)
  strobe_begin_op(s, FLAG_M | FLAG_A, 0);
  strobe_absorb(s, label, n);
}

extern "C" void otti_strobe_meta_ad(Strobe *s, const u8 *d, size_t n, int more) {
  strobe_begin_op(s, FLAG_M | FLAG_A, more);
  strobe_absorb(s, d, n);
}
extern "C" void otti_strobe_ad(Strobe *s, const u8 *d, size_t n, int more) {
  strobe_begin_op(s, FLAG_A, more);
  strobe_absorb(s, d, n);
}
extern "C" void otti_strobe_prf(Strobe *s, u8 *out, size_t n, int more) {
  strobe_begin_op(s, FLAG_I | FLAG_A | FLAG_C, more);
  for (size_t i = 0; i < n; ++i) {
    out[i] = s->st[s->pos];
    s->st[s->pos] = 0;
    if (++s->pos == STROBE_R) strobe_run_f(s);
  }
}
extern "C" void otti_strobe_key(Strobe *s, const u8 *d, size_t n, int more) {
  strobe_begin_op(s, FLAG_A | FLAG_C, more);
  for (size_t i = 0; i < n; ++i) {
    s->st[s->pos] = d[i];
    if (++s->pos == STROBE_R) strobe_run_f(s);
  }
}
extern "C" size_t otti_strobe_size() { return sizeof(Strobe); }

// ===========================================================================
// GF(2^255 - 19) — 4x64 little-endian limbs
// ===========================================================================
struct fe { u64 v[4]; };

static const fe FE_P = {{0xffffffffffffffedULL, 0xffffffffffffffffULL,
                         0xffffffffffffffffULL, 0x7fffffffffffffffULL}};

static inline void fe_copy(fe &o, const fe &a) { o = a; }

static u64 adc(u64 a, u64 b, u64 &carry) {
  u128 t = (u128)a + b + carry;
  carry = (u64)(t >> 64);
  return (u64)t;
}
static u64 sbb(u64 a, u64 b, u64 &borrow) {
  u128 t = (u128)a - b - borrow;
  borrow = (t >> 64) ? 1 : 0;
  return (u64)t;
}

static void fe_canon(fe &a) {
  // subtract p up to 2 times if >= p
  for (int rep = 0; rep < 2; ++rep) {
    u64 borrow = 0;
    fe t;
    for (int i = 0; i < 4; ++i) t.v[i] = sbb(a.v[i], FE_P.v[i], borrow);
    if (!borrow) a = t;
  }
}

static void fe_add(fe &o, const fe &a, const fe &b) {
  u64 carry = 0;
  for (int i = 0; i < 4; ++i) o.v[i] = adc(a.v[i], b.v[i], carry);
  // fold carry * 2^256 = carry * 38
  u128 t = (u128)o.v[0] + (u128)carry * 38;
  o.v[0] = (u64)t;
  u64 c = (u64)(t >> 64);
  for (int i = 1; i < 4 && c; ++i) {
    t = (u128)o.v[i] + c;
    o.v[i] = (u64)t;
    c = (u64)(t >> 64);
  }
}

static void fe_sub(fe &o, const fe &a, const fe &bb) {
  // a + 2p - b; b is canonicalized first so the result stays positive
  // (2p > 2^255 > canon b) and the lead digit is 0 or 1.
  static const fe P2 = {{0xffffffffffffffdaULL, 0xffffffffffffffffULL,
                         0xffffffffffffffffULL, 0xffffffffffffffffULL}};
  fe b = bb;
  fe_canon(b);
  u64 carry = 0, borrow = 0;
  fe t;
  for (int i = 0; i < 4; ++i) t.v[i] = adc(a.v[i], P2.v[i], carry);
  u64 hi = carry;  // can be 1
  for (int i = 0; i < 4; ++i) o.v[i] = sbb(t.v[i], b.v[i], borrow);
  u64 lead = hi - borrow;  // 0 or 1
  u128 x = (u128)o.v[0] + (u128)lead * 38;
  o.v[0] = (u64)x;
  u64 c = (u64)(x >> 64);
  for (int i = 1; i < 4 && c; ++i) {
    x = (u128)o.v[i] + c;
    o.v[i] = (u64)x;
    c = (u64)(x >> 64);
  }
}

static void fe_mul(fe &o, const fe &a, const fe &b) {
  u64 t[8] = {0};
  for (int i = 0; i < 4; ++i) {
    u64 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 cur = (u128)a.v[i] * b.v[j] + t[i + j] + carry;
      t[i + j] = (u64)cur;
      carry = (u64)(cur >> 64);
    }
    t[i + 4] += carry;
  }
  // fold: 2^256 == 38 (mod p)
  u64 r[5] = {0};
  u64 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 cur = (u128)t[i] + (u128)t[i + 4] * 38 + carry;
    r[i] = (u64)cur;
    carry = (u64)(cur >> 64);
  }
  r[4] = carry;
  // second fold (r[4] < 38ish)
  u128 cur = (u128)r[0] + (u128)r[4] * 38;
  o.v[0] = (u64)cur;
  u64 c = (u64)(cur >> 64);
  for (int i = 1; i < 4; ++i) {
    cur = (u128)r[i] + c;
    o.v[i] = (u64)cur;
    c = (u64)(cur >> 64);
  }
  if (c) {  // extremely rare third fold
    cur = (u128)o.v[0] + (u128)c * 38;
    o.v[0] = (u64)cur;
    c = (u64)(cur >> 64);
    for (int i = 1; i < 4 && c; ++i) {
      cur = (u128)o.v[i] + c;
      o.v[i] = (u64)cur;
      c = (u64)(cur >> 64);
    }
  }
}

static void fe_sq(fe &o, const fe &a) { fe_mul(o, a, a); }

static void fe_from_bytes(fe &o, const u8 b[32]) { std::memcpy(o.v, b, 32); }
static void fe_to_bytes(u8 b[32], const fe &a) {
  fe t = a;
  fe_canon(t);
  std::memcpy(b, t.v, 32);
}

static void fe_pow_bytes(fe &o, const fe &a, const u8 exp_le[32], int bits) {
  fe acc = {{1, 0, 0, 0}};
  fe base = a;
  // MSB-first square-and-multiply
  for (int i = bits - 1; i >= 0; --i) {
    fe_sq(acc, acc);
    if ((exp_le[i / 8] >> (i % 8)) & 1) fe_mul(acc, acc, base);
  }
  o = acc;
}

static void fe_inv(fe &o, const fe &a) {
  // p - 2 little-endian
  static const u8 PM2[32] = {0xeb, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff,
                             0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff,
                             0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff,
                             0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x7f};
  fe_pow_bytes(o, a, PM2, 255);
}

static int fe_is_zero(const fe &a) {
  fe t = a;
  fe_canon(t);
  return (t.v[0] | t.v[1] | t.v[2] | t.v[3]) == 0;
}
static int fe_is_neg(const fe &a) {
  fe t = a;
  fe_canon(t);
  return t.v[0] & 1;
}
static int fe_eq(const fe &a, const fe &b) {
  fe t;
  fe_sub(t, a, b);
  return fe_is_zero(t);
}

// ===========================================================================
// scalar field mod L = 2^252 + c  (Montgomery CIOS)
// ===========================================================================
static const u64 SC_L[4] = {0x5812631a5cf5d3edULL, 0x14def9dea2f79cd6ULL, 0,
                            0x1000000000000000ULL};
static u64 SC_INV64;   // -L^{-1} mod 2^64
static u64 SC_R2[4];   // 2^512 mod L

static void sc_reduce_once(u64 a[4]) {
  u64 borrow = 0;
  u64 t[4];
  for (int i = 0; i < 4; ++i) t[i] = sbb(a[i], SC_L[i], borrow);
  if (!borrow)
    for (int i = 0; i < 4; ++i) a[i] = t[i];
}

static void sc_add_(u64 o[4], const u64 a[4], const u64 b[4]) {
  u64 carry = 0;
  for (int i = 0; i < 4; ++i) o[i] = adc(a[i], b[i], carry);
  // L < 2^253 so sum < 2^254: no 2^256 overflow when inputs canonical
  sc_reduce_once(o);
  sc_reduce_once(o);
}

static void sc_sub_(u64 o[4], const u64 a[4], const u64 b[4]) {
  u64 borrow = 0;
  u64 t[4];
  for (int i = 0; i < 4; ++i) t[i] = sbb(a[i], b[i], borrow);
  if (borrow) {
    u64 carry = 0;
    for (int i = 0; i < 4; ++i) t[i] = adc(t[i], SC_L[i], carry);
  }
  for (int i = 0; i < 4; ++i) o[i] = t[i];
}

// CIOS Montgomery multiply: o = a * b * R^{-1} mod L, R = 2^256
static void sc_montmul(u64 o[4], const u64 a[4], const u64 b[4]) {
  u64 t[6] = {0};
  for (int i = 0; i < 4; ++i) {
    u64 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 cur = (u128)a[i] * b[j] + t[j] + carry;
      t[j] = (u64)cur;
      carry = (u64)(cur >> 64);
    }
    u128 cur = (u128)t[4] + carry;
    t[4] = (u64)cur;
    t[5] = (u64)(cur >> 64);
    u64 m = t[0] * SC_INV64;
    carry = 0;
    {
      u128 c2 = (u128)m * SC_L[0] + t[0];
      carry = (u64)(c2 >> 64);
    }
    for (int j = 1; j < 4; ++j) {
      u128 c2 = (u128)m * SC_L[j] + t[j] + carry;
      t[j - 1] = (u64)c2;
      carry = (u64)(c2 >> 64);
    }
    u128 c2 = (u128)t[4] + carry;
    t[3] = (u64)c2;
    carry = (u64)(c2 >> 64);
    t[4] = t[5] + carry;
    t[5] = 0;
  }
  for (int i = 0; i < 4; ++i) o[i] = t[i];
  sc_reduce_once(o);
}

static void sc_mul_(u64 o[4], const u64 a[4], const u64 b[4]) {
  u64 ar[4];
  sc_montmul(ar, a, SC_R2);  // a * R
  sc_montmul(o, ar, b);      // a * b
}

static void sc_init() {
  // inv64 = L^{-1} mod 2^64 via Newton; SC_INV64 = -inv64
  u64 x = 1;
  for (int i = 0; i < 6; ++i) x *= 2 - SC_L[0] * x;
  SC_INV64 = (u64)(0 - x);
  // R2 = 2^512 mod L by doubling 1 512 times
  u64 r[4] = {1, 0, 0, 0};
  for (int i = 0; i < 512; ++i) {
    u64 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u64 nv = (r[j] << 1) | carry;
      carry = r[j] >> 63;
      r[j] = nv;
    }
    // r < 2^254ish; fold by subtracting L up to twice
    sc_reduce_once(r);
    sc_reduce_once(r);
  }
  for (int i = 0; i < 4; ++i) SC_R2[i] = r[i];
}

extern "C" void otti_sc_mul(u8 o[32], const u8 a[32], const u8 b[32]) {
  u64 A[4], B[4], O[4];
  std::memcpy(A, a, 32);
  std::memcpy(B, b, 32);
  sc_mul_(O, A, B);
  std::memcpy(o, O, 32);
}
extern "C" void otti_sc_add(u8 o[32], const u8 a[32], const u8 b[32]) {
  u64 A[4], B[4], O[4];
  std::memcpy(A, a, 32);
  std::memcpy(B, b, 32);
  sc_add_(O, A, B);
  std::memcpy(o, O, 32);
}
extern "C" void otti_sc_sub(u8 o[32], const u8 a[32], const u8 b[32]) {
  u64 A[4], B[4], O[4];
  std::memcpy(A, a, 32);
  std::memcpy(B, b, 32);
  sc_sub_(O, A, B);
  std::memcpy(o, O, 32);
}

// ===========================================================================
// edwards25519 (extended coordinates), constants derived at init
// ===========================================================================
struct point {
  fe X, Y, Z, T;
};

static fe ED_D, ED_D2, SQRT_M1, INVSQRT_A_MINUS_D, SQRT_AD_MINUS_ONE,
    ONE_MINUS_D_SQ, D_MINUS_ONE_SQ;
static point ED_BASE;

static void pt_identity(point &p) {
  std::memset(&p, 0, sizeof(p));
  p.Y.v[0] = 1;
  p.Z.v[0] = 1;
}

static void pt_add(point &o, const point &p, const point &q) {
  fe a, b, c, d, e, f, g, h, t1, t2;
  fe_sub(t1, p.Y, p.X);
  fe_sub(t2, q.Y, q.X);
  fe_mul(a, t1, t2);
  fe_add(t1, p.Y, p.X);
  fe_add(t2, q.Y, q.X);
  fe_mul(b, t1, t2);
  fe_mul(t1, p.T, ED_D2);
  fe_mul(c, t1, q.T);
  fe_add(t1, p.Z, p.Z);
  fe_mul(d, t1, q.Z);
  fe_sub(e, b, a);
  fe_sub(f, d, c);
  fe_add(g, d, c);
  fe_add(h, b, a);
  fe_mul(o.X, e, f);
  fe_mul(o.Y, g, h);
  fe_mul(o.Z, f, g);
  fe_mul(o.T, e, h);
}

static void pt_double(point &o, const point &p) {
  fe a, b, c, h, e, g, f, t;
  fe_sq(a, p.X);
  fe_sq(b, p.Y);
  fe_sq(c, p.Z);
  fe_add(c, c, c);
  fe_add(h, a, b);
  fe_add(t, p.X, p.Y);
  fe_sq(t, t);
  fe_sub(e, h, t);
  fe_sub(g, a, b);
  fe_add(f, c, g);
  fe_mul(o.X, e, f);
  fe_mul(o.Y, g, h);
  fe_mul(o.Z, f, g);
  fe_mul(o.T, e, h);
}

static void pt_neg(point &o, const point &p) {
  fe zero;
  std::memset(&zero, 0, sizeof(zero));
  fe_sub(o.X, zero, p.X);
  o.Y = p.Y;
  o.Z = p.Z;
  fe_sub(o.T, zero, p.T);
}

static void pt_scalar_mul(point &o, const point &p, const u8 k[32]) {
  point acc, cur = p;
  pt_identity(acc);
  for (int i = 0; i < 256; ++i) {
    if ((k[i / 8] >> (i % 8)) & 1) pt_add(acc, acc, cur);
    pt_double(cur, cur);
  }
  o = acc;
}

// sqrt_ratio_m1 per RFC 9496 §4.2; returns was_square
static int sqrt_ratio_m1(fe &r, const fe &u, const fe &v) {
  fe v3, v7, t, uv7;
  fe_sq(v3, v);
  fe_mul(v3, v3, v);  // v^3
  fe_sq(v7, v3);
  fe_mul(v7, v7, v);  // v^7
  fe_mul(uv7, u, v7);
  // (p-5)/8 little-endian
  static const u8 E[32] = {0xfd, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff,
                           0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff,
                           0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff,
                           0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x0f};
  fe_pow_bytes(t, uv7, E, 252);
  fe_mul(r, u, v3);
  fe_mul(r, r, t);
  fe check, negu, negui;
  fe_sq(check, r);
  fe_mul(check, check, v);
  fe zero;
  std::memset(&zero, 0, sizeof(zero));
  fe_sub(negu, zero, u);
  fe_mul(negui, negu, SQRT_M1);
  int correct = fe_eq(check, u);
  int flipped = fe_eq(check, negu);
  int flipped_i = fe_eq(check, negui);
  if (flipped || flipped_i) fe_mul(r, r, SQRT_M1);
  if (fe_is_neg(r)) fe_sub(r, zero, r);
  return correct || flipped;
}

extern "C" void otti_ristretto_encode(u8 out[32], const u8 pt_bytes[128]) {
  point p;
  fe_from_bytes(p.X, pt_bytes);
  fe_from_bytes(p.Y, pt_bytes + 32);
  fe_from_bytes(p.Z, pt_bytes + 64);
  fe_from_bytes(p.T, pt_bytes + 96);
  fe u1, u2, t, invsqrt, den1, den2, z_inv, ix, iy, enchanted, s, zero;
  std::memset(&zero, 0, sizeof(zero));
  fe_add(u1, p.Z, p.Y);
  fe_sub(t, p.Z, p.Y);
  fe_mul(u1, u1, t);
  fe_mul(u2, p.X, p.Y);
  fe_sq(t, u2);
  fe_mul(t, t, u1);
  fe one = {{1, 0, 0, 0}};
  sqrt_ratio_m1(invsqrt, one, t);
  fe_mul(den1, invsqrt, u1);
  fe_mul(den2, invsqrt, u2);
  fe_mul(z_inv, den1, den2);
  fe_mul(z_inv, z_inv, p.T);
  fe_mul(ix, p.X, SQRT_M1);
  fe_mul(iy, p.Y, SQRT_M1);
  fe_mul(enchanted, den1, INVSQRT_A_MINUS_D);
  fe tz;
  fe_mul(tz, p.T, z_inv);
  int rotate = fe_is_neg(tz);
  fe x = p.X, y = p.Y, den_inv = den2;
  if (rotate) {
    x = iy;
    y = ix;
    den_inv = enchanted;
  }
  fe xz;
  fe_mul(xz, x, z_inv);
  if (fe_is_neg(xz)) fe_sub(y, zero, y);
  fe_sub(t, p.Z, y);
  fe_mul(s, den_inv, t);
  if (fe_is_neg(s)) fe_sub(s, zero, s);
  fe_to_bytes(out, s);
}

extern "C" int otti_ristretto_decode(u8 out_pt[128], const u8 in[32]) {
  fe s, zero, one = {{1, 0, 0, 0}};
  std::memset(&zero, 0, sizeof(zero));
  fe_from_bytes(s, in);
  fe canon_chk = s;
  fe_canon(canon_chk);
  u8 back[32];
  std::memcpy(back, canon_chk.v, 32);
  if (std::memcmp(back, in, 32) != 0) return 0;  // non-canonical
  if (fe_is_neg(s)) return 0;
  fe ss, u1, u2, u2s, v, invsqrt, den_x, den_y, x, y, t;
  fe_sq(ss, s);
  fe_sub(u1, one, ss);
  fe_add(u2, one, ss);
  fe_sq(u2s, u2);
  fe du1;
  fe_mul(du1, ED_D, u1);
  fe_mul(du1, du1, u1);
  fe_sub(v, zero, du1);
  fe_sub(v, v, u2s);
  fe vt;
  fe_mul(vt, v, u2s);
  int was_square = sqrt_ratio_m1(invsqrt, one, vt);
  fe_mul(den_x, invsqrt, u2);
  fe_mul(den_y, invsqrt, den_x);
  fe_mul(den_y, den_y, v);
  fe_add(x, s, s);
  fe_mul(x, x, den_x);
  if (fe_is_neg(x)) fe_sub(x, zero, x);
  fe_mul(y, u1, den_y);
  fe_mul(t, x, y);
  if (!was_square || fe_is_neg(t) || fe_is_zero(y)) return 0;
  fe_to_bytes(out_pt, x);
  fe_to_bytes(out_pt + 32, y);
  fe_to_bytes(out_pt + 64, one);
  fe_to_bytes(out_pt + 96, t);
  return 1;
}

extern "C" void otti_pt_add(u8 o[128], const u8 a[128], const u8 b[128]) {
  point P, Q, O;
  fe_from_bytes(P.X, a); fe_from_bytes(P.Y, a + 32);
  fe_from_bytes(P.Z, a + 64); fe_from_bytes(P.T, a + 96);
  fe_from_bytes(Q.X, b); fe_from_bytes(Q.Y, b + 32);
  fe_from_bytes(Q.Z, b + 64); fe_from_bytes(Q.T, b + 96);
  pt_add(O, P, Q);
  fe_to_bytes(o, O.X); fe_to_bytes(o + 32, O.Y);
  fe_to_bytes(o + 64, O.Z); fe_to_bytes(o + 96, O.T);
}

extern "C" void otti_pt_scalar_mul(u8 o[128], const u8 p[128], const u8 k[32]) {
  point P, O;
  fe_from_bytes(P.X, p); fe_from_bytes(P.Y, p + 32);
  fe_from_bytes(P.Z, p + 64); fe_from_bytes(P.T, p + 96);
  pt_scalar_mul(O, P, k);
  fe_to_bytes(o, O.X); fe_to_bytes(o + 32, O.Y);
  fe_to_bytes(o + 64, O.Z); fe_to_bytes(o + 96, O.T);
}

// Pippenger MSM: n points (128B ext coords), n scalars (32B canonical LE)
extern "C" void otti_msm(u8 out[128], const u8 *pts, const u8 *scalars,
                         size_t n) {
  const int W = 8;
  const int NBUCKETS = 1 << W;
  const int NWIN = (253 + W - 1) / W;
  point *P = new point[n];
  for (size_t i = 0; i < n; ++i) {
    fe_from_bytes(P[i].X, pts + 128 * i);
    fe_from_bytes(P[i].Y, pts + 128 * i + 32);
    fe_from_bytes(P[i].Z, pts + 128 * i + 64);
    fe_from_bytes(P[i].T, pts + 128 * i + 96);
  }
  if (n <= 32) {
    // small-n fast path: shared-doubling multi double-and-add.  The
    // bucket loop below costs ~512 pt_adds per window regardless of n
    // (the running-sum scan), a ~2 ms floor that dominates the tiny
    // MSMs issued by the sigma protocols (2-3 points per commit).
    // Shared doubling costs 255 doubles + ~128*n adds total instead.
    point acc;
    pt_identity(acc);
    for (int bit = 255; bit >= 0; --bit) {
      if (bit != 255) pt_double(acc, acc);
      for (size_t i = 0; i < n; ++i)
        if ((scalars[32 * i + bit / 8] >> (bit % 8)) & 1)
          pt_add(acc, acc, P[i]);
    }
    fe_to_bytes(out, acc.X);
    fe_to_bytes(out + 32, acc.Y);
    fe_to_bytes(out + 64, acc.Z);
    fe_to_bytes(out + 96, acc.T);
    delete[] P;
    return;
  }
  point total;
  pt_identity(total);
  point *buckets = new point[NBUCKETS];
  for (int w = NWIN - 1; w >= 0; --w) {
    if (w != NWIN - 1)
      for (int d = 0; d < W; ++d) pt_double(total, total);
    bool used[256] = {false};
    for (int bkt = 0; bkt < NBUCKETS; ++bkt) pt_identity(buckets[bkt]);
    for (size_t i = 0; i < n; ++i) {
      int bitpos = w * W;
      u64 digit = 0;
      for (int b = 0; b < W; ++b) {
        int pos = bitpos + b;
        if (pos < 256 && ((scalars[32 * i + pos / 8] >> (pos % 8)) & 1))
          digit |= 1ULL << b;
      }
      if (digit) {
        pt_add(buckets[digit], buckets[digit], P[i]);
        used[digit] = true;
      }
    }
    point run, wsum;
    pt_identity(run);
    pt_identity(wsum);
    for (int bkt = NBUCKETS - 1; bkt >= 1; --bkt) {
      if (used[bkt]) pt_add(run, run, buckets[bkt]);
      pt_add(wsum, wsum, run);
    }
    pt_add(total, total, wsum);
  }
  fe_to_bytes(out, total.X);
  fe_to_bytes(out + 32, total.Y);
  fe_to_bytes(out + 64, total.Z);
  fe_to_bytes(out + 96, total.T);
  delete[] P;
  delete[] buckets;
}

// Batched two-term combinations with SHARED scalars:
//   out[i] = sa * A[i] + sb * B[i]   for i in [0, n)
// (the bullet argument's per-round generator fold G' = u^-1 G_L + u G_R —
// one library call per round instead of one 2-point MSM per generator).
// Per pair: a 3-entry joint table {A, B, A+B} then one shared
// double-and-add walk over the two scalars' joint bits.
extern "C" void otti_fold_pairs(u8 *out, const u8 *a_pts, const u8 *b_pts,
                                const u8 sa[32], const u8 sb[32], size_t n) {
  int top = 255;
  while (top > 0) {
    int abit = (sa[top / 8] >> (top % 8)) & 1;
    int bbit = (sb[top / 8] >> (top % 8)) & 1;
    if (abit || bbit) break;
    --top;
  }
  for (size_t i = 0; i < n; ++i) {
    point tab[4];  // index (bbit<<1)|abit; tab[0] unused
    fe_from_bytes(tab[1].X, a_pts + 128 * i);
    fe_from_bytes(tab[1].Y, a_pts + 128 * i + 32);
    fe_from_bytes(tab[1].Z, a_pts + 128 * i + 64);
    fe_from_bytes(tab[1].T, a_pts + 128 * i + 96);
    fe_from_bytes(tab[2].X, b_pts + 128 * i);
    fe_from_bytes(tab[2].Y, b_pts + 128 * i + 32);
    fe_from_bytes(tab[2].Z, b_pts + 128 * i + 64);
    fe_from_bytes(tab[2].T, b_pts + 128 * i + 96);
    pt_add(tab[3], tab[1], tab[2]);
    point acc;
    pt_identity(acc);
    for (int bit = top; bit >= 0; --bit) {
      if (bit != top) pt_double(acc, acc);
      int d = ((sa[bit / 8] >> (bit % 8)) & 1) |
              (((sb[bit / 8] >> (bit % 8)) & 1) << 1);
      if (d) pt_add(acc, acc, tab[d]);
    }
    fe_to_bytes(out + 128 * i, acc.X);
    fe_to_bytes(out + 128 * i + 32, acc.Y);
    fe_to_bytes(out + 128 * i + 64, acc.Z);
    fe_to_bytes(out + 128 * i + 96, acc.T);
  }
}

// ===========================================================================
// init: derive curve constants
// ===========================================================================
static void fe_from_u64(fe &o, u64 v) {
  std::memset(&o, 0, sizeof(o));
  o.v[0] = v;
}

extern "C" void otti_init() {
  sc_init();
  // d = -121665/121666
  fe n121665, n121666, inv, zero, one = {{1, 0, 0, 0}};
  std::memset(&zero, 0, sizeof(zero));
  fe_from_u64(n121665, 121665);
  fe_from_u64(n121666, 121666);
  fe_inv(inv, n121666);
  fe_mul(ED_D, n121665, inv);
  fe_sub(ED_D, zero, ED_D);
  fe_add(ED_D2, ED_D, ED_D);
  // sqrt(-1) = 2^((p-1)/4)
  static const u8 E14[32] = {0xfb, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff,
                             0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff,
                             0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff,
                             0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x1f};
  fe two;
  fe_from_u64(two, 2);
  fe_pow_bytes(SQRT_M1, two, E14, 253);
  // invsqrt(a - d) with a = -1:  1/sqrt(-1 - d)
  fe amd;
  fe_sub(amd, zero, one);
  fe_sub(amd, amd, ED_D);
  sqrt_ratio_m1(INVSQRT_A_MINUS_D, one, amd);
  // sqrt(a*d - 1) = sqrt(-d - 1)
  fe adm1;
  fe_sub(adm1, zero, ED_D);
  fe_sub(adm1, adm1, one);
  sqrt_ratio_m1(SQRT_AD_MINUS_ONE, adm1, one);
  fe dd;
  fe_sq(dd, ED_D);
  fe_sub(ONE_MINUS_D_SQ, one, dd);
  fe dm1;
  fe_sub(dm1, ED_D, one);
  fe_sq(D_MINUS_ONE_SQ, dm1);
}
