#!/usr/bin/env python3
"""Probe candidate MXU/f32 field-kernel formulations against the VPU path.

Candidates (all exact-arithmetic by construction):
  * f32-limb conv: 9-bit limbs, f32 FMA products (exact < 2^24)
  * MXU inner product: sum_x a(x)*b(x) via 6-bit-split int8 matmul
    a6^T @ b6 -> [44,44] limb-cross matrix, anti-diagonal fold on host of
    the kernel (tiny)
  * MXU Toeplitz scalar-shared mul: c[n] = r * d[n] via d6 [N,44] @ T(r)
    [44,88] int8 matmul
Prints one JSON line per probe with effective field-ops/s.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _sync(x):
    import jax

    leaf = jax.tree.leaves(x)[0]
    jax.device_get(leaf.reshape(-1)[:1])


def _time(fn, *args, iters=3):
    _sync(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / iters


def main():
    from otti_tpu import runtime

    if os.environ.get("OTTI_BENCH_CPU"):
        runtime.force_cpu()
    else:
        runtime.use_tpu()

    import random

    import jax
    import jax.numpy as jnp

    from otti_tpu.field import ops as F
    from otti_tpu.field.fields import SCALAR, ints_to_limbs

    r = random.Random(7)
    n = 1 << 16
    chain = 128
    fa = jnp.asarray(ints_to_limbs([r.randrange(SCALAR.modulus) for _ in range(n)]))
    fb = jnp.asarray(ints_to_limbs([r.randrange(SCALAR.modulus) for _ in range(n)]))

    # --- baseline: current full mul (with r05 carry passes) ----------
    @jax.jit
    def base_chain(a, b):
        def body(_, acc):
            return F.mul(SCALAR, acc, b)

        return jax.lax.fori_loop(0, chain, body, a)

    dt = _time(base_chain, fa, fb)
    print(json.dumps({"probe": "mul_vpu_int32", "per_s": round(n * chain / dt)}), flush=True)

    # --- f32-limb conv (9-bit limbs, 30 limbs) -----------------------
    # correctness: products < 2^18, anti-diagonal sums < 30*2^18 < 2^23 —
    # exact in f32.  Conv only (no reduction) for an upper-bound estimate.
    def to9(x22):
        # 22x12-bit -> 30x9-bit limbs (vectorized bit regroup via int ops)
        bits = []
        for i in range(30):
            lo_bit = 9 * i
            limb, off = divmod(lo_bit, 12)
            if limb >= 22:
                bits.append(jnp.zeros_like(x22[..., 0]))
                continue
            v = x22[..., limb] >> off
            if off > 3 and limb + 1 < 22:
                v = v | (x22[..., limb + 1] << (12 - off))
            bits.append(v & 0x1FF)
        return jnp.stack(bits, axis=-1).astype(jnp.float32)

    a9 = to9(F.canon(SCALAR, fa))
    b9 = to9(F.canon(SCALAR, fb))

    @jax.jit
    def f32conv_chain(a, b):
        def body(_, acc):
            terms = [
                jnp.pad(acc[..., i : i + 1] * b, [(0, 0), (i, 59 - 30 - i)])
                for i in range(30)
            ]
            while len(terms) > 1:
                nxt = [terms[j] + terms[j + 1] for j in range(0, len(terms) - 1, 2)]
                if len(terms) % 2:
                    nxt.append(terms[-1])
                terms = nxt
            w = terms[0]
            # cheap fake normalization to keep values bounded across the
            # chain (NOT a real reduction — conv-throughput probe only)
            return jnp.mod(w[..., :30], 512.0)

        return jax.lax.fori_loop(0, chain, body, a)

    dt = _time(f32conv_chain, a9, b9)
    print(json.dumps({"probe": "conv_f32_9bit", "per_s": round(n * chain / dt)}), flush=True)

    # int32 conv-only baseline for comparison
    @jax.jit
    def i32conv_chain(a, b):
        def body(_, acc):
            w = F.conv(acc, b)
            return w[..., :22] & 0xFFF

        return jax.lax.fori_loop(0, chain, body, a)

    dt = _time(i32conv_chain, fa, fb)
    print(json.dumps({"probe": "conv_i32_12bit", "per_s": round(n * chain / dt)}), flush=True)

    # --- MXU inner product: a6^T @ b6 --------------------------------
    def to6(x22):
        lo = x22 & 0x3F
        hi = x22 >> 6
        out = jnp.stack([lo, hi], axis=-1).reshape(x22.shape[:-1] + (44,))
        return out.astype(jnp.int8)

    a6 = to6(fa)
    b6 = to6(fb)

    @jax.jit
    def mxu_dot_chain(a, b):
        def body(i, acc):
            m = jax.lax.dot_general(
                a,
                b,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [44, 44]
            return acc + m * (i + 1)

        return jax.lax.fori_loop(0, chain, body, jnp.zeros((44, 44), jnp.int32))

    dt = _time(mxu_dot_chain, a6, b6)
    print(
        json.dumps(
            {
                "probe": "mxu_inner_product",
                "pairs_per_s": round(n * chain / dt),
            }
        ),
        flush=True,
    )

    # --- MXU Toeplitz scalar-shared mul ------------------------------
    # T[i,k] = r6[k-i], built once; d6 [N,44] @ T [44,88] -> wide halves
    r6 = jnp.asarray([r.randrange(64) for _ in range(44)], jnp.int8)
    T = jnp.zeros((44, 88), jnp.int8)
    ii = jnp.arange(44)[:, None]
    kk = jnp.arange(88)[None, :]
    j = kk - ii
    T = jnp.where((j >= 0) & (j < 44), r6[jnp.clip(j, 0, 43)], 0).astype(jnp.int8)

    @jax.jit
    def mxu_toep_chain(d, T):
        def body(_, acc):
            w = jax.lax.dot_general(
                acc,
                T,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [N, 88], coeffs < 44*63*63 < 2^18
            # recombine 6-bit coeff pairs -> 44-ish 12-bit grid, carry, trim
            w12 = w[:, 0::2] + (w[:, 1::2] << 6)  # [N, 44]
            w12 = F.carry(w12, 45, passes=2)
            return (w12[:, :44] & 0x3F).astype(jnp.int8)

        return jax.lax.fori_loop(0, chain, body, d)

    dt = _time(mxu_toep_chain, a6, T)
    print(
        json.dumps(
            {"probe": "mxu_toeplitz_scalar_mul", "per_s": round(n * chain / dt)}
        ),
        flush=True,
    )

    # VPU scalar-shared mul baseline (broadcast mul, same as F.mul with
    # b a single element broadcast)
    rb = fb[:1]

    @jax.jit
    def vpu_scalar_chain(a, rb):
        def body(_, acc):
            return F.mul(SCALAR, acc, rb)

        return jax.lax.fori_loop(0, chain, body, a)

    dt = _time(vpu_scalar_chain, fa, rb)
    print(
        json.dumps(
            {"probe": "vpu_scalar_mul", "per_s": round(n * chain / dt)}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
