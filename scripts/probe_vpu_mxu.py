#!/usr/bin/env python3
"""Device-ceiling probes for the field-mul utilization analysis.

Measures, on the real TPU:
  * pure elementwise int32 multiply / add throughput (the VPU ceiling the
    limb kernels compete against),
  * int8 matmul MAC throughput (the MXU ceiling),
  * the current F.mul stage decomposition (conv / carry / fold), each
    chained inside one dispatch so device time dominates the ~100 ms
    tunnel RTT.

Output: one JSON line per probe.  This is the evidence base for
RESULTS.md's field-mul utilization analysis (VERDICT r04 next #1).
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
    _sync(fn(*args))  # compile + warm
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

    import jax
    import jax.numpy as jnp

    print(json.dumps({"devices": str(jax.devices())}), flush=True)

    # --- VPU int32 elementwise ceiling -------------------------------
    n = 1 << 20
    chain = 256
    a = jnp.arange(n, dtype=jnp.int32) | 1
    b = jnp.arange(n, dtype=jnp.int32) ^ 0x5A5A5A

    @jax.jit
    def mul_chain(a, b):
        def body(_, acc):
            return (acc * b) ^ 1  # xor defeats algebraic simplification

        return jax.lax.fori_loop(0, chain, body, a)

    dt = _time(mul_chain, a, b)
    print(
        json.dumps(
            {
                "probe": "vpu_int32_mul",
                "ops_per_s": round(n * chain * 2 / dt),  # mul+xor per iter
                "n": n,
                "chain": chain,
            }
        ),
        flush=True,
    )

    @jax.jit
    def add_chain(a, b):
        def body(_, acc):
            return (acc + b) ^ 1

        return jax.lax.fori_loop(0, chain, body, a)

    dt = _time(add_chain, a, b)
    print(
        json.dumps(
            {"probe": "vpu_int32_add", "ops_per_s": round(n * chain * 2 / dt)}
        ),
        flush=True,
    )

    # --- MXU int8 matmul ceiling -------------------------------------
    m = 1 << 13
    k8 = jnp.ones((m, 512), jnp.int8)
    w8 = jnp.ones((512, 512), jnp.int8)

    @jax.jit
    def mm_chain(x, w):
        def body(_, acc):
            y = jax.lax.dot_general(
                acc,
                w,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (y & 127).astype(jnp.int8)

        return jax.lax.fori_loop(0, 64, body, x)

    dt = _time(mm_chain, k8, w8)
    print(
        json.dumps(
            {
                "probe": "mxu_int8_matmul",
                "macs_per_s": round(m * 512 * 512 * 64 / dt),
                "shape": [m, 512, 512],
            }
        ),
        flush=True,
    )

    # bf16 matmul for reference
    kb = jnp.ones((m, 512), jnp.bfloat16)
    wb = jnp.ones((512, 512), jnp.bfloat16)

    @jax.jit
    def mmb_chain(x, w):
        def body(_, acc):
            y = jax.lax.dot_general(
                acc,
                w,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (y * 1e-3).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, 64, body, x)

    dt = _time(mmb_chain, kb, wb)
    print(
        json.dumps(
            {"probe": "mxu_bf16_matmul", "macs_per_s": round(m * 512 * 512 * 64 / dt)}
        ),
        flush=True,
    )

    # --- F.mul stage decomposition -----------------------------------
    import random

    from otti_tpu.field import ops as F
    from otti_tpu.field.fields import CONV_LIMBS, SCALAR, ints_to_limbs

    r = random.Random(1)
    nb = 1 << 16
    fa = jnp.asarray(ints_to_limbs([r.randrange(SCALAR.modulus) for _ in range(nb)]))
    fb = jnp.asarray(ints_to_limbs([r.randrange(SCALAR.modulus) for _ in range(nb)]))
    ch = 256

    def stage(name, f):
        @jax.jit
        def chain_f(a, b):
            def body(_, acc):
                out = f(acc, b)
                # keep shapes stable: slice/pad back to 22 limbs
                out = out[..., : a.shape[-1]]
                if out.shape[-1] < a.shape[-1]:
                    out = jnp.pad(
                        out, [(0, 0), (0, a.shape[-1] - out.shape[-1])]
                    )
                return out ^ (acc & 1)

            return jax.lax.fori_loop(0, ch, body, a)

        dt = _time(chain_f, fa, fb)
        print(
            json.dumps(
                {"probe": f"fmul_stage_{name}", "per_s": round(nb * ch / dt)}
            ),
            flush=True,
        )

    stage("conv_only", lambda a, b: F.conv(a, b))
    stage("conv_carry", lambda a, b: F.carry(F.conv(a, b), CONV_LIMBS + 1))
    stage("full_mul", lambda a, b: F.mul(SCALAR, a, b))


if __name__ == "__main__":
    main()
