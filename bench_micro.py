#!/usr/bin/env python3
"""North-star kernel microbenchmarks (BASELINE.md targets).

Measures the primitive throughputs that gate the whole prover
(SURVEY.md §7.4: "field-mul/s is north-star metric #1"):

  * field_mul_per_s      — batched curve25519 scalar-field multiplies
  * msm_points_per_s     — variable-base Pippenger MSM over ristretto255
  * sumcheck_points_per_s — hypercube points folded+evaluated per second
                            in one cubic sumcheck round (4 tables)
  * scaling (--scaling)  — sharded sumcheck-round efficiency on a
                            1/2/4/8-device mesh (virtual CPU devices;
                            SURVEY.md §6 "N-host scaling efficiency")

Usage:
  python bench_micro.py              # real TPU (falls back to CPU)
  python bench_micro.py --cpu        # force CPU
  python bench_micro.py --scaling    # CPU 8-virtual-device scaling runs

Prints one JSON line per metric (same shape as bench.py's line).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _sync(x):
    """Force REAL completion: on the axon backend block_until_ready
    returns at enqueue-acknowledgement (measured r03: chained work 64x
    apart timed identically), so honest timing must pull bytes back."""
    import jax

    leaf = jax.tree.leaves(x)[0]
    jax.device_get(leaf.reshape(-1)[:1])


def _emit(metric, value, unit, vs=None):
    line = {"metric": metric, "value": value, "unit": unit}
    if vs is not None:
        line["vs_baseline"] = vs
    print(json.dumps(line), flush=True)


def bench_field_mul(n=1 << 16, chain=64, iters=3, target_s=1.5):
    """Batched field-mul throughput with the work CHAINED inside one
    dispatch and auto-scaled until device time dominates the ~100 ms
    tunnel round trip (VERDICT r02 weak #1: the old fixed-size loop
    measured latency, not throughput, and was off by ~10^3)."""
    import random

    import jax
    import jax.numpy as jnp

    from otti_tpu.field import ops as F
    from otti_tpu.field.fields import SCALAR, ints_to_limbs

    r = random.Random(1)
    a = jnp.asarray(ints_to_limbs([r.randrange(SCALAR.modulus) for _ in range(n)]))
    b = jnp.asarray(ints_to_limbs([r.randrange(SCALAR.modulus) for _ in range(n)]))

    def make(chain):
        @jax.jit
        def chained(a, b):
            def body(_, acc):
                return F.mul(SCALAR, acc, b)

            return jax.lax.fori_loop(0, chain, body, a)

        return chained

    # calibration pass: estimate per-mul device time, then rescale the
    # chain so one timed dispatch runs ~target_s of pure device work
    fn = make(chain)
    _sync(fn(a, b))  # compile + warm
    t0 = time.time()
    _sync(fn(a, b))
    dt = max(time.time() - t0, 1e-6)
    est_rate = n * chain / dt
    chain2 = int(min(1 << 15, max(chain, est_rate * target_s / n)))
    fn = make(chain2)
    _sync(fn(a, b))
    t0 = time.time()
    for _ in range(iters):
        out = fn(a, b)
    _sync(out)
    dt = time.time() - t0
    rate = n * chain2 * iters / dt
    _emit("field_mul_per_s", round(rate), f"mul/s (batch={n} chain={chain2})")
    return rate


def bench_msm(n=1 << 13, iters=3):
    import random

    import jax.numpy as jnp

    from otti_tpu.curve import edwards as E
    from otti_tpu.field.fields import ints_to_limbs
    from otti_tpu.msm import pippenger

    r = random.Random(2)
    L = (1 << 252) + 27742317777372353535851937790883648493
    # random valid points: k_i * B computed batched on device
    gen_ks = jnp.asarray(ints_to_limbs([r.randrange(1, L) for _ in range(n)]))
    base = E.base_point(shape=(n,))
    import jax

    pts = jax.jit(E.scalar_mul)(base, gen_ks)
    pts = jax.tree.map(lambda x: x.block_until_ready(), pts)
    ks = jnp.asarray(ints_to_limbs([r.randrange(L) for _ in range(n)]))

    f = pippenger.msm_jit(n)
    _sync(f(pts, ks))  # compile + warm
    t0 = time.time()
    for _ in range(iters):
        out = f(pts, ks)
    _sync(out)
    dt = time.time() - t0
    rate = n * iters / dt
    _emit("msm_points_per_s", round(rate), f"points/s (n={n})")
    return rate


def bench_msm_fixed_base(n=1 << 16, iters=3):
    """Fixed-base comb MSM throughput — the path every production
    commitment takes (Hyrax row commitments; VERDICT r03 weak #5 asked
    for the north-star MSM row to track what production actually runs).
    Measured as scalar-point products per second over the Hyrax row grid
    of an n-variable witness."""
    import random

    import jax
    import jax.numpy as jnp

    from otti_tpu.field.fields import ints_to_limbs
    from otti_tpu.msm import pippenger
    from otti_tpu.spartan.hyrax import hyrax_dims
    from otti_tpu.spartan.nizk import GENS_LABEL

    r = random.Random(3)
    L = (1 << 252) + 27742317777372353535851937790883648493
    mu_rows, mu_cols = hyrax_dims(n)
    rows, cols = 1 << mu_rows, 1 << mu_cols
    sc = jnp.asarray(
        ints_to_limbs([r.randrange(L) for _ in range(n)])
    ).reshape(rows, cols, -1)
    tbl = pippenger.fixed_base_tables(
        cols, GENS_LABEL, pippenger.FIXED_BASE_WINDOW, False
    )[0]
    f = jax.jit(
        lambda s, t: pippenger.msm_fixed_base(cols, GENS_LABEL, s, tbl=t)
    )
    _sync(f(sc, tbl))  # compile + warm
    t0 = time.time()
    for _ in range(iters):
        out = f(sc, tbl)
    _sync(out)
    dt = time.time() - t0
    rate = n * iters / dt
    _emit(
        "msm_fixed_base_points_per_s",
        round(rate),
        f"points/s (n={n}, {rows}x{cols} Hyrax grid, w={pippenger.FIXED_BASE_WINDOW})",
    )
    return rate


def bench_sumcheck_round(n=1 << 18, rounds=64, iters=3):
    """Cubic sumcheck round throughput: ``rounds`` full bind+eval rounds
    (fixed active size n/2 — the first-round cost) CHAINED in one
    lax.scan dispatch, so device time dominates the tunnel RTT."""
    import random

    import jax
    import jax.numpy as jnp

    from otti_tpu.field.fields import SCALAR, ints_to_limbs
    from otti_tpu.spartan import sumcheck

    r = random.Random(3)

    def tbl():
        return jnp.asarray(
            ints_to_limbs([r.randrange(SCALAR.modulus) for _ in range(n)])
        )

    eq, pa, pb, pc = tbl(), tbl(), tbl(), tbl()
    r_prev = jnp.asarray(ints_to_limbs([r.randrange(SCALAR.modulus)]))[0]

    @jax.jit
    def chained(r_ch, eq, pa, pb, pc):
        def body(tabs, _):
            tabs = sumcheck._bind_tables(r_ch, jnp.int32(n // 2), tabs)
            evals = sumcheck._cubic_evals(*tabs, jnp.int32(n // 2))
            return tabs, evals

        _, evs = jax.lax.scan(body, (eq, pa, pb, pc), None, length=rounds)
        return evs

    _sync(chained(r_prev, eq, pa, pb, pc))  # compile + warm
    t0 = time.time()
    for _ in range(iters):
        out = chained(r_prev, eq, pa, pb, pc)
    _sync(out)
    dt = time.time() - t0
    rate = n * rounds * iters / dt
    _emit(
        "sumcheck_points_per_s",
        round(rate),
        f"hypercube points/s per round (n={n}, {rounds} chained rounds, "
        "bind+eval of 4 tables)",
    )
    return rate


def bench_scaling(n=1 << 18, iters=3):
    """Sharded cubic sumcheck round at mesh sizes 1/2/4/8 (virtual CPU)."""
    import random

    import jax
    import jax.numpy as jnp

    from otti_tpu.field.fields import SCALAR, ints_to_limbs
    from otti_tpu.parallel import sharded

    r = random.Random(4)

    def tbl():
        return jnp.asarray(
            ints_to_limbs([r.randrange(SCALAR.modulus) for _ in range(n)])
        )

    eq, pa, pb, pc = tbl(), tbl(), tbl(), tbl()
    times = {}
    for k in (1, 2, 4, 8):
        if k > len(jax.devices()):
            break
        mesh = sharded.make_mesh(k)
        # jit the whole sharded round: calling shard_map eagerly executes
        # the body per-op (minutes of dispatch — why no r04 scaling
        # record ever landed, r05 fix)
        fn = jax.jit(
            lambda eq, pa, pb, pc, m=mesh: sharded.round_cubic_sharded(
                m, eq, pa, pb, pc
            )
        )
        out = fn(eq, pa, pb, pc)
        _sync(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(eq, pa, pb, pc)
        _sync(out)
        times[k] = (time.time() - t0) / iters
    base = times.get(1)
    for k, t in times.items():
        eff = base / (k * t) if base else None
        _emit(
            f"sumcheck_round_sharded_{k}dev_s",
            round(t, 4),
            f"s/round (n={n})",
            vs=round(eff, 3) if eff else None,
        )
    return times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--quick", action="store_true", help="small sizes (CI)")
    args = ap.parse_args()

    from otti_tpu import runtime

    if args.cpu or args.scaling or os.environ.get("OTTI_BENCH_CPU"):
        runtime.force_cpu()
    else:
        runtime.use_tpu()
        try:
            import jax

            jax.devices()
        except Exception:
            runtime.force_cpu()

    if args.scaling:
        bench_scaling(n=1 << 14 if args.quick else 1 << 18)
        return

    sizes = (
        dict(fm=1 << 12, msm=1 << 8, fb=1 << 10, sc=1 << 12)
        if args.quick
        else dict(fm=1 << 16, msm=1 << 16, fb=1 << 16, sc=1 << 18)
    )
    bench_field_mul(n=sizes["fm"])
    bench_msm(n=sizes["msm"])
    bench_msm_fixed_base(n=sizes["fb"])
    bench_sumcheck_round(n=sizes["sc"])


if __name__ == "__main__":
    main()
