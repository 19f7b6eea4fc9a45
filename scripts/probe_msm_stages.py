#!/usr/bin/env python3
"""Per-stage var-base MSM profile on the real TPU: digits/sort/gather/
scan/aggregate, each isolated in its own chained dispatch."""

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

    from otti_tpu.curve import edwards as E
    from otti_tpu.field.fields import ints_to_limbs
    from otti_tpu.msm import pippenger as P

    n = 1 << 16
    w = P.pick_window(n)
    r = random.Random(5)
    L = (1 << 252) + 27742317777372353535851937790883648493
    ks = jnp.asarray(ints_to_limbs([r.randrange(L) for _ in range(n)]))
    base = E.base_point(shape=(n,))
    sc = jnp.asarray(ints_to_limbs([r.randrange(1, L) for _ in range(n)]))
    pts = jax.jit(E.scalar_mul)(base, sc)
    _sync(pts)

    dig = jax.jit(lambda s: P._digits(s, w))(ks)
    _sync(dig)
    n_win = dig.shape[0]
    print(json.dumps({"n": n, "window": w, "n_windows": n_win}), flush=True)

    t = _time(jax.jit(lambda s: P._digits(s, w)), ks)
    print(json.dumps({"stage": "digits_all_windows", "s": round(t, 4)}), flush=True)

    t = _time(jax.jit(E.to_affine_pack), pts)
    print(json.dumps({"stage": "affine_pack_once", "s": round(t, 4)}), flush=True)

    packed = jax.jit(E.to_affine_pack)(pts)
    _sync(packed)

    @jax.jit
    def sort_all(dig):
        return jnp.argsort(dig, axis=1)

    dg = dig.reshape(n_win, n)
    t = _time(sort_all, dg)
    print(json.dumps({"stage": "argsort_x%d" % n_win, "s": round(t, 4)}), flush=True)

    order = sort_all(dg)
    _sync(order)

    @jax.jit
    def gather_unpack_one(packed, order_row):
        return E.from_affine_pack(packed[order_row])

    t = _time(gather_unpack_one, packed, order[0])
    print(
        json.dumps({"stage": "gather_unpack_ONE_window", "s": round(t, 4)}),
        flush=True,
    )

    pts_sorted = gather_unpack_one(packed, order[0])
    dig_sorted = jnp.take_along_axis(dg, order, axis=1)[0]
    _sync(pts_sorted)

    @jax.jit
    def scan_one(pts_sorted, dig_sorted):
        return P._segment_scan_bucket_sums(pts_sorted, dig_sorted, w)

    t = _time(scan_one, pts_sorted, dig_sorted)
    print(json.dumps({"stage": "segscan_ONE_window", "s": round(t, 4)}), flush=True)

    buckets = scan_one(pts_sorted, dig_sorted)
    _sync(buckets)

    @jax.jit
    def agg_one(buckets):
        return P._aggregate_buckets(buckets, w)

    t = _time(agg_one, buckets)
    print(json.dumps({"stage": "aggregate_ONE_window", "s": round(t, 4)}), flush=True)

    f = P.msm_jit(n)
    t = _time(f, pts, ks)
    print(json.dumps({"stage": "full_msm", "s": round(t, 4), "pts_per_s": round(n / t)}), flush=True)


if __name__ == "__main__":
    main()
