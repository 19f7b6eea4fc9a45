#!/usr/bin/env python3
"""Prove a FULL-SUITE instance under --mesh (k=8 virtual CPU mesh) and
commit the record (VERDICT r04 next #5: the multi-chip story was only
toy-validated; this runs the segmented sharded zk prover at suite scale,
byte-compares against the single-chip proof, and writes a
mode="sharded-zk" meta).

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/mesh_suite_record.py [instance.mps]
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

INSTANCE = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/root/reference/datasets/LP/MPS-full/brandy.mps"
)


def _deep_eq(a, b):
    if dataclasses.is_dataclass(a):
        return type(a) is type(b) and all(
            _deep_eq(getattr(a, f.name), getattr(b, f.name))
            for f in dataclasses.fields(a)
        )
    if isinstance(a, (list, tuple)):
        return len(a) == len(b) and all(_deep_eq(x, y) for x, y in zip(a, b))
    return a == b


def main():
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    from otti_tpu import metrics, runtime

    runtime.force_cpu()
    runtime.enable_compile_cache()
    runtime.allow_multidevice_cache()
    import jax

    k = min(8, len(jax.devices()))
    from otti_tpu.codegen import lp_cert
    from otti_tpu.io import mps
    from otti_tpu.oracle import lp_oracle
    from otti_tpu.parallel import hybrid_sharded
    from otti_tpu.spartan import hybrid, zknizk

    name = os.path.basename(INSTANCE)
    prob = mps.parse_mps(INSTANCE)
    x, y, _ = lp_oracle.solve(prob)
    shape, vars_, inputs = lp_cert.build(prob, x, y)
    dev = shape.to_device()
    print(
        f"{name}: {shape.num_cons} cons (padded {shape.num_cons_padded}), "
        f"k={k} virtual devices"
    )
    seed = b"\x2a" * 32

    t0 = time.time()
    p_ref = hybrid.prove_zk(dev, vars_, inputs, seed=seed)
    t_single = time.time() - t0
    print(f"single-chip zk prove: {t_single:.1f}s")

    metrics.reset()
    t0 = time.time()
    p_k = hybrid_sharded.prove_zk(dev, vars_, inputs, k=k, seed=seed)
    t_shard_cold = time.time() - t0
    t0 = time.time()
    p_k2 = hybrid_sharded.prove_zk(dev, vars_, inputs, k=k, seed=seed)
    t_shard = time.time() - t0
    print(f"sharded zk prove (k={k}): cold {t_shard_cold:.1f}s warm {t_shard:.1f}s")

    byte_equal = _deep_eq(p_ref, p_k) and _deep_eq(p_ref, p_k2)
    t0 = time.time()
    ok = zknizk.verify(dev, inputs, p_k)
    t_verify = time.time() - t0
    print(f"byte-equal to single-chip: {byte_equal}; verified: {ok}")
    if not (byte_equal and ok):
        sys.exit(1)

    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "out", "LP"
    )
    os.makedirs(out_dir, exist_ok=True)
    meta = {
        "name": name,
        "mode": "sharded-zk",
        "mesh_devices": k,
        "mesh_kind": "virtual-cpu (8-device host mesh; collective schedule "
        "identical to a real ICI mesh, per-chip speed is not represented)",
        "num_cons": shape.num_cons,
        "num_cons_padded": shape.num_cons_padded,
        "num_vars_padded": shape.num_vars_padded,
        "verified": bool(ok),
        "byte_identical_to_single_chip": bool(byte_equal),
        "timings": {
            "prove_single_chip": round(t_single, 2),
            "prove_sharded_cold": round(t_shard_cold, 2),
            "prove_sharded_warm": round(t_shard, 2),
            "verify": round(t_verify, 2),
        },
        "prover_metrics": metrics.snapshot(),
        "capture": "warm",
        "seed": seed.hex(),
    }
    path = os.path.join(out_dir, name + ".sharded.meta.json")
    with open(path, "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
