#!/usr/bin/env python3
"""Headline benchmark + north-star metrics, in ONE JSON line.

Primary metric: LP optimality proof (afiro) end-to-end on TPU —
parse -> HiGHS oracle -> direct R1CS lowering -> Spartan prove -> verify
(the reference's flagship small-suite workload, SURVEY.md §3.1).

Baseline envelope (BASELINE.md): the reference proves the 6-instance LP
small suite in < 1 hour on x86 (~600 s/instance end-to-end including its
compiler stages).  vs_baseline = baseline_seconds / our_seconds.

The "extras" object carries BASELINE.md's target table (field-mul/s, MSM
points/s, sumcheck points/s) plus the zk and snark end-to-end timings, so
BENCH_r*.json tracks every north-star number, not one scalar.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N,
   "extras": {...}}
"""

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_E2E_S = 600.0  # reference small-suite per-instance envelope
AFIRO = "/root/reference/datasets/LP/MPS-small/afiro.mps"


def main():
    from otti_tpu import runtime

    if os.environ.get("OTTI_BENCH_CPU"):
        runtime.force_cpu()
    else:
        runtime.use_tpu()
        try:
            import jax

            jax.devices()
        except Exception:
            # TPU tunnel unreachable — still produce the JSON line on CPU
            runtime.force_cpu()

    from otti_tpu.codegen import lp_cert
    from otti_tpu.io import mps
    from otti_tpu.oracle import lp_oracle
    from otti_tpu.spartan import fused, nizk

    prob = mps.parse_mps(AFIRO)
    x, y, _ = lp_oracle.solve(prob)
    shape, vars_, inputs = lp_cert.build(prob, x, y)
    dev = shape.to_device()

    # steady-state lowering time (first pass pays one-time library imports)
    t0 = time.time()
    prob2 = mps.parse_mps(AFIRO)
    x2, y2, _ = lp_oracle.solve(prob2)
    lp_cert.build(prob2, x2, y2)
    t_lower = time.time() - t0

    # cold run (includes compilation), then steady-state measurement
    # prover = fused single-dispatch path (device Fiat-Shamir transcript);
    # OTTI_BENCH_CLASSIC=1 measures the per-round host-transcript prover
    prove_fn = nizk.prove if os.environ.get("OTTI_BENCH_CLASSIC") else fused.prove
    t0 = time.time()
    proof = prove_fn(dev, vars_, inputs)
    ok_cold = nizk.verify(dev, inputs, proof)
    t_cold = time.time() - t0

    t0 = time.time()
    proof = prove_fn(dev, vars_, inputs)
    t_prove = time.time() - t0
    t0 = time.time()
    ok = nizk.verify(dev, inputs, proof)
    t_verify = time.time() - t0

    assert ok_cold and ok, "benchmark proof failed to verify"
    e2e = t_lower + t_prove + t_verify

    extras = {
        "proof_bytes": proof.size_bytes(),
        "cons": shape.num_cons,
        "cons_per_s": round(shape.num_cons / max(t_prove, 1e-9), 1),
    }

    # ---- north-star kernel micros (BASELINE.md target table) --------------
    if not os.environ.get("OTTI_BENCH_FAST"):
        import bench_micro

        sink = io.StringIO()
        try:
            with contextlib.redirect_stdout(sink):
                extras["field_mul_per_s"] = round(bench_micro.bench_field_mul())
                extras["msm_points_per_s"] = round(
                    bench_micro.bench_msm(n=1 << 16)
                )
                extras["msm_fixed_base_points_per_s"] = round(
                    bench_micro.bench_msm_fixed_base(n=1 << 16)
                )
                extras["sumcheck_points_per_s"] = round(
                    bench_micro.bench_sumcheck_round()
                )
        except Exception as e:  # never let a micro kill the headline line
            extras["micro_error"] = f"{type(e).__name__}: {e}"

        # ---- zk + snark end-to-end on the same instance -------------------
        try:
            from otti_tpu import cli as _cli
            from otti_tpu.spartan import zkfused, zknizk

            zk_prove = (
                zkfused.prove if _cli._choose_fused(shape) else zknizk.prove
            )
            zk_prove(dev, vars_, inputs)  # warm/compile
            t0 = time.time()
            zp = zk_prove(dev, vars_, inputs)
            t_zk_prove = time.time() - t0
            t0 = time.time()
            zok = zknizk.verify(dev, inputs, zp)
            t_zk_verify = time.time() - t0
            assert zok, "zk benchmark proof failed to verify"
            extras["zk_prove_s"] = round(t_zk_prove, 3)
            extras["zk_verify_s"] = round(t_zk_verify, 3)
            extras["zk_proof_bytes"] = zp.size_bytes()
        except Exception as e:
            extras["zk_error"] = f"{type(e).__name__}: {e}"

        try:
            from otti_tpu.spartan import snark, spark

            comm = spark.commit(dev)
            sp = snark.prove(dev, comm, vars_, inputs)  # warm/compile
            t0 = time.time()
            sp = snark.prove(dev, comm, vars_, inputs)
            t_sn_prove = time.time() - t0
            t0 = time.time()
            sok = snark.verify(dev, comm, inputs, sp)
            t_sn_verify = time.time() - t0
            assert sok, "snark benchmark proof failed to verify"
            extras["snark_prove_s"] = round(t_sn_prove, 3)
            extras["snark_verify_s"] = round(t_sn_verify, 3)
            extras["snark_proof_bytes"] = sp.size_bytes()
        except Exception as e:
            extras["snark_error"] = f"{type(e).__name__}: {e}"

    # largest full-suite instance proved so far: scan ALL committed meta
    # artifacts instead of hardcoding one name (ADVICE r02: bench.py:148)
    best = None
    out_root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")
    for sub in ("LP", "SDP", "SGD"):
        d = os.path.join(out_root, sub)
        if not os.path.isdir(d):
            continue
        for fn in os.listdir(d):
            if not fn.endswith(".meta.json"):
                continue
            try:
                with open(os.path.join(d, fn)) as f:
                    m = json.load(f)
                if m.get("verified") and (
                    best is None or m["num_cons"] > best["num_cons"]
                ):
                    best = m
            except Exception:
                continue
    if best is not None:
        extras["full_suite_largest"] = {
            "name": best["name"],
            "cons": best["num_cons"],
            "prove_s": round(best["timings"].get("prove", 0), 2),
            "cons_per_s": best.get("prover_metrics", {}).get(
                "constraints_per_s"
            ),
        }

    print(
        json.dumps(
            {
                "metric": "lp_afiro_e2e_prove_verify_s",
                "value": round(e2e, 3),
                "unit": (
                    f"s (lower={t_lower:.2f} prove={t_prove:.2f} "
                    f"verify={t_verify:.2f} cold={t_cold:.2f})"
                ),
                "vs_baseline": round(BASELINE_E2E_S / max(e2e, 1e-9), 2),
                "extras": extras,
            }
        )
    )


if __name__ == "__main__":
    main()
