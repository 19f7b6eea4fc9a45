#!/usr/bin/env python3
"""Measure batched proving in its CLAIMED regime: dispatch-latency-bound
small instances through the ~100 ms axon tunnel (VERDICT r04 next #6).

The r04 measurement showed batch-of-9 hinf (compute-bound 2^17 shapes)
~12% SLOWER than sequential on one chip — batching's payoff is dispatch
COUNT collapse, which only matters when dispatches dominate.  The SGD
suite is exactly that regime: 18 instances of 2^9..2^14 cons whose
sequential zk proves are tunnel-latency-bound.  This runs the SGD
full+prob configs sequentially and batched (same zk provers), both WARM
(second pass timed), and records the comparison in
out/batched/LATENCY_DEMO.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

DS = "/root/reference/datasets"


def run(mode_batch: bool, out_root: str) -> float:
    from otti_tpu import cli

    t0 = time.time()
    ok = cli.run_sgd(
        os.path.join(DS, "SGD/pmlb-full.json"), out_root, prove=True,
        zk=True, batch=mode_batch,
    )
    ok &= cli.run_sgd(
        os.path.join(DS, "SGD/pmlb-prob.json"), out_root, prove=True,
        prob_check=True, zk=True, batch=mode_batch,
    )
    dt = time.time() - t0
    if not ok:
        print("FAILED", flush=True)
        sys.exit(1)
    return dt


def main():
    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    os.chdir(repo)
    out = {}
    for name, batch in (("sequential", False), ("batched", True)):
        cold = run(batch, os.path.join("out", "_latency_demo"))
        warm = run(batch, os.path.join("out", "_latency_demo"))
        out[name] = {"cold_s": round(cold, 2), "warm_s": round(warm, 2)}
        print(f"{name}: cold {cold:.1f}s warm {warm:.1f}s", flush=True)
    out["speedup_warm"] = round(
        out["sequential"]["warm_s"] / out["batched"]["warm_s"], 2
    )
    out["note"] = (
        "SGD full+prob (18 instances, 2^9..2^14 cons) zk-proved on the "
        "tunneled TPU (~100 ms/dispatch): the dispatch-latency-bound "
        "regime batching was built for.  Warm pass timed; r04's hinf "
        "batch (compute-bound 2^17 shapes) remains the honest negative."
    )
    os.makedirs("out/batched", exist_ok=True)
    with open("out/batched/LATENCY_DEMO.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
