"""Batch-prove real shape-class suites on the TPU (VERDICT r03 next #3).

Runs the SDPLIB hinf1-9 class and the LP agg class through the vmapped
batched device-FS ZK provers (spartan/batched.py, CLI --batch semantics)
into out/batched/, and records the batch wall times in
out/batched/SUMMARY.json so docs/RESULTS.md can quote measured
batch-vs-sequential speedups against the committed per-instance metas.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from otti_tpu import cli

DS = "/root/reference/datasets"
OUT = "out/batched"


def main():
    summary = {}

    hinf = [
        os.path.join(DS, "SDP/full", f)
        for f in sorted(os.listdir(os.path.join(DS, "SDP/full")))
        if f.startswith("hinf")
    ]
    print(f"[batch] SDP hinf class: {len(hinf)} instances", flush=True)
    t0 = time.time()
    ok = cli.run_sdp(hinf, OUT, prove=True, zk=True, batch=True)
    summary["sdp_hinf"] = {
        "instances": [os.path.basename(p) for p in hinf],
        "ok": bool(ok),
        "wall_s": round(time.time() - t0, 2),
    }
    print(f"[batch] SDP hinf: ok={ok} wall={summary['sdp_hinf']['wall_s']}s",
          flush=True)

    agg = [
        os.path.join(DS, "LP/MPS-full", f)
        for f in sorted(os.listdir(os.path.join(DS, "LP/MPS-full")))
        if f.startswith(("agg", "bandm"))
    ]
    print(f"[batch] LP agg/bandm class: {len(agg)} instances", flush=True)
    t0 = time.time()
    ok2 = cli.run_lp(agg, OUT, prove=True, zk=True, batch=True)
    summary["lp_agg"] = {
        "instances": [os.path.basename(p) for p in agg],
        "ok": bool(ok2),
        "wall_s": round(time.time() - t0, 2),
    }
    print(f"[batch] LP agg: ok={ok2} wall={summary['lp_agg']['wall_s']}s",
          flush=True)

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "SUMMARY.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return 0 if (ok and ok2) else 1


if __name__ == "__main__":
    sys.exit(main())
