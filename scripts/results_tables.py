"""Emit markdown tables for docs/RESULTS.md from the committed out/ metas.

Every number RESULTS.md quotes must exist in a committed artifact
(VERDICT r03 weak #4); this script derives the tables so the doc can
never drift from the evidence.  Run: python scripts/results_tables.py
"""

import json
import glob
import os
import sys


def rows(sub):
    out = []
    for p in sorted(glob.glob(os.path.join("out", sub, "*.meta.json"))):
        m = json.load(open(p))
        out.append(m)
    return out


def fmt_suite(sub):
    ms = rows(sub)
    if not ms:
        return
    ok = sum(1 for m in ms if m.get("verified"))
    warm = sum(1 for m in ms if m.get("capture") == "warm")
    print(f"\n### {sub}: {ok}/{len(ms)} verified ({warm} warm captures)\n")
    print("| instance | cons | mode | capture | prove (s) | cons/s | verify (s) | proof (B) |")
    print("|---|---|---|---|---|---|---|---|")
    for m in sorted(ms, key=lambda m: -m["num_cons"]):
        t = m["timings"]
        pm = m.get("prover_metrics", {})
        print(
            f"| {m['name']} | {m['num_cons']:,} | {m.get('mode','?')} "
            f"| {m.get('capture','?')} | {t.get('prove', 0):.2f} "
            f"| {pm.get('constraints_per_s', 0):,.0f} "
            f"| {t.get('verify', 0):.2f} | {m.get('proof_bytes', 0):,} |"
        )


def fmt_bench_history():
    """North-star metric history straight from the driver's BENCH_r*.json
    (VERDICT r04 weak #4 / next #8: every RESULTS.md bench number must be
    generated from the committed JSON, never hand-quoted)."""
    files = sorted(glob.glob("BENCH_r*.json"))
    if not files:
        return
    keys = [
        ("field_mul_per_s", "field mul/s", 1e6, "M"),
        ("msm_points_per_s", "MSM var-base pts/s", 1e3, "k"),
        ("msm_fixed_base_points_per_s", "MSM fixed-base pts/s", 1e3, "k"),
        ("sumcheck_points_per_s", "sumcheck pts/s", 1e6, "M"),
        ("cons_per_s", "afiro cons/s", 1e3, "k"),
        ("zk_prove_s", "afiro zk prove (s)", 1, ""),
        ("snark_prove_s", "afiro snark prove (s)", 1, ""),
        ("snark_verify_s", "afiro snark verify (s)", 1, ""),
        ("snark_proof_bytes", "snark proof (KB)", 1024, ""),
    ]
    hdr = ["metric"] + [os.path.basename(f)[6:-5] for f in files]
    print("\n### Bench history (generated from BENCH_r*.json)\n")
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    data = []
    for f in files:
        d = json.load(open(f))
        ex = (d.get("parsed") or {}).get("extras") or {}
        data.append(ex)
    for key, name, div, suf in keys:
        row = [name]
        for ex in data:
            v = ex.get(key)
            row.append("—" if v is None else f"{v / div:,.1f}{suf}")
        print("| " + " | ".join(row) + " |")


def main():
    args = sys.argv[1:]
    if "--bench-history" in args:
        fmt_bench_history()
        args = [a for a in args if a != "--bench-history"]
        if not args:
            return
    for sub in args or ("LP", "SDP", "SGD"):
        fmt_suite(sub)


if __name__ == "__main__":
    main()
