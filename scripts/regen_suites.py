"""Regenerate the committed out/ artifact matrix on the real TPU, warm.

One process per invocation (axon executable-load economics — CLAUDE.md):
pass 1 proves every instance of the requested suite (``--resume`` makes a
restart cheap if the process dies), pass 2 re-proves everything in the
now-warm process so the committed metas record steady-state timings
(VERDICT r03 next #2 / weak #3: no more cold-compile captures posing as
throughput numbers).

Usage:  python scripts/regen_suites.py lp|sdp|sgd [--once]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from otti_tpu import cli


def main():
    suite = sys.argv[1] if len(sys.argv) > 1 else "lp"
    once = "--once" in sys.argv
    # --fresh: prove everything in pass 1 too (no --resume skip), so
    # singleton shape classes also record a WARM pass-2 capture; without
    # it pass 1 skips already-verified instances and the first instance
    # of each class in pass 2 captures cold (fine for crash recovery,
    # wrong for regenerating the committed steady-state matrix)
    fresh = "--fresh" in sys.argv
    flag = "--" + suite
    t0 = time.time()
    print(f"[regen] pass 1 (cold{'' if fresh else ', resumable'}): {flag} --full", flush=True)
    rc = cli.main([flag, "--full"] + ([] if fresh else ["--resume"]))
    t1 = time.time()
    print(f"[regen] pass 1 rc={rc} in {t1 - t0:.0f}s", flush=True)
    if once:
        return rc
    print(f"[regen] pass 2 (warm overwrite): {flag} --full", flush=True)
    rc2 = cli.main([flag, "--full"])
    print(f"[regen] pass 2 rc={rc2} in {time.time() - t1:.0f}s", flush=True)
    return rc or rc2


if __name__ == "__main__":
    sys.exit(main())
