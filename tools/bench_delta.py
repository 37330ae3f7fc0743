"""Per-query bench delta between two BENCH_full.json snapshots.

Emits a grep-able markdown table of (query, old, new, ratio) for every
query present in both, flagging ratio > 1.5 above 0.3 s (the VERDICT
r3/r4 regression rule), plus the new/removed sets. Usage:

    git show <r4-sha>:BENCH_full.json > /tmp/bench_r4.json
    python tools/bench_delta.py /tmp/bench_r4.json BENCH_full.json
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    old_p, new_p = sys.argv[1], sys.argv[2]
    old = json.load(open(old_p))["queries"]
    new = json.load(open(new_p))["queries"]
    both = sorted(set(old) & set(new))
    flagged = []
    print("| query | r4 s | r5 s | ratio |")
    print("|---|---|---|---|")
    for q in sorted(both, key=lambda q: -(new[q] / max(old[q], 1e-9))):
        r = new[q] / max(old[q], 1e-9)
        mark = " ⚠" if r > 1.5 and new[q] > 0.3 else ""
        if r > 1.5 and new[q] > 0.3:
            flagged.append(q)
        print(f"| {q}{mark} | {old[q]:.2f} | {new[q]:.2f} | {r:.2f} |")
    print()
    print(f"flagged (>1.5x above 0.3 s): {flagged or 'none'}")
    print(f"new in r5: {sorted(set(new) - set(old))}")
    print(f"removed: {sorted(set(old) - set(new))}")
    tot_o = sum(old[q] for q in both)
    tot_n = sum(new[q] for q in both)
    if both:
        print(
            f"shared-query totals: r4 {tot_o:.1f} s -> r5 {tot_n:.1f} s "
            f"({tot_n / tot_o:.2f}x)"
        )
    else:
        print("shared-query totals: no shared queries")


if __name__ == "__main__":
    main()
