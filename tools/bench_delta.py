"""Per-query bench delta between two BENCH_full.json snapshots, with
an optional cross-check against the DRIVER's own BENCH_r{N}.json
tails so the two artifacts can't silently diverge (VERDICT r5 #2).

Emits a grep-able markdown table of (query, old, new, ratio) for every
query present in both, flagging ratio > 1.5 above 0.3 s (the VERDICT
r3/r4 regression rule), plus the new/removed sets. Usage:

    git show <r4-sha>:BENCH_full.json > /tmp/bench_r4.json
    python tools/bench_delta.py /tmp/bench_r4.json BENCH_full.json \
        [BENCH_r04.json BENCH_r05.json]

With the two extra args, the driver tails (truncated stdout captures
— only the trailing per-query pairs survive) are parsed and the
builder-vs-driver shared-total ratios are printed side by side,
with the median per-query ratio for each source. A builder ratio
near 1.0 with a uniformly higher driver ratio and elevated
"conditions" (loadavg / pass spread, recorded by bench.py since r6)
reads as suite-load inflation, not a plan regression; a single query
diverging in BOTH sources reads as a real regression.
"""

from __future__ import annotations

import json
import re
import sys


def _parse_tail(path: str) -> dict[str, float]:
    """Recover per-query timings from a driver BENCH_r{N}.json —
    {"tail": "<truncated stdout>"}. The first captured pair may be
    cut mid-name/value, so it is dropped."""
    raw = json.load(open(path))
    tail = raw.get("tail", "")
    pairs = re.findall(r'"([A-Za-z0-9_]+)":\s*([0-9]+\.[0-9]+)', tail)
    out: dict[str, float] = {}
    for i, (k, v) in enumerate(pairs):
        if i == 0:
            continue  # possibly truncated at the front
        if k in ("value", "sf"):
            continue
        out[k] = float(v)
    return out


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    return s[len(s) // 2] if s else float("nan")


def main() -> None:
    old_p, new_p = sys.argv[1], sys.argv[2]
    old_full = json.load(open(old_p))
    new_full = json.load(open(new_p))
    old = old_full["queries"]
    new = new_full["queries"]
    both = sorted(set(old) & set(new))
    flagged = []
    print("| query | old s | new s | ratio |")
    print("|---|---|---|---|")
    for q in sorted(both, key=lambda q: -(new[q] / max(old[q], 1e-9))):
        r = new[q] / max(old[q], 1e-9)
        mark = " ⚠" if r > 1.5 and new[q] > 0.3 else ""
        if r > 1.5 and new[q] > 0.3:
            flagged.append(q)
        print(f"| {q}{mark} | {old[q]:.2f} | {new[q]:.2f} | {r:.2f} |")
    print()
    print(f"flagged (>1.5x above 0.3 s): {flagged or 'none'}")
    print(f"new: {sorted(set(new) - set(old))}")
    print(f"removed: {sorted(set(old) - set(new))}")
    if both:
        tot_o = sum(old[q] for q in both)
        tot_n = sum(new[q] for q in both)
        med = _median([new[q] / max(old[q], 1e-9) for q in both])
        print(
            f"builder shared totals: {tot_o:.1f} s -> {tot_n:.1f} s "
            f"({tot_n / tot_o:.2f}x), median per-query {med:.2f}x"
        )
    else:
        print("builder shared totals: no shared queries")
    for lbl, blob in (("old", old_full), ("new", new_full)):
        cond = blob.get("conditions")
        if cond:
            print(f"{lbl} conditions: {json.dumps(cond, sort_keys=True)}")

    # ------- optional driver-tail cross-check -------
    if len(sys.argv) >= 5:
        d_old = _parse_tail(sys.argv[3])
        d_new = _parse_tail(sys.argv[4])
        shared = sorted(set(d_old) & set(d_new))
        print()
        print(f"driver tails: {len(d_old)}/{len(d_new)} queries "
              f"recovered, {len(shared)} shared")
        if shared:
            dt_o = sum(d_old[q] for q in shared)
            dt_n = sum(d_new[q] for q in shared)
            dmed = _median(
                [d_new[q] / max(d_old[q], 1e-9) for q in shared])
            print(
                f"driver shared totals: {dt_o:.1f} s -> {dt_n:.1f} s "
                f"({dt_n / dt_o:.2f}x), median per-query {dmed:.2f}x"
            )
            # queries where BOTH sources agree on a big regression:
            # those are real; driver-only movers are environment
            real, env_only = [], []
            for q in shared:
                if q not in old or q not in new:
                    continue
                rb = new[q] / max(old[q], 1e-9)
                rd = d_new[q] / max(d_old[q], 1e-9)
                if rd > 1.5 and d_new[q] > 0.3:
                    (real if rb > 1.5 else env_only).append(
                        f"{q}(builder {rb:.2f}x, driver {rd:.2f}x)")
            print(f"regressions confirmed by BOTH sources: "
                  f"{real or 'none'}")
            print(f"driver-only movers (environment suspects): "
                  f"{env_only or 'none'}")


if __name__ == "__main__":
    main()
