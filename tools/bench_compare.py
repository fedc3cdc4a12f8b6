"""Round-over-round bench regression audit.

Compares two bench JSON artifacts (the full per-query form bench.py now
always writes — BENCH_builder_r0N.json / BENCH_builder_last.json) and
prints every query whose time moved beyond a ratio threshold in either
direction, plus coverage gaps (queries present in one artifact only).

The rig's host-stall variance band is wide (PERFORMANCE.md documents
identical-code spreads of 81-154 s total), so the default threshold is
1.5x and sub-0.3 s queries are ignored — flagged rows are candidates
for a reproduced A/B (bracketed, reps, same session), not verdicts.

Usage: python tools/bench_compare.py OLD.json NEW.json [ratio] [min_sec]
Exit code 1 if any regression exceeds the threshold (CI-gate friendly).
"""

from __future__ import annotations

import json
import sys


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    min_sec = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3
    qo, qn = old["queries"], new["queries"]

    only_old = sorted(set(qo) - set(qn))
    only_new = sorted(set(qn) - set(qo))
    if only_old:
        print(f"dropped queries ({len(only_old)}): {only_old}")
    if only_new:
        print(f"new queries ({len(only_new)}): {only_new}")

    regs, imps = [], []
    for q in sorted(set(qo) & set(qn)):
        a, b = qo[q], qn[q]
        if max(a, b) < min_sec:
            continue
        if b > ratio * a:
            regs.append((b / a, q, a, b))
        elif a > ratio * b:
            imps.append((a / b, q, a, b))
    for r, q, a, b in sorted(regs, reverse=True):
        print(f"REGRESSION {q}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
    for r, q, a, b in sorted(imps, reverse=True):
        print(f"improvement {q}: {a:.2f}s -> {b:.2f}s ({r:.2f}x faster)")
    print(
        f"totals: {old.get('value')}s -> {new.get('value')}s; "
        f"headline {old.get('feature_pipeline_events_per_s')} -> "
        f"{new.get('feature_pipeline_events_per_s')} events/s; "
        f"{len(regs)} regression(s), {len(imps)} improvement(s) "
        f"beyond {ratio}x (>= {min_sec}s)"
    )
    # self-contained adjudication (VERDICT r11 #7): the artifacts carry
    # head + controls, so the host-band correction is one division here
    # instead of a PERFORMANCE.md investigation
    print(f"heads: {old.get('head')} -> {new.get('head')}")
    # band drift from the INTERSECTION of the control maps (r13): the
    # control set may grow across rounds (q202 added per VERDICT r12
    # #10); summing only the shared controls keeps the division
    # meaningful across artifacts with different control sets
    ctl_o, ctl_n = old.get("controls") or {}, new.get("controls") or {}
    shared = sorted(set(ctl_o) & set(ctl_n))
    if shared:
        co = sum(ctl_o[c] for c in shared)
        cn = sum(ctl_n[c] for c in shared)
        print(f"shared controls ({len(shared)}): {', '.join(shared)}")
    else:
        co, cn = old.get("control_index_sec"), new.get("control_index_sec")
    to, tn = old.get("total_sec", old.get("value")), new.get(
        "total_sec", new.get("value")
    )
    if co and cn and to and tn:
        drift = cn / co
        common = set(qo) & set(qn)
        so = sum(qo[q] for q in common)
        sn = sum(qn[q] for q in common)
        print(
            f"controls: {co}s -> {cn}s (host band x{drift:.2f}); "
            f"common-{len(common)} sum {so:.1f}s -> {sn:.1f}s "
            f"(x{sn / so:.2f} raw, x{sn / so / drift:.2f} band-corrected)"
        )
    sys.exit(1 if regs else 0)


if __name__ == "__main__":
    main()
