"""Adjudicate a per-query idle bench run against BENCH_BASELINE.json.

Usage:
    python tools/bench_adjudicate.py BENCH_IDLE_r6.json [--refresh]

Prints, per group: the shared-set ratio, every query above 2x its
baseline (with its run-global exec_trace offset so host-window clusters
are visible), and the new queries missing a baseline.  With --refresh,
writes an updated BENCH_BASELINE.json that (a) ADDS baselines for new
queries from this run and (b) lists-but-does-not-touch existing entries —
rebase decisions stay explicit and manual (edit the JSON with a NOTES
justification).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    argv = list(sys.argv[1:])
    refresh = "--refresh" in argv
    if refresh:
        argv.remove("--refresh")
    run_path = argv[0]
    with open(run_path, encoding="utf-8") as fh:
        # bench.py emits the full-detail line first and a compact
        # summary-only line last; take the last line that carries the
        # per-query dicts.
        lines = [
            json.loads(l)
            for l in fh.read().strip().splitlines()
            if l.startswith("{")
        ]
        # r12: the compact summary line ALSO carries a (truncated)
        # "queries" dict now — key on exec_trace, which only the
        # full-detail line has
        run = next((r for r in reversed(lines) if "exec_trace" in r), None)
    if run is None:
        sys.exit(
            f"{run_path}: no full-detail bench line found (a summary-only "
            "tail has no per-query dicts — point at the complete stdout)"
        )
    with open("BENCH_BASELINE.json", encoding="utf-8") as fh:
        base = json.load(fh)
    trace = run.get("exec_trace", {})
    added: dict[str, dict[str, float]] = {}
    for gname, key in (
        ("headline", "queries"), ("tpch", "tpch_queries"), ("llm", "llm_queries")
    ):
        current = run[key]
        bg = base["groups"].get(gname, {})
        shared = [q for q in current if q in bg and current[q] is not None]
        new = [q for q in current if q not in bg]
        if not shared:
            print(f"\n== {gname}: no shared baseline queries")
            if new:
                print(f"  new queries (no baseline): {new}")
                added[gname] = {
                    q: current[q] for q in new if current[q] is not None
                }
            continue
        b = sum(bg[q] for q in shared)
        c = sum(current[q] for q in shared)
        print(f"\n== {gname}: shared ratio {c / b:.3f} ({len(shared)} shared)")
        flagged = [
            (current[q] / bg[q], q)
            for q in shared
            if bg[q] > 0.05 and current[q] / bg[q] > 2.0
        ]
        for ratio, q in sorted(flagged, reverse=True):
            print(
                f"  >2x: {q}  {ratio:.2f}x  ({bg[q]} -> {current[q]} s, "
                f"trace +{trace.get(q, '?')}s)"
            )
        if not flagged:
            print("  no query above 2x its baseline")
        if new:
            print(f"  new queries (no baseline): {new}")
            added[gname] = {q: current[q] for q in new if current[q] is not None}
    if refresh and added:
        for gname, qs in added.items():
            base["groups"].setdefault(gname, {}).update(qs)
        base["note"] += (
            "  Round-6 refresh: baselines ADDED for the round-5 new_queries"
            " from the committed idle run (BENCH_IDLE_r6.json); no existing"
            " entry was rebased by this script."
        )
        with open("BENCH_BASELINE.json", "w", encoding="utf-8") as fh:
            json.dump(base, fh, indent=1)
        print("\nwrote BENCH_BASELINE.json with added entries")


if __name__ == "__main__":
    main()
