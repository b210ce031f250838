"""Physical-plan fingerprint sweep: one structural fingerprint per registry
query, committed as PLAN_FINGERPRINTS.json per round.

tests/test_plans.py pins the load-bearing plan shapes exactly; this tool
adds BREADTH — a cheap structural fingerprint (exchange / join-strategy /
Python-stage counts) for EVERY registry entry, so an accidental plan
regression anywhere (a broadcast falling back to sort-merge after a schema
change, a new Python stage sneaking into a hot path, a window acquiring a
rangepartitioning) shows up as a one-line JSON diff at round end instead of
a silent slowdown.

Usage:
    python tools/plan_audit.py [sf_dir] [--json PATH] [--diff OLD.json]

Notes: fingerprints are taken from the INITIAL static plan (AQE runtime
re-planning doesn't show here), at a fixed sf_dir on a fixed Spark version —
they are a per-round regression surface, not a portable contract.  Queries
that execute eagerly (materialized pipelines, real streaming runs, sink
round-trips) do run when fingerprinted; default sf0.001 keeps that cheap.
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, "/root/repo")

# Formatted-mode explain renders each Exchange as a numbered node with its
# partitioning on a separate "Arguments:" line — 'Exchange hashpartitioning'
# as an adjacent string ONLY exists in simple mode.  The original patterns
# silently matched nothing (0 across all 184 queries in the first committed
# fingerprint set), which made the audit blind to every shuffle regression.
FEATURES = {
    "exchange_hash": r"Arguments: hashpartitioning\(",
    "exchange_range": r"Arguments: rangepartitioning\(",
    "exchange_single": r"Arguments: SinglePartition",
    "broadcast_exchange": r"\bBroadcastExchange\b",
    "sort_merge_join": r"SortMergeJoin",
    "broadcast_hash_join": r"BroadcastHashJoin",
    "broadcast_nl_join": r"BroadcastNestedLoopJoin",
    "shuffled_hash_join": r"ShuffledHashJoin",
    "cartesian": r"CartesianProduct",
    "python_batch": r"BatchEvalPython",
    "python_arrow": r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas",
    "take_ordered": r"TakeOrderedAndProject",
    # a Sort node whose global flag is true: "Arguments: […], true, 0"
    "global_sort": r"Arguments: \[[^\]]*\], true, ",
    "window": r"\bWindow\b|RunningWindowFunction",
}


def fingerprint(plan: str) -> dict[str, int]:
    return {
        k: len(re.findall(pat, plan)) for k, pat in FEATURES.items()
        if len(re.findall(pat, plan)) > 0
    }


def main() -> None:
    argv = list(sys.argv[1:])
    json_out = diff_old = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    if "--diff" in argv:
        i = argv.index("--diff")
        diff_old = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod
    from worlddatapipeline_spark import get_spark
    from worlddatapipeline_spark import session as sess

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for name, fn in entrymod.queries().items():
        try:
            # Capture the PRE-checkpoint plan of every frame the query
            # materializes internally (materialize_and_release truncates
            # lineage, so those plans never reach the returned frame —
            # the r8 `{}`-fingerprint blind spot).  The fingerprint is
            # the FEATURE-COUNT SUM over internal plans + the final
            # static plan: one number per feature, still diffable.
            sess._PLAN_CAPTURE = []
            df = fn(spark, sf_dir)
            plans = list(sess._PLAN_CAPTURE)
            plans.append(
                df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
            )
            fp: dict[str, int] = {}
            for plan in plans:
                for k, v in fingerprint(plan).items():
                    fp[k] = fp.get(k, 0) + v
            out[name] = fp
        except Exception as exc:  # keep sweeping; record the failure
            out[name] = {"error": str(exc)[:200]}
        finally:
            sess._PLAN_CAPTURE = None
        print(f"{name}: {out[name]}")

    if json_out:
        with open(json_out, "w", encoding="utf-8") as fh:
            json.dump({"sf_dir": sf_dir, "fingerprints": out}, fh, indent=1,
                      sort_keys=True)
        print(f"wrote {json_out}")

    if diff_old:
        with open(diff_old, encoding="utf-8") as fh:
            old = json.load(fh)["fingerprints"]
        n_diff = 0
        for name in sorted(set(old) | set(out)):
            if old.get(name) != out.get(name):
                n_diff += 1
                print(f"DIFF {name}: {old.get(name)} -> {out.get(name)}")
        print(f"{n_diff} fingerprint changes vs {diff_old}")


if __name__ == "__main__":
    main()
