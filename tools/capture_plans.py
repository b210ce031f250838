"""Capture .explain('formatted') output for named queries into plans/r12/.

Usage: python tools/capture_plans.py SUFFIX query1 query2 ...
Writes plans/r12/<query>_<SUFFIX>.txt for each query (SUFFIX = before|after).

Uses the same get_spark session as bench.py so plan shapes (AQE, broadcast
thresholds, shuffle partitions) match what the bench actually executes.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r12",
    )
    os.makedirs(out_dir, exist_ok=True)

    from worlddatapipeline_spark import get_spark
    from worlddatapipeline_spark.queries import QUERIES

    spark = get_spark(app_name="wdp-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")

    # Queries that eagerly materialize (persist + localCheckpoint release)
    # return a lineage-truncated ExistingRDD scan; capture the
    # PRE-checkpoint plan at each truncation point (the plan_audit /
    # test_plans interception) so the committed file shows the physical
    # plan that actually executed.
    from pyspark.sql.classic.dataframe import DataFrame as _CDF

    def _fmt(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    for name in names:
        captured: list[str] = []
        orig = _CDF.localCheckpoint

        def lc(self, *a, **k):
            try:
                captured.append(_fmt(self))
            except Exception:
                pass
            return orig(self, *a, **k)

        _CDF.localCheckpoint = lc
        try:
            df = QUERIES[name](spark, sf_dir)
        finally:
            _CDF.localCheckpoint = orig
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue()
        if "Scan ExistingRDD" in text and captured:
            text = (
                "-- pre-checkpoint plan(s) captured at localCheckpoint "
                "(lineage is truncated in the final frame) --\n\n"
                + "\n".join(captured)
                + "\n-- final (post-checkpoint) frame --\n"
                + text
            )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
