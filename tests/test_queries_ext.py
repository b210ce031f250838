"""Unit tests for the extension-query helpers (queries_ext.py)."""

from pyspark.sql import functions as F

from worlddatapipeline_spark.functions.paths import longest_common_prefix
from worlddatapipeline_spark.queries_ext import _synth_listing_lines
from worlddatapipeline_spark.sources.listings import parse_bos_listing


def test_longest_common_prefix(spark):
    df = spark.createDataFrame(
        [("scenes/A/x.uasset", "scenes/A/y.uasset"),
         ("abc", "abd"),
         ("same", "same"),
         ("", "anything")],
        "a string, b string",
    )
    got = [
        r["p"]
        for r in df.select(
            longest_common_prefix(F.col("a"), F.col("b")).alias("p")
        ).collect()
    ]
    assert got == ["scenes/A/", "ab", "same", ""]


def test_synth_listing_roundtrip(spark):
    part = spark.createDataFrame(
        [(1, "small ring", "Brand#2", "t", 7, 900.0),
         (2, "red widget", "Brand#17", "t", 3, 900.1)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    parsed = parse_bos_listing(_synth_listing_lines(part))
    rows = {(r["kind"], r["key"]): r for r in parsed.collect()}
    # TOTAL footer dropped; 2 objects + 2 prefixes survive
    assert len(rows) == 4
    obj = rows[("object", "scenes/Brand#2/small ring.uasset")]
    assert obj["size"] == 1 * 100 + 7
    assert obj["storage_class"] == "STANDARD"
    assert ("prefix", "scenes/Brand#17/") in rows
