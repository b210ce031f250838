"""Round-4 late additions (fourth session): pattern mining, seasonality,
distribution audits.

Each entry follows the registry contract: a ``(spark, sf_dir) ->
DataFrame`` callable plus an ANSI-SQL oracle DuckDB runs over the same
parquet — column names aliased identically on both sides, every checked
numeric an integer (micro-units / parts-per-million floor division).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import mining as mining_ops
from .session import load_tables


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tabs = load_tables(spark, sf_dir, list(names))
    return [tabs[n] for n in names]


# ---------------------------------------------------------------------------
# Market-basket association rules
# ---------------------------------------------------------------------------

def q_basket_brand_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules between part brands co-purchased in one order
    (support / confidence / lift, all integer ppm).  Baskets come from
    lineitem ⋈ broadcast(part) — the brand dimension is 25 rows; the only
    quadratic term (brand pairs per order) is bounded by the basket-size
    cap inside `mining.association_rules`, and at ~4 lines/order the
    directed fan-out is ≤ 12 pairs.  At 100 TB: one shuffle of the
    (order, brand) incidence on orderkey (self-join reuses the exchange),
    pair/item counts map-side combinable, brand counts broadcast."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    baskets = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        lineitem["l_partkey"] == part["p_partkey"],
    ).select("l_orderkey", "p_brand")
    return mining_ops.association_rules(
        baskets,
        "l_orderkey",
        "p_brand",
        min_support_ppm=2000,
        max_items=64,
    )


SQL_BASKET_BRAND_RULES = """
WITH inc AS (
  SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), kept AS (
  SELECT basket FROM inc GROUP BY basket HAVING count(*) <= 64
), ki AS (
  SELECT inc.basket, inc.item FROM inc JOIN kept USING (basket)
), pairs AS (
  SELECT a.item AS ante, b.item AS conseq, count(*) AS n_ab
  FROM ki a JOIN ki b ON a.basket = b.basket AND a.item <> b.item
  GROUP BY 1, 2
), ic AS (
  SELECT item, count(*) AS n_item FROM ki GROUP BY item
), tot AS (
  SELECT count(DISTINCT basket) AS n_baskets FROM ki
)
SELECT ante, conseq, n_ab,
       CAST((n_ab * 1000000) // t.n_baskets AS BIGINT) AS support_ppm,
       CAST((n_ab * 1000000) // ia.n_item AS BIGINT) AS confidence_ppm,
       CAST((CAST(n_ab AS HUGEINT) * t.n_baskets * 1000000)
            // (CAST(ia.n_item AS HUGEINT) * ib.n_item) AS BIGINT)
         AS lift_ppm
FROM pairs
JOIN ic ia ON pairs.ante = ia.item
JOIN ic ib ON pairs.conseq = ib.item
CROSS JOIN tot t
WHERE (n_ab * 1000000) // t.n_baskets >= 2000
"""


# ---------------------------------------------------------------------------
# Item-item collaborative-filtering affinity
# ---------------------------------------------------------------------------

def q_brand_affinity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most-similar brands per brand by co-purchase cosine² across
    customers — item-item collaborative filtering on binary (customer,
    brand) incidence.  cos² = n_ab²/(n_a·n_b) in integer ppm keeps sqrt
    out of checked output while preserving the ranking.  The
    lineitem ⋈ orders equi-join rides AQE on the shared orderkey; the
    pair frame is brand×brand (≤ 300 rows) so the per-item top-k window
    is dimension-sized.  Ties break (cos2 desc, n_ab desc, other asc)."""
    lineitem, orders, part = _t(
        spark, sf_dir, "lineitem", "orders", "part"
    )
    inc = (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            lineitem["l_orderkey"] == orders["o_orderkey"],
        )
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            lineitem["l_partkey"] == part["p_partkey"],
        )
        .select("o_custkey", "p_brand")
    )
    und = mining_ops.cooccurrence_cosine(inc, "o_custkey", "p_brand")
    directed = und.select(
        F.col("item_a").alias("brand"),
        F.col("item_b").alias("other"),
        "n_ab",
        "cos2_ppm",
    ).unionByName(
        und.select(
            F.col("item_b").alias("brand"),
            F.col("item_a").alias("other"),
            "n_ab",
            "cos2_ppm",
        )
    )
    w = Window.partitionBy("brand").orderBy(
        F.col("cos2_ppm").desc(), F.col("n_ab").desc(), F.col("other").asc()
    )
    return (
        directed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("brand", "other", "n_ab", "cos2_ppm", "rk")
    )


SQL_BRAND_AFFINITY_TOPK = """
WITH inc AS (
  SELECT DISTINCT o.o_custkey AS basket, p.p_brand AS item
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
), kept AS (
  SELECT basket FROM inc GROUP BY basket HAVING count(*) <= 1024
), ki AS (
  SELECT inc.basket, inc.item FROM inc JOIN kept USING (basket)
), pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_ab
  FROM ki a JOIN ki b ON a.basket = b.basket AND a.item < b.item
  GROUP BY 1, 2
), ic AS (
  SELECT item, count(*) AS n_item FROM ki GROUP BY item
), und AS (
  SELECT item_a, item_b, n_ab,
         CAST((CAST(n_ab AS HUGEINT) * n_ab * 1000000)
              // (CAST(ia.n_item AS HUGEINT) * ib.n_item) AS BIGINT)
           AS cos2_ppm
  FROM pairs
  JOIN ic ia ON pairs.item_a = ia.item
  JOIN ic ib ON pairs.item_b = ib.item
), directed AS (
  SELECT item_a AS brand, item_b AS other, n_ab, cos2_ppm FROM und
  UNION ALL
  SELECT item_b AS brand, item_a AS other, n_ab, cos2_ppm FROM und
), ranked AS (
  SELECT brand, other, n_ab, cos2_ppm,
         row_number() OVER (PARTITION BY brand
                            ORDER BY cos2_ppm DESC, n_ab DESC, other ASC)
           AS rk
  FROM directed
)
SELECT brand, other, n_ab, cos2_ppm, rk FROM ranked WHERE rk <= 3
"""


# ---------------------------------------------------------------------------
# Day-of-week seasonality index
# ---------------------------------------------------------------------------

def q_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index per event type: average daily count
    on that weekday relative to the type's overall average daily count,
    in integer ppm.  Weekday is computed portably from epoch days —
    ``(days_since_epoch + 3) % 7`` with 0 = Monday — because Spark's
    dayofweek() (1 = Sunday) and DuckDB's (0 = Sunday) disagree.
    Normalizing by DISTINCT DAYS PRESENT per weekday (not /7) keeps the
    index unbiased when the data window is not a whole number of weeks
    (this corpus spans 30 days).  Two partial-agg shuffles on tiny keys;
    the day-calendar aggregate is broadcast back."""
    (events,) = _t(spark, sf_dir, "events")
    staged = events.select(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).withColumn("dow", F.expr("(day + 3) % 7"))
    counts = staged.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n_td")
    )
    cal = (
        staged.select("day", "dow")
        .distinct()
        .groupBy("dow")
        .agg(F.count(F.lit(1)).alias("d_w"))
    )
    d_total = staged.select("day").distinct().agg(
        F.count(F.lit(1)).alias("d_all")
    )
    wt = Window.partitionBy("event_type")
    return (
        counts.withColumn("n_t", F.sum("n_td").over(wt))
        .join(F.broadcast(cal), "dow")
        .crossJoin(F.broadcast(d_total))
        .select(
            "event_type",
            "dow",
            "n_td",
            F.expr(
                "CAST((CAST(n_td AS DECIMAL(38,0)) * d_all * 1000000)"
                " div (CAST(d_w AS DECIMAL(38,0)) * n_t) AS BIGINT)"
            ).alias("idx_ppm"),
        )
    )


SQL_DOW_SEASONALITY = """
WITH staged AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day,
         (epoch_us(ts) // 86400000000 + 3) % 7 AS dow
  FROM events
), counts AS (
  SELECT event_type, dow, count(*) AS n_td FROM staged GROUP BY 1, 2
), cal AS (
  SELECT dow, count(*) AS d_w
  FROM (SELECT DISTINCT day, dow FROM staged) GROUP BY dow
), dt AS (
  SELECT count(DISTINCT day) AS d_all FROM staged
)
SELECT c.event_type, c.dow, c.n_td,
       CAST((CAST(c.n_td AS HUGEINT) * dt.d_all * 1000000)
            // (CAST(cal.d_w AS HUGEINT)
                * sum(c.n_td) OVER (PARTITION BY c.event_type))
         AS BIGINT) AS idx_ppm
FROM counts c JOIN cal USING (dow) CROSS JOIN dt
"""


MINING_QUERIES = {
    "basket_brand_rules": q_basket_brand_rules,
    "brand_affinity_topk": q_brand_affinity_topk,
    "dow_seasonality": q_dow_seasonality,
}

MINING_ORACLES = {
    "basket_brand_rules": SQL_BASKET_BRAND_RULES,
    "brand_affinity_topk": SQL_BRAND_AFFINITY_TOPK,
    "dow_seasonality": SQL_DOW_SEASONALITY,
}
