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
from .session import (
    drain_memory_sink,
    load_tables,
    materialize_and_release,
    streaming_events,
)


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
    # ONE fact scan into a calendar-bounded (type, day) aggregate; every
    # downstream branch (dow counts, weekday calendar, day total) derives
    # from the persisted base so the scan never re-runs
    base = (
        events.select(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n_d"))
        .withColumn("dow", F.expr("(day + 3) % 7"))
        .persist()
    )
    counts = base.groupBy("event_type", "dow").agg(
        F.sum("n_d").alias("n_td")
    )
    cal = (
        base.select("day", "dow")
        .distinct()
        .groupBy("dow")
        .agg(F.count(F.lit(1)).alias("d_w"))
    )
    d_total = base.select("day").distinct().agg(
        F.count(F.lit(1)).alias("d_all")
    )
    wt = Window.partitionBy("event_type")
    out = (
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
    return materialize_and_release(out, base)


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


# ---------------------------------------------------------------------------
# Gini / Lorenz concentration of purchase value
# ---------------------------------------------------------------------------

def q_gini_purchase_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inequality audit of purchase value across users: Lorenz-curve
    deciles (cumulative value share, integer ppm) plus the exact Gini
    coefficient from the rank formula G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx)
    over ascending per-user totals in micro-units.  Rank products are
    summed in DECIMAL(38,0) (i·x passes int64 near 1e9 users).  Ties
    break on user_id so ranks are total on both engines.

    Scale (VERDICT r8 item 3 — was three single-partition global-order
    windows): the rank comes from `operators/windows.global_index`
    (parallel range exchange + broadcast per-partition offsets), the
    decile is ntile arithmetic over that dense index (semantics
    bit-identical to SQL ntile, same derivation as `ntile_global` — kept
    inline because the gini sum needs the raw index too), and the
    running sum collapses to a 10-row prefix over the DECILE aggregate
    (cum_us is only consumed at decile granularity).  No per-user-scale
    frame ever funnels through one task."""
    from .operators import windows as win_ops

    (events,) = _t(spark, sf_dir, "events")
    per_user = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long")
            ).alias("x_us")
        )
    )
    indexed, m = win_ops.global_index(
        per_user,
        [F.col("x_us").asc(), F.col("user_id").asc()],
        with_total=True,
    )
    # ntile(10) via the shared tile arithmetic (windows.ntile_expr) on the
    # dense 0-based index — kept inline rather than ntile_global because
    # the gini sum needs the raw index too
    ranked = indexed.select(
        "user_id",
        "x_us",
        (F.col("row_idx") + 1).alias("i"),
        win_ops.ntile_expr(F.col("row_idx"), m, 10).alias("decile"),
    )
    gini = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x_us").cast("decimal(38,0)")).alias("s"),
        F.sum(
            F.col("i").cast("decimal(38,0)") * F.col("x_us")
        ).alias("s1"),
    ).select(
        F.expr(
            "CAST(((2 * s1 - (n + 1) * s) * 1000000) div (CAST(n AS"
            " DECIMAL(38,0)) * s) AS BIGINT)"
        ).alias("gini_ppm")
    )
    # cum_us (prefix of per-user x_us up to each decile's last row) ==
    # running sum of decile totals — a 10-row bounded window, so the
    # unpartitioned orderBy is a fixed-size frame, not a fact-sized one
    deciles = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x_us").alias("decile_us"),
    )
    wd = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    deciles = deciles.withColumn("cum_us", F.sum("decile_us").over(wd))
    total = ranked.agg(F.sum("x_us").alias("total_us"))
    return (
        deciles.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(gini))
        .select(
            "decile",
            "n_users",
            "decile_us",
            F.expr(
                "CAST((CAST(cum_us AS DECIMAL(38,0)) * 1000000)"
                " div total_us AS BIGINT)"
            ).alias("cum_share_ppm"),
            "gini_ppm",
        )
    )


SQL_GINI_PURCHASE_CONCENTRATION = """
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS x_us
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), ranked AS (
  SELECT user_id, x_us,
         row_number() OVER (ORDER BY x_us ASC, user_id ASC) AS i,
         ntile(10) OVER (ORDER BY x_us ASC, user_id ASC) AS decile,
         sum(x_us) OVER (ORDER BY x_us ASC, user_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_us
  FROM per_user
), g AS (
  SELECT CAST(((2 * sum(CAST(i AS HUGEINT) * x_us)
                - (count(*) + 1) * CAST(sum(x_us) AS HUGEINT)) * 1000000)
              // (CAST(count(*) AS HUGEINT) * sum(x_us)) AS BIGINT)
           AS gini_ppm
  FROM ranked
), tot AS (
  SELECT CAST(sum(x_us) AS BIGINT) AS total_us FROM ranked
)
SELECT decile, count(*) AS n_users,
       CAST(sum(x_us) AS BIGINT) AS decile_us,
       CAST((CAST(max(cum_us) AS HUGEINT) * 1000000) // t.total_us
         AS BIGINT) AS cum_share_ppm,
       g.gini_ppm
FROM ranked CROSS JOIN g CROSS JOIN tot t
GROUP BY decile, g.gini_ppm, t.total_us
"""


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

# log10(1 + 1/d) in ppm, the Benford expectation — literal on BOTH engines
# so no transcendental is ever evaluated at query time.
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def q_benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-numbers screen, a data-quality complement to the constraint
    suite.  The first significant digit comes from the DECIMAL STRING of
    exact integer cents (no log10 at query time; the Benford expectations
    are ppm literals on both engines).  One map stage + one 9-row groupBy;
    deviation is |observed − expected| in integer ppm."""
    (orders,) = _t(spark, sf_dir, "orders")
    exp_map = F.create_map(
        *[x for d, p in _BENFORD_PPM.items() for x in (F.lit(d), F.lit(p))]
    )
    digits = orders.select(
        F.substring(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    ).filter(F.col("digit") >= 1)
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    # total as an unbounded window over the 9-row counts frame — no second
    # aggregate branch, so the orders scan runs exactly once
    return (
        counts.withColumn(
            "n_total", F.sum("n").over(Window.partitionBy())
        )
        .withColumn("obs_ppm", F.expr("(n * 1000000) div n_total"))
        .withColumn("exp_ppm", exp_map[F.col("digit")])
        .select(
            "digit",
            "n",
            "obs_ppm",
            "exp_ppm",
            F.abs(F.col("obs_ppm") - F.col("exp_ppm")).alias("dev_ppm"),
        )
    )


SQL_BENFORD_PRICE_AUDIT = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM orders
), dd AS (SELECT digit FROM d WHERE digit >= 1),
c AS (SELECT digit, count(*) AS n FROM dd GROUP BY digit),
ct AS (SELECT digit, n, sum(n) OVER () AS n_total FROM c),
e(digit, exp_ppm) AS (VALUES (1, 301030), (2, 176091), (3, 124939),
  (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153), (9, 45757))
SELECT ct.digit, ct.n,
       CAST((ct.n * 1000000) // ct.n_total AS BIGINT) AS obs_ppm,
       e.exp_ppm,
       abs(CAST((ct.n * 1000000) // ct.n_total AS BIGINT) - e.exp_ppm)
         AS dev_ppm
FROM ct JOIN e ON ct.digit = e.digit
"""


# ---------------------------------------------------------------------------
# Lag autocorrelation of the daily event series
# ---------------------------------------------------------------------------

def q_daily_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event-count series at lags 1–7 — the
    weekly-pattern detector feeding dow_seasonality.  Pearson r is kept
    exact by reporting the SIGNED SQUARE in ppm via the TWO-STAGE
    factored division (num·1e3 div denx)·(num·1e3 div deny) with
    num = n·Σxy − Σx·Σy — the degree_assortativity form.  The naive
    num²·1e6 single quotient silently NULLs in Spark past n·Σxy ≈ 1e16
    (DECIMAL(38,0) overflow) while DuckDB HUGEINT keeps going — the
    factored form's largest intermediate is num·1e3 ≈ 1e19, never near
    the 38-digit bound, so the engines cannot diverge by overflow.
    PRECISION CONTRACT: each factor is truncated to per-mille before the
    product, so `r2_ppm` is the ppm-SCALED square of a per-mille-rounded
    |r| — it carries ~0.1–0.2% relative truncation (and floors to 0 when
    |num|·1000 < den), NOT 1-ppm accuracy; the ppm suffix names the
    scale of the column, not its granularity.  Downstream consumers
    needing finer resolution should recompute from (n, sx, sy, sxx,
    syy, sxy).  This holds for every user of the two-stage factored
    form (lead_lag_correlation and degree_assortativity alike).  The
    sign rides a separate CASE purely for readability (div and // agree
    on negatives anyway, both truncate toward zero; see theil_sen).  The
    daily-count frame is one fact scan + date groupBy; the 7 lag
    self-joins run on that tiny aggregate (broadcast)."""
    (events,) = _t(spark, sf_dir, "events")
    # daily feeds both sides of the lag join — persist the calendar-sized
    # aggregate so the fact scan runs once, release on return
    daily = (
        events.select(
            F.expr("unix_micros(ts) div 86400000000").alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("y"))
        .persist()
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    pairs = (
        daily.alias("a")
        .crossJoin(F.broadcast(lags))
        .join(
            F.broadcast(daily.alias("b")),
            F.col("b.day") == F.col("a.day") + F.col("lag"),
        )
        .select(
            "lag", F.col("a.y").alias("x"), F.col("b.y").alias("yy")
        )
    )
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("yy").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("x").cast("decimal(38,0)") * F.col("x"))).alias("sxx"),
        F.sum((F.col("yy").cast("decimal(38,0)") * F.col("yy"))).alias("syy"),
        F.sum((F.col("x").cast("decimal(38,0)") * F.col("yy"))).alias("sxy"),
    )
    out = m.select(
        "lag",
        "n",
        F.expr(
            "CAST(CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END"
            " AS BIGINT)"
        ).alias("sign"),
        F.expr(
            "CAST(((n * sxy - sx * sy) * 1000 div (n * sxx - sx * sx))"
            " * ((n * sxy - sx * sy) * 1000 div (n * syy - sy * sy))"
            " AS BIGINT)"
        ).alias("r2_ppm"),
    )
    return materialize_and_release(out, daily)


SQL_DAILY_AUTOCORRELATION = """
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS y
  FROM events GROUP BY 1
), pairs AS (
  SELECT l.lag, a.y AS x, b.y AS yy
  FROM (SELECT unnest(range(1, 8)) AS lag) l
  CROSS JOIN daily a
  JOIN daily b ON b.day = a.day + l.lag
), m AS (
  SELECT lag, count(*) AS n,
         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(yy AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(yy AS HUGEINT) * yy) AS syy,
         sum(CAST(x AS HUGEINT) * yy) AS sxy
  FROM pairs GROUP BY lag
)
SELECT lag, n,
       CAST(CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END AS BIGINT)
         AS sign,
       CAST(((n * sxy - sx * sy) * 1000 // (n * sxx - sx * sx))
            * ((n * sxy - sx * sy) * 1000 // (n * syy - sy * sy))
         AS BIGINT) AS r2_ppm
FROM m
"""


# ---------------------------------------------------------------------------
# Distinctive terms per document (keyword extraction)
# ---------------------------------------------------------------------------

def q_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: the 3 most distinctive terms per sampled
    document, ranked by (tf desc, df asc, term asc) — highest in-doc
    frequency, rarest in the corpus — a pure-integer stand-in for TF-IDF
    ranking (idf is monotone-decreasing in df, so the composite order
    matches tf-idf whenever tf ties break by rarity; no log evaluated).
    df is the corpus-wide distinct-doc count per term (one fact-sized
    groupBy); the sampled tf frame (doc_id < 50, a deterministic slice)
    is tiny and BROADCAST into the df join, so the vocabulary never
    shuffles for the sample.  Shares `text.tokenize` with BM25/TF-IDF.
    The corpus is tokenized twice (df branch + sample branch — the sample
    branch's doc_id predicate pushes to the scan, so its cost is the
    sample, not the corpus); at 100 TB write the (doc, term) incidence to
    durable storage once per release instead (the PMI/bloom note)."""
    from .operators.text import tokenize

    (documents,) = _t(spark, sf_dir, "documents")
    toks = documents.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("term")
    )
    df_counts = toks.distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    tf_sample = (
        toks.filter(F.col("doc_id") < 50)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        df_counts.join(F.broadcast(tf_sample), "term")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "df", "rk")
    )


SQL_DISTINCTIVE_TERMS = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(
           string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                        ' '), t -> t <> '')) AS term
  FROM documents
), dfc AS (
  SELECT term, count(*) AS df
  FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY term
), tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM toks WHERE doc_id < 50 GROUP BY 1, 2
), ranked AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfc.df,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, dfc.df ASC, tf.term ASC)
           AS rk
  FROM tf JOIN dfc ON tf.term = dfc.term
)
SELECT doc_id, term, tf, df, rk FROM ranked WHERE rk <= 3
"""


# ---------------------------------------------------------------------------
# PMI co-occurrence over the top vocabulary
# ---------------------------------------------------------------------------

def q_pmi_term_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information term associations over the corpus,
    vocabulary-pruned for scale: only the TOP-50 corpus terms (by total
    count, term tie-break) enter the within-document pair stage, so the
    quadratic term is ≤ C(50,2) per doc regardless of corpus size — the
    mining-module cap philosophy applied to text.  PMI's exp is monotone
    in the integer lift n_ab·N/(n_a·n_b), so the checked output is lift
    in exact ppm (DECIMAL numerator) and no log is evaluated.  N is the
    count of docs containing ≥1 top-vocab term — one consistent
    population for every ratio.  Pairs below 5 joint docs are noise-cut."""
    from .operators.text import tokenize

    (documents,) = _t(spark, sf_dir, "documents")
    inc_all = documents.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("term")
    ).distinct()
    wtop = Window.orderBy(F.col("n_docs").desc(), F.col("term").asc())
    top = (
        inc_all.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") <= 50)
        .select("term", F.col("n_docs").alias("n_term"))
    )
    # inc feeds both sides of the pair self-join and the population count
    # (persisted; ≤ 50·n_docs rows).  inc_all itself is derived twice —
    # once for the vocabulary, once pruned — two corpus scans; at 100 TB
    # write the tokenized incidence to durable storage once per release
    # instead of re-tokenizing (the bloom-module note).
    # r12 A/B (VERDICT r11 item 6): persisting inc_all in-query was
    # measured SLOWER-to-wash at both scales (interleaved best-of-2 warm,
    # noop sink — sf0.1: 1.48/1.54 s current vs 1.53/1.64 s persisted;
    # sf1.0: 4.11/4.44 vs 4.44/4.67): the full-vocabulary distinct frame
    # is ~n_docs·vocab rows and its materialization costs more than the
    # second tokenize pass saves.  Kept the two-scan form; the durable
    # once-per-release incidence table above remains the 100 TB answer.
    inc = inc_all.join(F.broadcast(top), "term").persist()
    n_docs = inc.agg(
        F.countDistinct("doc_id").cast("long").alias("n_pop")
    )
    pairs = (
        inc.alias("a")
        .join(inc.alias("b"), "doc_id")
        .filter(F.col("a.term") < F.col("b.term"))
        .groupBy(
            F.col("a.term").alias("term_a"),
            F.col("a.n_term").alias("n_a"),
            F.col("b.term").alias("term_b"),
            F.col("b.n_term").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 5)
    )
    out = pairs.crossJoin(F.broadcast(n_docs)).select(
        "term_a",
        "term_b",
        "n_ab",
        F.expr(
            "CAST((CAST(n_ab AS DECIMAL(38,0)) * n_pop * 1000000)"
            " div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"
        ).alias("lift_ppm"),
    )
    return materialize_and_release(out, inc)


SQL_PMI_TERM_PAIRS = """
WITH inc_all AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(
           string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                        ' '), t -> t <> '')) AS term
  FROM documents
), top AS (
  SELECT term, n_docs AS n_term
  FROM (
    SELECT term, count(*) AS n_docs,
           row_number() OVER (ORDER BY count(*) DESC, term ASC) AS rk
    FROM inc_all GROUP BY term
  ) WHERE rk <= 50
), inc AS (
  SELECT i.doc_id, i.term, t.n_term FROM inc_all i JOIN top t USING (term)
), pop AS (
  SELECT count(DISTINCT doc_id) AS n_pop FROM inc
), pairs AS (
  SELECT a.term AS term_a, a.n_term AS n_a,
         b.term AS term_b, b.n_term AS n_b, count(*) AS n_ab
  FROM inc a JOIN inc b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2, 3, 4 HAVING count(*) >= 5
)
SELECT term_a, term_b, n_ab,
       CAST((CAST(n_ab AS HUGEINT) * p.n_pop * 1000000)
            // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS lift_ppm
FROM pairs CROSS JOIN pop p
"""


# ---------------------------------------------------------------------------
# Blocked fuzzy record linkage
# ---------------------------------------------------------------------------

def q_fuzzy_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage with blocking + edit distance, self-contained with
    a checkable ground truth: a deterministic one-character deletion
    corrupts each customer name (position keyed off custkey), then the
    dirty roster is linked back to the clean one by block agreement
    (last 4 chars — digits, so blocks are ~uniform) + levenshtein ≤ 1.
    The corruption position is confined to chars 10–14 so it can NEVER
    move the last-4 block key — recall audits the LINKER.  Output is the
    audit summary — candidate count, matches, true matches (same key),
    precision and recall in integer ppm — one row, all exact.

    Scale shape (r11, size-routed hybrid).  Two physical plans compute
    the IDENTICAL one-row result (A/B-verified equal at sf0.1 and
    sf1.0; the DuckDB oracle keeps the reference block-join
    formulation, so the driver's hash check is the standing
    equivalence proof):

    * **Block equi-join** (the reference shape): candidate pairs grow
      n²/10⁴ because the last-4-digit key fixes the block count at
      10⁴.  Quadratic — but with a tiny constant: measured r11
      (interleaved best-of-3, noop sink) 0.28 s at sf0.1 and 6.99 s at
      sf1.0 (n = 150 k).
    * **FastSS deletion-neighborhood** (the linear form): every string
      emits {s} ∪ del1(s) as 8-byte xxhash64 join keys, and
      lev(s,t) ≤ 1 ⟹ the key sets intersect (equal: s itself;
      deletion: t ∈ del1(s); insertion symmetric; substitution at i:
      del_at(s,i) = del_at(t,i)).  Variant-join candidates are
      verified with the SAME predicates as the block join — block
      equality AND levenshtein ≤ 1 — and deduped per (key, dkey), so
      false candidates cannot leak and completeness is the theorem
      above; ``n_candidates`` is reproduced exactly as
      Σ_blk |clean_blk|·|dirty_blk| from per-block tallies.  O(n·L)
      rows, but ~8 stages of fixed overhead: measured 1.01 s at sf0.1
      and 8.5 s at sf1.0 — SLOWER than the quadratic plan at both
      bench scales; its win starts at the ~sf2 crossover.

    The router picks the block join while the roster count is at or
    under ``SPARK_GRAFT_FUZZY_FASTSS_MIN`` (default 200 000 — just
    above the measured sf1.0 roster, below the extrapolated ~sf2
    crossover where the n²/10⁴ term overtakes FastSS's fixed stages)
    and the FastSS form above it, so a 100× corpus runs the linear
    plan instead of 22.5 G levenshtein pairs.  The roster size is read
    from the parquet footer on the driver (the statistic Spark's own
    planner uses) — no job, no data pass; a count() action here cost
    0.35 s, more than the whole routed query."""
    import os  # noqa: PLC0415

    (customer,) = _t(spark, sf_dir, "customer")
    clean = customer.select(
        F.col("c_custkey").alias("key"), F.col("c_name").alias("name")
    )
    # delete one char from positions 10-14 — outside the last-4 block key
    dirty = clean.select(
        F.col("key").alias("dkey"),
        F.concat(
            F.expr("substr(name, 1, 9 + CAST(key % 5 AS INT))"),
            F.expr("substr(name, 11 + CAST(key % 5 AS INT))"),
        ).alias("dname"),
    )
    from .session import parquet_num_rows  # noqa: PLC0415

    n_roster = parquet_num_rows(sf_dir, "customer")
    if n_roster <= int(
        os.environ.get("SPARK_GRAFT_FUZZY_FASTSS_MIN", "200000")
    ):
        # Reference block-join plan: fastest while n²/10⁴ lev pairs cost
        # less than FastSS's fixed stages (measured: wins at sf0.1 AND
        # sf1.0; see docstring table).
        blocked = clean.join(
            dirty, F.expr("right(name, 4)") == F.expr("right(dname, 4)")
        ).select(
            "key",
            "dkey",
            # banded threshold form: identical boolean, ~2x cheaper per
            # pair (r12 A/B at sf1.0: 6.5 -> 3.3 s over the blocked pairs)
            (F.levenshtein(F.col("name"), F.col("dname"), 1) >= 0).alias(
                "match"
            ),
        )
        total = clean.agg(F.count("*").alias("n_rec"))
        return (
            blocked.agg(
                F.count("*").alias("n_candidates"),
                F.sum(F.when(F.col("match"), 1).otherwise(0)).alias(
                    "n_matches"
                ),
                F.sum(
                    F.when(
                        F.col("match") & (F.col("key") == F.col("dkey")), 1
                    ).otherwise(0)
                ).alias("n_true"),
            )
            .crossJoin(F.broadcast(total))
            .select(
                "n_candidates",
                "n_matches",
                "n_true",
                F.expr("(n_true * 1000000) div n_matches").alias(
                    "precision_ppm"
                ),
                F.expr("(n_true * 1000000) div n_rec").alias("recall_ppm"),
            )
        )
    # Blocked-pair COUNT and roster size from ONE per-block tally (exact,
    # no pair fan-out): n_candidates = Σ_blk |clean_blk|·|dirty_blk| and
    # n_rec = Σ_blk |clean_blk| — a single union-tag shuffle.
    tallies = (
        clean.select(
            F.expr("right(name, 4)").alias("blk"), F.lit(1).alias("is_clean")
        )
        .unionByName(
            dirty.select(
                F.expr("right(dname, 4)").alias("blk"),
                F.lit(0).alias("is_clean"),
            )
        )
        .groupBy("blk")
        .agg(
            F.sum("is_clean").alias("n_clean"),
            F.sum(F.lit(1) - F.col("is_clean")).alias("n_dirty"),
        )
        .agg(
            F.coalesce(
                F.sum(F.col("n_clean") * F.col("n_dirty")),
                F.lit(0).cast("long"),
            ).alias("n_candidates"),
            F.coalesce(F.sum("n_clean"), F.lit(0).cast("long")).alias(
                "n_rec"
            ),
        )
    )
    # Deletion-neighborhood keys: the string itself plus every single-char
    # deletion, shuffled as 8-byte xxhash64 digests (hash equality is
    # implied by string equality, so candidates are a superset; collisions
    # only add rows for the exact verify below to discard).
    _variants = (
        "transform(array_distinct(concat(array({c}),"
        " transform(sequence(1, length({c})),"
        " i -> concat(substr({c}, 1, i - 1), substr({c}, i + 1))))),"
        " s -> xxhash64(s))"
    )
    # The variant join ships ONLY (key, 8-byte hash) rows — the O(n·L)
    # fan-out never carries name strings (guide §8: decide with small rows,
    # attach the payload once).  Names re-attach to the (distinct, match-
    # sized) candidate pair set for the exact block + levenshtein verify.
    cvar = clean.select(
        "key", F.explode(F.expr(_variants.format(c="name"))).alias("v")
    )
    dvar = dirty.select(
        "dkey", F.explode(F.expr(_variants.format(c="dname"))).alias("v")
    )
    cand = cvar.join(dvar, "v").select("key", "dkey").distinct()
    matched = (
        cand.join(clean, "key")
        .join(dirty.withColumnRenamed("dkey", "dk2"), F.col("dkey") == F.col("dk2"))
        .filter(
            (F.expr("right(name, 4)") == F.expr("right(dname, 4)"))
            & (F.levenshtein(F.col("name"), F.col("dname"), 1) >= 0)
        )
        .select("key", "dkey")
    )
    return (
        matched.agg(
            # sum-of-ones, not count: NULL on an empty match set, exactly as
            # the original sum(CASE WHEN match ...) read on an empty block join
            F.sum(F.lit(1)).alias("n_matches"),
            F.sum(
                F.when(F.col("key") == F.col("dkey"), 1).otherwise(0)
            ).alias("n_true"),
        )
        .crossJoin(F.broadcast(tallies))
        .select(
            "n_candidates",
            "n_matches",
            "n_true",
            F.expr("(n_true * 1000000) div n_matches").alias(
                "precision_ppm"
            ),
            F.expr("(n_true * 1000000) div n_rec").alias("recall_ppm"),
        )
    )


SQL_FUZZY_RECORD_LINKAGE = """
WITH clean AS (
  SELECT c_custkey AS key, c_name AS name FROM customer
), dirty AS (
  SELECT key AS dkey,
         substr(name, 1, 9 + CAST(key % 5 AS INTEGER))
           || substr(name, 11 + CAST(key % 5 AS INTEGER)) AS dname
  FROM clean
), blocked AS (
  SELECT c.key, d.dkey,
         (levenshtein(c.name, d.dname) <= 1) AS match
  FROM clean c JOIN dirty d
    ON right(c.name, 4) = right(d.dname, 4)
), agg AS (
  SELECT count(*) AS n_candidates,
         CAST(sum(CASE WHEN match THEN 1 ELSE 0 END) AS BIGINT)
           AS n_matches,
         CAST(sum(CASE WHEN match AND key = dkey THEN 1 ELSE 0 END)
           AS BIGINT) AS n_true
  FROM blocked
), t AS (SELECT count(*) AS n_rec FROM clean)
SELECT n_candidates, n_matches, n_true,
       CAST((n_true * 1000000) // n_matches AS BIGINT) AS precision_ppm,
       CAST((n_true * 1000000) // n_rec AS BIGINT) AS recall_ppm
FROM agg CROSS JOIN t
"""


# ---------------------------------------------------------------------------
# Entity resolution: blocked fuzzy matching -> transitive closure -> clusters
# ---------------------------------------------------------------------------

def q_entity_resolution_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full entity-resolution pipeline in ONE lineage — the composed
    follow-on to `fuzzy_record_linkage`: a roster with TWO independently
    corrupted variants per base record (single-char deletions at distinct
    positions) is blocked (last-4 key, untouched by the corruptions),
    pairwise-matched by levenshtein ≤ 1, and the match graph resolved by
    TRANSITIVE CLOSURE (`operators/graph.py::connected_components`, the
    star kernel).  The closure is the point: variant A and variant B of
    the same entity are lev-2 apart — no direct edge — and unify only
    through the clean record, which is exactly why production ER needs
    components, not pairwise matches.  The DuckDB oracle replays the same
    blocking + edit-distance edges and closes them with a recursive-CTE
    min-label walk, so accidental cross-entity matches (near-identical
    names) are resolved identically in both engines rather than assumed
    away.  Scale shape: candidate pairs are O(n²/#blocks) via the block
    equi-join; the closure runs on match edges only (≈ 2 per entity), not
    on records.  Output: cluster-size histogram with canonical-id range
    per size — small, exact, total-ordered."""
    from .operators import graph as graph_ops

    (customer,) = _t(spark, sf_dir, "customer")
    base = customer.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("key"), F.col("c_name").alias("name")
    )
    clean = base.select(
        (F.col("key") * 3).alias("rid"), F.col("name").alias("txt")
    )
    var_a = base.select(
        (F.col("key") * 3 + 1).alias("rid"),
        F.concat(
            F.expr("substr(name, 1, 9 + CAST(key % 2 AS INT))"),
            F.expr("substr(name, 11 + CAST(key % 2 AS INT))"),
        ).alias("txt"),
    )
    var_b = base.select(
        (F.col("key") * 3 + 2).alias("rid"),
        F.concat(
            F.expr("substr(name, 1, 12)"), F.expr("substr(name, 14)")
        ).alias("txt"),
    )
    recs = clean.unionByName(var_a).unionByName(var_b)
    # r11 measured note: a FastSS deletion-neighborhood candidate
    # generator (the fuzzy_record_linkage treatment) was built and
    # A/B-timed here — SLOWER at both sf0.1 (4.8 vs 4.1 s) and sf1.0
    # (15.9 vs 11.7 s): this roster is 3 deterministic variants per base
    # record, so the O(n·L) variant fan-out (~19 rows/record/side) costs
    # more than the block join's n²/10⁴ candidate term until far beyond
    # the measured decade (2.25e6 lev calls at sf1.0 — still linear-stage
    # dominated).  Kept the block join per guide §1.1; the crossover is
    # documented, and the FastSS form exists measured in
    # q_fuzzy_record_linkage if the corpus ever outgrows it.
    blocked = recs.withColumn("blk", F.expr("right(txt, 4)"))
    pairs = (
        blocked.alias("a")
        .join(
            blocked.alias("b"),
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.rid") < F.col("b.rid")),
        )
        .filter(F.levenshtein(F.col("a.txt"), F.col("b.txt"), 1) >= 0)
        .select(F.col("a.rid").alias("src"), F.col("b.rid").alias("dst"))
    )
    comps = graph_ops.connected_components(
        pairs, vertices=recs.select(F.col("rid").alias("id"))
    )
    sizes = comps.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.min("component").alias("min_canonical"),
        F.max("component").alias("max_canonical"),
    )


SQL_ENTITY_RESOLUTION_CLUSTERS = """
WITH RECURSIVE base AS (
  SELECT c_custkey AS key, c_name AS name FROM customer
  WHERE c_custkey % 3 = 0
), recs AS (
  SELECT key * 3 AS rid, name AS txt FROM base
  UNION ALL
  SELECT key * 3 + 1,
         substr(name, 1, 9 + CAST(key % 2 AS INTEGER))
           || substr(name, 11 + CAST(key % 2 AS INTEGER)) FROM base
  UNION ALL
  SELECT key * 3 + 2,
         substr(name, 1, 12) || substr(name, 14) FROM base
), e AS (
  SELECT a.rid AS src, b.rid AS dst
  FROM recs a JOIN recs b
    ON right(a.txt, 4) = right(b.txt, 4) AND a.rid < b.rid
  WHERE levenshtein(a.txt, b.txt) <= 1
), bidir AS (
  SELECT src AS s, dst AS d FROM e UNION SELECT dst, src FROM e
), walk(node, label) AS (
  SELECT rid, rid FROM recs
  UNION
  SELECT b.d, w.label
  FROM walk w JOIN bidir b ON b.s = w.node
  WHERE w.label < b.d
), comp AS (
  SELECT node, min(label) AS component FROM walk GROUP BY node
), sizes AS (
  SELECT component, count(*) AS cluster_size FROM comp GROUP BY component
)
SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
       min(component) AS min_canonical, max(component) AS max_canonical
FROM sizes GROUP BY cluster_size
"""


# ---------------------------------------------------------------------------
# Kaplan-Meier survival (churn)
# ---------------------------------------------------------------------------

def q_kaplan_meier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of user lifetime: duration = whole hours
    between a user's first and last event; a user is a CHURN (death) if
    their last event is > 12 hours before the dataset's final timestamp
    (the p90 inactivity gap is ~17 h, so deaths and censors both occur),
    otherwise right-censored.  S(t) = Π_{u ≤ t} (nᵤ−dᵤ)/nᵤ over death
    times.  The survival column is a raw double kept engine-bit-identical
    WITHOUT rounding: IEEE divide and multiply are correctly rounded, so
    folding the same ratios in the same (sorted, distinct-t) order yields
    the same bits on Spark (`aggregate` over a sorted array) and DuckDB
    (`list_reduce` over the same sort) — the same replay discipline as
    the EWMA contract, needing no recursive CTE.  One fact scan → tiny
    per-user aggregate; risk sets come from one cumulative window; the
    death-time array is a broadcast scalar (distinct durations are
    calendar-bounded, not data-bounded)."""
    (events,) = _t(spark, sf_dir, "events")
    anchor = events.agg(F.max(F.unix_micros("ts")).alias("t_anchor"))
    # per_user feeds the per-duration rollup AND the population total;
    # risk feeds the death-time array AND the output rows — persist both
    # (user-sized / calendar-sized), release after the checkpoint
    per_user = (
        events.groupBy("user_id")
        .agg(
            F.min(F.unix_micros("ts")).alias("first_us"),
            F.max(F.unix_micros("ts")).alias("last_us"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            F.expr("(last_us - first_us) div 3600000000").alias("t_hour"),
            (F.col("t_anchor") - F.col("last_us") > 43200000000).alias(
                "churned"
            ),
        )
        .persist()
    )
    per_t = per_user.groupBy("t_hour").agg(
        F.sum(F.when(F.col("churned"), 1).otherwise(0)).alias("d"),
        F.count(F.lit(1)).alias("all_t"),
    )
    w = Window.orderBy("t_hour").rowsBetween(
        Window.unboundedPreceding, -1
    )
    total = per_user.agg(F.count(F.lit(1)).alias("n_users"))
    risk = (
        per_t.crossJoin(F.broadcast(total))
        .withColumn(
            "n_at_risk",
            F.col("n_users")
            - F.coalesce(F.sum("all_t").over(w), F.lit(0)),
        )
        .filter(F.col("d") > 0)
        .select(
            "t_hour",
            "d",
            "n_at_risk",
            (
                (F.col("n_at_risk") - F.col("d")).cast("double")
                / F.col("n_at_risk").cast("double")
            ).alias("ratio"),
        )
        .persist()
    )
    arr = risk.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("t_hour").alias("t"), "ratio"))
        ).alias("deaths")
    )
    out = risk.crossJoin(F.broadcast(arr)).select(
        "t_hour",
        "n_at_risk",
        "d",
        F.aggregate(
            F.filter(
                F.col("deaths"), lambda x: x["t"] <= F.col("t_hour")
            ),
            F.lit(1.0),
            lambda acc, x: acc * x["ratio"],
        ).alias("survival"),
    )
    return materialize_and_release(out, per_user, risk)


SQL_KAPLAN_MEIER_CHURN = """
WITH anchor AS (
  SELECT max(epoch_us(ts)) AS t_anchor FROM events
), per_user AS (
  SELECT (max(epoch_us(ts)) - min(epoch_us(ts))) // 3600000000 AS t_hour,
         (a.t_anchor - max(epoch_us(ts))) > 43200000000 AS churned
  FROM events CROSS JOIN anchor a
  GROUP BY user_id, a.t_anchor
), per_t AS (
  SELECT t_hour,
         CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS d,
         count(*) AS all_t
  FROM per_user GROUP BY t_hour
), tot AS (SELECT count(*) AS n_users FROM per_user),
risk AS (
  SELECT t_hour, d,
         CAST(t.n_users - coalesce(sum(all_t) OVER (
           ORDER BY t_hour ROWS BETWEEN UNBOUNDED PRECEDING
           AND 1 PRECEDING), 0) AS BIGINT) AS n_at_risk
  FROM per_t CROSS JOIN tot t
), deaths AS (
  SELECT t_hour, d, n_at_risk,
         CAST(n_at_risk - d AS DOUBLE) / CAST(n_at_risk AS DOUBLE)
           AS ratio
  FROM risk WHERE d > 0
), arr AS (
  SELECT list_sort(list(struct_pack(t := t_hour, ratio := ratio)))
    AS dl FROM deaths
)
SELECT t_hour, n_at_risk, d,
       list_reduce(
         list_prepend(CAST(1.0 AS DOUBLE),
           list_transform(list_filter(a.dl, x -> x.t <= deaths.t_hour),
                          x -> x.ratio)),
         (p, q) -> p * q) AS survival
FROM deaths CROSS JOIN arr a
"""


# ---------------------------------------------------------------------------
# Frequent event trigrams (sequential patterns)
# ---------------------------------------------------------------------------

def q_event_trigram_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 frequent length-3 event-type sequences (consecutive, per
    user) — the second-order complement of `event_transition_matrix`.
    Two lag windows over one (user, ts, id) sort; trigram counts are
    map-side combinable; share in integer ppm of all trigrams.  Rank ties
    break on the full (t1, t2, t3) tuple so top-20 is total."""
    (events,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    tri = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("t2", F.lag("event_type", 1).over(w))
        .withColumn("t1", F.lag("event_type", 2).over(w))
        .filter(F.col("t1").isNotNull())
        .select(
            "t1", F.col("t2"), F.col("event_type").alias("t3")
        )
    )
    counts = tri.groupBy("t1", "t2", "t3").agg(
        F.count(F.lit(1)).alias("n")
    )
    wr = Window.orderBy(
        F.col("n").desc(),
        F.col("t1").asc(),
        F.col("t2").asc(),
        F.col("t3").asc(),
    )
    # total as a window over the |types|^3-bounded counts frame: the
    # fact-sized lag stage runs exactly once
    return (
        counts.withColumn(
            "n_total", F.sum("n").over(Window.partitionBy())
        )
        .withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 20)
        .select(
            "t1",
            "t2",
            "t3",
            "n",
            F.expr("(n * 1000000) div n_total").alias("share_ppm"),
            "rk",
        )
    )


SQL_EVENT_TRIGRAM_PATTERNS = """
WITH seq AS (
  SELECT lag(event_type, 2) OVER w AS t1,
         lag(event_type, 1) OVER w AS t2,
         event_type AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), tri AS (
  SELECT t1, t2, t3 FROM seq WHERE t1 IS NOT NULL
), c AS (
  SELECT t1, t2, t3, count(*) AS n FROM tri GROUP BY 1, 2, 3
), ranked AS (
  SELECT t1, t2, t3, n,
         CAST((n * 1000000) // sum(n) OVER () AS BIGINT) AS share_ppm,
         row_number() OVER (ORDER BY n DESC, t1 ASC, t2 ASC, t3 ASC) AS rk
  FROM c
)
SELECT t1, t2, t3, n, share_ppm, rk FROM ranked WHERE rk <= 20
"""


# ---------------------------------------------------------------------------
# Behavioral diversity (Gini-Simpson index)
# ---------------------------------------------------------------------------

def q_behavior_diversity_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral diversity via the Gini-Simpson index
    1 − Σ pᵢ², histogrammed into
    1%-wide bins.  Unlike Shannon entropy the index is a pure integer
    ratio — 1e6 − Σ nᵢ²·1e6 div n² — so no log is evaluated and the value
    is engine-exact.  One (user, type) count shuffle + one per-user
    reduce; the bin key is a floor division, a pure map stage."""
    (events,) = _t(spark, sf_dir, "events")
    per_ut = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_i")
    )
    per_user = per_ut.groupBy("user_id").agg(
        F.sum("n_i").alias("n"),
        # DECIMAL before the square: a single-type count past ~3e9 would
        # wrap int64 silently under non-ANSI mode (the oracle's BIGINT
        # product errors instead — an undetectable divergence otherwise)
        F.sum(
            F.col("n_i").cast("decimal(38,0)") * F.col("n_i")
        ).alias("ss"),
    )
    div = per_user.select(
        "user_id",
        F.expr(
            "1000000 - CAST((CAST(ss AS DECIMAL(38,0)) * 1000000)"
            " div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"
        ).alias("div_ppm"),
    )
    return (
        div.groupBy(F.expr("div_ppm div 10000").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("div_ppm").alias("min_ppm"),
            F.max("div_ppm").alias("max_ppm"),
        )
    )


SQL_BEHAVIOR_DIVERSITY_BANDS = """
WITH per_ut AS (
  SELECT user_id, event_type, count(*) AS n_i
  FROM events GROUP BY 1, 2
), per_user AS (
  SELECT user_id, sum(n_i) AS n, sum(CAST(n_i AS HUGEINT) * n_i) AS ss
  FROM per_ut GROUP BY user_id
), d AS (
  SELECT user_id,
         1000000 - CAST((CAST(ss AS HUGEINT) * 1000000)
                        // (CAST(n AS HUGEINT) * n) AS BIGINT) AS div_ppm
  FROM per_user
)
SELECT div_ppm // 10000 AS bin,
       count(*) AS n_users,
       min(div_ppm) AS min_ppm, max(div_ppm) AS max_ppm
FROM d GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Theil-Sen robust trend
# ---------------------------------------------------------------------------

def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-revenue trend per event type via the Theil-Sen
    estimator: the MEDIAN of all pairwise slopes between daily totals —
    outlier-immune where least squares is not (the trend complement of
    `mad_outlier_counts`).  Slopes are integer micro-units/day by floor
    division; the median is the exact lower order statistic with a
    (slope, day-pair) tie-break; slope division truncates toward zero
    on BOTH engines (div and // agree on negatives — verified).  The pair stage is a self-join of the
    per-type DAILY aggregate — calendar-bounded (30 days → ≤ 435 pairs
    per type), so it is dimension-sized at any corpus scale; only the
    daily rollup touches the fact table."""
    (events,) = _t(spark, sf_dir, "events")
    daily = (
        events.select(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
            F.floor(F.col("value") * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("v_us"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v_us").alias("y_us"))
        .persist()
    )
    pairs = (
        daily.alias("a")
        .join(
            daily.alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.day").alias("d1"),
            F.col("b.day").alias("d2"),
            F.expr("(b.y_us - a.y_us) div (b.day - a.day)").alias(
                "slope_us"
            ),
        )
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("slope_us").asc(), F.col("d1").asc(), F.col("d2").asc()
    )
    wall = Window.partitionBy("event_type")
    out = (
        pairs.withColumn("i", F.row_number().over(w))
        .withColumn("n_pairs", F.count(F.lit(1)).over(wall))
        .filter(F.expr("i = (n_pairs + 1) div 2"))
        .select(
            "event_type",
            F.col("slope_us").alias("median_slope_us"),
            "n_pairs",
        )
    )
    return materialize_and_release(out, daily)


SQL_THEIL_SEN_TREND = """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS y_us
  FROM events GROUP BY 1, 2
), slopes AS (
  -- DuckDB // and Spark div both truncate toward zero, so the raw
  -- integer division matches the engine expression exactly
  SELECT a.event_type, a.day AS d1, b.day AS d2,
         CAST((b.y_us - a.y_us) // (b.day - a.day) AS BIGINT) AS slope_us
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
), ranked AS (
  SELECT event_type, slope_us,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY slope_us ASC, d1 ASC, d2 ASC) AS i,
         count(*) OVER (PARTITION BY event_type) AS n_pairs
  FROM slopes
)
SELECT event_type, slope_us AS median_slope_us,
       CAST(n_pairs AS BIGINT) AS n_pairs
FROM ranked WHERE i = (n_pairs + 1) // 2
"""


# ---------------------------------------------------------------------------
# Holt linear-trend forecast
# ---------------------------------------------------------------------------

def q_holt_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing over each event type's daily
    micro-unit totals, with a 3-day-ahead forecast.  α = 0.25 and
    β = 0.125 are exact binary fractions; the coupled level/trend
    recursion runs as ONE ordered fold over the sorted daily array with a
    struct accumulator — the Kaplan-Meier bit-replay discipline extended
    to two-variable state (every op is a correctly-rounded IEEE add/mul,
    so identical fold order ⇒ identical unrounded doubles on both
    engines; the oracle folds a uniform struct list since list_reduce
    has no separate accumulator type).  Init l₀ = y₁, t₀ = y₂ − y₁.  The
    daily aggregate is the only fact-sized stage; the per-type fold is
    calendar-bounded."""
    (events,) = _t(spark, sf_dir, "events")
    daily = (
        events.select(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
            F.floor(F.col("value") * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("v_us"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v_us").cast("double").alias("y"))
    )
    arr = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "y"))),
            lambda s: s["y"],
        ).alias("ys"),
        F.count(F.lit(1)).alias("n_days"),
    ).filter(F.col("n_days") >= 3)
    ys = F.col("ys")
    init = F.struct(
        F.element_at(ys, 1).alias("l"),
        (F.element_at(ys, 2) - F.element_at(ys, 1)).alias("t"),
    )
    state = F.aggregate(
        F.slice(ys, 3, F.size(ys) - 2),
        init,
        lambda acc, y: F.struct(
            (
                F.lit(0.25) * y + F.lit(0.75) * (acc["l"] + acc["t"])
            ).alias("l"),
            (
                F.lit(0.125)
                * (
                    (F.lit(0.25) * y + F.lit(0.75) * (acc["l"] + acc["t"]))
                    - acc["l"]
                )
                + F.lit(0.875) * acc["t"]
            ).alias("t"),
        ),
    )
    return arr.select(
        "event_type",
        "n_days",
        state["l"].alias("level"),
        state["t"].alias("trend"),
        (state["l"] + F.lit(3.0) * state["t"]).alias("forecast_3d"),
    )


SQL_HOLT_TREND_FORECAST = """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                   AS BIGINT) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
), arr AS (
  SELECT event_type,
         list_transform(list_sort(list(struct_pack(day := day, y := y))),
                        s -> s.y) AS ys,
         count(*) AS n_days
  FROM daily GROUP BY event_type HAVING count(*) >= 3
), folded AS (
  -- list-valued accumulator on purpose: DuckDB's list_reduce updates a
  -- STRUCT accumulator field-by-field in place (the trend expression
  -- would see the already-updated level); a list accumulator evaluates
  -- functionally, matching Spark's aggregate() semantics
  SELECT event_type, n_days,
         list_reduce(
           list_prepend(
             [ys[1], ys[2] - ys[1]],
             list_transform(ys[3:], y -> [y, CAST(0.0 AS DOUBLE)])),
           (acc, x) -> [
             0.25 * x[1] + 0.75 * (acc[1] + acc[2]),
             0.125 * ((0.25 * x[1] + 0.75 * (acc[1] + acc[2])) - acc[1])
             + 0.875 * acc[2]]) AS st
  FROM arr
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       st[1] AS level, st[2] AS trend,
       st[1] + 3.0 * st[2] AS forecast_3d
FROM folded
"""


# ---------------------------------------------------------------------------
# Discount elasticity (exact OLS slope)
# ---------------------------------------------------------------------------

def q_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS slope of quantity on discount — does a deeper
    discount move volume?  Slope = (n·Σxy − Σx·Σy)·1e6 div (n·Σxx − Σx²)
    entirely in integer micro-unit moments (DECIMAL(38,0) sums), so the
    regression coefficient is engine-exact with no doubles; both engines
    truncate integer division toward zero, verified.  One broadcast dim
    join + one partial-agg shuffle on brand."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    staged = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        lineitem["l_partkey"] == part["p_partkey"],
    ).select(
        "p_brand",
        F.floor(F.col("l_discount") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("x"),
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("y"),
    )
    m = staged.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("x").cast("decimal(38,0)") * F.col("x"))).alias("sxx"),
        F.sum((F.col("x").cast("decimal(38,0)") * F.col("y"))).alias("sxy"),
    )
    return m.select(
        "p_brand",
        "n",
        F.expr(
            "CAST(((n * sxy - sx * sy) * 1000000)"
            " div (n * sxx - sx * sx) AS BIGINT)"
        ).alias("slope_ppm"),
    )


SQL_DISCOUNT_ELASTICITY = """
WITH staged AS (
  SELECT p.p_brand,
         CAST(floor(l.l_discount * 1000000 + 0.5) AS BIGINT) AS x,
         CAST(floor(l.l_quantity + 0.5) AS BIGINT) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), m AS (
  SELECT p_brand, count(*) AS n,
         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM staged GROUP BY p_brand
)
SELECT p_brand, n,
       CAST(((n * sxy - sx * sy) * 1000000)
            // (n * sxx - sx * sx) AS BIGINT) AS slope_ppm
FROM m
"""


# ---------------------------------------------------------------------------
# ABC/XYZ inventory classification
# ---------------------------------------------------------------------------

def q_abc_xyz_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/XYZ part classification: ABC from the cumulative revenue share
    (A ≤ 70%, B ≤ 90%, C rest — the Pareto bands of the Lorenz machinery)
    and XYZ from demand variability as the SQUARED coefficient of
    variation in exact ppm — cv² = (n·Σq² − (Σq)²)·1e6 div (Σq)², no
    sqrt (X < 0.25, Y < 1.0 in cv² terms).  One fact shuffle on partkey;
    the cumulative-share window sorts the PART-sized rollup (at 1e9
    parts ride `windows.global_index`).  Output: class grid with part
    counts and exact revenue share per cell."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    per_part = lineitem.groupBy("l_partkey").agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * 1000000 + F.lit(0.5)).cast(
                "long"
            )
        ).alias("rev_us"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")).alias(
            "sq"
        ),
        F.sum(
            F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
            * F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
        ).alias("sqq"),
    )
    w = Window.orderBy(F.col("rev_us").desc(), F.col("l_partkey").asc())
    wall = Window.partitionBy()
    classified = (
        per_part.withColumn(
            "cum_us",
            F.sum("rev_us").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("tot_us", F.sum("rev_us").over(wall))
        .withColumn(
            "cum_ppm",
            F.expr(
                "CAST((CAST(cum_us AS DECIMAL(38,0)) * 1000000)"
                " div tot_us AS BIGINT)"
            ),
        )
        .withColumn(
            "cv2_ppm",
            F.expr(
                "CAST(((CAST(n AS DECIMAL(38,0)) * sqq - CAST(sq AS"
                " DECIMAL(38,0)) * sq) * 1000000) div (CAST(sq AS"
                " DECIMAL(38,0)) * sq) AS BIGINT)"
            ),
        )
        .select(
            F.when(F.col("cum_ppm") <= 700000, "A")
            .when(F.col("cum_ppm") <= 900000, "B")
            .otherwise("C")
            .alias("abc"),
            F.when(F.col("cv2_ppm") < 250000, "X")
            .when(F.col("cv2_ppm") < 1000000, "Y")
            .otherwise("Z")
            .alias("xyz"),
            "rev_us",
            "tot_us",
        )
    )
    # tot_us rides through from the window total — no second aggregate
    # branch, so the fact shuffle and the global sort run exactly once
    return (
        classified.groupBy("abc", "xyz")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev_us").alias("class_rev_us"),
            F.first("tot_us").alias("t_us"),
        )
        .select(
            "abc",
            "xyz",
            "n_parts",
            "class_rev_us",
            F.expr(
                "CAST((CAST(class_rev_us AS DECIMAL(38,0)) * 1000000)"
                " div t_us AS BIGINT)"
            ).alias("rev_share_ppm"),
        )
    )


SQL_ABC_XYZ_CLASSIFICATION = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(sum(CAST(floor(l_extendedprice * 1000000 + 0.5) AS BIGINT))
           AS BIGINT) AS rev_us,
         count(*) AS n,
         CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
           AS sq,
         CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)
                  * CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
           AS sqq
  FROM lineitem GROUP BY l_partkey
), classified AS (
  SELECT CASE WHEN CAST((CAST(sum(rev_us) OVER (ORDER BY rev_us DESC,
                l_partkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND
                CURRENT ROW) AS HUGEINT) * 1000000)
                // sum(rev_us) OVER () AS BIGINT) <= 700000 THEN 'A'
              WHEN CAST((CAST(sum(rev_us) OVER (ORDER BY rev_us DESC,
                l_partkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND
                CURRENT ROW) AS HUGEINT) * 1000000)
                // sum(rev_us) OVER () AS BIGINT) <= 900000 THEN 'B'
              ELSE 'C' END AS abc,
         CASE WHEN CAST(((CAST(n AS HUGEINT) * sqq
                - CAST(sq AS HUGEINT) * sq) * 1000000)
                // (CAST(sq AS HUGEINT) * sq) AS BIGINT) < 250000 THEN 'X'
              WHEN CAST(((CAST(n AS HUGEINT) * sqq
                - CAST(sq AS HUGEINT) * sq) * 1000000)
                // (CAST(sq AS HUGEINT) * sq) AS BIGINT) < 1000000 THEN 'Y'
              ELSE 'Z' END AS xyz,
         rev_us
  FROM per_part
), tot AS (SELECT CAST(sum(rev_us) AS BIGINT) AS t_us FROM classified)
SELECT abc, xyz, count(*) AS n_parts,
       CAST(sum(rev_us) AS BIGINT) AS class_rev_us,
       CAST((CAST(sum(rev_us) AS HUGEINT) * 1000000) // t.t_us AS BIGINT)
         AS rev_share_ppm
FROM classified CROSS JOIN tot t
GROUP BY abc, xyz, t.t_us
"""


# ---------------------------------------------------------------------------
# Seasonal decomposition (trend / seasonal / residual)
# ---------------------------------------------------------------------------

def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of each type's daily micro-unit
    series: trend = centered 7-day moving SUM div 7 (rows with a full
    window only — integer, no double mean), detrended = y − trend,
    seasonal = per-weekday mean of detrended (floor division; both
    engines truncate toward zero), residual = detrended − seasonal.
    Output is the weekday seasonal profile per type plus the mean
    absolute residual — the seasonal-strength readout.  One fact scan
    into the calendar-bounded daily aggregate; every window extends the
    same (type) partitioning; the detrended frame feeds two consumers so
    it is persisted and released."""
    (events,) = _t(spark, sf_dir, "events")
    daily = (
        events.select(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
            F.floor(F.col("value") * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("v_us"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v_us").alias("y_us"))
    )
    w7 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    detrended = (
        daily.withColumn("n_w", F.count(F.lit(1)).over(w7))
        .withColumn("sum_w", F.sum("y_us").over(w7))
        .filter(F.col("n_w") == 7)
        .select(
            "event_type",
            "day",
            F.expr("(day + 3) % 7").alias("dow"),
            (F.col("y_us") - F.expr("sum_w div 7")).alias("det_us"),
        )
        .persist()
    )
    seasonal = detrended.groupBy("event_type", "dow").agg(
        F.expr("sum(det_us) div count(1)").alias("seasonal_us"),
        F.count(F.lit(1)).alias("n_days"),
    )
    out = (
        detrended.join(F.broadcast(seasonal), ["event_type", "dow"])
        .groupBy("event_type", "dow")
        .agg(
            F.first("seasonal_us").alias("seasonal_us"),
            F.first("n_days").alias("n_days"),
            F.expr(
                "sum(abs(det_us - seasonal_us)) div count(1)"
            ).alias("mean_abs_resid_us"),
        )
    )
    return materialize_and_release(out, detrended)


SQL_SEASONAL_DECOMPOSE = """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS y_us
  FROM events GROUP BY 1, 2
), win AS (
  SELECT event_type, day, y_us,
         count(*) OVER w AS n_w,
         sum(y_us) OVER w AS sum_w
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), det AS (
  SELECT event_type, day, (day + 3) % 7 AS dow,
         y_us - CAST(sum_w // 7 AS BIGINT) AS det_us
  FROM win WHERE n_w = 7
), seas AS (
  SELECT event_type, dow,
         CAST(sum(det_us) // count(*) AS BIGINT) AS seasonal_us,
         count(*) AS n_days
  FROM det GROUP BY 1, 2
)
SELECT d.event_type, d.dow,
       any_value(s.seasonal_us) AS seasonal_us,
       any_value(s.n_days) AS n_days,
       CAST(sum(abs(d.det_us - s.seasonal_us)) // count(*) AS BIGINT)
         AS mean_abs_resid_us
FROM det d JOIN seas s ON d.event_type = s.event_type AND d.dow = s.dow
GROUP BY d.event_type, d.dow
"""


# ---------------------------------------------------------------------------
# SAX-style symbolic series representation
# ---------------------------------------------------------------------------

def q_sax_symbolic_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symbolic series representation (SAX-shaped): each type's daily
    series is PAA-compressed into 5-day segment means (integer floor
    division), segments are quartile-coded a–d by RANK within the type
    (ntile — rank-based discretization instead of the Gaussian
    breakpoints, so no mean/std/sqrt), and the symbols concatenate in
    time order into one word per type.  Words of equal series become
    equal strings — the similarity-search / motif-discovery primitive.
    Everything is calendar-bounded after the one fact scan; the word
    assembly is a sorted-array transform, no second shuffle."""
    (events,) = _t(spark, sf_dir, "events")
    daily = (
        events.select(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
            F.floor(F.col("value") * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("v_us"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v_us").alias("y_us"))
    )
    wmin = Window.partitionBy("event_type")
    paa = (
        daily.withColumn("day0", F.col("day") - F.min("day").over(wmin))
        .withColumn("seg", F.expr("day0 div 5"))
        .groupBy("event_type", "seg")
        .agg(
            F.expr("sum(y_us) div count(1)").alias("paa_us"),
            F.count(F.lit(1)).alias("n_d"),
        )
        .filter(F.col("n_d") == 5)
    )
    wq = Window.partitionBy("event_type").orderBy(
        F.col("paa_us").asc(), F.col("seg").asc()
    )
    sym = paa.withColumn(
        "sym",
        F.element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c"), F.lit("d")),
            F.ntile(4).over(wq),
        ),
    )
    return sym.groupBy("event_type").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("seg", "sym"))
                ),
                lambda s: s["sym"],
            ),
            "",
        ).alias("sax_word"),
        F.count(F.lit(1)).alias("n_segs"),
    )


SQL_SAX_SYMBOLIC_WORDS = """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS y_us
  FROM events GROUP BY 1, 2
), paa AS (
  SELECT event_type, seg,
         CAST(sum(y_us) // count(*) AS BIGINT) AS paa_us,
         count(*) AS n_d
  FROM (
    SELECT event_type, y_us,
           (day - min(day) OVER (PARTITION BY event_type)) // 5 AS seg
    FROM daily
  ) GROUP BY 1, 2 HAVING count(*) = 5
), sym AS (
  SELECT event_type, seg,
         ['a', 'b', 'c', 'd'][ntile(4) OVER (PARTITION BY event_type
             ORDER BY paa_us ASC, seg ASC)] AS sym
  FROM paa
)
SELECT event_type,
       string_agg(sym, '' ORDER BY seg) AS sax_word,
       count(*) AS n_segs
FROM sym GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# CUPED variance-reduced experiment readout
# ---------------------------------------------------------------------------

def q_cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED experiment readout: per-user PRE-period purchase totals (the
    first 15 days) serve as the covariate for the POST-period metric —
    adjusted = post − θ·(pre − mean_pre) with θ = cov(pre, post)/var(pre)
    pooled across arms.  θ is an exact integer ppm from DECIMAL moments
    (the OLS-slope form of discount_elasticity); the adjustment applies
    as integer micro-units (θ·Δpre div 1e6), so the whole variance
    reduction is engine-exact.  Arms split by the registry's md5-parity
    discipline.  One per-user shuffle; θ and mean_pre are broadcast
    scalars-from-aggregates; arm means are a conditional one-row fold."""
    (events,) = _t(spark, sf_dir, "events")
    anchor = events.agg(
        F.min(F.expr("unix_micros(ts) div 86400000000")).alias("d0")
    )
    per_user = (
        events.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.expr("unix_micros(ts) div 86400000000 - d0") < 15,
                    F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast(
                        "long"
                    ),
                ).otherwise(F.lit(0))
            ).alias("pre_us"),
            F.sum(
                F.when(
                    F.expr("unix_micros(ts) div 86400000000 - d0") >= 15,
                    F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast(
                        "long"
                    ),
                ).otherwise(F.lit(0))
            ).alias("post_us"),
        )
        .withColumn(
            "arm",
            (
                F.conv(
                    F.substring(
                        F.md5(F.col("user_id").cast("string")), 1, 4
                    ),
                    16,
                    10,
                ).cast("long")
                % 2
            ).cast("int"),
        )
        .persist()
    )
    theta = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("pre_us").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("post_us").cast("decimal(38,0)")).alias("sy"),
        F.sum(
            F.col("pre_us").cast("decimal(38,0)") * F.col("pre_us")
        ).alias("sxx"),
        F.sum(
            F.col("pre_us").cast("decimal(38,0)") * F.col("post_us")
        ).alias("sxy"),
    ).select(
        "n",
        F.expr(
            "CAST(((n * sxy - sx * sy) * 1000000)"
            " div (n * sxx - sx * sx) AS BIGINT)"
        ).alias("theta_ppm"),
        F.expr("CAST(sx div n AS BIGINT)").alias("mean_pre_us"),
    )
    adjusted = per_user.crossJoin(F.broadcast(theta)).withColumn(
        "adj_us",
        F.expr(
            "post_us - (theta_ppm * (pre_us - mean_pre_us)) div 1000000"
        ),
    )
    out = adjusted.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.expr("sum(post_us) div count(1)").alias("mean_raw_us"),
        F.expr("sum(adj_us) div count(1)").alias("mean_adj_us"),
        F.first("theta_ppm").alias("theta_ppm"),
    )
    return materialize_and_release(out, per_user)


SQL_CUPED_ADJUSTED_AB = """
WITH anchor AS (
  SELECT min(epoch_us(ts) // 86400000000) AS d0 FROM events
), per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN epoch_us(ts) // 86400000000 - a.d0 < 15
             THEN CAST(floor(value * 1000000 + 0.5) AS BIGINT)
             ELSE 0 END) AS BIGINT) AS pre_us,
         CAST(sum(CASE WHEN epoch_us(ts) // 86400000000 - a.d0 >= 15
             THEN CAST(floor(value * 1000000 + 0.5) AS BIGINT)
             ELSE 0 END) AS BIGINT) AS post_us,
         CAST(CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 4))
                   AS BIGINT) % 2 AS INTEGER) AS arm
  FROM events, anchor a
  WHERE event_type = 'purchase'
  GROUP BY user_id, a.d0
), theta AS (
  SELECT count(*) AS n,
         CAST(((count(*) * sum(CAST(pre_us AS HUGEINT) * post_us)
                - sum(CAST(pre_us AS HUGEINT)) * sum(CAST(post_us AS HUGEINT)))
               * 1000000)
              // (count(*) * sum(CAST(pre_us AS HUGEINT) * pre_us)
                  - sum(CAST(pre_us AS HUGEINT)) * sum(CAST(pre_us AS HUGEINT)))
           AS BIGINT) AS theta_ppm,
         CAST(sum(CAST(pre_us AS HUGEINT)) // count(*) AS BIGINT)
           AS mean_pre_us
  FROM per_user
), adjusted AS (
  SELECT arm,
         post_us,
         post_us - (t.theta_ppm * (pre_us - t.mean_pre_us)) // 1000000
           AS adj_us,
         t.theta_ppm
  FROM per_user CROSS JOIN theta t
)
SELECT arm, count(*) AS n_users,
       CAST(sum(post_us) // count(*) AS BIGINT) AS mean_raw_us,
       CAST(sum(adj_us) // count(*) AS BIGINT) AS mean_adj_us,
       any_value(theta_ppm) AS theta_ppm
FROM adjusted GROUP BY arm
"""


# ---------------------------------------------------------------------------
# Winsorized (trimmed) means
# ---------------------------------------------------------------------------

def q_trimmed_mean_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-trimmed mean of event value per type — the robust-mean
    complement of mad_outlier_counts: drop the lowest and highest
    n div 20 rows by (value, event_id) rank, then an exact integer
    floor-division mean of the remainder alongside the raw mean.  The
    rank and count windows share one per-type sort; trimming is a
    codegen'd comparison, no second shuffle."""
    (events,) = _t(spark, sf_dir, "events")
    staged = events.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("v_us"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("v_us").asc(), F.col("event_id").asc()
    )
    wall = Window.partitionBy("event_type")
    ranked = (
        staged.withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wall))
        .withColumn("cut", F.expr("n div 20"))
    )
    return ranked.groupBy("event_type").agg(
        F.first("n").alias("n"),
        F.sum(
            F.when(
                (F.col("rk") > F.col("cut"))
                & (F.col("rk") <= F.col("n") - F.col("cut")),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_kept"),
        F.expr("sum(v_us) div count(1)").alias("raw_mean_us"),
        F.expr(
            "sum(CASE WHEN rk > cut AND rk <= n - cut THEN v_us ELSE 0 END)"
            " div sum(CASE WHEN rk > cut AND rk <= n - cut THEN 1 ELSE 0"
            " END)"
        ).alias("trimmed_mean_us"),
    )


SQL_TRIMMED_MEAN_VALUES = """
WITH staged AS (
  SELECT event_type, event_id,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v_us
  FROM events
), ranked AS (
  SELECT event_type, v_us,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY v_us ASC, event_id ASC) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM staged
)
SELECT event_type, any_value(n) AS n,
       CAST(sum(CASE WHEN rk > n // 20 AND rk <= n - n // 20
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(v_us) // count(*) AS BIGINT) AS raw_mean_us,
       CAST(sum(CASE WHEN rk > n // 20 AND rk <= n - n // 20
                THEN v_us ELSE 0 END)
            // sum(CASE WHEN rk > n // 20 AND rk <= n - n // 20
                   THEN 1 ELSE 0 END) AS BIGINT) AS trimmed_mean_us
FROM ranked GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Lead-lag cross-correlation (clicks vs purchases)
# ---------------------------------------------------------------------------

def q_lead_lag_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation between the daily click and purchase count
    series at lags −7…7 — do clicks lead purchases?  Same signed-square
    ppm discipline as daily_autocorrelation: the TWO-STAGE factored
    division (num·1e3 div denx)·(num·1e3 div deny) — never the num²·1e6
    single quotient, which silently NULLs in Spark past n·Σxy ≈ 1e16
    where DuckDB HUGEINT still succeeds — ranked so rk = 1 is the
    strongest alignment.  The two daily series come from ONE fact scan
    (conditional aggregate), persisted against the 15 lag joins."""
    (events,) = _t(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(F.expr("unix_micros(ts) div 86400000000").alias("day"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).cast("long").alias("x"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).cast("long").alias("yy"),
        )
        .persist()
    )
    lags = spark.range(-7, 8).select(F.col("id").cast("int").alias("lag"))
    pairs = (
        daily.alias("a")
        .crossJoin(F.broadcast(lags))
        .join(
            F.broadcast(daily.alias("b")),
            F.col("b.day") == F.col("a.day") + F.col("lag"),
        )
        .select("lag", F.col("a.x").alias("x"), F.col("b.yy").alias("yy"))
    )
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("yy").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("yy").cast("decimal(38,0)") * F.col("yy")).alias("syy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("yy")).alias("sxy"),
    )
    scored = m.select(
        "lag",
        "n",
        F.expr(
            "CAST(CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END"
            " AS BIGINT)"
        ).alias("sign"),
        F.expr(
            "CAST(((n * sxy - sx * sy) * 1000 div (n * sxx - sx * sx))"
            " * ((n * sxy - sx * sy) * 1000 div (n * syy - sy * sy))"
            " AS BIGINT)"
        ).alias("r2_ppm"),
    )
    wr = Window.orderBy(F.col("r2_ppm").desc(), F.col("lag").asc())
    out = scored.withColumn("rk", F.row_number().over(wr))
    return materialize_and_release(out, daily)


SQL_LEAD_LAG_CORRELATION = """
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
           AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS BIGINT) AS yy
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY 1
), pairs AS (
  SELECT l.lag, a.x, b.yy
  FROM (SELECT unnest(range(-7, 8)) AS lag) l
  CROSS JOIN daily a
  JOIN daily b ON b.day = a.day + l.lag
), m AS (
  SELECT lag, count(*) AS n,
         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(yy AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(yy AS HUGEINT) * yy) AS syy,
         sum(CAST(x AS HUGEINT) * yy) AS sxy
  FROM pairs GROUP BY lag
), scored AS (
  SELECT lag, n,
         CAST(CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END AS BIGINT)
           AS sign,
         CAST(((n * sxy - sx * sy) * 1000 // (n * sxx - sx * sx))
              * ((n * sxy - sx * sy) * 1000 // (n * syy - sy * sy))
           AS BIGINT) AS r2_ppm
  FROM m
)
SELECT lag, n, sign, r2_ppm,
       row_number() OVER (ORDER BY r2_ppm DESC, lag ASC) AS rk
FROM scored
"""


# ---------------------------------------------------------------------------
# Audio dominant-frequency extraction (end-to-end FFT oracle)
# ---------------------------------------------------------------------------

def q_audio_dominant_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio feature extraction, oracle-checked end to end: per doc a
    pure sine tone at FFT bin (doc_id % 100 + 4) is synthesized, encoded
    as a REAL 8-bit PCM WAV, decoded back through the RIFF parser, and
    its dominant spectral bin recovered by numpy rFFT inside Arrow
    batches (`multimodal.dominant_frequency_bins`).  The oracle computes
    the expected bin ARITHMETICALLY from doc_id — any corruption in the
    encode, decode, or FFT path hash-fails.  Pure map end to end (no
    shuffle but the final count rollup); doc_id < 200 bounds the synth
    cost and pushes to the scan."""
    from .operators import multimodal as mm

    (documents,) = _t(spark, sf_dir, "documents")
    sample = documents.filter(F.col("doc_id") < 200).select("doc_id")
    wavs = mm.synthesize_tone_wavs(sample, "doc_id")
    bins = mm.dominant_frequency_bins(wavs)
    return bins.select(
        F.col("media_id").alias("doc_id"),
        "n_samples",
        "dom_bin",
        (F.col("dom_bin") * 31250).alias("dom_mhz"),
    )


SQL_AUDIO_DOMINANT_BINS = """
SELECT doc_id,
       CAST(256 AS BIGINT) AS n_samples,
       CAST(doc_id % 100 + 4 AS BIGINT) AS dom_bin,
       CAST((doc_id % 100 + 4) * 31250 AS BIGINT) AS dom_mhz
FROM documents WHERE doc_id < 200
"""


# ---------------------------------------------------------------------------
# Streaming trending top-k
# ---------------------------------------------------------------------------

def q_streaming_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending dashboard as a REAL Structured Streaming pipeline: file
    readStream → event-time watermark → 6-hour tumbling window counts per
    event type → in-memory sink (availableNow) — then the top-3 rank per
    window applied over the SINK table, the serving-layer step a live
    dashboard runs on each refresh.  Deterministic on the single-file
    source, so it hash-checks against the batch SQL restatement; on a
    live feed the same code runs with a processing trigger + update mode
    and the watermark bounds state to (lookback / window) rows per type.
    Tenth real streaming-vs-batch parity in the registry."""
    import uuid  # noqa: PLC0415

    stream = streaming_events(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "6 hours")
        .groupBy(
            F.window(F.col("ts"), "6 hours").alias("w"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH").alias(
                "win_start"
            ),
            "event_type",
            "n_events",
        )
    )
    sink = "stream_trend_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = drain_memory_sink(spark, sink)
    wr = Window.partitionBy("win_start").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    return drained.withColumn("rk", F.row_number().over(wr)).filter(
        F.col("rk") <= 3
    )


SQL_STREAMING_TRENDING_TOPK = """
WITH c AS (
  -- make_timestamp stays tz-naive TIMESTAMP; to_timestamp would return
  -- TIMESTAMPTZ and strftime would render it in the HOST timezone while
  -- the Spark side is pinned UTC (caught in review)
  SELECT strftime(make_timestamp((epoch_us(ts) // 21600000000) * 21600000000),
                  '%Y-%m-%d %H') AS win_start,
         event_type, count(*) AS n_events
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT win_start, event_type, n_events,
         row_number() OVER (PARTITION BY win_start
                            ORDER BY n_events DESC, event_type ASC) AS rk
  FROM c
)
SELECT win_start, event_type, n_events, rk FROM ranked WHERE rk <= 3
"""


# ---------------------------------------------------------------------------
# Perceptual image dedup (average-hash through the real BMP codec)
# ---------------------------------------------------------------------------

def q_image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup, oracle-checked end to end: per doc a 64×64
    BMP whose 8×8 block pattern encodes md5(doc_id % 50)'s low 60 bits is
    encoded through the REAL BMP writer, decoded back through the real
    parser, average-hashed (`multimodal.average_hash_64`), and duplicate
    groups collapse by exact hash — 200 images → 50 perceptual classes.
    The oracle derives every hash ARITHMETICALLY from doc_id, so any
    corruption in the BMP encode, the palette/row-padding decode, the
    block-mean pipeline, or the bit packing hash-fails.  Scale shape =
    exact dedup: an 8-byte key shuffle; image payloads never shuffle."""
    from .operators import multimodal as mm

    (documents,) = _t(spark, sf_dir, "documents")
    sample = documents.filter(F.col("doc_id") < 200).select("doc_id")
    hashes = mm.average_hash_64(
        mm.synthesize_pattern_bmps(sample, "doc_id", classes=50)
    )
    return hashes.groupBy("ahash").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.min("media_id").alias("min_doc"),
    )


SQL_IMAGE_AHASH_DEDUP = """
SELECT CAST(('0x' || substr(md5(CAST(doc_id % 50 AS VARCHAR)), 1, 15))
         AS BIGINT) AS ahash,
       count(*) AS n_images,
       min(doc_id) AS min_doc
FROM documents WHERE doc_id < 200
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Difference-in-differences readout
# ---------------------------------------------------------------------------

def q_did_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: md5-parity cohorts × pre/post periods
    (first/last 15 days), per-cell user-mean purchase value in integer
    micro-units, DiD = (B_post − B_pre) − (A_post − A_pre) — the quasi-
    experimental complement of ab_test_zscore/cuped when only one cohort
    receives a change mid-stream.  Everything is exact: per-user totals,
    floor-division cell means, and the closed DiD difference; the single
    fact scan folds to a 4-cell conditional aggregate.  Output is the
    cell grid plus the DiD estimate repeated as a scalar column."""
    (events,) = _t(spark, sf_dir, "events")
    anchor = events.agg(
        F.min(F.expr("unix_micros(ts) div 86400000000")).alias("d0")
    )
    per_user_period = (
        events.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(anchor))
        .groupBy(
            "user_id",
            (F.expr("unix_micros(ts) div 86400000000 - d0") >= 15)
            .cast("int")
            .alias("post"),
        )
        .agg(
            F.sum(
                F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long")
            ).alias("v_us")
        )
        .withColumn(
            "cohort",
            (
                F.conv(
                    F.substring(
                        F.md5(F.col("user_id").cast("string")), 1, 4
                    ),
                    16,
                    10,
                ).cast("long")
                % 2
            ).cast("int"),
        )
    )
    # cells feeds both the DiD derivation and the returned grid — persist
    # the 4-row aggregate so the fact scan runs once, release on return
    cells = per_user_period.groupBy("cohort", "post").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.expr("sum(v_us) div count(1)").alias("mean_us"),
    ).persist()
    wide = cells.groupBy().pivot("cohort", [0, 1]).agg(
        F.min(F.when(F.col("post") == 0, F.col("mean_us"))).alias("pre"),
        F.min(F.when(F.col("post") == 1, F.col("mean_us"))).alias("post_m"),
    )
    did = wide.select(
        (
            (F.col("1_post_m") - F.col("1_pre"))
            - (F.col("0_post_m") - F.col("0_pre"))
        ).alias("did_us")
    )
    out = cells.crossJoin(F.broadcast(did)).select(
        "cohort", "post", "n_users", "mean_us", "did_us"
    )
    return materialize_and_release(out, cells)


SQL_DID_READOUT = """
WITH anchor AS (
  SELECT min(epoch_us(ts) // 86400000000) AS d0 FROM events
), per_up AS (
  SELECT user_id,
         CAST(epoch_us(ts) // 86400000000 - a.d0 >= 15 AS INTEGER) AS post,
         CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS v_us,
         CAST(CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 4))
                   AS BIGINT) % 2 AS INTEGER) AS cohort
  FROM events, anchor a
  WHERE event_type = 'purchase'
  GROUP BY user_id, 2, 4
), cells AS (
  SELECT cohort, post, count(*) AS n_users,
         CAST(sum(v_us) // count(*) AS BIGINT) AS mean_us
  FROM per_up GROUP BY 1, 2
), did AS (
  SELECT (max(CASE WHEN cohort = 1 AND post = 1 THEN mean_us END)
          - max(CASE WHEN cohort = 1 AND post = 0 THEN mean_us END))
         - (max(CASE WHEN cohort = 0 AND post = 1 THEN mean_us END)
            - max(CASE WHEN cohort = 0 AND post = 0 THEN mean_us END))
           AS did_us
  FROM cells
)
SELECT cohort, post, n_users, mean_us, d.did_us
FROM cells CROSS JOIN did d
"""


# ---------------------------------------------------------------------------
# Deterministic negative sampling (contrastive training pairs)
# ---------------------------------------------------------------------------

def q_negative_sampling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair generation: for each customer, the 2
    top-ranked NON-purchased brands by a deterministic md5 key — the
    negative-sampling step of recommender / embedding training, with the
    registry's no-rand() discipline so the sample is replayable.  The
    candidate space is customers × the brand DIMENSION (25), built as a
    broadcast nested-loop against the distinct-brand frame and anti-
    filtered by the interaction set — never a fact×fact product.  Output
    counts negatives per (brand, rank) to keep the checked frame small
    while pinning every sampled pair through the group sizes."""
    lineitem, orders, part = _t(
        spark, sf_dir, "lineitem", "orders", "part"
    )
    # interacted feeds two consumers (the users projection and the
    # anti-join), so without a persist the lineitem ⋈ orders fact-fact
    # join ran TWICE (plan showed 7 parquet scans).  The frame is
    # dimension-bounded (≤ |customers| × 25 brands) — persist + eager
    # release (r11, guide §2.4).
    interacted = (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            lineitem["l_orderkey"] == orders["o_orderkey"],
        )
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            lineitem["l_partkey"] == part["p_partkey"],
        )
        .select(F.col("o_custkey").alias("cust"), "p_brand")
        .distinct()
        .persist()
    )
    users = interacted.select("cust").distinct()
    brands = part.select("p_brand").distinct()
    candidates = users.crossJoin(F.broadcast(brands)).join(
        interacted, ["cust", "p_brand"], "left_anti"
    )
    wr = Window.partitionBy("cust").orderBy(
        F.md5(F.concat_ws("#", F.col("cust"), F.col("p_brand"))).asc(),
        F.col("p_brand").asc(),
    )
    sampled = candidates.withColumn("rk", F.row_number().over(wr)).filter(
        F.col("rk") <= 2
    )
    out = sampled.groupBy("p_brand", "rk").agg(
        F.count(F.lit(1)).alias("n_negatives"),
        F.min("cust").alias("min_cust"),
    )
    return materialize_and_release(out, interacted)


SQL_NEGATIVE_SAMPLING_PAIRS = """
WITH interacted AS (
  SELECT DISTINCT o.o_custkey AS cust, p.p_brand
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
), users AS (SELECT DISTINCT cust FROM interacted),
brands AS (SELECT DISTINCT p_brand FROM part),
candidates AS (
  SELECT u.cust, b.p_brand
  FROM users u CROSS JOIN brands b
  WHERE NOT EXISTS (SELECT 1 FROM interacted i
                    WHERE i.cust = u.cust AND i.p_brand = b.p_brand)
), sampled AS (
  SELECT cust, p_brand,
         row_number() OVER (PARTITION BY cust
                            ORDER BY md5(CAST(cust AS VARCHAR) || '#'
                                         || p_brand) ASC,
                                     p_brand ASC) AS rk
  FROM candidates
)
SELECT p_brand, rk, count(*) AS n_negatives, min(cust) AS min_cust
FROM sampled WHERE rk <= 2
GROUP BY p_brand, rk
"""


# ---------------------------------------------------------------------------
# Composed product-analytics pipeline
# ---------------------------------------------------------------------------

def q_product_analytics_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-analytics composition in ONE Catalyst plan from reused,
    individually-verified operators — the events-side sibling of
    curation_pipeline_stats: the shared sessionize kernel
    (`windows.with_session_ids`) → per-session conversion flag → per-user
    session/conversion rollup → conversion-rate quintiles (full tie-break)
    → per-quintile readout with integer ppm rates and floor-division
    averages.  Sessionization, rollups, and the quintile window all
    extend ONE user-keyed sort lineage until the final tiny quintile
    aggregate; nothing re-scans the fact table."""
    from .operators import windows as win_ops

    (events,) = _t(spark, sf_dir, "events")
    sess = win_ops.with_session_ids(events)
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    per_user = per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("converted").cast("long").alias("conv_sessions"),
        F.sum("n_events").alias("n_events"),
    ).withColumn(
        "conv_ppm",
        F.expr("(conv_sessions * 1000000) div n_sessions"),
    )
    wq = Window.orderBy(F.col("conv_ppm").asc(), F.col("user_id").asc())
    return (
        per_user.withColumn("quintile", F.ntile(5).over(wq))
        .groupBy("quintile")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.expr("sum(n_sessions) div count(1)").alias(
                "avg_sessions"
            ),
            F.expr("sum(n_events) div count(1)").alias("avg_events"),
            F.min("conv_ppm").alias("min_conv_ppm"),
            F.max("conv_ppm").alias("max_conv_ppm"),
        )
    )


SQL_PRODUCT_ANALYTICS_PIPELINE = """
WITH g AS (
  SELECT user_id, event_id, event_type, ts,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id) AS gap
  FROM events
), s AS (
  SELECT user_id, event_type,
         sum(CASE WHEN gap IS NULL OR gap > 1800 * 1000000 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
), per_session AS (
  SELECT user_id, session_id, count(*) AS n_events,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM s GROUP BY 1, 2
), per_user AS (
  SELECT user_id, count(*) AS n_sessions,
         CAST(sum(converted) AS BIGINT) AS conv_sessions,
         CAST(sum(n_events) AS BIGINT) AS n_events,
         CAST((CAST(sum(converted) AS BIGINT) * 1000000) // count(*)
           AS BIGINT) AS conv_ppm
  FROM per_session GROUP BY user_id
), q AS (
  SELECT *, ntile(5) OVER (ORDER BY conv_ppm ASC, user_id ASC) AS quintile
  FROM per_user
)
SELECT quintile, count(*) AS n_users,
       CAST(sum(n_sessions) // count(*) AS BIGINT) AS avg_sessions,
       CAST(sum(n_events) // count(*) AS BIGINT) AS avg_events,
       min(conv_ppm) AS min_conv_ppm, max(conv_ppm) AS max_conv_ppm
FROM q GROUP BY quintile
"""


# ---------------------------------------------------------------------------
# U-shaped (position-based) attribution
# ---------------------------------------------------------------------------

def q_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution — 40% to the
    first touch, 40% to the last, the middle 20% split equally —
    completing the attribution family (last-touch / linear / U).  The
    credit arithmetic is exact integer micro-units with every remainder
    assigned deterministically (n=1 → all, n=2 → halves with the
    remainder to the first, n≥3 → 40/40 floors with the mid remainder to
    the FIRST middle), restated identically in the oracle so both
    engines split to the cent.  Same single user-key co-shuffle as
    linear_attribution; position ranks ride one window per purchase."""
    (events,) = _t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("p_us"),
        F.floor(F.col("value") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("value_us"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros("ts").alias("c_us"),
    )
    week_us = 7 * 24 * 3600 * 1000000
    touches = purchases.join(clicks, "user_id").filter(
        (F.col("c_us") <= F.col("p_us"))
        & (F.col("c_us") > F.col("p_us") - F.lit(week_us))
    )
    wn = Window.partitionBy("purchase_id")
    wr = Window.partitionBy("purchase_id").orderBy(
        F.col("c_us").asc(), F.col("click_id").asc()
    )
    ranked = touches.withColumn("n", F.count(F.lit(1)).over(wn)).withColumn(
        "rk", F.row_number().over(wr)
    )
    credit = F.expr(
        """
        CASE
          WHEN n = 1 THEN value_us
          WHEN n = 2 AND rk = 1 THEN value_us - (value_us div 2)
          WHEN n = 2 THEN value_us div 2
          WHEN rk = 1 OR rk = n THEN (value_us * 40) div 100
          WHEN rk = 2 THEN
            (value_us - 2 * ((value_us * 40) div 100))
            - (n - 3) * ((value_us - 2 * ((value_us * 40) div 100))
                         div (n - 2))
          ELSE (value_us - 2 * ((value_us * 40) div 100)) div (n - 2)
        END
        """
    )
    pos = (
        F.when(F.col("n") == 1, "solo")
        .when(F.col("rk") == 1, "first")
        .when(F.col("rk") == F.col("n"), "last")
        .otherwise("middle")
    )
    return (
        ranked.withColumn("credit_us", credit)
        .groupBy(pos.alias("position"))
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.sum("credit_us").alias("credited_us"),
        )
    )


SQL_POSITION_ATTRIBUTION = """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS value_us
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_us
  FROM events WHERE event_type = 'click'
), t AS (
  SELECT p.purchase_id, c.click_id, p.value_us, c.c_us
  FROM p JOIN c ON p.user_id = c.user_id
   AND c.c_us <= p.p_us AND c.c_us > p.p_us - 604800000000
), ranked AS (
  SELECT purchase_id, click_id, value_us,
         count(*) OVER (PARTITION BY purchase_id) AS n,
         row_number() OVER (PARTITION BY purchase_id
                            ORDER BY c_us ASC, click_id ASC) AS rk
  FROM t
), credited AS (
  SELECT CASE WHEN n = 1 THEN 'solo'
              WHEN rk = 1 THEN 'first'
              WHEN rk = n THEN 'last'
              ELSE 'middle' END AS position,
         CASE
           WHEN n = 1 THEN value_us
           WHEN n = 2 AND rk = 1 THEN value_us - (value_us // 2)
           WHEN n = 2 THEN value_us // 2
           WHEN rk = 1 OR rk = n THEN (value_us * 40) // 100
           WHEN rk = 2 THEN
             (value_us - 2 * ((value_us * 40) // 100))
             - (n - 3) * ((value_us - 2 * ((value_us * 40) // 100))
                          // (n - 2))
           ELSE (value_us - 2 * ((value_us * 40) // 100)) // (n - 2)
         END AS credit_us
  FROM ranked
)
SELECT position, count(*) AS n_credits,
       CAST(sum(credit_us) AS BIGINT) AS credited_us
FROM credited GROUP BY position
"""


# ---------------------------------------------------------------------------
# Flesch-style readability bands
# ---------------------------------------------------------------------------

def q_readability_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease scoring as a corpus-quality filter, in exact
    integer micro-points: 206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words), with syllables approximated by vowel groups
    (`[aeiouy]+` runs — the standard heuristic) and the two ratio terms
    floor-divided identically on both engines.  Pure map + one 10-point
    band groupBy; joins the Gopher/entropy/unigram quality family."""
    (documents,) = _t(spark, sf_dir, "documents")
    scored = documents.select(
        "doc_id",
        F.greatest(
            F.size(
                F.filter(
                    F.split(F.col("text"), r"\. "), lambda x: x != ""
                )
            ),
            F.lit(1),
        ).alias("s"),
        F.greatest(
            F.size(
                F.filter(
                    F.split(
                        F.lower(
                            F.regexp_replace(F.trim("text"), r"\s+", " ")
                        ),
                        " ",
                    ),
                    lambda t: t != "",
                )
            ),
            F.lit(1),
        ).alias("w"),
        F.expr(
            "regexp_count(lower(text), '[aeiouy]+')"
        ).alias("syl"),
    ).withColumn(
        "flesch_u",
        F.expr(
            "206835000 - (1015000 * CAST(w AS BIGINT)) div s"
            " - (84600000 * CAST(syl AS BIGINT)) div w"
        ),
    )
    # true FLOOR banding (div truncates toward zero; flesch can be
    # negative, and truncation would fold (-10, 0) into band 0)
    return scored.groupBy(
        F.expr(
            "CASE WHEN flesch_u >= 0 THEN flesch_u div 10000000"
            " ELSE -((-flesch_u + 9999999) div 10000000) END"
        ).alias("band")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("flesch_u").alias("min_u"),
        F.max("flesch_u").alias("max_u"),
    )


SQL_READABILITY_BANDS = """
WITH scored AS (
  SELECT doc_id,
         greatest(len(list_filter(string_split(text, '. '),
                                  x -> x <> '')), 1) AS s,
         greatest(len(list_filter(
           string_split(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')),
                        ' '), t -> t <> '')), 1) AS w,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syl
  FROM documents
), f AS (
  SELECT 206835000 - (1015000 * w) // s - (84600000 * syl) // w
           AS flesch_u
  FROM scored
)
SELECT CAST(CASE WHEN flesch_u >= 0 THEN flesch_u // 10000000
            ELSE -((-flesch_u + 9999999) // 10000000) END AS BIGINT) AS band,
       count(*) AS n_docs,
       CAST(min(flesch_u) AS BIGINT) AS min_u,
       CAST(max(flesch_u) AS BIGINT) AS max_u
FROM f GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Distribution drift score (train/serve skew monitor)
# ---------------------------------------------------------------------------

def q_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between the first and second 15-day halves of
    each event type's value distribution — the ML-monitoring screen that
    catches train/serve skew.  Values bin by a global-max-scaled integer
    rule (20 bins), each half's bin shares go to exact ppm, and the
    drift score is Σ (a−b)²/(a+b+1) over bins — the χ²-shaped statistic
    kept in pure integers (PSI's log is avoided on purpose).  One fact
    scan → (type, half, bin) counts; everything after is tiny."""
    (events,) = _t(spark, sf_dir, "events")
    bounds = events.agg(
        F.max(
            F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long")
        ).alias("max_us"),
        F.min(F.expr("unix_micros(ts) div 86400000000")).alias("d0"),
    )
    binned = (
        events.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            (F.expr("unix_micros(ts) div 86400000000 - d0") >= 15)
            .cast("int")
            .alias("half"),
            F.expr(
                "(CAST(floor(value * 1000000 + 0.5) AS BIGINT) * 20)"
                " div (max_us + 1)"
            ).alias("bin"),
        )
        .groupBy("event_type", "half", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("event_type", "half")
    # shares feeds both halves of the full join — persist the tiny
    # (type x half x 20-bin) frame so the fact scan runs once
    shares = binned.withColumn("tot", F.sum("n").over(wt)).select(
        "event_type",
        "half",
        "bin",
        F.expr("(n * 1000000) div tot").alias("ppm"),
    ).persist()
    a = shares.filter(F.col("half") == 0).select(
        "event_type", "bin", F.col("ppm").alias("a_ppm")
    )
    b = shares.filter(F.col("half") == 1).select(
        "event_type", "bin", F.col("ppm").alias("b_ppm")
    )
    joined = a.join(b, ["event_type", "bin"], "full").select(
        "event_type",
        "bin",
        F.coalesce("a_ppm", F.lit(0)).alias("a_ppm"),
        F.coalesce("b_ppm", F.lit(0)).alias("b_ppm"),
    )
    out = joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum(
            F.expr(
                "((a_ppm - b_ppm) * (a_ppm - b_ppm))"
                " div (a_ppm + b_ppm + 1)"
            )
        ).cast("long").alias("drift_score"),
    )
    return materialize_and_release(out, shares)


SQL_DISTRIBUTION_DRIFT = """
WITH bounds AS (
  SELECT max(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS max_us,
         min(epoch_us(ts) // 86400000000) AS d0
  FROM events
), binned AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 86400000000 - b.d0 >= 15 AS INTEGER) AS half,
         (CAST(floor(value * 1000000 + 0.5) AS BIGINT) * 20)
           // (b.max_us + 1) AS bin,
         count(*) AS n
  FROM events, bounds b
  GROUP BY 1, 2, 3
), shares AS (
  SELECT event_type, half, bin,
         CAST((n * 1000000) // sum(n) OVER (PARTITION BY event_type, half)
           AS BIGINT) AS ppm
  FROM binned
), sides AS (
  SELECT coalesce(a.event_type, b.event_type) AS event_type,
         coalesce(a.bin, b.bin) AS bin,
         coalesce(a.ppm, 0) AS a_ppm, coalesce(b.ppm, 0) AS b_ppm
  FROM (SELECT * FROM shares WHERE half = 0) a
  FULL JOIN (SELECT * FROM shares WHERE half = 1) b
    ON a.event_type = b.event_type AND a.bin = b.bin
)
SELECT event_type, count(*) AS n_bins,
       CAST(sum(((a_ppm - b_ppm) * (a_ppm - b_ppm))
                // (a_ppm + b_ppm + 1)) AS BIGINT) AS drift_score
FROM sides GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Feature-store user vector assembly
# ---------------------------------------------------------------------------

def q_user_feature_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store assembly: one wide ML feature row per user —
    recency, purchase frequency, monetary total, behavioral diversity
    (Gini-Simpson ppm), session count, event count — from ONE windowed
    pass over the user's events (the sessionize kernel carries
    session_id) followed by a (user, type) rollup and a per-user
    combine; no fact re-scan per feature, the assembly shape a feature
    platform materializes nightly.  The user_id predicate pushes to the
    scan (per-user features need only that user's rows), and every
    feature is exact integer micro-units/ppm."""
    from .operators import windows as win_ops

    (events,) = _t(spark, sf_dir, "events")
    anchor = events.agg(F.max(F.unix_micros("ts")).alias("t_max"))
    sess = win_ops.with_session_ids(
        events.filter(F.col("user_id") < 300)
    )
    per_ut = sess.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_i"),
        F.max("session_id").alias("m_sess"),
        F.max(F.unix_micros("ts")).alias("last_us"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast(
                    "long"
                ),
            ).otherwise(F.lit(0))
        ).alias("v_us"),
    )
    return (
        per_ut.groupBy("user_id")
        .agg(
            F.sum("n_i").alias("n_events"),
            F.max("m_sess").alias("n_sessions"),
            F.max("last_us").alias("last_us"),
            F.sum("v_us").alias("monetary_us"),
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("n_i"))
                .otherwise(F.lit(0))
            ).cast("long").alias("freq_purchases"),
            F.sum(
                F.col("n_i").cast("decimal(38,0)") * F.col("n_i")
            ).alias("ss"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            (F.col("t_max") - F.col("last_us")).alias("recency_us"),
            "freq_purchases",
            "monetary_us",
            F.expr(
                "1000000 - CAST((ss * 1000000) div (CAST(n_events AS"
                " DECIMAL(38,0)) * n_events) AS BIGINT)"
            ).alias("diversity_ppm"),
            "n_sessions",
            "n_events",
        )
    )


SQL_USER_FEATURE_VECTOR = """
WITH anchor AS (
  SELECT max(epoch_us(ts)) AS t_max FROM events
), g AS (
  SELECT user_id, event_type, ts, event_id, value,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id) AS gap
  FROM events WHERE user_id < 300
), s AS (
  SELECT user_id, event_type, ts, value,
         sum(CASE WHEN gap IS NULL OR gap > 1800 * 1000000 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
), per_ut AS (
  SELECT user_id, event_type, count(*) AS n_i,
         max(session_id) AS m_sess, max(epoch_us(ts)) AS last_us,
         CAST(sum(CASE WHEN event_type = 'purchase'
              THEN CAST(floor(value * 1000000 + 0.5) AS BIGINT)
              ELSE 0 END) AS BIGINT) AS v_us
  FROM s GROUP BY 1, 2
), per_user AS (
  SELECT user_id,
         CAST(sum(n_i) AS BIGINT) AS n_events,
         CAST(max(m_sess) AS BIGINT) AS n_sessions,
         max(last_us) AS last_us,
         CAST(sum(v_us) AS BIGINT) AS monetary_us,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN n_i ELSE 0 END)
           AS BIGINT) AS freq_purchases,
         sum(CAST(n_i AS HUGEINT) * n_i) AS ss
  FROM per_ut GROUP BY user_id
)
SELECT user_id, (a.t_max - last_us) AS recency_us, freq_purchases,
       monetary_us,
       1000000 - CAST((ss * 1000000)
                      // (CAST(n_events AS HUGEINT) * n_events) AS BIGINT)
         AS diversity_ppm,
       n_sessions, n_events
FROM per_user CROSS JOIN anchor a
"""


# ---------------------------------------------------------------------------
# Session conformance (edit distance to the modal path)
# ---------------------------------------------------------------------------

def q_session_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral conformance: each user's event-type-initial path string
    (first 20 events, ordered, deterministic) is compared by levenshtein
    to the corpus's MODAL path — how far users deviate from the dominant
    behavior pattern, banded by edit distance.  Path building reuses the
    session-path sort discipline (sort_array over (ts, id) structs); the
    modal path is a broadcast scalar-from-aggregate; levenshtein is
    JVM-codegen'd in both engines.  Distances band by 4-edit steps."""
    (events,) = _t(spark, sf_dir, "events")
    paths = events.groupBy("user_id").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: F.substring(s["event_type"], 1, 1),
                ),
                1,
                20,
            ),
            "",
        ).alias("path")
    ).persist()
    wtop = Window.orderBy(F.col("n").desc(), F.col("path").asc())
    modal = (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") == 1)
        .select(F.col("path").alias("modal_path"))
    )
    out = (
        paths.crossJoin(F.broadcast(modal))
        .select(F.levenshtein("path", F.col("modal_path")).alias("d"))
        .select(F.expr("d div 4").alias("dist_band"), "d")
        .groupBy("dist_band")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("d").alias("min_dist"),
            F.max("d").alias("max_dist"),
        )
    )
    return materialize_and_release(out, paths)


SQL_SESSION_CONFORMANCE = """
WITH p AS (
  SELECT user_id,
         list_aggr(
           list_transform(
             list_sort(list(struct_pack(ts := ts, event_id := event_id,
                                        event_type := event_type)))[1:20],
             x -> substr(x.event_type, 1, 1)),
           'string_agg', '') AS path
  FROM events GROUP BY user_id
), modal AS (
  SELECT path AS modal_path
  FROM (SELECT path, count(*) AS n,
               row_number() OVER (ORDER BY count(*) DESC, path ASC) AS rk
        FROM p GROUP BY path)
  WHERE rk = 1
)
SELECT levenshtein(p.path, m.modal_path) // 4 AS dist_band,
       count(*) AS n_users,
       CAST(min(levenshtein(p.path, m.modal_path)) AS BIGINT) AS min_dist,
       CAST(max(levenshtein(p.path, m.modal_path)) AS BIGINT) AS max_dist
FROM p CROSS JOIN modal m
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Graph degree assortativity
# ---------------------------------------------------------------------------

def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the part↔supplier co-purchase graph — do
    high-degree nodes attach to high-degree nodes?  The network-science
    summary beside PageRank/k-core/triangles: Pearson correlation over
    the degree pairs of every edge endpoint (both orientations, the
    standard undirected treatment), reported as the signed square in
    exact ppm from DECIMAL integer moments — the same sqrt-free
    discipline as the autocorrelation family.  Node ids use the disjoint
    2k/2k+1 encoding; degrees join back to edges broadcast-free on the
    node key (one shuffle each side).

    r11 measured note: a degree-table-algebra variant (sx = Σdeg²,
    sxx = Σdeg³ from the degree frame alone; sxy via a neighbour-degree-
    sum join) was built and A/B-timed — SLOWER at both sf0.1 (3.0 vs
    2.5 s) and sf1.0 (5.2 vs 3.7 s): the degree table is node-sized and
    broadcasts, so the "two edge-sized joins" it removed were already
    map-side, while its neighbour-sum stage ADDED a real edge-sized
    exchange (groupBy dst).  Kept the pair-join form per guide §1.1."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    edges = lineitem.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    ).distinct()
    # both feeds the degree aggregate AND both sides of the pair join —
    # persist so the distinct-edge scan runs once, release on return
    both = edges.unionByName(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    ).persist()
    deg = both.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    pairs = (
        both.join(deg.withColumnRenamed("src", "a"), F.col("src") == F.col("a"))
        .withColumnRenamed("deg", "dx")
        .drop("a")
        .join(
            deg.withColumnRenamed("src", "b").withColumnRenamed(
                "deg", "dy"
            ),
            F.col("dst") == F.col("b"),
        )
        .drop("b")
        .select("dx", "dy")
    )
    m = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("dx").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("dy").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("dx").cast("decimal(38,0)") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy").cast("decimal(38,0)") * F.col("dy")).alias("syy"),
        F.sum(F.col("dx").cast("decimal(38,0)") * F.col("dy")).alias("sxy"),
    )
    out = m.select(
        F.col("n").alias("n_endpoint_pairs"),
        F.expr(
            "CAST(CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END"
            " AS BIGINT)"
        ).alias("sign"),
        F.expr(
            "CAST(((n * sxy - sx * sy) * 1000 div (n * sxx - sx * sx))"
            " * ((n * sxy - sx * sy) * 1000 div (n * syy - sy * sy))"
            " AS BIGINT)"
        ).alias("r2_ppm"),
    )
    return materialize_and_release(out, both)


SQL_DEGREE_ASSORTATIVITY = """
WITH e AS (
  SELECT DISTINCT 2 * l_partkey AS src, 2 * l_suppkey + 1 AS dst
  FROM lineitem
), both_dir AS (
  SELECT src, dst FROM e
  UNION ALL
  SELECT dst AS src, src AS dst FROM e
), deg AS (
  SELECT src, count(*) AS deg FROM both_dir GROUP BY src
), pairs AS (
  SELECT da.deg AS dx, db.deg AS dy
  FROM both_dir b
  JOIN deg da ON b.src = da.src
  JOIN deg db ON b.dst = db.src
), m AS (
  SELECT count(*) AS n,
         sum(CAST(dx AS HUGEINT)) AS sx, sum(CAST(dy AS HUGEINT)) AS sy,
         sum(CAST(dx AS HUGEINT) * dx) AS sxx,
         sum(CAST(dy AS HUGEINT) * dy) AS syy,
         sum(CAST(dx AS HUGEINT) * dy) AS sxy
  FROM pairs
)
SELECT CAST(n AS BIGINT) AS n_endpoint_pairs,
       CAST(CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END AS BIGINT)
         AS sign,
       CAST(((n * sxy - sx * sy) * 1000 // (n * sxx - sx * sx))
            * ((n * sxy - sx * sy) * 1000 // (n * syy - sy * sy))
         AS BIGINT) AS r2_ppm
FROM m
"""


# ---------------------------------------------------------------------------
# Stratified k-fold assignment
# ---------------------------------------------------------------------------

def q_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 5-fold cross-validation assignment over documents:
    within each stratum (source × language) docs rank by the md5 of
    their id (the registry's no-rand() replayable shuffle) and fold =
    (rank − 1) % k, so fold sizes within every stratum differ by at most
    one — the exact-balance property rand() splits can't give.  Output
    reports per (stratum, fold) counts plus the stratum's max−min
    fold-size spread INCLUDING empty folds (the balance invariant holds
    by round-robin construction; the output pins engine agreement on
    every stratum's exact assignment sizes).  One rank window per
    stratum; assignment is a map stage."""
    (documents,) = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source", "lang").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    folds = documents.select(
        "source",
        "lang",
        ((F.row_number().over(w) - 1) % 5).alias("fold"),
    )
    counts = folds.groupBy("source", "lang", "fold").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    # spread counts EMPTY folds too (a 3-doc stratum has true spread 1,
    # not 0): when fewer than 5 folds are present the minimum is 0
    ws = Window.partitionBy("source", "lang")
    return counts.select(
        "source",
        "lang",
        "fold",
        "n_docs",
        (
            F.max("n_docs").over(ws)
            - F.when(
                F.count(F.lit(1)).over(ws) == 5, F.min("n_docs").over(ws)
            ).otherwise(F.lit(0))
        ).alias("stratum_spread"),
    )


SQL_KFOLD_ASSIGNMENT = """
WITH folds AS (
  SELECT source, lang,
         (row_number() OVER (PARTITION BY source, lang
                             ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC,
                                      doc_id ASC) - 1) % 5 AS fold
  FROM documents
), c AS (
  SELECT source, lang, fold, count(*) AS n_docs
  FROM folds GROUP BY 1, 2, 3
)
SELECT source, lang, fold, n_docs,
       CAST(max(n_docs) OVER (PARTITION BY source, lang)
            - CASE WHEN count(*) OVER (PARTITION BY source, lang) = 5
                   THEN min(n_docs) OVER (PARTITION BY source, lang)
                   ELSE 0 END AS BIGINT) AS stratum_spread
FROM c
"""


# ---------------------------------------------------------------------------
# IPS off-policy evaluation
# ---------------------------------------------------------------------------

def q_ips_policy_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-scored off-policy evaluation: the logged events
    act as a uniform-over-5-types logging policy (propensity 1/5 exact);
    the TARGET policy deterministically picks one event type per user
    (md5 parity over 5).  IPS value = Σ reward·𝟙[logged action = target
    action]/p over logged steps, which with the exact rational p = 1/5
    is just 5·Σ matched rewards — integer micro-units throughout, no
    estimator noise.  Reported per target-arm with the matched-step
    count and the naive on-logged average for contrast — the
    counterfactual-evaluation primitive of recommendation pipelines."""
    (events,) = _t(spark, sf_dir, "events")
    arms = F.array(
        F.lit("view"), F.lit("click"), F.lit("signup"),
        F.lit("purchase"), F.lit("error"),
    )
    staged = events.select(
        "user_id",
        "event_type",
        F.floor(F.col("value") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("r_us"),
        F.element_at(
            arms,
            (
                F.conv(
                    F.substring(
                        F.md5(F.col("user_id").cast("string")), 1, 4
                    ),
                    16,
                    10,
                ).cast("long")
                % 5
                + 1
            ).cast("int"),
        ).alias("target_action"),
    )
    return staged.groupBy("target_action").agg(
        F.count(F.lit(1)).alias("n_steps"),
        F.sum(
            F.when(F.col("event_type") == F.col("target_action"), 1)
            .otherwise(0)
        ).cast("long").alias("n_matched"),
        F.expr(
            "5 * sum(CASE WHEN event_type = target_action THEN r_us"
            " ELSE 0 END) div count(1)"
        ).alias("ips_value_us"),
        F.expr("sum(r_us) div count(1)").alias("logged_value_us"),
    )


SQL_IPS_POLICY_VALUE = """
WITH staged AS (
  SELECT user_id, event_type,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS r_us,
         (['view', 'click', 'signup', 'purchase', 'error'])[
           CAST(CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 4))
                     AS BIGINT) % 5 AS INTEGER) + 1] AS target_action
  FROM events
)
SELECT target_action, count(*) AS n_steps,
       CAST(sum(CASE WHEN event_type = target_action THEN 1 ELSE 0 END)
         AS BIGINT) AS n_matched,
       CAST(5 * sum(CASE WHEN event_type = target_action THEN r_us
                    ELSE 0 END) // count(*) AS BIGINT) AS ips_value_us,
       CAST(sum(r_us) // count(*) AS BIGINT) AS logged_value_us
FROM staged GROUP BY target_action
"""


# ---------------------------------------------------------------------------
# Attribution lookback sensitivity (parameter sweep in one scan)
# ---------------------------------------------------------------------------

def q_attribution_window_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-window sensitivity in ONE pass: per purchase the gap
    to its nearest preceding click (the as-of backward step), then the
    1-day / 3-day / 7-day lookback configurations fall out of the SAME
    frame as conditional aggregates — the parameter-sweep-without-
    rescanning pattern that matters at 100 TB (three configs, one fact
    scan, one user-key shuffle).  Output per lookback: purchases
    attributed, share ppm, credited value — how sensitive the
    attribution readout is to the window choice."""
    (events,) = _t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("p_us"),
        F.floor(F.col("value") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("value_us"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("c_us")
    )
    # the time bound lives IN the join condition: as a post-join filter it
    # would drop purchases whose clicks are all later (no NULL row
    # survives), diverging from the oracle's ON-clause semantics
    nearest = (
        purchases.join(
            clicks,
            (purchases["user_id"] == clicks["user_id"])
            & (F.col("c_us") <= F.col("p_us")),
            "left",
        )
        .groupBy("purchase_id", "p_us", "value_us")
        .agg(F.max("c_us").alias("last_c_us"))
        .withColumn(
            "gap_us",
            F.when(
                F.col("last_c_us").isNotNull(),
                F.col("p_us") - F.col("last_c_us"),
            ),
        )
    )
    day = 86400000000
    # the one-row sweep aggregate feeds three union branches — persist so
    # the scan/join/aggregate subtree runs once (the committed fingerprint
    # showed the whole tree tripled without it)
    sweep = nearest.agg(
        F.count(F.lit(1)).alias("n_purchases"),
        *[
            F.sum(
                F.when(F.col("gap_us") <= F.lit(d * day), 1).otherwise(0)
            ).cast("long").alias(f"n_{d}d")
            for d in (1, 3, 7)
        ],
        *[
            F.sum(
                F.when(
                    F.col("gap_us") <= F.lit(d * day), F.col("value_us")
                ).otherwise(F.lit(0))
            ).alias(f"v_{d}d")
            for d in (1, 3, 7)
        ],
    ).persist()
    rows = [
        sweep.select(
            F.lit(f"{d}d").alias("lookback"),
            F.col(f"n_{d}d").alias("n_attributed"),
            F.expr(f"(n_{d}d * 1000000) div n_purchases").alias(
                "attr_share_ppm"
            ),
            F.col(f"v_{d}d").alias("credited_us"),
        )
        for d in (1, 3, 7)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return materialize_and_release(out, sweep)


SQL_ATTRIBUTION_WINDOW_SWEEP = """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS value_us
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, epoch_us(ts) AS c_us FROM events
  WHERE event_type = 'click'
), nearest AS (
  SELECT p.purchase_id, p.p_us, p.value_us,
         max(c.c_us) AS last_c_us
  FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.c_us <= p.p_us
  GROUP BY 1, 2, 3
), g AS (
  SELECT purchase_id, value_us,
         CASE WHEN last_c_us IS NOT NULL THEN p_us - last_c_us END AS gap_us
  FROM nearest
), sweep AS (
  SELECT count(*) AS n_purchases,
         CAST(sum(CASE WHEN gap_us <= 1 * 86400000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_1,
         CAST(sum(CASE WHEN gap_us <= 3 * 86400000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_3,
         CAST(sum(CASE WHEN gap_us <= 7 * 86400000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_7,
         CAST(sum(CASE WHEN gap_us <= 1 * 86400000000 THEN value_us ELSE 0 END) AS BIGINT) AS v_1,
         CAST(sum(CASE WHEN gap_us <= 3 * 86400000000 THEN value_us ELSE 0 END) AS BIGINT) AS v_3,
         CAST(sum(CASE WHEN gap_us <= 7 * 86400000000 THEN value_us ELSE 0 END) AS BIGINT) AS v_7
  FROM g
)
SELECT '1d' AS lookback, n_1 AS n_attributed,
       CAST((n_1 * 1000000) // n_purchases AS BIGINT) AS attr_share_ppm,
       v_1 AS credited_us FROM sweep
UNION ALL
SELECT '3d', n_3, CAST((n_3 * 1000000) // n_purchases AS BIGINT), v_3
FROM sweep
UNION ALL
SELECT '7d', n_7, CAST((n_7 * 1000000) // n_purchases AS BIGINT), v_7
FROM sweep
"""


# ---------------------------------------------------------------------------
# Zipf rank-size audit
# ---------------------------------------------------------------------------

def q_zipf_rank_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-size audit over brand revenue: size_k/size_1 in exact
    ppm against the ideal 1/k, with the absolute deviation — the
    power-law screen for concentration (complements Gini/Pareto with the
    per-rank view).  Brand rollup is one fact shuffle; the rank window
    sorts 25 rows."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    rev = (
        lineitem.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            lineitem["l_partkey"] == part["p_partkey"],
        )
        .groupBy("p_brand")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * 1000000 + F.lit(0.5)
                ).cast("long")
            ).alias("rev_us")
        )
    )
    w = Window.orderBy(F.col("rev_us").desc(), F.col("p_brand").asc())
    wall = Window.partitionBy()
    return (
        rev.withColumn("rk", F.row_number().over(w))
        .withColumn("top_us", F.max("rev_us").over(wall))
        .withColumn(
            "size_ratio_ppm",
            F.expr(
                "CAST((CAST(rev_us AS DECIMAL(38,0)) * 1000000)"
                " div top_us AS BIGINT)"
            ),
        )
        .withColumn("zipf_ideal_ppm", F.expr("1000000 div rk"))
        .select(
            "p_brand",
            "rk",
            "rev_us",
            "size_ratio_ppm",
            "zipf_ideal_ppm",
            F.abs(
                F.col("size_ratio_ppm") - F.col("zipf_ideal_ppm")
            ).alias("dev_ppm"),
        )
    )


SQL_ZIPF_RANK_AUDIT = """
WITH rev AS (
  SELECT p.p_brand,
         CAST(sum(CAST(floor(l.l_extendedprice * 1000000 + 0.5) AS BIGINT))
           AS BIGINT) AS rev_us
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
), ranked AS (
  SELECT p_brand, rev_us,
         row_number() OVER (ORDER BY rev_us DESC, p_brand ASC) AS rk,
         max(rev_us) OVER () AS top_us
  FROM rev
)
SELECT p_brand, rk, rev_us,
       CAST((CAST(rev_us AS HUGEINT) * 1000000) // top_us AS BIGINT)
         AS size_ratio_ppm,
       CAST(1000000 // rk AS BIGINT) AS zipf_ideal_ppm,
       abs(CAST((CAST(rev_us AS HUGEINT) * 1000000) // top_us AS BIGINT)
           - CAST(1000000 // rk AS BIGINT)) AS dev_ppm
FROM ranked
"""


# ---------------------------------------------------------------------------
# Short-text edit-distance near-dup
# ---------------------------------------------------------------------------

_EDITDUP_BLOCK_CAP = 64


def q_short_text_editdups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-duplicate detection for SHORT texts — the
    dedup-family member for titles/instructions where shingle and
    MinHash methods lose power (too few n-grams to hash).  Candidate
    blocking = (first token, length div 8 band): only same-block pairs
    meet, then normalized edit distance
    lev·1e6 div greatest(len_a, len_b) ≤ 150000 (15%) confirms — the
    levenshtein is JVM-codegen'd in both engines and runs only inside
    blocks.  Texts are truncated to their first 60 chars (the
    short-text regime by construction; full-length near-dup belongs to
    the shingle family).

    Blocks larger than ``_EDITDUP_BLOCK_CAP`` docs are EXCLUDED entirely
    before pair generation (the ``basket_incidence`` / LSH ``max_bucket``
    contract): templated corpora concentrate docs on few first tokens, so
    an uncapped block is O(b²) and dominates at scale (measured 0.9 s at
    sf0.01 → 25.1 s at sf0.1 pre-cap).  The block count rides the SAME
    (tok1, lband) shuffle key as the pair join, and the exclusion is
    surfaced — n_capped_blocks / n_capped_docs are part of the checked
    output, restated identically in the DuckDB oracle — so the cap is an
    explicit contract, never a silent recall loss.  Output: confirmed-pair
    counts with min/max normalized distances + the cap-exclusion audit."""
    (documents,) = _t(spark, sf_dir, "documents")
    short = documents.select(
        "doc_id",
        F.substring(
            F.lower(F.regexp_replace(F.trim("text"), r"\s+", " ")), 1, 60
        ).alias("t"),
    ).select(
        "doc_id",
        "t",
        F.substring_index(F.col("t"), " ", 1).alias("tok1"),
        F.expr("length(t) div 8").alias("lband"),
    )
    # short feeds three consumers (block sizing + both join sides);
    # persist the tiny (doc_id, 60-char) frame once.
    short = short.persist()
    blocks = short.groupBy("tok1", "lband").agg(
        F.count(F.lit(1)).alias("block_n")
    )
    kept = short.join(
        blocks.filter(F.col("block_n") <= _EDITDUP_BLOCK_CAP)
        .select("tok1", "lband"),
        ["tok1", "lband"],
    )
    pairs = (
        kept.alias("a")
        .join(
            kept.alias("b"),
            (F.col("a.tok1") == F.col("b.tok1"))
            & (F.col("a.lband") == F.col("b.lband"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.expr(
                "(levenshtein(a.t, b.t) * 1000000)"
                " div greatest(length(a.t), length(b.t))"
            ).alias("ndist_ppm"),
        )
        .filter(F.col("ndist_ppm") <= 150000)
    )
    pair_stats = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("id_a").cast("long").alias("n_left_docs"),
        F.min("ndist_ppm").alias("min_ndist_ppm"),
        F.max("ndist_ppm").alias("max_ndist_ppm"),
    )
    cap_stats = blocks.filter(F.col("block_n") > _EDITDUP_BLOCK_CAP).agg(
        F.count(F.lit(1)).alias("n_capped_blocks"),
        F.coalesce(F.sum("block_n"), F.lit(0)).alias("n_capped_docs"),
    )
    out = pair_stats.crossJoin(F.broadcast(cap_stats))
    return materialize_and_release(out, short)


SQL_SHORT_TEXT_EDITDUPS = """
WITH short AS (
  SELECT doc_id,
         substr(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), 1, 60)
           AS t
  FROM documents
), keyed AS (
  SELECT doc_id, t,
         string_split(t, ' ')[1] AS tok1,
         length(t) // 8 AS lband
  FROM short
), blocks AS (
  SELECT tok1, lband, count(*) AS block_n FROM keyed GROUP BY 1, 2
), kept AS (
  SELECT k.* FROM keyed k
  JOIN blocks bl ON k.tok1 = bl.tok1 AND k.lband = bl.lband
  WHERE bl.block_n <= 64
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         (levenshtein(a.t, b.t) * 1000000)
           // greatest(length(a.t), length(b.t)) AS ndist_ppm
  FROM kept a JOIN kept b
    ON a.tok1 = b.tok1 AND a.lband = b.lband AND a.doc_id < b.doc_id
), pair_stats AS (
  SELECT count(*) AS n_pairs,
         CAST(count(DISTINCT id_a) AS BIGINT) AS n_left_docs,
         CAST(min(ndist_ppm) AS BIGINT) AS min_ndist_ppm,
         CAST(max(ndist_ppm) AS BIGINT) AS max_ndist_ppm
  FROM pairs WHERE ndist_ppm <= 150000
), cap_stats AS (
  SELECT count(*) AS n_capped_blocks,
         CAST(coalesce(sum(block_n), 0) AS BIGINT) AS n_capped_docs
  FROM blocks WHERE block_n > 64
)
SELECT p.*, c.* FROM pair_stats p, cap_stats c
"""


# ---------------------------------------------------------------------------
# OHLC daily bars (time-series downsampling)
# ---------------------------------------------------------------------------

def q_ohlc_daily_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candlestick downsampling of the event-value stream to daily OHLC
    bars — the classic time-series compaction (open/high/low/close +
    mean) every monitoring/market pipeline runs before plotting or
    modeling.  Open/close are argmin/argmax over the (ts, event_id)
    total order via ONE struct-ordered min/max in the same single
    aggregate as high/low/count/sum — no window, no second scan, one
    partial-agg shuffle on the day key.  Values ride as micro-unit
    BIGINTs; the mean is a DECIMAL-sum floor division, so every output
    is engine-exact."""
    (events,) = _t(spark, sf_dir, "events")
    base = events.select(
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        F.expr("CAST(floor(value * 1000000 + 0.5) AS BIGINT)").alias("v_us"),
        "ts",
        "event_id",
    )
    agg = base.groupBy("day").agg(
        F.min(F.struct("ts", "event_id", "v_us"))["v_us"].alias("open_us"),
        F.max(F.struct("ts", "event_id", "v_us"))["v_us"].alias("close_us"),
        F.max("v_us").alias("high_us"),
        F.min("v_us").alias("low_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("v_us").cast("decimal(38,0)")).alias("__sum_us"),
    )
    return agg.select(
        "day",
        "open_us",
        "close_us",
        "high_us",
        "low_us",
        "n_events",
        F.expr("CAST(__sum_us div n_events AS BIGINT)").alias("avg_us"),
    )


SQL_OHLC_DAILY_BARS = """
WITH base AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v_us, ts, event_id
  FROM events
), o AS (
  SELECT day, v_us,
         row_number() OVER (PARTITION BY day
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY day
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM base
), agg AS (
  SELECT day, max(v_us) AS high_us, min(v_us) AS low_us,
         count(*) AS n_events,
         CAST(sum(CAST(v_us AS HUGEINT)) // count(*) AS BIGINT) AS avg_us
  FROM base GROUP BY day
)
SELECT a.day, oo.v_us AS open_us, cc.v_us AS close_us,
       a.high_us, a.low_us, a.n_events, a.avg_us
FROM agg a
JOIN (SELECT day, v_us FROM o WHERE rn_a = 1) oo USING (day)
JOIN (SELECT day, v_us FROM o WHERE rn_d = 1) cc USING (day)
"""


def q_streaming_ohlc_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eleventh REAL Structured Streaming parity pipeline: the daily OHLC
    bars computed by readStream → event-time watermark → tumbling 1-day
    window → complete-mode sink, hash-checked against the SAME DuckDB
    oracle as the batch `ohlc_daily_bars`.  The interesting streaming
    property: open/close are struct-ordered min/max — associative,
    merge-combinable aggregates, so the incremental executor maintains
    exact bars across micro-batches with O(1) state per (day) key where a
    window-function formulation could not run incrementally at all.  Day
    keys leave as epoch-day integers (tz-proof; the trending query's
    TIMESTAMPTZ lesson).  Scale: on a live feed the same code runs with a
    processing trigger and update mode; watermark bounds state to ~2 days
    of keys."""
    import uuid  # noqa: PLC0415

    stream = streaming_events(spark, sf_dir)
    base = stream.select(
        "ts",
        "event_id",
        F.expr("CAST(floor(value * 1000000 + 0.5) AS BIGINT)").alias("v_us"),
    )
    agg = (
        base.withWatermark("ts", "25 hours")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.min(F.struct("ts", "event_id", "v_us"))["v_us"].alias(
                "open_us"
            ),
            F.max(F.struct("ts", "event_id", "v_us"))["v_us"].alias(
                "close_us"
            ),
            F.max("v_us").alias("high_us"),
            F.min("v_us").alias("low_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("v_us").cast("decimal(38,0)")).alias("__sum_us"),
        )
        .select(
            F.expr("unix_micros(w.start) div 86400000000").alias("day"),
            "open_us",
            "close_us",
            "high_us",
            "low_us",
            "n_events",
            F.expr("CAST(__sum_us div n_events AS BIGINT)").alias("avg_us"),
        )
    )
    sink = "stream_ohlc_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return drain_memory_sink(spark, sink)


MINING_QUERIES = {
    "basket_brand_rules": q_basket_brand_rules,
    "brand_affinity_topk": q_brand_affinity_topk,
    "dow_seasonality": q_dow_seasonality,
    "gini_purchase_concentration": q_gini_purchase_concentration,
    "benford_price_audit": q_benford_price_audit,
    "daily_autocorrelation": q_daily_autocorrelation,
    "distinctive_terms": q_distinctive_terms,
    "pmi_term_pairs": q_pmi_term_pairs,
    "fuzzy_record_linkage": q_fuzzy_record_linkage,
    "entity_resolution_clusters": q_entity_resolution_clusters,
    "ohlc_daily_bars": q_ohlc_daily_bars,
    "streaming_ohlc_parity": q_streaming_ohlc_parity,
    "kaplan_meier_churn": q_kaplan_meier_churn,
    "event_trigram_patterns": q_event_trigram_patterns,
    "behavior_diversity_bands": q_behavior_diversity_bands,
    "theil_sen_trend": q_theil_sen_trend,
    "holt_trend_forecast": q_holt_trend_forecast,
    "discount_elasticity": q_discount_elasticity,
    "abc_xyz_classification": q_abc_xyz_classification,
    "seasonal_decompose": q_seasonal_decompose,
    "sax_symbolic_words": q_sax_symbolic_words,
    "cuped_adjusted_ab": q_cuped_adjusted_ab,
    "trimmed_mean_values": q_trimmed_mean_values,
    "lead_lag_correlation": q_lead_lag_correlation,
    "audio_dominant_bins": q_audio_dominant_bins,
    "streaming_trending_topk": q_streaming_trending_topk,
    "image_ahash_dedup": q_image_ahash_dedup,
    "did_readout": q_did_readout,
    "negative_sampling_pairs": q_negative_sampling_pairs,
    "product_analytics_pipeline": q_product_analytics_pipeline,
    "position_attribution": q_position_attribution,
    "readability_bands": q_readability_bands,
    "distribution_drift": q_distribution_drift,
    "user_feature_vector": q_user_feature_vector,
    "session_conformance": q_session_conformance,
    "degree_assortativity": q_degree_assortativity,
    "kfold_assignment": q_kfold_assignment,
    "ips_policy_value": q_ips_policy_value,
    "attribution_window_sweep": q_attribution_window_sweep,
    "zipf_rank_audit": q_zipf_rank_audit,
    "short_text_editdups": q_short_text_editdups,
}

MINING_ORACLES = {
    "basket_brand_rules": SQL_BASKET_BRAND_RULES,
    "brand_affinity_topk": SQL_BRAND_AFFINITY_TOPK,
    "dow_seasonality": SQL_DOW_SEASONALITY,
    "gini_purchase_concentration": SQL_GINI_PURCHASE_CONCENTRATION,
    "benford_price_audit": SQL_BENFORD_PRICE_AUDIT,
    "daily_autocorrelation": SQL_DAILY_AUTOCORRELATION,
    "distinctive_terms": SQL_DISTINCTIVE_TERMS,
    "pmi_term_pairs": SQL_PMI_TERM_PAIRS,
    "fuzzy_record_linkage": SQL_FUZZY_RECORD_LINKAGE,
    "entity_resolution_clusters": SQL_ENTITY_RESOLUTION_CLUSTERS,
    "ohlc_daily_bars": SQL_OHLC_DAILY_BARS,
    "streaming_ohlc_parity": SQL_OHLC_DAILY_BARS,
    "kaplan_meier_churn": SQL_KAPLAN_MEIER_CHURN,
    "event_trigram_patterns": SQL_EVENT_TRIGRAM_PATTERNS,
    "behavior_diversity_bands": SQL_BEHAVIOR_DIVERSITY_BANDS,
    "theil_sen_trend": SQL_THEIL_SEN_TREND,
    "holt_trend_forecast": SQL_HOLT_TREND_FORECAST,
    "discount_elasticity": SQL_DISCOUNT_ELASTICITY,
    "abc_xyz_classification": SQL_ABC_XYZ_CLASSIFICATION,
    "seasonal_decompose": SQL_SEASONAL_DECOMPOSE,
    "sax_symbolic_words": SQL_SAX_SYMBOLIC_WORDS,
    "cuped_adjusted_ab": SQL_CUPED_ADJUSTED_AB,
    "trimmed_mean_values": SQL_TRIMMED_MEAN_VALUES,
    "lead_lag_correlation": SQL_LEAD_LAG_CORRELATION,
    "audio_dominant_bins": SQL_AUDIO_DOMINANT_BINS,
    "streaming_trending_topk": SQL_STREAMING_TRENDING_TOPK,
    "image_ahash_dedup": SQL_IMAGE_AHASH_DEDUP,
    "did_readout": SQL_DID_READOUT,
    "negative_sampling_pairs": SQL_NEGATIVE_SAMPLING_PAIRS,
    "product_analytics_pipeline": SQL_PRODUCT_ANALYTICS_PIPELINE,
    "position_attribution": SQL_POSITION_ATTRIBUTION,
    "readability_bands": SQL_READABILITY_BANDS,
    "distribution_drift": SQL_DISTRIBUTION_DRIFT,
    "user_feature_vector": SQL_USER_FEATURE_VECTOR,
    "session_conformance": SQL_SESSION_CONFORMANCE,
    "degree_assortativity": SQL_DEGREE_ASSORTATIVITY,
    "kfold_assignment": SQL_KFOLD_ASSIGNMENT,
    "ips_policy_value": SQL_IPS_POLICY_VALUE,
    "attribution_window_sweep": SQL_ATTRIBUTION_WINDOW_SWEEP,
    "zipf_rank_audit": SQL_ZIPF_RANK_AUDIT,
    "short_text_editdups": SQL_SHORT_TEXT_EDITDUPS,
}
