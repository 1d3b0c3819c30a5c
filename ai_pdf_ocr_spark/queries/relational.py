"""Relational operator surface (SURVEY.md §2.2-2.7) over the shared
testdata tables, each with a DuckDB oracle.

Scale notes (100 TB design stance, verified via .explain in tests):
 - joins against region/nation/customer are BROADCAST (tiny dims);
 - aggregations are partial (map-side combine) by construction —
   plain groupBy().agg() of algebraic aggregates;
 - filters/projections sit directly on the parquet scan so Catalyst
   pushes them down (PushedFilters / ReadSchema pruning).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load, micro, register

# CJK code-point ranges, /root/reference/pdf_processor.py:14-19 (P6)
CJK_RE_SPARK = "[\\u3040-\\u309F\\u30A0-\\u30FF\\u4E00-\\u9FAF\\uFF65-\\uFF9F]"
CJK_RE_DUCK = r"[\x{3040}-\x{309F}\x{30A0}-\x{30FF}\x{4E00}-\x{9FAF}\x{FF65}-\x{FF9F}]"


# ---------------------------------------------------------------- A4/A8
@register("q1_pricing_summary", sql="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                          AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                     AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
       ROUND(AVG(l_quantity), 4)                          AS avg_qty,
       ROUND(AVG(l_discount), 4)                          AS avg_disc,
       COUNT(*)                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""")
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary: partial-aggregatable, pushdown
    filter on the scan (A4 conditional counts + A8 rollup analog)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00")
                 .cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
             F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2)
             .alias("sum_disc_price"),
             F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
             F.round(F.avg("l_discount"), 4).alias("avg_disc"),
             F.count("*").alias("count_order"))
    )


@micro("q3_top_revenue_orders", sql="""
SELECT o.o_orderkey, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
         AS revenue,
       CAST(o.o_orderdate AS VARCHAR) AS orderdate
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""")
def q3_top_revenue_orders(spark, sf_dir):
    """Join + agg + deterministic top-k (J1 equi-join, W9 limit)."""
    c = load(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("o_orderkey", "revenue",
                F.col("o_orderdate").cast("string").alias("orderdate"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@micro("q5_nation_revenue", sql="""
SELECT n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""")
def q5_nation_revenue(spark, sf_dir):
    """Multi-join star query; all dims broadcast (no big-side shuffle
    except the final small agg)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2).alias("revenue"),
             F.count("*").alias("n_items"))
    )


# ------------------------------------------------- P4-P11 filter/project
@micro("p4_nonempty_filter", sql="""
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE LENGTH(TRIM(text)) > 0
GROUP BY lang
""")
def p4_nonempty_filter(spark, sf_dir):
    """Empty-text admission filter (P4, /root/reference/pdf_processor.py:244-246)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.where(F.length(F.trim("text")) > 0)
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_chars").cast("long").alias("total_chars"))
    )


@micro("p6_cjk_predicate", sql=f"""
SELECT lang,
       CAST(SUM(CASE WHEN regexp_matches(text, '{CJK_RE_DUCK}')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_cjk,
       COUNT(*) AS n_docs
FROM documents GROUP BY lang
""")
def p6_cjk_predicate(spark, sf_dir):
    """Unicode-range predicate (P6) as native regex — no UDF."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(F.sum(F.when(F.col("text").rlike(CJK_RE_SPARK), 1)
                   .otherwise(0)).cast("long").alias("n_cjk"),
             F.count("*").alias("n_docs"))
    )


@micro("p7_font_select", sql=f"""
SELECT CASE WHEN regexp_matches(text, '{CJK_RE_DUCK}') THEN 'japan'
            ELSE 'helv' END AS fontname,
       COUNT(*) AS n_docs
FROM documents GROUP BY fontname
""")
def p7_font_select(spark, sf_dir):
    """Conditional scalar (P7, /root/reference/pdf_processor.py:22-26)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.when(F.col("text").rlike(CJK_RE_SPARK), "japan")
                 .otherwise("helv").alias("fontname"))
        .groupBy("fontname").agg(F.count("*").alias("n_docs"))
    )


@micro("p10_fontsize_clamp", sql="""
SELECT l_returnflag,
       ROUND(AVG(GREATEST(LEAST(l_quantity * 0.8, 12), 6)), 4) AS avg_fs,
       ROUND(MIN(GREATEST(LEAST(l_quantity * 0.8, 12), 6)), 4) AS min_fs,
       ROUND(MAX(GREATEST(LEAST(l_quantity * 0.8, 12), 6)), 4) AS max_fs
FROM lineitem GROUP BY l_returnflag
""")
def p10_fontsize_clamp(spark, sf_dir):
    """Clamped linear map max(min(x*0.8,12),6) (P10/F6,
    /root/reference/pdf_processor.py:152-154)."""
    li = load(spark, sf_dir, "lineitem")
    fs = F.greatest(F.least(F.col("l_quantity") * 0.8, F.lit(12.0)),
                    F.lit(6.0))
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(F.avg(fs), 4).alias("avg_fs"),
             F.round(F.min(fs), 4).alias("min_fs"),
             F.round(F.max(fs), 4).alias("max_fs"))
    )


@micro("p9_rescale_projection", sql="""
SELECT l_linestatus,
       ROUND(SUM(l_extendedprice * 72.0 / 200.0), 2) AS total_pt
FROM lineitem GROUP BY l_linestatus
""")
def p9_rescale_projection(spark, sf_dir):
    """px->pt affine rescale (P9/F9, /root/reference/pdf_processor.py:122-123)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(F.round(F.sum(F.col("l_extendedprice") * 72.0 / 200.0), 2)
             .alias("total_pt"))
    )


# ------------------------------------------------------- A1-A7 aggregates
@micro("a1_ordered_text_concat", sql="""
SELECT lang, MD5(STRING_AGG(SUBSTR(text, 1, 16), ' ' ORDER BY doc_id))
         AS concat_md5,
       COUNT(*) AS n_docs
FROM documents WHERE doc_id < 100 GROUP BY lang
""")
def a1_ordered_text_concat(spark, sf_dir):
    """Order-preserving string aggregation (A1/A5/F4: ordered concat_ws).
    Spark: sort_array(collect_list(struct)) keeps it deterministic.

    SCALE NOTE (VERDICT r1): collect_list state is O(group size) — legal
    here ONLY because the ``doc_id < 100`` predicate bounds every group
    to <=100 16-char prefixes.  For unbounded groups use the array-HOF
    form over an already-grouped array column (engine/pipeline.py::
    doc_stats) or a repartition+sortWithinPartitions mapPartitions agg —
    never an unbounded collect_list."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return (
        d.select("lang", F.struct("doc_id",
                                  F.substring("text", 1, 16).alias("t"))
                 .alias("s"))
        .groupBy("lang")
        .agg(F.md5(F.concat_ws(" ", F.transform(
            F.sort_array(F.collect_list("s")), lambda s: s.t)))
            .alias("concat_md5"),
            F.count("*").alias("n_docs"))
    )


@micro("a7_argmax_doc", sql="""
SELECT lang, doc_id AS max_doc_id, n_chars AS max_n_chars FROM (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id DESC) AS rn
  FROM documents) WHERE rn = 1
""")
def a7_argmax_doc(spark, sf_dir):
    """Deterministic argmax (A7 merged-block reduction analog,
    /root/reference/text_block_sorter.py:224,231)."""
    from pyspark.sql import Window
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"),
                                           F.desc("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("lang", F.col("doc_id").alias("max_doc_id"),
                F.col("n_chars").alias("max_n_chars"))
    )


# ------------------------------------------------------ windows / limits
@micro("w7_row_number", sql="""
SELECT user_id, event_id, rn FROM (
  SELECT user_id, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events) WHERE rn <= 3
""")
def w7_row_number(spark, sf_dir):
    """Sequence renumbering (W7, dense 1..n in order,
    /root/reference/text_block_sorter.py:145-146)."""
    from pyspark.sql import Window
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("user_id", "event_id", "rn")
    )


@micro("w9_topk_preview", sql="""
SELECT event_id, user_id, event_type, ROUND(value, 2) AS value_r
FROM events ORDER BY value DESC, event_id LIMIT 5
""")
def w9_topk_preview(spark, sf_dir):
    """First-k preview (W9, /root/reference/main.py:143-152)."""
    e = load(spark, sf_dir, "events")
    return (
        e.select("event_id", "user_id", "event_type",
                 F.round("value", 2).alias("value_r"))
        .orderBy(F.desc("value_r"), "event_id").limit(5)
    )


# --------------------------------------------------------------- joins
@micro("j4_resume_anti_join", sql="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers_without_orders
FROM customer c ANTI JOIN orders o ON c.c_custkey = o.o_custkey
""")
def j4_resume_anti_join(spark, sf_dir):
    """left_anti = the resume skip pattern (J4,
    /root/reference/main.py:371-398)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count("*").alias("n_customers_without_orders"))
    )


@micro("so2_except_types", sql="""
SELECT event_type FROM events
EXCEPT
SELECT event_type FROM events WHERE value > 280
""")
def so2_except_types(spark, sf_dir):
    """Set EXCEPT with distinct semantics (SO2,
    duplicate-removal-as-set-op analog): event types never seen among
    very-high-value events."""
    e = load(spark, sf_dir, "events")
    return (e.select("event_type")
            .subtract(e.where(F.col("value") > 280).select("event_type")))


@micro("so1_union_all_counts", sql="""
SELECT src, CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT 'hi' AS src FROM events WHERE value > 150
  UNION ALL
  SELECT 'err' AS src FROM events WHERE event_type = 'error'
) GROUP BY src
""")
def so1_union_all_counts(spark, sf_dir):
    """UNION ALL of two decoded streams (SO1,
    /root/reference/ocr_processor.py:356-389)."""
    e = load(spark, sf_dir, "events")
    hi = e.where(F.col("value") > 150).select(F.lit("hi").alias("src"))
    err = e.where(F.col("event_type") == "error") \
        .select(F.lit("err").alias("src"))
    return hi.unionByName(err).groupBy("src").agg(F.count("*").alias("n"))


@micro("p8_direction_scale", sql="""
SELECT event_type,
       ROUND(SUM(CASE WHEN user_id % 2 = 0 THEN value * 0.9
                 ELSE value END), 2) AS adj_total
FROM events GROUP BY event_type
""")
def p8_direction_scale(spark, sf_dir):
    """Direction-conditional scale (P8: vertical -> x0.9,
    /root/reference/pdf_processor.py:29-30)."""
    e = load(spark, sf_dir, "events")
    adj = F.when(F.col("user_id") % 2 == 0, F.col("value") * 0.9) \
        .otherwise(F.col("value"))
    return (e.groupBy("event_type")
            .agg(F.round(F.sum(adj), 2).alias("adj_total")))


@micro("f5_array_minmax", sql="""
SELECT vec_id,
       ROUND(CAST(LIST_MIN(embedding) AS DOUBLE), 4) AS emb_min,
       ROUND(CAST(LIST_MAX(embedding) AS DOUBLE), 4) AS emb_max,
       LENGTH(embedding) AS dim
FROM embeddings WHERE vec_id < 20 ORDER BY vec_id
""")
def f5_array_minmax(spark, sf_dir):
    """min/max over a coordinate list (F5: quad->bbox reduction,
    /root/reference/ocr_processor.py:365-366)."""
    e = load(spark, sf_dir, "embeddings")
    return (
        e.where(F.col("vec_id") < 20)
        .select("vec_id",
                F.round(F.array_min("embedding").cast("double"), 4)
                .alias("emb_min"),
                F.round(F.array_max("embedding").cast("double"), 4)
                .alias("emb_max"),
                F.size("embedding").cast("long").alias("dim"))
        .orderBy("vec_id")
    )


@micro("f2_substring_preview", sql="""
SELECT doc_id, SUBSTR(text, 1, 20) AS preview, lang
FROM documents WHERE doc_id < 10
""")
def f2_substring_preview(spark, sf_dir):
    """Substring preview (F2, /root/reference/main.py:144)."""
    d = load(spark, sf_dir, "documents")
    return (d.where(F.col("doc_id") < 10)
            .select("doc_id", F.substring("text", 1, 20).alias("preview"),
                    "lang"))


@micro("w_lag_gap_sessions", sql="""
SELECT user_id,
       CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM (
  SELECT user_id,
         date_diff('microseconds',
                   LAG(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id), ts) AS gap_us
  FROM events)
GROUP BY user_id
""")
def w_lag_gap_sessions(spark, sf_dir):
    """lag + gap sessionization (window op over event time); gaps in
    exact integer microseconds on both sides (no float epoch)."""
    from pyspark.sql import Window
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    return (
        e.withColumn("gap_us", gap)
        .groupBy("user_id")
        .agg(F.sum(F.when(F.col("gap_us").isNull()
                          | (F.col("gap_us") > 1800000000), 1).otherwise(0))
             .cast("long").alias("n_sessions"),
             F.count("*").alias("n_events"))
    )


@micro("p5_tiny_box_filter", sql="""
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(p_size) AS BIGINT) AS total_size
FROM part WHERE p_size * 72.0 / 200.0 >= 1
GROUP BY p_brand ORDER BY p_brand
""")
def p5_tiny_box_filter(spark, sf_dir):
    """Sub-point extent filter (P5,
    /root/reference/pdf_processor.py:148-150: scaled width/height < 1pt
    dropped) as a pushdown-able numeric predicate."""
    p = load(spark, sf_dir, "part")
    return (
        p.where(F.col("p_size") * 72.0 / 200.0 >= 1)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_kept"),
             F.sum("p_size").cast("long").alias("total_size"))
        .orderBy("p_brand")
    )


@micro("p11_baseline_offset", sql="""
SELECT event_type,
       ROUND(AVG(value + GREATEST(LEAST(value * 0.8, 12), 6)), 4)
         AS avg_baseline
FROM events GROUP BY event_type ORDER BY event_type
""")
def p11_baseline_offset(spark, sf_dir):
    """Baseline-offset projection (P11,
    /root/reference/pdf_processor.py:161: text_y = y0 + font_size),
    composed with the F6 clamp."""
    e = load(spark, sf_dir, "events")
    fs = F.greatest(F.least(F.col("value") * 0.8, F.lit(12.0)), F.lit(6.0))
    return (
        e.groupBy("event_type")
        .agg(F.round(F.avg(F.col("value") + fs), 4).alias("avg_baseline"))
        .orderBy("event_type")
    )


@micro("a3_avg_empty_guard", sql="""
SELECT user_id,
       ROUND(COALESCE(AVG(CASE WHEN event_type = 'error' THEN value END),
                      0.0), 4) AS avg_error_value,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_errors
FROM events GROUP BY user_id ORDER BY user_id
""")
def a3_avg_empty_guard(spark, sf_dir):
    """Mean with explicit empty-group guard (A3,
    /root/reference/data_structures.py:129-134: average confidence,
    0.0 when the page has no blocks)."""
    e = load(spark, sf_dir, "events")
    err_val = F.when(F.col("event_type") == "error", F.col("value"))
    return (
        e.groupBy("user_id")
        .agg(F.round(F.coalesce(F.avg(err_val), F.lit(0.0)), 4)
             .alias("avg_error_value"),
             F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
             .cast("long").alias("n_errors"))
        .orderBy("user_id")
    )


@micro("f10_name_format", sql="""
SELECT doc_id,
       CONCAT('doc-', LPAD(CAST(doc_id AS VARCHAR), 8, '0'),
              '_ocr_results.json') AS ckpt_name
FROM documents WHERE doc_id < 20 ORDER BY doc_id
""")
def f10_name_format(spark, sf_dir):
    """Checkpoint/lineage-key formatting (F10,
    /root/reference/main.py:117-121,368: '{stem}_ocr_results.json')."""
    d = load(spark, sf_dir, "documents")
    return (
        d.where(F.col("doc_id") < 20)
        .select("doc_id",
                F.format_string("doc-%08d_ocr_results.json",
                                F.col("doc_id")).alias("ckpt_name"))
        .orderBy("doc_id")
    )


_ASOF_SQL = """
WITH probe AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
ref AS (
  SELECT event_id AS m_event_id, user_id, ts AS m_ts
  FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id,
       CAST(epoch_us(p.ts) AS BIGINT) AS ts_us,
       m.m_event_id AS matched_click_id,
       CAST(epoch_us(p.ts) - epoch_us(m.m_ts) AS BIGINT) AS gap_us
FROM probe p ASOF LEFT JOIN ref m
  ON p.user_id = m.user_id AND p.ts >= m.m_ts
"""


@register("j_events_asof", sql=_ASOF_SQL)
def j_events_asof(spark, sf_dir):
    """AS-OF join: for each 'error' event, the most recent 'click' by
    the same user at-or-before the error's timestamp — the temporal
    join Spark has no native operator for (DuckDB: ASOF JOIN; the
    oracle uses it directly).

    Implemented as the union-window trick, NOT a range join: tag probe
    rows side=1 and reference rows side=0, union, then
    ``last(ref_id, ignorenulls=True)`` over a per-user window ordered
    by (ts, side, event_id) rows UNBOUNDED PRECEDING..CURRENT.  At
    equal timestamps the reference row sorts first (side 0 < 1), so
    the match is inclusive (ts >= ref.ts) exactly like the oracle's
    ASOF predicate; ties among equal-ts references resolve to the max
    event_id deterministically (none exist in the synthetic data —
    verified unique (user_id, ts) at every SF).

    Scale shape: ONE Exchange on user_id + a per-user sort — never the
    O(probe x ref) explosion of an inequality theta-join, and no
    per-row Python.  Skewed users (one user = one partition's sort) are
    the known hazard; ``j_events_asof_bucketed`` below is the
    skew-hardened variant (coarse time-bucket in the partition key +
    carry-forward of each bucket's last reference row), equal output
    by construction (same oracle; equality + skew pinned in
    tests/test_plans.py)."""
    from pyspark.sql import Window
    e = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    probe = (e.where(F.col("event_type") == "error")
             .select("event_id", "user_id", us.alias("ts_us"),
                     F.lit(1).alias("side"),
                     F.lit(None).cast("long").alias("m_id"),
                     F.lit(None).cast("long").alias("m_us")))
    ref = (e.where(F.col("event_type") == "click")
           .select("event_id", "user_id", us.alias("ts_us"),
                   F.lit(0).alias("side"),
                   F.col("event_id").alias("m_id"), us.alias("m_us")))
    w = (Window.partitionBy("user_id")
         .orderBy("ts_us", "side", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (probe.unionByName(ref)
            .select("event_id", "user_id", "ts_us", "side",
                    F.last("m_id", ignorenulls=True).over(w)
                    .alias("matched_click_id"),
                    F.last("m_us", ignorenulls=True).over(w).alias("m_us"))
            .where(F.col("side") == 1)
            .select("event_id", "user_id", "ts_us", "matched_click_id",
                    (F.col("ts_us") - F.col("m_us")).alias("gap_us")))


# 6-hour coarse time buckets: the skew dial for the as-of join.  At
# 100 TB pick the bucket so (hottest user's events per bucket) fits one
# task's sort comfortably; smaller buckets = more parallelism, more
# carry-forward seed rows (one per probe bucket — trivial either way).
_ASOF_BUCKET_US = 6 * 3600 * 1_000_000


@register("j_events_asof_bucketed", sql=_ASOF_SQL)
def j_events_asof_bucketed(spark, sf_dir):
    """Skew-hardened as-of join — the remediation ``j_events_asof``'s
    docstring promises (VERDICT r3 ask #5), same output and same DuckDB
    ASOF oracle.

    The union-window trick partitions by user_id alone, so one hot user
    (half the events) serializes into a single task's sort.  Here the
    partition key is (user_id, time_bucket): a hot user's events spread
    over its time range, and correctness across bucket boundaries is
    restored by SEEDING each bucket with a carry-forward row holding
    the user's most recent reference event from all earlier buckets:

      1. per-(user, bucket) last reference row — a map-side-combinable
         ``max(struct(ts, id))`` aggregate, tiny output;
      2. running carry-in per bucket via a per-user window over BUCKETS
         (rows = user's distinct buckets, bounded by time range /
         bucket width — independent of event skew);
      3. seed rows sort first in their bucket (side -1 at the bucket's
         start timestamp), so ``last(ref, ignorenulls)`` sees the
         carry-in until a same-bucket reference supersedes it.

    Shuffle shape: one Exchange on (user_id, bkt) for the big union +
    two tiny aggregates; the per-task sort is now bounded by events per
    (user, bucket).  Equality vs the unbucketed operator on a 50%-skew
    corpus is pinned in tests/test_plans.py."""
    from pyspark.sql import Window
    e = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bkt = F.floor(us / _ASOF_BUCKET_US).cast("long")
    probe = (e.where(F.col("event_type") == "error")
             .select("event_id", "user_id", us.alias("ts_us"),
                     bkt.alias("bkt"), F.lit(1).alias("side"),
                     F.lit(None).cast("long").alias("m_id"),
                     F.lit(None).cast("long").alias("m_us")))
    ref = (e.where(F.col("event_type") == "click")
           .select("event_id", "user_id", us.alias("ts_us"),
                   bkt.alias("bkt"), F.lit(0).alias("side"),
                   F.col("event_id").alias("m_id"), us.alias("m_us")))
    # last reference per (user, bucket): lexicographic struct max ==
    # latest ts, ties to max id — the same tie-break the window form
    # resolves via its (ts, side, event_id) ordering
    rb = (ref.groupBy("user_id", "bkt")
          .agg(F.max(F.struct("m_us", "m_id")).alias("last_ref")))
    pb = probe.select("user_id", "bkt").distinct()
    allb = pb.union(rb.select("user_id", "bkt")).distinct()
    wseq = (Window.partitionBy("user_id").orderBy("bkt")
            .rowsBetween(Window.unboundedPreceding, -1))
    carry = (allb.join(rb, ["user_id", "bkt"], "left")
             .withColumn("carry", F.max("last_ref").over(wseq))
             .where(F.col("carry").isNotNull()))
    seed = carry.select(F.lit(None).cast("long").alias("event_id"),
                        "user_id",
                        (F.col("bkt") * _ASOF_BUCKET_US).alias("ts_us"),
                        "bkt", F.lit(-1).alias("side"),
                        F.col("carry.m_id").alias("m_id"),
                        F.col("carry.m_us").alias("m_us"))
    w = (Window.partitionBy("user_id", "bkt")
         .orderBy("ts_us", "side", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (probe.unionByName(ref).unionByName(seed)
            .select("event_id", "user_id", "ts_us", "side",
                    F.last("m_id", ignorenulls=True).over(w)
                    .alias("matched_click_id"),
                    F.last("m_us", ignorenulls=True).over(w).alias("m_us"))
            .where(F.col("side") == 1)
            .select("event_id", "user_id", "ts_us", "matched_click_id",
                    (F.col("ts_us") - F.col("m_us")).alias("gap_us")))


# ------------------------------------- streaming analytics batch twins
# (VERDICT r3 ask #7: the streaming engine's windowed metrics and
# sessionization had pytest parity only — these batch twins give the
# same window/session semantics a driver CORRECTNESS row.)

@register("w_tumbling_event_metrics", sql="""
SELECT CAST(FLOOR(epoch_us(ts) / 600000000.0) * 600000000 AS BIGINT)
         AS window_start_us,
       CAST(FLOOR(epoch_us(ts) / 600000000.0) * 600000000 + 600000000
            AS BIGINT) AS window_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS value_sum,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1, 2
""")
def w_tumbling_event_metrics(spark, sf_dir):
    """10-minute tumbling event-time windows — the BATCH twin of
    ``engine/streaming.py::stream_windowed_event_metrics`` (same
    ``F.window`` operator the watermarked stream runs; batch/stream
    parity asserted in tests/test_streaming.py).

    Oracle note: Spark tumbling windows are epoch-aligned (FLOOR
    toward -inf), so the DuckDB twin derives the window bounds with
    ``FLOOR(us / width) * width`` — NOT ``us - us % width``, whose
    DuckDB ``%`` truncates toward zero and would misalign pre-1970
    timestamps (ADVICE r4).  epoch_us values stay < 2^53, so the
    double division is exact after FLOOR; no timestamp-to-string
    formatting anywhere.

    Scale shape: one map-side-combinable groupBy on the window start
    (uniform keys — time buckets); countDistinct rewrites to a two-
    phase expand+agg, still partial-aggregated."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window(F.col("ts").cast("timestamp"),
                           "10 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("value_sum"),
             F.countDistinct("user_id").cast("long").alias("n_users"))
        .select(F.unix_micros("w.start").alias("window_start_us"),
                F.unix_micros("w.end").alias("window_end_us"),
                "n_events", "value_sum", "n_users")
    )


@register("w_session_window_agg", sql="""
WITH g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) IS NULL
                OR epoch_us(ts) - epoch_us(LAG(ts) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id))
                   >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events),
s AS (
  SELECT user_id, ts, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM g)
SELECT user_id,
       CAST(MIN(epoch_us(ts)) AS BIGINT) AS session_start_us,
       CAST(MAX(epoch_us(ts)) + 1800000000 AS BIGINT) AS session_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS value_sum
FROM s GROUP BY user_id, sid
""")
def w_session_window_agg(spark, sf_dir):
    """Per-user session windows (30-minute gap) via native
    ``session_window`` — the BATCH twin of
    ``engine/streaming.py::stream_sessionize`` (same operator, same
    gap; batch/stream parity asserted in tests/test_streaming.py).

    Semantics pinned against the oracle: a session's window is
    [first_ts, last_ts + gap); an event exactly ``gap`` after the
    previous one starts a NEW session (Spark's end bound is exclusive,
    hence the oracle's ``>= gap`` split).  Bounds are exact BIGINT
    microseconds on both sides.

    Scale shape: session_window is a per-user sort + merge — one
    Exchange on user_id; state per task bounded by that user's events
    (the skew dial for a hot user is the same time-bucket trick as
    ``j_events_asof_bucketed``)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window(F.col("ts").cast("timestamp"),
                                   "30 minutes").alias("w"),
                  "user_id")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("value_sum"))
        .select("user_id",
                F.unix_micros("w.start").alias("session_start_us"),
                F.unix_micros("w.end").alias("session_end_us"),
                "n_events", "value_sum")
    )
