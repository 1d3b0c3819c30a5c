"""Corpus-level training-data pipeline operators: deterministic split
assignment and eval-set decontamination.

Both are plain-SQL-expressible (full DuckDB oracle twins).  The split
hash is arithmetic (Knuth multiplicative), not a Spark builtin, so the
SAME expression runs in both engines at every scale — the standard way
production pipelines pin train/val/test membership to content identity
rather than to file layout or sampling RNG state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load, register
from .dedup import _spread, _tokens

# Lehmer/MINSTD multiplicative hash over the Mersenne prime 2^31-1:
# identical BIGINT arithmetic in Spark and DuckDB AND overflow-safe at
# any doc_id — (id % p) * 48271 < 2^47, far inside int64, so ANSI-mode
# Spark never throws at 10^12-scale ids (a plain id*K mod 2^32 would
# overflow long multiplication there).
_A = 48271
_P = 2147483647


@register("sample_hash_split", sql=f"""
SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (
  SELECT lang, n_chars,
         CASE WHEN bucket < 80 THEN 'train'
              WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
  FROM (SELECT lang, n_chars,
               ((doc_id % {_P}) * {_A}) % {_P} % 100 AS bucket
        FROM documents))
GROUP BY lang, split
""")
def sample_hash_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split by content-id hash
    (reservoir/sampleBy alternatives are RNG- and partitioning-
    dependent; a multiplicative id hash gives every engine and every
    rerun the same membership).  Output: per (lang, split) doc counts
    — the assignment itself is the per-row ``split`` column."""
    d = load(spark, sf_dir, "documents")
    bucket = F.pmod(F.pmod(F.pmod("doc_id", F.lit(_P)) * F.lit(_A),
                           F.lit(_P)), F.lit(100))
    split = (F.when(bucket < 80, "train")
             .when(bucket < 90, "val").otherwise("test"))
    return (d.select("lang", "n_chars", split.alias("split"))
            .groupBy("lang", "split")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("total_chars")))


@register("rollup_corpus_stats", sql="""
SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(AVG(n_chars), 4) AS avg_chars
FROM documents GROUP BY ROLLUP (source, lang)
""")
def rollup_corpus_stats(spark, sf_dir):
    """Hierarchical corpus dashboard: per-(source, lang), per-source,
    and grand-total stats in ONE pass via ROLLUP grouping sets — the
    release-report aggregation every corpus pipeline maintains, without
    3 separate scans.  Integer sums keep the avg deterministic across
    partitionings (exact long sum / count)."""
    d = load(spark, sf_dir, "documents")
    return (d.rollup("source", "lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("total_chars"),
                 F.round(F.avg("n_chars"), 4).alias("avg_chars")))


_EVAL_MAX_ID = 10  # doc_id < 10 plays the held-out benchmark set


@register("decontaminate_ngram_overlap", sql=f"""
WITH toks AS (
  SELECT doc_id,
         LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'),
                     t -> LENGTH(t) > 0) AS ts
  FROM documents
), sh AS (
  SELECT doc_id, UNNEST(LIST_DISTINCT(
           [ARRAY_TO_STRING(ts[CAST(i AS INT):CAST(i + 2 AS INT)], ' ')
            FOR i IN GENERATE_SERIES(1, GREATEST(LENGTH(ts) - 2, 1))]))
         AS shingle
  FROM toks
)
SELECT tr.doc_id,
       CAST(COUNT(DISTINCT tr.shingle) AS BIGINT) AS n_shared_shingles,
       CAST(COUNT(DISTINCT ev.doc_id) AS BIGINT) AS n_eval_docs
FROM sh tr JOIN sh ev ON tr.shingle = ev.shingle
WHERE tr.doc_id >= {_EVAL_MAX_ID} AND ev.doc_id < {_EVAL_MAX_ID}
  AND LENGTH(tr.shingle) > 0 AND LENGTH(ev.shingle) > 0
GROUP BY tr.doc_id
""")
def decontaminate_ngram_overlap(spark, sf_dir):
    """Test-set decontamination screen: training docs sharing >=1
    word-3-gram shingle with ANY held-out eval doc (here: doc_id <
    10), with overlap counts — the operator every training pipeline
    runs before a data release (n-gram overlap decontamination as in
    published LM training reports).

    Scale shape: the eval side is small by definition -> its shingle
    set BROADCASTS; the training side streams through the join without
    shuffling, and only (doc_id, counts) rows aggregate."""
    d = _spread(load(spark, sf_dir, "documents"))
    tokd = d.select("doc_id", _tokens(F.col("text")).alias("toks"))
    toks = F.col("toks")
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 3, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)))
    sh = (tokd.select("doc_id", F.explode(F.array_distinct(shingles))
                      .alias("shingle"))
          .where(F.length("shingle") > 0))
    ev = (sh.where(F.col("doc_id") < _EVAL_MAX_ID)
          .select(F.col("doc_id").alias("eval_doc"),
                  F.col("shingle").alias("ev_shingle")))
    tr = sh.where(F.col("doc_id") >= _EVAL_MAX_ID)
    return (tr.join(F.broadcast(ev),
                    tr.shingle == F.col("ev_shingle"))
            .groupBy("doc_id")
            .agg(F.countDistinct("shingle").alias("n_shared_shingles"),
                 F.countDistinct("eval_doc").alias("n_eval_docs")))