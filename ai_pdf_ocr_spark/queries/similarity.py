"""Similarity search over the ``embeddings`` table (vec_id, embedding
float[64], label).

 - brute-force cosine top-k: the exactness baseline, DuckDB-checked;
 - LSH-bucketed ANN (random hyperplane signs): the scale path — at
   10^9+ vectors the query only probes its own bucket, turning a full
   scan into a bucket scan; recall is checked against brute force in
   tests/test_queries.py.

The dot products use array HOFs (zip_with + aggregate) — JVM-side,
no Python UDF, no explode shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load, register


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


@register("ann_bruteforce_topk", sql="""
WITH q AS (
  SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
), flat AS (
  SELECT e.vec_id, e.label, i,
         CAST(e.embedding[i] AS DOUBLE) AS v,
         CAST(q.qe[i] AS DOUBLE) AS qv
  FROM embeddings e, q, generate_series(1, 64) g(i)
  WHERE e.vec_id <> 0
), dots AS (
  SELECT vec_id, label,
         SUM(v * qv) / (SQRT(SUM(v * v)) * SQRT(SUM(qv * qv))) AS cos
  FROM flat GROUP BY vec_id, label
)
SELECT vec_id, label, ROUND(cos, 4) AS cosine
FROM dots ORDER BY cos DESC, vec_id LIMIT 10
""")
def ann_bruteforce_topk(spark, sf_dir):
    """Exact cosine top-10 neighbors of vec_id=0 (broadcast query vec)."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.transform("embedding", lambda x: x.cast("double"))
    q = e.where(F.col("vec_id") == 0) \
        .select(emb.alias("qe"))
    scored = (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label",
                F.round(_cosine(emb, F.col("qe")), 4).alias("cosine"))
    )
    return scored.orderBy(F.desc("cosine"), "vec_id").limit(10)


@register("dedup_embedding_cosine", sql="""
WITH flat AS (
  SELECT vec_id, label, i, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, generate_series(1, 64) g(i)
), norms AS (
  SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM flat GROUP BY vec_id
), dots AS (
  SELECT a.vec_id AS v1, b.vec_id AS v2, SUM(a.v * b.v) AS dot
  FROM flat a JOIN flat b ON a.i = b.i AND a.label = b.label
                          AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
)
SELECT v1, v2, ROUND(dot / (n1.nrm * n2.nrm), 4) AS cosine
FROM dots JOIN norms n1 ON n1.vec_id = v1
          JOIN norms n2 ON n2.vec_id = v2
WHERE dot / (n1.nrm * n2.nrm) >= 0.4
ORDER BY v1, v2
""")
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs, blocked by label (the
    exactness baseline for embedding dedupe; the LSH-bucketed variant
    below is the scale path).  Pairwise only WITHIN a block — the join
    key bounds the quadratic term."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.transform("embedding", lambda x: x.cast("double"))
    v = e.select("vec_id", "label", emb.alias("emb"))
    a, b = v.alias("a"), v.alias("b")
    cos = _cosine(F.col("a.emb"), F.col("b.emb"))
    return (
        a.join(b, (F.col("a.label") == F.col("b.label"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("v1"),
                F.col("b.vec_id").alias("v2"),
                F.round(cos, 4).alias("cosine"),
                cos.alias("_raw"))
        .where(F.col("_raw") >= 0.4)
        .drop("_raw")
        .orderBy("v1", "v2")
    )


N_PLANES = 8


@register("ann_lsh_bucketed")  # xxhash64-seeded planes: rows-only check
def ann_lsh_bucketed(spark, sf_dir):
    """Random-hyperplane LSH bucketing: 8-bit sign signature per vector
    (deterministic pseudo-planes from xxhash64(dim,plane)), then top-5
    per bucket by cosine to the bucket centroid.

    At scale: bucket id is the shuffle key (2^8 buckets x ~n/256
    vectors); a query probes one bucket instead of the full corpus."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.transform("embedding", lambda x: x.cast("double"))

    def plane_dot(vec, p):
        # pseudo-random unit-ish plane: component j = hash(j,p) scaled
        return F.aggregate(
            F.zip_with(vec,
                       F.transform(F.sequence(F.lit(0), F.lit(63)),
                                   lambda j: (F.pmod(F.xxhash64(
                                       F.concat_ws(":", j.cast("string"),
                                                   F.lit(str(p)))),
                                       F.lit(2001)) - 1000.0) / 1000.0),
                       lambda x, w: x * w),
            F.lit(0.0), lambda acc, v: acc + v)

    sig = None
    for p in range(N_PLANES):
        bit = F.when(plane_dot(emb, p) >= 0, F.lit(1 << p)).otherwise(0)
        sig = bit if sig is None else sig + bit
    bucketed = e.select("vec_id", "label", emb.alias("emb"),
                        sig.alias("bucket"))
    # bucket centroid as 64 avg aggregates: algebraic, map-side
    # combinable, O(1) state per bucket (collect_list would not scale)
    cent = (
        bucketed.groupBy("bucket")
        .agg(*[F.avg(F.element_at(F.col("emb"), j + 1)).alias(f"c{j}")
               for j in range(64)])
        .select("bucket", F.array(*[F.col(f"c{j}")
                                    for j in range(64)]).alias("centroid"))
    )
    from pyspark.sql import Window
    w = Window.partitionBy("bucket").orderBy(F.desc("cos_c"), "vec_id")
    return (
        bucketed.join(cent, "bucket")
        .withColumn("cos_c", F.round(_cosine(F.col("emb"),
                                             F.col("centroid")), 4))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("bucket", "rank", "vec_id", "label", "cos_c")
        .orderBy("bucket", "rank")
    )
