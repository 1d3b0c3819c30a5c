"""Deduplication operators over the ``documents`` table — the
training-data-pipeline layer (exact, n-gram Jaccard, MinHash+LSH,
SimHash).  Exact and Jaccard have DuckDB oracles; the hash-sketch
variants use Spark's xxhash64 (no DuckDB twin) and are checked
rows-only by the driver plus structural tests in tests/test_queries.py.

Scale stance: every variant is shuffle-bounded —
 - exact dedupe groups on a 128-bit digest (uniform keys, no skew);
 - Jaccard candidate generation is blocked by (lang) and joined on
   shared tokens, never an unblocked O(n^2) cross join;
 - MinHash/LSH shuffles only (band_key -> doc list) pairs;
 - SimHash is a single groupBy over exploded tokens with 64 algebraic
   bit-count aggregates (map-side combinable).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load, register

_NORM = r"\s+"


def _tokens(col):
    """lowercased whitespace tokens, empties dropped."""
    return F.filter(F.split(F.lower(F.trim(col)), _NORM),
                    lambda t: F.length(t) > 0)


# ------------------------------------------------------------- exact
@register("dedup_exact", sql="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS n_redundant
FROM (
  SELECT MD5(LOWER(TRIM(text))) AS h, COUNT(*) AS n,
         MIN(doc_id) AS keeper
  FROM documents GROUP BY h HAVING COUNT(*) > 1)
""")
def dedup_exact(spark, sf_dir):
    """Exact near-normalized dedupe: hash-groupBy on md5(lower(trim))."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.lower(F.trim("text"))).alias("h"))
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("keeper"))
        .where(F.col("n") > 1)
        .agg(F.count("*").alias("n_groups"),
             F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).cast("long")
             .alias("n_redundant"))
    )


# -------------------------------------------------- n-gram Jaccard
@register("dedup_ngram_jaccard", sql="""
WITH tok AS (
  SELECT doc_id, lang, UNNEST(LIST_DISTINCT(
           LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'),
                       t -> LENGTH(t) > 0))) AS tok
  FROM documents
), sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
  FROM tok a JOIN tok b ON a.tok = b.tok AND a.lang = b.lang
                        AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT d1, d2, ROUND(CAST(c AS DOUBLE) / (s1.sz + s2.sz - c), 4) AS jaccard
FROM common JOIN sizes s1 ON s1.doc_id = d1
            JOIN sizes s2 ON s2.doc_id = d2
WHERE CAST(c AS DOUBLE) / (s1.sz + s2.sz - c) >= 0.5
""")
def dedup_ngram_jaccard(spark, sf_dir):
    """Token-set Jaccard near-dup pairs (blocked by lang, threshold 0.5).

    Candidate pairs come from an inverted-index join on shared tokens —
    the standard scalable formulation (only docs sharing >=1 token are
    ever compared; the token join is the shuffle).

    Measured alternative (rejected): a lang-blocked dense pair join
    with JVM-side ``array_intersect`` looked cheaper on paper for this
    corpus's tiny vocabulary (31 distinct tokens -> Σdf² = 115M token-
    join rows vs 2.5M dense pairs at sf0.1), but ran 4x SLOWER (86s vs
    20s at local[32]) — per-pair array materialization costs more than
    shuffling skinny (tok, doc) rows through a count agg.  At 10^12
    docs neither exact method runs corpus-wide: MinHash-LSH
    (``dedup_minhash_lsh``) generates candidates and an exact check
    verifies only those."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang",
                   F.explode(F.array_distinct(_tokens(F.col("text"))))
                   .alias("tok"))
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = tok.alias("a")
    b = tok.alias("b")
    common = (
        a.join(b, (F.col("a.tok") == F.col("b.tok"))
               & (F.col("a.lang") == F.col("b.lang"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"),
                 F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("c"))
    )
    s1 = sizes.alias("s1")
    s2 = sizes.alias("s2")
    jac = F.col("c").cast("double") / (F.col("s1.sz") + F.col("s2.sz")
                                       - F.col("c"))
    return (
        common.join(s1, F.col("d1") == F.col("s1.doc_id"))
        .join(s2, F.col("d2") == F.col("s2.doc_id"))
        .where(jac >= 0.5)
        .select("d1", "d2", F.round(jac, 4).alias("jaccard"))
    )


# ---------------------------------------------------- MinHash + LSH
N_HASHES = 16
N_BANDS = 4  # 4 rows per band
# 31-bit Mersenne prime keeps a*h+b well inside int64 under ANSI mode
_MERSENNE = (1 << 31) - 1


@register("dedup_minhash_lsh")  # xxhash64 has no DuckDB twin: rows-only
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash (16 perms) + LSH banding (4 bands x 4 rows) candidate
    pairs over word-3-gram shingles.

    shingle -> xxhash64 -> 16 affine permutations mod a Mersenne prime
    -> per-doc min -> band keys -> docs sharing a band key are
    candidates.  Only (band_key, doc_id) pairs shuffle; no O(n^2)."""
    d = load(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    # word 3-gram shingles via transform over an index range (array HOFs,
    # no explode until the shingle stream is final)
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 3, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)))
    sh = (d.select("doc_id", F.explode(F.array_distinct(shingles))
                   .alias("shingle"))
          .where(F.length("shingle") > 0)
          .withColumn("h", F.pmod(F.xxhash64("shingle"),
                                  F.lit(_MERSENNE))))
    # 16 deterministic affine perms: h_i = (a_i*h + b_i) mod p
    perms = [(2 * i + 1, 7919 * (i + 1)) for i in range(N_HASHES)]
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b),
                     F.lit(_MERSENNE))).alias(f"mh{i}")
        for i, (a, b) in enumerate(perms)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    rows_per_band = N_HASHES // N_BANDS
    # unpivot the bands with ONE explode over the signature row — a
    # union of per-band selects re-executes the shingle aggregation
    # once per band (measured: 4x the signature compute, 10 exchanges
    # vs 5 in the executed plan)
    band_structs = F.array(*[
        F.struct(
            F.lit(bi).alias("band"),
            F.xxhash64(F.concat_ws("_", *[
                f"mh{bi * rows_per_band + r}" for r in range(rows_per_band)
            ])).alias("band_key"))
        for bi in range(N_BANDS)
    ])
    banded = (sig.select("doc_id", F.explode(band_structs).alias("bk"))
              .select("doc_id", F.col("bk.band").alias("band"),
                      F.col("bk.band_key").alias("band_key")))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("d1"),
                F.col("b.doc_id").alias("d2"))
        .distinct()
        .orderBy("d1", "d2")
    )


# ----------------------------------------------------------- SimHash
@register("dedup_simhash")  # xxhash64-based: rows-only check
def dedup_simhash(spark, sf_dir):
    """64-bit SimHash per document from token hashes: one exploded
    groupBy with 64 algebraic sign-sum aggregates, fully map-side
    combinable; emits (doc_id, simhash as hex)."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens(F.col("text")))
                   .alias("tok"))
    h = F.xxhash64("tok")
    aggs = [
        F.sum(F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1)
              .otherwise(-1)).alias(f"b{i}")
        for i in range(64)
    ]
    sums = tok.groupBy("doc_id").agg(*aggs)
    bits = None
    for i in range(64):
        # two's-complement assembly: bit 63 contributes -(2^63)
        term = F.when(F.col(f"b{i}") > 0,
                      F.lit(2 ** i if i < 63 else -(2 ** 63))
                      .cast("long")).otherwise(F.lit(0).cast("long"))
        bits = term if bits is None else bits + term
    return sums.select("doc_id", bits.alias("simhash")).orderBy("doc_id")
