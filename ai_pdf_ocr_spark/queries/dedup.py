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
_JACCARD_SQL = """
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
"""


def token_masks(spark, d, n_salt=None):
    """(doc_id, lang, p, sz, m0..m{C-1}): each doc's distinct-token set
    as C=ceil(|vocab|/64) bitmask longs plus a salt partition ``p``.

    The vocabulary gets dense ids once (distinct tokens -> row_number;
    the single-partition window and the one driver-side ``count()`` are
    both O(|vocab|), a metadata-sized job — same class as the bounded
    collects in engine/partitioning.py).  Token->id is a broadcast join
    (never a per-row literal map, CLAUDE.md perf trap #1)."""
    from pyspark.sql import Window

    tok = d.select("doc_id", "lang",
                   F.explode(F.array_distinct(_tokens(F.col("text"))))
                   .alias("tok"))
    vocab_df = tok.select("tok").distinct().persist()
    n_vocab = vocab_df.count()  # bounded: |vocab| rows
    n_chunks = max(1, (n_vocab + 63) // 64)
    vocab = vocab_df.select(
        "tok", (F.row_number().over(Window.orderBy("tok")) - 1).alias("tid"))
    mask_aggs = [
        F.bit_or(
            F.when(F.floor(F.col("tid") / 64) == c,
                   F.expr("shiftleft(CAST(1 AS BIGINT), "
                          "CAST(tid % 64 AS INT))"))
            .otherwise(F.lit(0).cast("long"))).alias(f"m{c}")
        for c in range(n_chunks)
    ]
    masks = (tok.join(F.broadcast(vocab), "tok")
             .groupBy("doc_id", "lang")
             .agg(F.count("*").alias("sz"), *mask_aggs))
    if n_salt:
        masks = masks.withColumn(
            "p", F.pmod(F.xxhash64("doc_id"), F.lit(n_salt)).cast("int"))
    return masks, n_chunks


def _mask_jaccard(left, right, n_chunks):
    inter = None
    for c in range(n_chunks):
        t = F.bit_count(F.col(f"l.m{c}").bitwiseAND(F.col(f"r.m{c}")))
        inter = t if inter is None else inter + t
    union = F.col("l.sz") + F.col("r.sz") - inter
    return inter.cast("double") / union


_JACCARD_SALT = 8  # triangle-join fan: S*(S+1)/2 keys per lang block


@register("dedup_ngram_jaccard", sql=_JACCARD_SQL)
def dedup_ngram_jaccard(spark, sf_dir):
    """Token-set Jaccard near-dup pairs (blocked by lang, threshold 0.5).

    Exact all-pairs within a lang block, with two scale defenses:

    1. **Bitmask token sets.** Each doc's distinct tokens become
       ceil(|vocab|/64) bitmask longs via a broadcast vocab join; the
       per-pair cost is AND+popcount over longs inside whole-stage
       codegen.  Replaces the r1 token inverted-index join whose
       shuffle was Σ df² over tokens (115M rows, 23.6s = 68% of the
       bench at sf0.1 — VERDICT r1); now the pair join shuffles n
       skinny mask rows per side.
    2. **Triangle salting.** A lang-only equi-join hash-partitions on
       5 lang keys, so one task computes a whole block's n²/2 pairs.
       Each doc gets p = hash(doc_id) % S; the left side replicates to
       keys (p, q>=p), the right to (q<=p, p), so every unordered pair
       lands on exactly one of the S(S+1)/2 sub-keys per lang — skew
       becomes 36-way parallel instead of 1 task per lang.

    Exact all-pairs is still Ω(n²/S) per block by definition — at 10^12
    docs use ``dedup_jaccard_verified`` (MinHash-LSH candidates ->
    exact bitmask verify on candidates only, same predicate)."""
    d = load(spark, sf_dir, "documents")
    masks, n_chunks = token_masks(spark, d, n_salt=_JACCARD_SALT)
    cols = ["doc_id", "lang", "sz"] + [f"m{c}" for c in range(n_chunks)]
    left = masks.select(
        *cols, F.col("p").alias("kp"),
        F.explode(F.sequence(F.col("p"), F.lit(_JACCARD_SALT - 1)))
        .alias("kq")).alias("l")
    right = masks.select(
        *cols, F.col("p").alias("kq"),
        F.explode(F.sequence(F.lit(0), F.col("p"))).alias("kp")).alias("r")
    jac = _mask_jaccard(left, right, n_chunks)
    pair_once = (F.col("l.kp") < F.col("r.kq")) | \
        (F.col("l.doc_id") < F.col("r.doc_id"))
    return (
        left.join(right,
                  (F.col("l.lang") == F.col("r.lang"))
                  & (F.col("l.kp") == F.col("r.kp"))
                  & (F.col("l.kq") == F.col("r.kq"))
                  & pair_once)
        .where(jac >= 0.5)
        .select(F.least("l.doc_id", "r.doc_id").alias("d1"),
                F.greatest("l.doc_id", "r.doc_id").alias("d2"),
                F.round(jac, 4).alias("jaccard"))
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
