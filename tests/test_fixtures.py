"""Guard rails for the fixture-backed oracles (fixtures/expected/):

1. freshness — the committed parquet must equal what the pure-Python
   oracles produce from the CURRENT testdata + generator (if the driver
   ever regenerates /root/testdata differently, this fails loudly
   instead of silently flunking the correctness gate);
2. dtype parity — the DuckDB oracle result's Arrow schema must match
   the Spark query's schema type-for-type (the driver compares
   schemas, not just values).
"""

from __future__ import annotations

import duckdb
import pytest

FIXTURE_DIR = "/root/repo/fixtures/expected"
SF_DIR = "/root/testdata/sf0.001"
# full twin recompute per SF: sf0.001+sf0.01 are ~1.5 s combined;
# sf0.1 takes ~2 min (loop-based layout oracle over 5k docs) and is
# covered by the checksum-manifest test below instead (ADVICE r2 #5)
RECOMPUTE_SFS = ["sf0.001", "sf0.01"]

FIXTURE_QUERIES = [
    "extract_spans", "extract_doc_stats", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_simhash_pairs", "dedup_jaccard_verified",
    "ann_lsh_bucketed", "ann_lsh_multiprobe", "s1_corpus_probe",
    "j_media_asset_join", "dedup_embedding_verified",
]


def _marker(sf_dir: str) -> int:
    return duckdb.sql(
        f"SELECT SUM(n_chars) FROM "
        f"read_parquet('{sf_dir}/documents.parquet')").fetchone()[0]


def _slice(name: str, m: int):
    return duckdb.sql(
        f"SELECT * EXCLUDE (_corpus) FROM "
        f"read_parquet('{FIXTURE_DIR}/{name}.parquet') "
        f"WHERE _corpus = {m}").fetchall()


@pytest.mark.parametrize("sf", RECOMPUTE_SFS)
def test_sketch_fixtures_fresh(sf):
    from tests import oracle_sketches as OS
    sf_dir = f"/root/testdata/{sf}"
    m = _marker(sf_dir)
    docs = duckdb.sql(
        f"SELECT doc_id, lang, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet') "
        f"ORDER BY doc_id").fetchall()
    dt = [(d, t) for d, _, t in docs]
    assert sorted(_slice("dedup_minhash_lsh", m)) == \
        OS.minhash_lsh_pairs(dt)
    assert sorted(_slice("dedup_simhash_pairs", m)) == OS.simhash_pairs(dt)
    assert sorted(_slice("dedup_jaccard_verified", m)) == \
        OS.jaccard_verified_pairs(docs)
    sigs = sorted((d, s) for d, t in dt
                  if (s := OS.simhash_sig(t)) is not None)
    assert sorted(_slice("dedup_simhash", m)) == sigs


@pytest.mark.parametrize("sf", RECOMPUTE_SFS)
def test_ann_fixtures_fresh(sf):
    import gen_fixtures as G
    from tests import oracle_sketches as OS
    m = _marker(f"/root/testdata/{sf}")
    vecs = G.emb_table(sf)
    assert sorted(_slice("ann_lsh_bucketed", m)) == \
        sorted(OS.ann_lsh_bucketed_rows(vecs))
    assert sorted(_slice("ann_lsh_multiprobe", m)) == \
        sorted(OS.ann_multiprobe_rows(vecs))
    assert sorted(_slice("dedup_embedding_verified", m)) == \
        OS.embedding_verified_pairs(vecs)
    assert sorted(_slice("ann_pq_topk", m)) == \
        sorted(OS.pq_topk_rows(vecs))


def test_manifest_fresh():
    """ADVICE r2 #5: slices not recomputed above (sf0.1's loop-based
    layout oracle takes ~2 min) are still freshness-guarded: the baked
    CHECKSUMS.json pins (a) the twin SOURCE digest, (b) every SF's
    testdata marker, (c) a content hash of every fixture slice.  Any of
    those drifting without a re-bake fails here, not at the driver
    gate."""
    import glob
    import json
    import os

    import gen_fixtures as G
    with open(f"{FIXTURE_DIR}/CHECKSUMS.json") as f:
        man = json.load(f)
    assert man["src_sha"] == G.src_digest(), \
        "oracle-twin sources changed since bake — rerun gen_fixtures.py"
    for sf, m in man["markers"].items():
        assert G.marker(sf) == m, \
            f"testdata {sf} regenerated — rerun gen_fixtures.py"
    slice_files = sorted(glob.glob(f"{FIXTURE_DIR}/*.parquet"))
    assert {os.path.basename(p)[:-len('.parquet')] for p in slice_files} \
        == set(man["slices"])
    for p in slice_files:
        name = os.path.basename(p)[:-len(".parquet")]
        for mk, digest in man["slices"][name].items():
            assert G.slice_digest(p, int(mk)) == digest, \
                f"{name} slice _corpus={mk} differs from bake"
    for name, digest in man["inputs"].items():
        assert G.slice_digest(
            os.path.join(G.INPUTS, f"{name}.parquet"), None) == digest, \
            f"fixture input {name} differs from bake"


def test_extract_fixtures_fresh():
    from ai_pdf_ocr_spark.fixtures.generate import make_documents
    from tests import oracle_sketches as OS
    m = _marker(SF_DIR)
    expect = []
    for d in make_documents(200, seed=42):
        out, _, _ = OS.extract_doc_rows(d)
        for pos, (kind, text, ref, order) in enumerate(out):
            expect.append((d["doc_id"], pos, kind, text, ref, order))
    assert sorted(_slice("extract_spans", m)) == sorted(expect)


def test_corpus_fixture_fresh():
    from ai_pdf_ocr_spark.fixtures.generate import make_documents
    m = _marker(SF_DIR)
    n = duckdb.sql(
        f"SELECT COUNT(*), SUM(LENGTH(spans)) FROM "
        f"read_parquet('{FIXTURE_DIR}/corpus.parquet') "
        f"WHERE _corpus = {m}").fetchone()
    docs = make_documents(200, seed=42)
    assert n[0] == len(docs)
    assert n[1] == sum(len(d["spans"]) for d in docs)


_ARROW_OF_SPARK = {"bigint": "int64", "int": "int32", "double": "double",
                   "float": "float", "string": "string",
                   "boolean": "bool"}


@pytest.mark.parametrize("name", FIXTURE_QUERIES)
def test_fixture_oracle_dtypes_match_spark(spark, name):
    from ai_pdf_ocr_spark.queries import all_queries
    q = all_queries()[name]
    sdf = q.fn(spark, SF_DIR)
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    tbl = con.execute(q.sql).arrow()
    duck_types = {f.name: str(f.type) for f in tbl.schema}
    for col, styp in sdf.dtypes:
        assert duck_types[col] == _ARROW_OF_SPARK[styp], \
            f"{name}.{col}: spark {styp} vs duckdb {duck_types[col]}"


def test_jaccard_verified_vectorized_equals_loop():
    """The numpy-vectorized verify must equal a straightforward
    set-intersection loop bit-for-bit (same candidates, same floats)."""
    from tests import oracle_sketches as OS
    docs = duckdb.sql(
        f"SELECT doc_id, lang, text FROM "
        f"read_parquet('{SF_DIR}/documents.parquet') "
        f"ORDER BY doc_id").fetchall()
    fast = OS.jaccard_verified_pairs(docs)
    toks = {d: set(OS.tokens_py(t)) for d, _, t in docs}
    lang = {d: lg for d, lg, _ in docs}
    by_lang: dict = {}
    for d, lg, _ in docs:
        by_lang.setdefault(lg, []).append(d)
    cands = set()
    for ms in by_lang.values():
        cands |= OS.lsh_candidate_pairs(
            {d: sorted(toks[d]) for d in ms}, 32, 16, 1024,
            sub_band_levels=3)
    slow = []
    for d1, d2 in sorted(cands):
        if lang[d1] != lang[d2]:
            continue
        inter = len(toks[d1] & toks[d2])
        union = len(toks[d1]) + len(toks[d2]) - inter
        if union and inter / union >= 0.5:
            slow.append((d1, d2, OS.spark_round(inter / union)))
    assert fast == sorted(slow)


def test_subbanding_recovers_recall_on_dense_corpus():
    """VERDICT r3 ask #6 'done' criterion: on the dense sf0.1 corpus
    (where V_BAND_CAP buckets genuinely overflow) recursive
    sub-banding must recover candidate recall vs the r3 drop-cap —
    measured against EXACT same-lang Jaccard ground truth (all-pairs
    verify, no LSH).  Pure-Python twins, no Spark."""
    from itertools import combinations

    from tests import oracle_sketches as OS
    docs = duckdb.sql(
        "SELECT doc_id, lang, text FROM "
        "read_parquet('/root/testdata/sf0.1/documents.parquet') "
        "ORDER BY doc_id").fetchall()
    by_lang: dict = {}
    for d, lg, _ in docs:
        by_lang.setdefault(lg, []).append(d)
    all_pairs = {p for ms in by_lang.values()
                 for p in combinations(sorted(ms), 2)}
    exact = {(a, b) for a, b, _ in OS.verify_jaccard_pairs(docs, all_pairs)}
    assert exact, "dense corpus must have true near-dup pairs"
    toks = {d: sorted(set(OS.tokens_py(t))) for d, _, t in docs}

    def lang_blocked(levels):
        out = set()
        for ms in by_lang.values():
            out |= OS.lsh_candidate_pairs(
                {d: toks[d] for d in ms}, 32, 16, 1024,
                sub_band_levels=levels)
        return out

    capped = lang_blocked(0)
    split = lang_blocked(3)
    r_capped = len(capped & exact) / len(exact)
    r_split = len(split & exact) / len(exact)
    # a verified candidate that IS a true pair always survives the
    # exact verify, so candidate recall == operator recall.  Context
    # for the floors: this corpus is pathologically LSH-hostile — 72%
    # of ALL same-lang pairs are true near-dups (2.29M of 3.2M), so
    # most band buckets overflow and survival requires agreeing on
    # EXTRA bands (P ~ s^2 each).  Measured r4 figures (lang-blocked
    # banding): drop-cap 0.480 -> sub-banded 0.914, candidates a
    # strict superset; the r3 shipping scheme (drop-cap, no lang
    # blocking) measured 0.215.
    assert capped <= split, "sub-banding must never lose a candidate"
    assert r_split > r_capped + 0.25, (r_split, r_capped)
    assert r_split >= 0.85, (r_split, r_capped, len(exact))
