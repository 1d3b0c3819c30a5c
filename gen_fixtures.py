"""Materialize the expected-output fixtures that back the DuckDB
oracles of the non-SQL-expressible operators (greedy layout kernel,
xxhash64 sketches) plus the two fixture input tables (raw interleaved
corpus, media-asset dimension).

Every expected-output table is computed by an INDEPENDENT pure-Python
implementation — tests/oracle.py (the reference-parity extraction SPEC)
and tests/oracle_sketches.py (XXH64 twins) — never by the Spark code
under test.  Slices for each SF are stacked in one parquet, tagged
``_corpus`` = SUM(n_chars) of that SF's ``documents`` table so the
static oracle SQL (queries/__init__.py::fixture_sql) dispatches at
whatever SF the gate runs.

Run: ``python gen_fixtures.py``   (idempotent; ~30 s)
Freshness is asserted by tests/test_fixtures.py — if the driver ever
regenerates /root/testdata differently, that test fails loudly.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ai_pdf_ocr_spark.flagship import corpus_size  # noqa: E402
from ai_pdf_ocr_spark.fixtures.generate import make_documents  # noqa: E402
from ai_pdf_ocr_spark.kernel.xxh64 import xxhash64_str  # noqa: E402
from tests import oracle_sketches as OS  # noqa: E402

TESTDATA = "/root/testdata"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "fixtures", "expected")
INPUTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "fixtures", "inputs")

TEXT_SFS = ("sf0.001", "sf0.01", "sf0.1")    # corpus-shaped fixtures
SKETCH_SFS = ("sf0.001", "sf0.01", "sf0.1")  # minhash/simhash/ann slices
JV_SFS = SKETCH_SFS  # numpy-vectorized verify bakes sf0.1 in seconds

MIMES = ("image/png", "image/jpeg", "video/mp4", "audio/wav")


def marker(sf: str) -> int:
    return duckdb.sql(
        f"SELECT SUM(n_chars) FROM "
        f"read_parquet('{TESTDATA}/{sf}/documents.parquet')").fetchone()[0]


def docs_table(sf: str):
    return duckdb.sql(
        f"SELECT doc_id, lang, text FROM "
        f"read_parquet('{TESTDATA}/{sf}/documents.parquet') "
        f"ORDER BY doc_id").fetchall()


def emb_table(sf: str):
    rows = duckdb.sql(
        f"SELECT vec_id, embedding, label FROM "
        f"read_parquet('{TESTDATA}/{sf}/embeddings.parquet') "
        f"ORDER BY vec_id").fetchall()
    # float32 -> exact float64, matching Spark's cast
    return [(v, [float(x) for x in e], lab) for v, e, lab in rows]


SPAN_T = pa.struct([("kind", pa.string()), ("text", pa.string()),
                    ("media_ref", pa.string()), ("offset", pa.int32())])


def _write_to(dirname: str, name: str, cols: dict, types: dict):
    arrays, fields = [], []
    for k, v in cols.items():
        t = types[k]
        arrays.append(pa.array(v, type=t))
        fields.append(pa.field(k, t))
    pq.write_table(pa.table(arrays, schema=pa.schema(fields)),
                   os.path.join(dirname, f"{name}.parquet"))
    print(f"  {name}.parquet: {len(arrays[0])} rows")


def _write(name: str, cols: dict, types: dict):
    _write_to(OUT, name, cols, types)


def corpus_and_extract():
    corpus = {k: [] for k in ("_corpus", "doc_id", "spans")}
    spans_rows = {k: [] for k in ("_corpus", "doc_id", "pos", "kind",
                                  "text", "media_ref", "order")}
    stats_rows = {k: [] for k in (
        "_corpus", "doc_id", "n_spans", "n_text_spans", "n_media_spans",
        "document_text", "document_length", "span_count_in", "malformed",
        "merged_away", "dedup_removed", "filtered")}
    refs = set()
    for sf in TEXT_SFS:
        m = marker(sf)
        docs = make_documents(corpus_size(f"{TESTDATA}/{sf}"), seed=42)
        for d in docs:
            corpus["_corpus"].append(m)
            corpus["doc_id"].append(d["doc_id"])
            corpus["spans"].append(
                [{"kind": s["kind"], "text": s["text"],
                  "media_ref": s["media_ref"], "offset": s["offset"]}
                 for s in d["spans"]])
            refs.update(s["media_ref"] for s in d["spans"]
                        if s["media_ref"] is not None)
            out, document_text, met = OS.extract_doc_rows(d)
            for pos, (kind, text, ref, order) in enumerate(out):
                spans_rows["_corpus"].append(m)
                spans_rows["doc_id"].append(d["doc_id"])
                spans_rows["pos"].append(pos)
                spans_rows["kind"].append(kind)
                spans_rows["text"].append(text)
                spans_rows["media_ref"].append(ref)
                spans_rows["order"].append(order)
            n_text = sum(1 for k, _, _, _ in out if k == "text")
            stats_rows["_corpus"].append(m)
            stats_rows["doc_id"].append(d["doc_id"])
            stats_rows["n_spans"].append(len(out))
            stats_rows["n_text_spans"].append(n_text)
            stats_rows["n_media_spans"].append(len(out) - n_text)
            stats_rows["document_text"].append(document_text[:64])
            stats_rows["document_length"].append(len(document_text))
            for k in ("span_count_in", "malformed", "merged_away",
                      "dedup_removed", "filtered"):
                stats_rows[k].append(met[k])
    _write("corpus", corpus,
           {"_corpus": pa.int64(), "doc_id": pa.string(),
            "spans": pa.list_(SPAN_T)})
    _write("extract_spans", spans_rows,
           {"_corpus": pa.int64(), "doc_id": pa.string(),
            "pos": pa.int32(), "kind": pa.string(), "text": pa.string(),
            "media_ref": pa.string(), "order": pa.int32()})
    _write("extract_doc_stats", stats_rows,
           {"_corpus": pa.int64(), "doc_id": pa.string(),
            "n_spans": pa.int32(), "n_text_spans": pa.int32(),
            "n_media_spans": pa.int32(), "document_text": pa.string(),
            "document_length": pa.int32(), "span_count_in": pa.int64(),
            "malformed": pa.int64(), "merged_away": pa.int64(),
            "dedup_removed": pa.int64(), "filtered": pa.int64()})
    # media-asset dimension: deterministic attrs per distinct ref
    rs = sorted(refs)
    _write_to(INPUTS, "media_assets",
           {"media_ref": rs,
            "mime": [MIMES[xxhash64_str("mime:" + r) % 4] for r in rs],
            "bytes": [xxhash64_str("bytes:" + r) % 999000 + 1000
                      for r in rs]},
           {"media_ref": pa.string(), "mime": pa.string(),
            "bytes": pa.int64()})


def sketches():
    mh = {k: [] for k in ("_corpus", "d1", "d2")}
    sh = {k: [] for k in ("_corpus", "doc_id", "simhash")}
    shp = {k: [] for k in ("_corpus", "d1", "d2", "hamming")}
    jv = {k: [] for k in ("_corpus", "d1", "d2", "jaccard")}
    ce = {k: [] for k in ("_corpus", "doc_id", "epoch", "dup_exact",
                          "dup_near")}
    for sf in SKETCH_SFS:
        m = marker(sf)
        docs = docs_table(sf)
        for d, e, de, dn in OS.cross_epoch_flags(
                [(d, t) for d, _, t in docs]):
            ce["_corpus"].append(m)
            ce["doc_id"].append(d)
            ce["epoch"].append(e)
            ce["dup_exact"].append(de)
            ce["dup_near"].append(dn)
        for d1, d2 in OS.minhash_lsh_pairs([(d, t) for d, _, t in docs]):
            mh["_corpus"].append(m)
            mh["d1"].append(d1)
            mh["d2"].append(d2)
        for d, _, t in docs:
            s = OS.simhash_sig(t)
            if s is not None:
                sh["_corpus"].append(m)
                sh["doc_id"].append(d)
                sh["simhash"].append(s)
        for d1, d2, ham in OS.simhash_pairs([(d, t) for d, _, t in docs]):
            shp["_corpus"].append(m)
            shp["d1"].append(d1)
            shp["d2"].append(d2)
            shp["hamming"].append(ham)
        if sf in JV_SFS:
            for d1, d2, jac in OS.jaccard_verified_pairs(docs):
                jv["_corpus"].append(m)
                jv["d1"].append(d1)
                jv["d2"].append(d2)
                jv["jaccard"].append(jac)
    _write("dedup_minhash_lsh", mh,
           {"_corpus": pa.int64(), "d1": pa.int64(), "d2": pa.int64()})
    _write("dedup_simhash", sh,
           {"_corpus": pa.int64(), "doc_id": pa.int64(),
            "simhash": pa.int64()})
    _write("dedup_simhash_pairs", shp,
           {"_corpus": pa.int64(), "d1": pa.int64(), "d2": pa.int64(),
            "hamming": pa.int32()})
    _write("dedup_jaccard_verified", jv,
           {"_corpus": pa.int64(), "d1": pa.int64(), "d2": pa.int64(),
            "jaccard": pa.float64()})
    _write("dedup_cross_epoch", ce,
           {"_corpus": pa.int64(), "doc_id": pa.int64(),
            "epoch": pa.int32(), "dup_exact": pa.bool_(),
            "dup_near": pa.bool_()})


def ann():
    bucketed = {k: [] for k in ("_corpus", "bucket", "rank", "vec_id",
                                "label", "cos_q")}
    probe = {k: [] for k in ("_corpus", "rank", "vec_id", "label",
                             "cosine")}
    ev = {k: [] for k in ("_corpus", "v1", "v2", "hamming", "cosine")}
    ivf = {k: [] for k in ("_corpus", "rank", "vec_id", "label",
                           "list_id", "cosine")}
    pq = {k: [] for k in ("_corpus", "rank", "vec_id", "label",
                          "adc_d2")}
    ivfpq = {k: [] for k in ("_corpus", "rank", "vec_id", "label",
                             "list_id", "adc_d2")}
    rer = {k: [] for k in ("_corpus", "rank", "vec_id", "label", "d2")}
    for sf in SKETCH_SFS:
        m = marker(sf)
        vecs = emb_table(sf)
        for rank, v, lab, d in OS.pq_rerank_topk_rows(vecs):
            rer["_corpus"].append(m)
            rer["rank"].append(rank)
            rer["vec_id"].append(v)
            rer["label"].append(lab)
            rer["d2"].append(d)
        for rank, v, lab, cid, d in OS.ivfpq_topk_rows(vecs):
            ivfpq["_corpus"].append(m)
            ivfpq["rank"].append(rank)
            ivfpq["vec_id"].append(v)
            ivfpq["label"].append(lab)
            ivfpq["list_id"].append(cid)
            ivfpq["adc_d2"].append(d)
        for rank, v, lab, d in OS.pq_topk_rows(vecs):
            pq["_corpus"].append(m)
            pq["rank"].append(rank)
            pq["vec_id"].append(v)
            pq["label"].append(lab)
            pq["adc_d2"].append(d)
        for rank, v, lab, cid, c in OS.ivf_topk_rows(vecs):
            ivf["_corpus"].append(m)
            ivf["rank"].append(rank)
            ivf["vec_id"].append(v)
            ivf["label"].append(lab)
            ivf["list_id"].append(cid)
            ivf["cosine"].append(c)
        for b, rank, v, lab, c in OS.ann_lsh_bucketed_rows(vecs):
            bucketed["_corpus"].append(m)
            bucketed["bucket"].append(b)
            bucketed["rank"].append(rank)
            bucketed["vec_id"].append(v)
            bucketed["label"].append(lab)
            bucketed["cos_q"].append(c)
        for rank, v, lab, c in OS.ann_multiprobe_rows(vecs):
            probe["_corpus"].append(m)
            probe["rank"].append(rank)
            probe["vec_id"].append(v)
            probe["label"].append(lab)
            probe["cosine"].append(c)
        for v1, v2, ham, c in OS.embedding_verified_pairs(vecs):
            ev["_corpus"].append(m)
            ev["v1"].append(v1)
            ev["v2"].append(v2)
            ev["hamming"].append(ham)
            ev["cosine"].append(c)
    _write("ann_lsh_bucketed", bucketed,
           {"_corpus": pa.int64(), "bucket": pa.int32(),
            "rank": pa.int32(), "vec_id": pa.int64(),
            "label": pa.int32(), "cos_q": pa.float64()})
    _write("ann_lsh_multiprobe", probe,
           {"_corpus": pa.int64(), "rank": pa.int32(),
            "vec_id": pa.int64(), "label": pa.int32(),
            "cosine": pa.float64()})
    _write("dedup_embedding_verified", ev,
           {"_corpus": pa.int64(), "v1": pa.int64(), "v2": pa.int64(),
            "hamming": pa.int32(), "cosine": pa.float64()})
    _write("ann_ivf_topk", ivf,
           {"_corpus": pa.int64(), "rank": pa.int32(),
            "vec_id": pa.int64(), "label": pa.int32(),
            "list_id": pa.int32(), "cosine": pa.float64()})
    _write("ann_pq_topk", pq,
           {"_corpus": pa.int64(), "rank": pa.int32(),
            "vec_id": pa.int64(), "label": pa.int32(),
            "adc_d2": pa.float64()})
    _write("ann_ivfpq_topk", ivfpq,
           {"_corpus": pa.int64(), "rank": pa.int32(),
            "vec_id": pa.int64(), "label": pa.int32(),
            "list_id": pa.int32(), "adc_d2": pa.float64()})
    _write("ann_pq_rerank_topk", rer,
           {"_corpus": pa.int64(), "rank": pa.int32(),
            "vec_id": pa.int64(), "label": pa.int32(),
            "d2": pa.float64()})


# ------------------------------------------------- checksum manifest
# Full twin recompute at sf0.1 takes ~2 min (loop-based layout oracle
# over 5k docs), too slow for every pytest run.  Instead the bake
# writes CHECKSUMS.json recording (a) a digest of the twin SOURCES,
# (b) each SF's testdata corpus marker, (c) a content hash of every
# fixture slice.  tests/test_fixtures.py recomputes twins fully at
# sf0.001+sf0.01 and, for ALL SFs, asserts sources+markers+slice
# hashes are unchanged — so a stale sf0.1 slice (testdata or twin code
# changed without re-baking) fails the suite instead of surfacing at
# the driver gate (ADVICE r2 #5).

_SRC_FILES = ("tests/oracle.py", "tests/oracle_sketches.py",
              "ai_pdf_ocr_spark/fixtures/generate.py", "gen_fixtures.py")


def src_digest() -> str:
    import hashlib
    root = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.sha256()
    for rel in _SRC_FILES:
        with open(os.path.join(root, rel), "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def slice_digest(parquet_path: str, m: int | None) -> str:
    """Content hash of one fixture slice: sorted-row repr (Python float
    repr is the exact shortest round-trip form, so this is
    deterministic across runs)."""
    import hashlib
    where = f"WHERE _corpus = {m}" if m is not None else ""
    cols = "* EXCLUDE (_corpus)" if m is not None else "*"
    rows = duckdb.sql(f"SELECT {cols} FROM "
                      f"read_parquet('{parquet_path}') {where}").fetchall()
    return hashlib.sha256(repr(sorted(map(repr, rows))).encode()).hexdigest()


def write_manifest():
    import glob
    import json
    markers = {sf: marker(sf) for sf in SKETCH_SFS}
    slices: dict[str, dict[str, str]] = {}
    for p in sorted(glob.glob(os.path.join(OUT, "*.parquet"))):
        name = os.path.basename(p)[:-len(".parquet")]
        ms = [r[0] for r in duckdb.sql(
            f"SELECT DISTINCT _corpus FROM read_parquet('{p}') "
            f"ORDER BY 1").fetchall()]
        slices[name] = {str(m): slice_digest(p, m) for m in ms}
    inputs = {os.path.basename(p)[:-len(".parquet")]: slice_digest(p, None)
              for p in sorted(glob.glob(os.path.join(INPUTS, "*.parquet")))}
    with open(os.path.join(OUT, "CHECKSUMS.json"), "w") as f:
        json.dump({"src_sha": src_digest(), "markers": markers,
                   "slices": slices, "inputs": inputs}, f, indent=1,
                  sort_keys=True)
    print("  CHECKSUMS.json written")


def main():
    os.makedirs(OUT, exist_ok=True)
    os.makedirs(INPUTS, exist_ok=True)
    print("generating fixtures ->", OUT)
    corpus_and_extract()
    sketches()
    ann()
    write_manifest()
    print("done")


if __name__ == "__main__":
    main()
