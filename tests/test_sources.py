"""Input-source readers: JSONL and parquet land identical documents and
produce identical extraction output; zstd sink round-trips."""

from __future__ import annotations

from ai_pdf_ocr_spark.engine.io import TableStore
from ai_pdf_ocr_spark.engine.pipeline import documents_df, extract_documents
from ai_pdf_ocr_spark.engine.sources import read_documents
from ai_pdf_ocr_spark.fixtures.generate import make_documents


def _spans_map(df):
    return {r.doc_id: [(s.kind, s.text, s.media_ref, s.order)
                       for s in r.spans]
            for r in df.select("doc_id", "spans").collect()}


def test_jsonl_source_equals_parquet(spark, tmp_path):
    docs = make_documents(30, seed=11)
    src = documents_df(spark, docs)
    src.write.parquet(str(tmp_path / "p"))
    src.write.json(str(tmp_path / "j"))

    via_parquet = read_documents(spark, str(tmp_path / "p"), "parquet")
    via_jsonl = read_documents(spark, str(tmp_path / "j"), "jsonl")
    # identical rows in (schema enforced, no inference pass)
    a = {r.doc_id: r.spans for r in via_parquet.collect()}
    b = {r.doc_id: r.spans for r in via_jsonl.collect()}
    assert a == b
    # identical extraction output
    out_p = _spans_map(extract_documents(via_parquet))
    out_j = _spans_map(extract_documents(via_jsonl))
    assert out_p == out_j


def test_jsonl_rejects_unknown_format(spark, tmp_path):
    import pytest
    with pytest.raises(ValueError, match="unknown input format"):
        read_documents(spark, str(tmp_path), "csvx")


def test_zstd_sink_roundtrip(spark, tmp_path):
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F
    docs = documents_df(spark, make_documents(10, seed=3))
    store = TableStore(spark, str(tmp_path / "store"))  # default zstd
    extracted = extract_documents(docs).withColumn("bin", F.lit(0))
    store.write_extracted(extracted)
    back = store.read_extracted()
    assert _spans_map(back) == _spans_map(extracted)
    # the files really are zstd-compressed
    files = [f for f in (tmp_path / "store" /
                         "documents_extracted" / "bin=0").iterdir()
             if f.name.endswith(".parquet")]
    assert files
    meta = pq.ParquetFile(str(files[0])).metadata
    codecs = {meta.row_group(i).column(0).compression
              for i in range(meta.num_row_groups)}
    assert codecs == {"ZSTD"}
