"""Flagship extraction queries exposed through the driver contract.

The interleaved-span ``documents`` input (BASELINE.json input_hint) is
not part of the shared testdata, so it is synthesized deterministically
(seed=42, scale keyed to the sf directory) — FIXTURES.md §1.  These are
non-SQL-expressible (order-dependent greedy layout clustering), so the
driver records rows-only checks; exact span-sequence equality vs the
oracle is enforced by tests/test_pipeline.py.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from .engine.partitioning import weighted_repartition
from .engine.pipeline import (doc_stats, documents_df, extract_documents,
                              extracted_spans_flat)
from .fixtures.generate import make_documents
from .queries import register

_SF_DOCS = {"sf0.001": 200, "sf0.01": 500, "sf0.1": 2000}


def corpus_size(sf_dir: str) -> int:
    return _SF_DOCS.get(os.path.basename(sf_dir.rstrip("/")), 200)


def synthetic_documents(spark, sf_dir: str, n_docs: int | None = None):
    n = n_docs or corpus_size(sf_dir)
    return documents_df(spark, make_documents(n, seed=42))


def synthetic_documents_distributed(spark, n_docs: int, seed: int = 42,
                                    heavy_tail_frac: float = 0.0,
                                    partitions: int | None = None):
    """Generate the corpus ON THE EXECUTORS (each doc is a pure function
    of (seed, doc_id), so generation is embarrassingly parallel) — the
    driver-side list would not scale past toy sizes."""
    import pandas as pd

    from .engine import schemas
    from .fixtures.generate import build_document

    parts = partitions or spark.sparkContext.defaultParallelism
    stride = max(1, int(1 / heavy_tail_frac)) if heavy_tail_frac else 0

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].tolist()
            docs = [build_document(f"doc-{i:08d}", seed,
                                   heavy_tail=bool(stride) and i % stride == 0)
                    for i in ids]
            yield pd.DataFrame({
                "doc_id": [d["doc_id"] for d in docs],
                "spans": [d["spans"] for d in docs],
            })

    return (spark.range(0, n_docs, numPartitions=parts)
            .mapInPandas(gen, schema=schemas.DOCUMENTS))


@register("extract_spans")  # greedy layout clustering: not SQL-expressible
def extract_spans(spark, sf_dir):
    """The flagship pipeline: interleaved raw spans -> reading-ordered
    (kind, text, media_ref, order) spans, exploded to one row per span."""
    docs = synthetic_documents(spark, sf_dir)
    parts = min(8, max(2, corpus_size(sf_dir) // 100))
    extracted = extract_documents(weighted_repartition(docs, parts))
    return (extracted_spans_flat(extracted)
            .orderBy("doc_id", "pos"))


@register("extract_doc_stats")  # derived from extract output: rows-only
def extract_doc_stats(spark, sf_dir):
    """Per-document rollup of the extraction output (A1-A8 analog)."""
    docs = synthetic_documents(spark, sf_dir)
    return (doc_stats(extract_documents(docs))
            .withColumn("document_text",
                        F.substring("document_text", 1, 64))
            .orderBy("doc_id"))
