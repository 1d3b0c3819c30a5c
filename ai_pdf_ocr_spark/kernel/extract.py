"""Batch extraction driver: pandas batches of (doc_id, spans) ->
(doc_id, spans_out, per-doc metrics).

This is the body of the engine's single fused Arrow stage (SURVEY.md
§2.9 ``decode_spans`` + ``extract_spans``): the whole batch is
flattened once, decoded vectorized, then grouped per (doc, page) for
the layout kernel.  Pages within a doc are processed in ascending page
order with arrival order = the span ``offset`` field (permutation of
the spans array does not change output).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .decode import decode_flat
from .layout import process_page

KERNEL_VERSION = "1.0.0"

_METRIC_COLS = ("span_count_in", "span_count_out", "malformed",
                "merged_away", "dedup_removed", "filtered")


def extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """pdf columns: doc_id (str), spans (sequence of {kind,text,
    media_ref,offset} dicts).  Returns one row per input doc."""
    n_docs = len(pdf)
    doc_ids = pdf["doc_id"].tolist()
    spans_col = pdf["spans"].tolist()
    counts = np.fromiter((0 if s is None else len(s) for s in spans_col),
                         np.int64, n_docs)

    # ---- flatten the batch once ----
    total = int(counts.sum())
    doc_of = np.repeat(np.arange(n_docs), counts)
    kinds = np.empty(total, object)
    texts = np.empty(total, object)
    mrefs = np.empty(total, object)
    offs = np.empty(total, np.int64)
    p = 0
    for s in spans_col:
        if s is None:
            continue
        for d in s:
            kinds[p] = d["kind"]
            texts[p] = d["text"]
            mrefs[p] = d["media_ref"]
            offs[p] = -1 if d["offset"] is None else d["offset"]
            p += 1

    flat = pd.DataFrame({"kind": kinds, "text": texts, "media_ref": mrefs,
                         "offset": offs})
    dec, valid = decode_flat(flat)

    out_spans: list[list[dict]] = [[] for _ in range(n_docs)]
    metrics = {c: np.zeros(n_docs, np.int64) for c in _METRIC_COLS}
    metrics["span_count_in"] = counts
    malformed_per_doc = np.bincount(doc_of[~valid], minlength=n_docs) \
        if total else np.zeros(n_docs, np.int64)
    metrics["malformed"] = malformed_per_doc.astype(np.int64)

    if len(dec):
        d_doc = doc_of[valid]
        d_page = dec["page"].to_numpy()
        d_off = dec["offset"].to_numpy()
        # (doc, page) groups with within-page arrival = offset order
        order = np.lexsort((d_off, d_page, d_doc))
        d_doc = d_doc[order]
        d_page = d_page[order]
        x0 = dec["x0"].to_numpy()[order]
        y0 = dec["y0"].to_numpy()[order]
        x1 = dec["x1"].to_numpy()[order]
        y1 = dec["y1"].to_numpy()[order]
        conf = dec["conf"].to_numpy()[order]
        direction = dec["direction"].to_numpy(dtype=object)[order]
        okind = dec["out_kind"].to_numpy(dtype=object)[order]
        content = dec["content"].to_numpy(dtype=object)[order]
        oref = dec["out_media_ref"].to_numpy(dtype=object)[order]

        # group boundaries where (doc, page) changes
        change = np.empty(len(d_doc), bool)
        change[0] = True
        change[1:] = (d_doc[1:] != d_doc[:-1]) | (d_page[1:] != d_page[:-1])
        starts = np.nonzero(change)[0]
        ends = np.append(starts[1:], len(d_doc))

        for s, e in zip(starts, ends):
            di = int(d_doc[s])
            ks, ts, rs, orders, st = process_page(
                x0[s:e], y0[s:e], x1[s:e], y1[s:e], conf[s:e],
                direction[s:e], okind[s:e], content[s:e], oref[s:e])
            dst = out_spans[di]
            dst.extend(
                {"kind": k, "text": t, "media_ref": r, "order": o}
                for k, t, r, o in zip(ks, ts, rs, orders))
            for key in ("merged_away", "dedup_removed", "filtered"):
                metrics[key][di] += st[key]

    metrics["span_count_out"] = np.fromiter(
        (len(s) for s in out_spans), np.int64, n_docs)
    out = pd.DataFrame({"doc_id": doc_ids, "spans": out_spans})
    for c in _METRIC_COLS:
        out[c] = metrics[c]
    return out


def spans_to_tuples(spans: list[dict]) -> list[tuple]:
    return [(d["kind"], d["text"], d["media_ref"], d["order"])
            for d in spans]
