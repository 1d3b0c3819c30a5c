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
import pyarrow as pa

from .decode import decode_flat
from .layout import SMALL_PAGE, process_page, process_page_small

KERNEL_VERSION = "1.1.0"

_METRIC_COLS = ("span_count_in", "span_count_out", "malformed",
                "merged_away", "dedup_removed", "filtered")


def _extract_core(n_docs: int, counts: np.ndarray, kinds, texts, mrefs,
                  offs) -> tuple:
    """Shared core over flat per-span arrays (already doc-concatenated).

    Returns (out_counts, out_kind, out_text, out_ref, out_order,
    metrics dict of int64 arrays).  Output spans are concatenated in
    doc order (doc i's spans occupy out slots sum(out_counts[:i])...).
    """
    total = int(counts.sum())
    doc_of = np.repeat(np.arange(n_docs), counts)

    flat = pd.DataFrame({"kind": kinds, "text": texts, "media_ref": mrefs,
                         "offset": offs})
    dec, valid = decode_flat(flat)

    metrics = {c: np.zeros(n_docs, np.int64) for c in _METRIC_COLS}
    metrics["span_count_in"] = counts.astype(np.int64)
    if total:
        metrics["malformed"] = np.bincount(
            doc_of[~valid], minlength=n_docs).astype(np.int64)

    out_kind: list[list] = [[] for _ in range(n_docs)]
    out_text: list[list] = [[] for _ in range(n_docs)]
    out_ref: list[list] = [[] for _ in range(n_docs)]
    out_order: list[list] = [[] for _ in range(n_docs)]

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

        # primitive-list views for the small-page fast path (one C pass
        # each; per-page numpy dispatch dominates at n~20)
        x0_l = x0.tolist(); y0_l = y0.tolist()
        x1_l = x1.tolist(); y1_l = y1.tolist()
        conf_l = conf.tolist()
        dir_l = direction.tolist(); kind_l = okind.tolist()
        text_l = content.tolist(); ref_l = oref.tolist()

        for s, e in zip(starts, ends):
            di = int(d_doc[s])
            if e - s <= SMALL_PAGE:
                ks, ts, rs, orders, st = process_page_small(
                    x0_l[s:e], y0_l[s:e], x1_l[s:e], y1_l[s:e],
                    conf_l[s:e], dir_l[s:e], kind_l[s:e], text_l[s:e],
                    ref_l[s:e])
            else:
                ks, ts, rs, orders, st = process_page(
                    x0[s:e], y0[s:e], x1[s:e], y1[s:e], conf[s:e],
                    direction[s:e], okind[s:e], content[s:e], oref[s:e])
            out_kind[di].extend(ks)
            out_text[di].extend(ts)
            out_ref[di].extend(rs)
            out_order[di].extend(orders)
            for key in ("merged_away", "dedup_removed", "filtered"):
                metrics[key][di] += st[key]

    out_counts = np.fromiter((len(s) for s in out_kind), np.int64, n_docs)
    metrics["span_count_out"] = out_counts
    return out_counts, out_kind, out_text, out_ref, out_order, metrics


_OUT_SPAN_PA = pa.struct([
    pa.field("kind", pa.string()),
    pa.field("text", pa.string()),
    pa.field("media_ref", pa.string()),
    pa.field("order", pa.int32()),
])


def extract_record_batch(rb: pa.RecordBatch) -> pa.RecordBatch:
    """Arrow-native batch extraction: the list<struct> spans column is
    flattened zero-copy (no per-span Python dicts in either direction —
    the pandas dict marshaling was ~5x the kernel cost)."""
    n_docs = rb.num_rows
    doc_id = rb.column("doc_id")
    spans = rb.column("spans")
    counts = spans.value_lengths().fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    values = spans.flatten()  # StructArray, slice/offset-aware
    kinds = values.field("kind").to_numpy(zero_copy_only=False)
    texts = values.field("text").to_numpy(zero_copy_only=False)
    mrefs = values.field("media_ref").to_numpy(zero_copy_only=False)
    offs_pa = values.field("offset")
    offs = offs_pa.fill_null(-1).to_numpy(zero_copy_only=False) \
        .astype(np.int64)

    out_counts, ok, ot, orf, oo, metrics = _extract_core(
        n_docs, counts, kinds, texts, mrefs, offs)

    # assemble output list<struct> directly from flat arrays + offsets
    flat_kind = pa.array([v for d in ok for v in d], type=pa.string())
    flat_text = pa.array([v for d in ot for v in d], type=pa.string())
    flat_ref = pa.array([v for d in orf for v in d], type=pa.string())
    flat_order = pa.array([v for d in oo for v in d], type=pa.int32())
    struct = pa.StructArray.from_arrays(
        [flat_kind, flat_text, flat_ref, flat_order],
        fields=list(_OUT_SPAN_PA))
    offsets = pa.array(np.concatenate(([0], np.cumsum(out_counts))),
                       type=pa.int32())
    spans_out = pa.ListArray.from_arrays(offsets, struct)
    cols = [doc_id, spans_out] + \
        [pa.array(metrics[c], type=pa.int64()) for c in _METRIC_COLS]
    return pa.RecordBatch.from_arrays(
        cols, names=["doc_id", "spans", *_METRIC_COLS])


def extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """pandas adapter (tests / non-Arrow callers): pdf columns doc_id,
    spans (sequences of {kind,text,media_ref,offset} dicts); returns
    one row per doc with list-of-dict spans + metrics."""
    n_docs = len(pdf)
    spans_col = pdf["spans"].tolist()
    counts = np.fromiter((0 if s is None else len(s) for s in spans_col),
                         np.int64, n_docs)
    total = int(counts.sum())
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

    out_counts, ok, ot, orf, oo, metrics = _extract_core(
        n_docs, counts, kinds, texts, mrefs, offs)
    out_spans = [
        [{"kind": k, "text": t, "media_ref": r, "order": o}
         for k, t, r, o in zip(ok[i], ot[i], orf[i], oo[i])]
        for i in range(n_docs)
    ]
    out = pd.DataFrame({"doc_id": pdf["doc_id"].tolist(),
                        "spans": out_spans})
    for c in _METRIC_COLS:
        out[c] = metrics[c]
    return out


def spans_to_tuples(spans: list[dict]) -> list[tuple]:
    return [(d["kind"], d["text"], d["media_ref"], d["order"])
            for d in spans]
