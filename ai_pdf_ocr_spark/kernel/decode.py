"""Vectorized raw-span payload decode.

The batched analog of the reference's byte-stream decode + OCR-result
parse (``/root/reference/ocr_processor.py:61-105`` pixmap decode,
``:335-398`` quad->bbox + lenient defaults): one pandas/numpy pass over
a *flat* frame of spans — no per-span Python in the parse hot path
except the final exact-float conversion, which deliberately uses
CPython ``float()`` semantics so the kernel bit-matches the oracle.

Input frame columns:  kind, text, media_ref, offset (+ any passthrough)
Output: the valid subset with page:int64, x0..y1/conf:float64,
direction, out_kind ('text'|'media'), content, out_media_ref columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_INT_RE = r"\s*[+-]?\d+\s*"


def decode_flat(flat: pd.DataFrame) -> tuple[pd.DataFrame, np.ndarray]:
    """Decode payloads; returns (decoded_valid_rows, valid_mask).

    Lenient defaults mirror /root/reference/ocr_processor.py:371-372
    (conf -> 1.0) and /root/reference/data_structures.py:102-103
    (direction -> 'horizontal'); malformed rows are dropped (the
    per-unit error isolation rule, /root/reference/main.py:263-275).
    """
    n = len(flat)
    if n == 0:
        return flat.assign(page=np.array([], dtype=np.int64)), np.zeros(0, bool)
    text = flat["text"].astype("object")
    notna = text.notna().to_numpy()
    text = text.fillna("")

    part = text.str.partition("|")
    head, sep, content = part[0], part[1], part[2]
    has_pipe = (sep == "|").to_numpy()

    nseg = (head.str.count(";") + 1).to_numpy()
    seg = head.str.split(";", n=3, expand=True)
    for c in range(seg.shape[1], 4):
        seg[c] = None
    seg = seg.fillna("")

    page_ok = seg[0].str.fullmatch(_INT_RE).to_numpy()

    ncoord = (seg[1].str.count(",") + 1).to_numpy()
    coords = seg[1].str.split(",", n=3, expand=True)
    for c in range(coords.shape[1], 4):
        coords[c] = None

    kind = flat["kind"].astype("object")
    kind_text = (kind == "raw_text").to_numpy()
    kind_media = (kind == "raw_media").to_numpy()

    has_conf = (nseg >= 3) & (seg[2] != "").to_numpy()
    has_dir = (nseg >= 4) & (seg[3] != "").to_numpy()

    valid = (
        notna & has_pipe & (nseg >= 2) & (nseg <= 4)
        & page_ok & (ncoord == 4) & (kind_text | kind_media)
    )

    # exact-float parse (CPython float()) on candidate rows only; a
    # parse failure flips the row to malformed, never raises
    def _floats(col: pd.Series, mask: np.ndarray) -> np.ndarray:
        out = np.full(n, np.nan)
        idx = np.nonzero(mask)[0]
        vals = col.to_numpy(dtype=object)
        bad = []
        for i in idx:
            try:
                out[i] = float(vals[i])
            except (TypeError, ValueError):
                bad.append(i)
        if bad:
            mask[np.array(bad)] = False
        return out

    x0 = _floats(coords[0], valid)
    y0 = _floats(coords[1], valid)
    x1 = _floats(coords[2], valid)
    y1 = _floats(coords[3], valid)
    conf = np.ones(n)
    conf_mask = valid & has_conf
    conf_vals = _floats(seg[2], conf_mask)
    # a bad explicit conf invalidates the whole span (oracle parity)
    valid &= ~(has_conf & ~conf_mask)
    conf = np.where(valid & has_conf, conf_vals, 1.0)

    page = np.zeros(n, dtype=np.int64)
    pv = np.nonzero(valid)[0]
    seg0 = seg[0].to_numpy(dtype=object)
    for i in pv:
        page[i] = int(seg0[i])

    direction = np.where(has_dir, seg[3].to_numpy(dtype=object),
                         "horizontal")
    out_kind = np.where(kind_media, "media", "text")
    mref = flat["media_ref"].astype("object").to_numpy()
    out_ref = np.where(kind_media, mref, None)

    dec = pd.DataFrame({
        "page": page, "x0": x0, "y0": y0, "x1": x1, "y1": y1,
        "conf": conf, "direction": direction, "out_kind": out_kind,
        "content": content.to_numpy(dtype=object), "out_media_ref": out_ref,
        "offset": flat["offset"].to_numpy(),
    }, index=flat.index)
    return dec[valid], valid
