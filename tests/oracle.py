"""Reference-parity oracle: the executable SPEC of span extraction.

A deliberately slow, loop-based, single-document transcription of the
reference pipeline's semantics (mossan-hoshi/ai-pdf-ocr).  The Spark
kernels in ``ai_pdf_ocr_spark.kernel`` must produce byte-identical
``(kind, text, media_ref, order)`` sequences per document.

Pipeline order (load-bearing, /root/reference/main.py:297-300):
  decode -> per page: merge (0.5) -> direction split -> column/row
  cluster sort -> group interleave -> renumber 1..n -> duplicate
  removal (0.6, NO renumbering -> gaps) -> sink filters (empty text,
  sub-point boxes; text spans only).

Every function cites the reference lines it transcribes.
"""

from __future__ import annotations

from dataclasses import dataclass

DPI = 200           # fixture raster DPI (FIXTURES.md §1.1)
PT_SCALE = 72.0 / DPI  # px -> pt, /root/reference/pdf_processor.py:122-123
MERGE_THRESHOLD = 0.5   # /root/reference/text_block_sorter.py:178
REMOVE_THRESHOLD = 0.6  # /root/reference/data_structures.py:136


@dataclass
class Block:
    kind: str              # 'text' | 'media'
    text: str
    media_ref: str | None
    page: int
    x0: float
    y0: float
    x1: float
    y1: float
    conf: float
    direction: str
    offset: int
    block_id: int | None = None


def parse_span(kind: str, text: str | None, media_ref: str | None,
               offset: int) -> Block | None:
    """Decode one raw span payload; None = malformed (dropped).

    Payload grammar per FIXTURES.md §1.1; lenient defaults mirror
    /root/reference/ocr_processor.py:371-372 and
    /root/reference/data_structures.py:102-103.
    """
    if text is None:
        return None
    head, sep, content = text.partition("|")
    if not sep:
        return None
    parts = head.split(";")
    if not (2 <= len(parts) <= 4):
        return None
    try:
        page = int(parts[0])
        coords = [float(c) for c in parts[1].split(",")]
    except ValueError:
        return None
    if len(coords) != 4:
        return None
    conf = 1.0
    if len(parts) >= 3 and parts[2] != "":
        try:
            conf = float(parts[2])
        except ValueError:
            return None
    direction = "horizontal"
    if len(parts) >= 4 and parts[3] != "":
        direction = parts[3]
    if kind == "raw_text":
        out_kind = "text"
    elif kind == "raw_media":
        out_kind = "media"
    else:
        return None
    return Block(
        kind=out_kind, text=content,
        media_ref=media_ref if out_kind == "media" else None,
        page=page, x0=coords[0], y0=coords[1], x1=coords[2], y1=coords[3],
        conf=conf, direction=direction, offset=offset)


# ---- geometry, /root/reference/text_block_sorter.py:7-23,161-175 ----

def _props(b: Block):
    """/root/reference/text_block_sorter.py:7-9"""
    lx, ty, rx, by = b.x0, b.y0, b.x1, b.y1
    return lx, ty, rx, by, (lx + rx) / 2, (ty + by) / 2, rx - lx, by - ty


def is_horizontal_overlap(b1: Block, b2: Block, threshold: float = 0.5) -> bool:
    """/root/reference/text_block_sorter.py:12-16"""
    lx1, _, rx1, _, _, _, w1, _ = _props(b1)
    lx2, _, rx2, _, _, _, w2, _ = _props(b2)
    overlap = max(0, min(rx1, rx2) - max(lx1, lx2))
    return overlap >= w1 * threshold or overlap >= w2 * threshold


def is_vertical_overlap(b1: Block, b2: Block, threshold: float = 0.5) -> bool:
    """/root/reference/text_block_sorter.py:19-23"""
    _, ty1, _, by1, _, _, _, h1 = _props(b1)
    _, ty2, _, by2, _, _, _, h2 = _props(b2)
    overlap = max(0, min(by1, by2) - max(ty1, ty2))
    return overlap >= h1 * threshold or overlap >= h2 * threshold


def overlap_ratio_smaller(b1: Block, b2: Block) -> float:
    """Overlap vs the SMALLER area, /root/reference/text_block_sorter.py:161-175."""
    lx1, ty1, rx1, by1, _, _, w1, h1 = _props(b1)
    lx2, ty2, rx2, by2, _, _, w2, h2 = _props(b2)
    ol, ot = max(lx1, lx2), max(ty1, ty2)
    or_, ob = min(rx1, rx2), min(by1, by2)
    if ol >= or_ or ot >= ob:
        return 0.0
    overlap_area = (or_ - ol) * (ob - ot)
    area1, area2 = w1 * h1, w2 * h2
    smaller = min(area1, area2)
    return overlap_area / smaller if smaller > 0 else 0.0


def overlap_ratio_own(a: Block, b: Block) -> float:
    """Overlap vs a's OWN area, /root/reference/data_structures.py:41-61.

    Note the strict ``<`` intersection test (:48) vs the >= short-circuit
    in the smaller-area variant — both must be preserved bit-for-bit.
    """
    area_a = (a.x1 - a.x0) * (a.y1 - a.y0)
    if area_a == 0:
        return 0.0
    x0 = max(a.x0, b.x0)
    y0 = max(a.y0, b.y0)
    x1 = min(a.x1, b.x1)
    y1 = min(a.y1, b.y1)
    if x0 < x1 and y0 < y1:
        inter = (x1 - x0) * (y1 - y0)
    else:
        inter = 0.0
    return inter / area_a


# ---- merge, /root/reference/text_block_sorter.py:178-240 ----

def merge_blocks(cand: list[Block]) -> Block:
    """/root/reference/text_block_sorter.py:220-240 (argmax = first max)."""
    if len(cand) == 1:
        return cand[0]
    base = max(cand, key=lambda b: b.conf)
    min_x = min(b.x0 for b in cand)
    min_y = min(b.y0 for b in cand)
    max_x = max(b.x1 for b in cand)
    max_y = max(b.y1 for b in cand)
    text = max(cand, key=lambda b: len(b.text)).text
    conf = sum(b.conf for b in cand) / len(cand)
    return Block(kind="text", text=text, media_ref=None, page=base.page,
                 x0=min_x, y0=min_y, x1=max_x, y1=max_y, conf=conf,
                 direction=base.direction, offset=base.offset,
                 block_id=base.block_id)


def merge_overlapping(blocks: list[Block],
                      threshold: float = MERGE_THRESHOLD) -> list[Block]:
    """/root/reference/text_block_sorter.py:178-217, plus one engine rule:
    media spans never merge (only kind=='text' pairs are candidates) —
    the reference merges only OCR TextBlocks; its media channel (page
    image, /root/reference/pdf_processor.py:127) is separate."""
    if len(blocks) <= 1:
        return list(blocks)
    merged: list[Block] = []
    used: set[int] = set()
    for i, b1 in enumerate(blocks):
        if i in used:
            continue
        cand, idx = [b1], {i}
        for j, b2 in enumerate(blocks):
            if j <= i or j in used:
                continue
            if b1.kind != "text" or b2.kind != "text":
                continue
            if b1.direction != b2.direction:
                continue
            if overlap_ratio_smaller(b1, b2) >= threshold:
                cand.append(b2)
                idx.add(j)
        if len(cand) > 1:
            merged.append(merge_blocks(cand))
            used.update(idx)
        else:
            merged.append(b1)
            used.add(i)
    return merged


# ---- reading-order sorts, /root/reference/text_block_sorter.py:26-87 ----

def sort_vertical(blocks: list[Block]) -> list[Block]:
    """/root/reference/text_block_sorter.py:26-55.  NB: columns are
    ordered by the center-x of their POST-intra-sort first block (:47
    runs before :48), not the original greedy seed."""
    if not blocks:
        return list(blocks)
    columns: list[list[Block]] = []
    for b in blocks:
        added = False
        for col in columns:
            if is_horizontal_overlap(b, col[0]):
                col.append(b)
                added = True
                break
        if not added:
            columns.append([b])
    for col in columns:
        col.sort(key=lambda b: b.y0)
    columns.sort(key=lambda col: -((col[0].x0 + col[0].x1) / 2))
    return [b for col in columns for b in col]


def sort_horizontal(blocks: list[Block]) -> list[Block]:
    """/root/reference/text_block_sorter.py:58-87 (same post-sort-first
    subtlety: rows keyed by center-y of the left-most block)."""
    if not blocks:
        return list(blocks)
    rows: list[list[Block]] = []
    for b in blocks:
        added = False
        for row in rows:
            if is_vertical_overlap(b, row[0]):
                row.append(b)
                added = True
                break
        if not added:
            rows.append([b])
    for row in rows:
        row.sort(key=lambda b: b.x0)
    rows.sort(key=lambda row: (row[0].y0 + row[0].y1) / 2)
    return [b for row in rows for b in row]


def sort_page(blocks: list[Block]) -> list[Block]:
    """/root/reference/text_block_sorter.py:100-158.

    Blocks whose direction is neither 'vertical' nor 'horizontal' are
    silently dropped (:113-114 — two exact-equality filters).
    Renumbering (:145-146) assigns block_id 1..n per page."""
    if not blocks:
        return []
    merged = merge_overlapping(blocks)
    vertical = [b for b in merged if b.direction == "vertical"]
    horizontal = [b for b in merged if b.direction == "horizontal"]
    sv = sort_vertical(vertical)
    sh = sort_horizontal(horizontal)
    final: list[Block] = []
    if vertical and horizontal:
        v_top = min(b.y0 for b in vertical)   # group bbox min-y, :90-97
        h_top = min(b.y0 for b in horizontal)
        if v_top <= h_top:                     # tie -> vertical first, :130
            final = sv + sh
        else:
            final = sh + sv
    elif vertical:
        final = sv
    elif horizontal:
        final = sh
    for i, b in enumerate(final):
        b.block_id = i + 1
    return final


# ---- duplicate removal, /root/reference/data_structures.py:136-176 ----

def remove_duplicates(blocks: list[Block],
                      threshold: float = REMOVE_THRESHOLD
                      ) -> tuple[list[Block], int]:
    """Greedy pairwise removal: block i removed when >=60% of its own
    area overlaps a strictly larger block j.  Removal does NOT renumber
    block_id (gaps remain, /root/reference/data_structures.py:173)."""
    if len(blocks) <= 1:
        return list(blocks), 0
    to_remove: set[int] = set()
    for i, a in enumerate(blocks):
        if i in to_remove:
            continue
        for j, b in enumerate(blocks):
            if i == j or j in to_remove:
                continue
            area_a = (a.x1 - a.x0) * (a.y1 - a.y0)
            area_b = (b.x1 - b.x0) * (b.y1 - b.y0)
            if overlap_ratio_own(a, b) >= threshold and area_a < area_b:
                to_remove.add(i)
                break
    out = [b for i, b in enumerate(blocks) if i not in to_remove]
    return out, len(blocks) - len(out)


# ---- sink filters, /root/reference/pdf_processor.py:148-150,244-246 ----

def keep_block(b: Block) -> bool:
    """Applied last, text spans only (the reference's media channel —
    the page image — is inserted unconditionally,
    /root/reference/pdf_processor.py:127)."""
    if b.kind != "text":
        return True
    if not b.text.strip():                     # :244-246
        return False
    w_pt = (b.x1 - b.x0) * PT_SCALE            # :148-150 scaled width/height
    h_pt = (b.y1 - b.y0) * PT_SCALE
    if w_pt < 1 or h_pt < 1:
        return False
    return True


# ---- whole-document pipeline ----

def extract_document(spans: list[dict]) -> list[tuple]:
    """spans: [{kind,text,media_ref,offset}, ...] (array order irrelevant;
    arrival order is the ``offset`` field).  Returns the output span
    sequence [(kind, text, media_ref, order), ...] — pages ascending,
    reading order within page, per-page order numbers with gaps."""
    blocks = []
    for s in spans:
        b = parse_span(s["kind"], s["text"], s.get("media_ref"),
                       s["offset"])
        if b is not None:
            blocks.append(b)
    out: list[tuple] = []
    for page in sorted({b.page for b in blocks}):
        page_blocks = sorted((b for b in blocks if b.page == page),
                             key=lambda b: b.offset)
        ordered = sort_page(page_blocks)
        deduped, _removed = remove_duplicates(ordered)
        for b in deduped:
            if keep_block(b):
                out.append((b.kind, b.text, b.media_ref, b.block_id))
    return out


def extract_corpus(docs: list[dict]) -> dict[str, list[tuple]]:
    return {d["doc_id"]: extract_document(d["spans"]) for d in docs}
