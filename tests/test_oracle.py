"""Oracle self-consistency + degeneracy behavior (SURVEY.md §5 items 1/4)."""

from __future__ import annotations

import random

from ai_pdf_ocr_spark.fixtures.generate import (
    build_document, golden_documents, make_documents)
from tests import oracle as O


def test_parse_defaults():
    b = O.parse_span("raw_text", "1;10.0,20.0,30.0,40.0|hi", None, 0)
    assert (b.page, b.conf, b.direction) == (1, 1.0, "horizontal")
    b = O.parse_span("raw_text", "2;1,2,3,4;0.5|x", None, 1)
    assert b.conf == 0.5 and b.direction == "horizontal"
    b = O.parse_span("raw_text", "2;1,2,3,4;;|x", None, 1)
    assert b.conf == 1.0 and b.direction == "horizontal"
    b = O.parse_span("raw_media", "3;1,2,3,4;;|", "asset-1", 2)
    assert b.kind == "media" and b.media_ref == "asset-1" and b.text == ""
    # text spans never carry a media_ref
    b = O.parse_span("raw_text", "1;1,2,3,4|t", "asset-9", 0)
    assert b.media_ref is None


def test_parse_malformed_dropped():
    for payload in ["no pipe", "x;1,2,3,4|p", "1;1,2,3|p", "1;a,b,c,d|p",
                    ";|", "1;1,2,3,4;bad|p", None]:
        assert O.parse_span("raw_text", payload, None, 0) is None
    assert O.parse_span("unknown_kind", "1;1,2,3,4|p", None, 0) is None


def _mk(kind, page, x0, y0, x1, y1, conf=1.0, direction="horizontal",
        text="t", media_ref=None, offset=0):
    return O.Block(kind=kind, text=text, media_ref=media_ref, page=page,
                   x0=x0, y0=y0, x1=x1, y1=y1, conf=conf,
                   direction=direction, offset=offset)


def test_overlap_ratio_formulas_differ():
    # a small box fully inside a big one: smaller-denominator ratio = 1.0,
    # own-area ratio of the BIG box is small (F8 — two denominators)
    small = _mk("text", 1, 10, 10, 20, 20)
    big = _mk("text", 1, 0, 0, 100, 100)
    assert O.overlap_ratio_smaller(small, big) == 1.0
    assert O.overlap_ratio_own(big, small) == 0.01
    assert O.overlap_ratio_own(small, big) == 1.0


def test_merge_threshold_straddle():
    # equal-size pairs at planted ratios: >=0.5 merges, <0.5 does not
    for ratio, expect_merge in [(0.45, False), (0.5, True), (0.55, True)]:
        dx = round(100.0 * (1 - ratio), 1)
        a = _mk("text", 1, 0, 0, 100, 50, text="aaaa")
        b = _mk("text", 1, dx, 0, dx + 100, 50, text="bb")
        got = O.merge_overlapping([a, b])
        assert (len(got) == 1) == expect_merge, ratio
        if expect_merge:
            m = got[0]
            assert m.text == "aaaa"  # argmax by length
            assert (m.x0, m.x1) == (0, dx + 100)  # union bbox


def test_merge_guards():
    a = _mk("text", 1, 0, 0, 100, 50, direction="horizontal")
    b = _mk("text", 1, 0, 0, 100, 50, direction="vertical")
    assert len(O.merge_overlapping([a, b])) == 2  # direction guard
    m = _mk("media", 1, 0, 0, 100, 50, media_ref="m")
    t = _mk("text", 1, 0, 0, 100, 50)
    assert len(O.merge_overlapping([m, t])) == 2  # media never merges


def test_merge_base_block_semantics():
    # base = argmax confidence (first max on ties); conf = mean
    a = _mk("text", 1, 0, 0, 100, 50, conf=0.9, text="short")
    b = _mk("text", 1, 10, 0, 110, 50, conf=0.95, direction="horizontal",
            text="the longest text")
    got = O.merge_overlapping([a, b])
    assert len(got) == 1
    assert got[0].conf == (0.9 + 0.95) / 2
    assert got[0].text == "the longest text"


def test_vertical_sort_right_to_left():
    # two columns: right column should come first
    left = [_mk("text", 1, 100, y, 160, y + 200, direction="vertical",
                text=f"L{y}") for y in (300, 50)]
    right = [_mk("text", 1, 1400, y, 1460, y + 200, direction="vertical",
                 text=f"R{y}") for y in (400, 100)]
    got = O.sort_vertical(left + right)
    assert [b.text for b in got] == ["R100", "R400", "L50", "L300"]


def test_horizontal_sort_rows_top_to_bottom():
    blocks = [
        _mk("text", 1, 500, 100, 800, 150, text="r1b"),
        _mk("text", 1, 100, 105, 400, 155, text="r1a"),  # same row (y-overlap)
        _mk("text", 1, 100, 300, 400, 350, text="r2a"),
    ]
    got = O.sort_horizontal(blocks)
    assert [b.text for b in got] == ["r1a", "r1b", "r2a"]


def test_group_interleave_tie_vertical_first():
    v = _mk("text", 1, 1400, 100, 1460, 400, direction="vertical", text="v")
    h = _mk("text", 1, 100, 100, 400, 150, text="h")  # same top y -> tie
    got = O.sort_page([v, h])
    assert [b.text for b in got] == ["v", "h"]
    assert [b.block_id for b in got] == [1, 2]
    h2 = _mk("text", 1, 100, 50, 400, 100, text="h2")
    got = O.sort_page([v, h2])
    assert [b.text for b in got] == ["h2", "v"]


def test_unknown_direction_dropped():
    good = _mk("text", 1, 100, 100, 400, 150, text="ok")
    bad = _mk("text", 1, 100, 300, 400, 350, direction="diagonal", text="no")
    got = O.sort_page([good, bad])
    assert [b.text for b in got] == ["ok"]


def test_dedupe_gaps_not_renumbered():
    # big horizontal + contained small vertical: no merge, dedupe removes
    # the smaller; surviving order numbers keep their gap
    big = _mk("text", 1, 100, 100, 500, 300, text="big")
    small = _mk("text", 1, 150, 90, 230, 220, direction="vertical",
                text="small")  # v-group top 90 <= h-group top 100 -> first
    after = _mk("text", 1, 100, 400, 500, 450, text="after")
    ordered = O.sort_page([big, small, after])
    assert [b.text for b in ordered] == ["small", "big", "after"]
    deduped, removed = O.remove_duplicates(ordered)
    assert removed == 1
    assert [b.text for b in deduped] == ["big", "after"]
    assert [b.block_id for b in deduped] == [2, 3]  # gap at removed id 1


def test_dedupe_threshold_straddle():
    # own-area overlap 0.55 < 0.6 -> kept; 0.6 and 0.65 -> removed
    for ratio, removed_expect in [(0.55, 0), (0.6, 1), (0.65, 1)]:
        dx = round(100.0 * (1 - ratio), 1)
        small = _mk("text", 1, dx, 0, dx + 100, 50, direction="vertical")
        big = _mk("text", 1, 0, -10, 100, 60, direction="horizontal")
        _, removed = O.remove_duplicates([small, big])
        assert removed == removed_expect, ratio


def test_filters_text_only():
    empty = _mk("text", 1, 0, 0, 100, 50, text="   ")
    tiny = _mk("text", 1, 0, 0, 2.0, 2.0, text="x")
    media_tiny = _mk("media", 1, 0, 0, 2.0, 2.0, text="", media_ref="m")
    ok = _mk("text", 1, 0, 0, 100, 50, text="x")
    assert not O.keep_block(empty)
    assert not O.keep_block(tiny)
    assert O.keep_block(media_tiny)  # media never filtered
    assert O.keep_block(ok)


def test_permutation_invariance():
    # array order is irrelevant: arrival order is the offset field
    doc = build_document("perm-0001", seed=7)
    base = O.extract_document(doc["spans"])
    rng = random.Random(0)
    for _ in range(3):
        shuffled = list(doc["spans"])
        rng.shuffle(shuffled)
        assert O.extract_document(shuffled) == base


def test_idempotence_of_output_ordering():
    # feeding the extractor's own output back (re-encoded) yields the
    # same sequence — mirrors the reference's resume re-run,
    # /root/reference/main.py:378-391
    for doc in golden_documents()[:8]:
        out = O.extract_document(doc["spans"])
        assert out == O.extract_document(doc["spans"])


def test_golden_corpus_shape():
    docs = golden_documents()
    assert len(docs) == 24
    results = O.extract_corpus(docs)
    assert len(results) == 24
    total = sum(len(v) for v in results.values())
    assert total > 100  # substantive output
    for doc_id, seq in results.items():
        for (kind, text, media_ref, order) in seq:
            assert kind in ("text", "media")
            assert isinstance(order, int) and order >= 1
            if kind == "text":
                assert media_ref is None and text.strip()
            else:
                assert media_ref is not None
    # degenerate archetypes produce media spans somewhere
    assert any(k == "media" for seq in results.values()
               for (k, *_rest) in seq)


def test_generator_determinism():
    a = make_documents(10, seed=42)
    b = make_documents(10, seed=42)
    assert a == b
    c = make_documents(10, seed=43)
    assert a != c


def test_dedupe_never_increases_and_orders_strictly_increase_per_page():
    for doc in make_documents(50, seed=11):
        seq = O.extract_document(doc["spans"])
        # per-page order values strictly increase (page boundary = reset)
        last = 0
        for (_k, _t, _m, order) in seq:
            if order <= last:
                assert order >= 1  # reset at page boundary
            last = order
