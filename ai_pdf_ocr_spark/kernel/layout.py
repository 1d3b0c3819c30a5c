"""Per-page reading-order kernel: merge -> cluster-sort -> interleave ->
renumber -> dedupe -> sink filters.

Vectorized transcription of ``/root/reference/text_block_sorter.py`` +
``/root/reference/data_structures.py:136-176`` +
``/root/reference/pdf_processor.py:148-150,244-246``: all O(n^2)
pairwise geometry is computed as numpy float64 matrices; only the
order-DEPENDENT greedy scans (cluster membership depends on arrival
order and current seed set — not expressible as a window function,
SURVEY.md §2.5) remain as loops over precomputed booleans.

Float parity notes: every arithmetic expression keeps the reference's
operand order ((right-left)*(bottom-top))/smaller etc.), all math is
IEEE float64, and group-confidence means use sequential Python
summation to match ``sum()/len()`` at
/root/reference/text_block_sorter.py:232.
"""

from __future__ import annotations

from operator import itemgetter

import numpy as np

_KEY_X0 = itemgetter(0)
_KEY_Y0 = itemgetter(1)

DPI = 200
PT_SCALE = 72.0 / DPI
MERGE_THRESHOLD = 0.5   # /root/reference/text_block_sorter.py:178
REMOVE_THRESHOLD = 0.6  # /root/reference/data_structures.py:136


def _pairwise_intersection(x0, y0, x1, y1):
    il = np.maximum(x0[:, None], x0[None, :])
    ir = np.minimum(x1[:, None], x1[None, :])
    it = np.maximum(y0[:, None], y0[None, :])
    ib = np.minimum(y1[:, None], y1[None, :])
    return il, ir, it, ib


def _ratio_smaller_matrix(x0, y0, x1, y1):
    """Overlap vs smaller area, /root/reference/text_block_sorter.py:161-175."""
    area = (x1 - x0) * (y1 - y0)
    il, ir, it, ib = _pairwise_intersection(x0, y0, x1, y1)
    strict = (il < ir) & (it < ib)
    inter = (ir - il) * (ib - it)
    smaller = np.minimum(area[:, None], area[None, :])
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(strict & (smaller > 0), inter / smaller, 0.0)
    return ratio


def _ratio_own_matrix(x0, y0, x1, y1):
    """ratio[i,j] = intersection / area_i, /root/reference/data_structures.py:41-61."""
    area = (x1 - x0) * (y1 - y0)
    il, ir, it, ib = _pairwise_intersection(x0, y0, x1, y1)
    strict = (il < ir) & (it < ib)
    inter = np.where(strict, (ir - il) * (ib - it), 0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(area[:, None] == 0, 0.0, inter / area[:, None])
    return ratio, area


def _axis_overlap_matrix(lo, hi):
    """overlap >= 0.5*len_i OR >= 0.5*len_j,
    /root/reference/text_block_sorter.py:12-23 (symmetric)."""
    length = hi - lo
    ov = np.minimum(hi[:, None], hi[None, :]) - np.maximum(lo[:, None], lo[None, :])
    ov = np.maximum(0.0, ov)
    return (ov >= length[:, None] * 0.5) | (ov >= length[None, :] * 0.5)


def _greedy_groups(ovmat: np.ndarray) -> list[list[int]]:
    """First-fit clustering against each existing group's SEED (its
    first block), /root/reference/text_block_sorter.py:33-42,66-74."""
    groups: list[list[int]] = []
    seeds: list[int] = []
    for a in range(ovmat.shape[0]):
        for gi, s in enumerate(seeds):
            if ovmat[a, s]:
                groups[gi].append(a)
                break
        else:
            groups.append([a])
            seeds.append(a)
    return groups


def _cluster_sort(idx: np.ndarray, ovmat: np.ndarray,
                  intra_key: np.ndarray, group_key: np.ndarray,
                  group_desc: bool) -> list[int]:
    """Shared shape of sort_vertical / sort_horizontal
    (/root/reference/text_block_sorter.py:26-55,58-87): greedy groups,
    stable intra-group sort by ``intra_key``, then stable group ordering
    by ``group_key`` of the POST-sort first member (:47-48 order)."""
    groups = _greedy_groups(ovmat)
    sorted_groups = []
    for g in groups:
        g_arr = np.asarray(g)
        order = np.argsort(intra_key[g_arr], kind="stable")
        sorted_groups.append(g_arr[order])
    keys = np.array([(-group_key[g[0]] if group_desc else group_key[g[0]])
                     for g in sorted_groups])
    g_order = np.argsort(keys, kind="stable")
    out: list[int] = []
    for gi in g_order:
        out.extend(int(idx[a]) for a in sorted_groups[gi])
    return out


# fast-path cutoff: the candidate-driven pure-Python path wins through
# ~160 blocks/page (r2 A/B/A sweep: 64->3388, 192->3493-3596 docs/s on
# the heavy-tail corpus whose p99 page is 103, max 163); the numpy
# matrix path takes over for genuinely huge pages where O(n^2) Python
# pair walks would dominate
SMALL_PAGE = 160


def process_page_fast(blocks, merge_cands, dd_cands):
    """Pure-Python fast path for pages up to SMALL_PAGE blocks,
    candidate-driven.

    At typical page sizes (10-40 blocks) numpy's per-call dispatch on
    tiny pairwise matrices costs more than tight Python loops over
    primitive floats (measured ~3x).  Bit-parity with the numpy path
    and the oracle: identical IEEE doubles, identical expression order,
    CPython's stable list.sort.

    ``blocks``: list of 10-tuples (x0, y0, x1, y1, conf, direction,
    kind, text, media_ref, gidx) in arrival order — pre-zipped ONCE per
    Arrow batch by extract.py (one list slice per page instead of nine).
    ``gidx`` is the batch-global span index; merged blocks get fresh
    negative ids.

    ``merge_cands``: merge-candidate pairs (i<j LOCAL indices passing
    the J3 predicate, batch-vectorized in extract.py) or None when the
    page has none.  The greedy used-state semantics equal the reference
    nested loop because candidates arrive in the same (i asc, j asc)
    visit order.

    ``dd_cands``: duplicate-removal candidate pairs (small_gidx,
    large_gidx with own-ratio >= REMOVE_THRESHOLD and strictly smaller
    area, batch-vectorized).  Valid for blocks whose geometry the merge
    stage did not touch; pairs involving post-merge geometry are
    recomputed here — O(n_merged * k) instead of O(k^2) (round-2 perf:
    the full dedupe rescan was ~30%% of the kernel on merge-bearing
    pages, which the planted dup-pair degeneracies make ~37%% of all
    pages)."""
    n = len(blocks)
    stats = {"merged_away": 0, "dedup_removed": 0, "filtered": 0}
    if n == 0:
        return [], [], [], [], stats

    # ---- merge (J3), /root/reference/text_block_sorter.py:178-240 ----
    new_blocks = None
    if n > 1 and merge_cands:
        cand_js: dict[int, list[int]] = {}
        for i, j in merge_cands:
            cand_js.setdefault(i, []).append(j)
        merged = []
        new_blocks = []
        used = [False] * n
        neg = -1
        for i in range(n):
            if used[i]:
                continue
            used[i] = True
            js = cand_js.get(i)
            cand = None
            if js is not None:
                for j in js:
                    if not used[j]:
                        if cand is None:
                            cand = [blocks[i]]
                        cand.append(blocks[j])
                        used[j] = True
            if cand is None:
                merged.append(blocks[i])
            else:
                base = max(cand, key=lambda b: b[4])
                longest = max(cand, key=lambda b: len(b[7]))[7]
                conf_m = sum(b[4] for b in cand) / len(cand)
                nb = (min(b[0] for b in cand),
                      min(b[1] for b in cand),
                      max(b[2] for b in cand),
                      max(b[3] for b in cand),
                      conf_m, base[5], "text", longest, None, neg)
                neg -= 1
                merged.append(nb)
                new_blocks.append(nb)
        stats["merged_away"] = n - len(merged)
    else:
        merged = blocks

    # ---- direction split + cluster sorts (:26-87,:113-114) ----
    vert = [b for b in merged if b[5] == "vertical"]
    horiz = [b for b in merged if b[5] == "horizontal"]

    def _sort_v(bs):
        cols = []
        for b in bs:
            for col in cols:
                s = col[0]
                lo = b[0] if b[0] > s[0] else s[0]
                hi = b[2] if b[2] < s[2] else s[2]
                ov = hi - lo
                if ov < 0:
                    ov = 0
                if ov >= (b[2] - b[0]) * 0.5 or ov >= (s[2] - s[0]) * 0.5:
                    col.append(b)
                    break
            else:
                cols.append([b])
        # itemgetter + singleton guards: same keys, same stable sort,
        # ~2x less per-call overhead than a lambda on tiny lists
        for col in cols:
            if len(col) > 1:
                col.sort(key=_KEY_Y0)
        if len(cols) > 1:
            cols.sort(key=lambda col: -((col[0][0] + col[0][2]) / 2))
        return [b for col in cols for b in col]

    def _sort_h(bs):
        rows = []
        for b in bs:
            for row in rows:
                s = row[0]
                lo = b[1] if b[1] > s[1] else s[1]
                hi = b[3] if b[3] < s[3] else s[3]
                ov = hi - lo
                if ov < 0:
                    ov = 0
                if ov >= (b[3] - b[1]) * 0.5 or ov >= (s[3] - s[1]) * 0.5:
                    row.append(b)
                    break
            else:
                rows.append([b])
        for row in rows:
            if len(row) > 1:
                row.sort(key=_KEY_X0)
        if len(rows) > 1:
            rows.sort(key=lambda row: (row[0][1] + row[0][3]) / 2)
        return [b for row in rows for b in row]

    if vert and horiz:
        v_top = min(b[1] for b in vert)
        h_top = min(b[1] for b in horiz)
        final = _sort_v(vert) + _sort_h(horiz) if v_top <= h_top \
            else _sort_h(horiz) + _sort_v(vert)
    elif vert:
        final = _sort_v(vert)
    else:
        final = _sort_h(horiz)

    # ---- dedupe (J2), /root/reference/data_structures.py:136-176 ----
    # candidate-driven: only the greedy state machine is order-dependent
    # (SURVEY.md §2.5); the pair predicates are batch-precomputed for
    # untouched geometry and recomputed only around merged blocks.
    k = len(final)
    removed = [False] * k
    if k > 1 and (dd_cands or new_blocks):
        pos_of = {b[9]: p for p, b in enumerate(final)}
        by_small: dict[int, list[int]] = {}
        if dd_cands:
            for sm, lg in dd_cands:
                ps = pos_of.get(sm)
                pl = pos_of.get(lg)
                if ps is not None and pl is not None:
                    by_small.setdefault(ps, []).append(pl)
        if new_blocks:
            for b in new_blocks:
                p = pos_of[b[9]]
                bx0, by0, bx1, by1 = b[0], b[1], b[2], b[3]
                ab = (bx1 - bx0) * (by1 - by0)
                for q, o in enumerate(final):
                    if q == p or (o[9] < 0 and o[9] > b[9]):
                        continue  # merged-merged pair handled once
                    ol = bx0 if bx0 > o[0] else o[0]
                    ot = by0 if by0 > o[1] else o[1]
                    orr = bx1 if bx1 < o[2] else o[2]
                    ob = by1 if by1 < o[3] else o[3]
                    if ol >= orr or ot >= ob:
                        continue
                    ao = (o[2] - o[0]) * (o[3] - o[1])
                    inter = (orr - ol) * (ob - ot)
                    if ab != 0 and ab < ao \
                            and inter / ab >= REMOVE_THRESHOLD:
                        by_small.setdefault(p, []).append(q)
                    if ao != 0 and ao < ab \
                            and inter / ao >= REMOVE_THRESHOLD:
                        by_small.setdefault(q, []).append(p)
        for i in sorted(by_small):
            # the full O(k^2) scan visits j ascending; first surviving
            # j wins (removed-at-visit-time state reproduced exactly)
            for j in sorted(by_small[i]):
                if not removed[j]:
                    removed[i] = True
                    break
        stats["dedup_removed"] = sum(removed)

    # ---- sink filters: text spans only ----
    kinds, texts, refs, orders = [], [], [], []
    for a in range(k):
        if removed[a]:
            continue
        b = final[a]
        if b[6] == "text":
            t = b[7]
            if not t.strip():
                stats["filtered"] += 1
                continue
            if (b[2] - b[0]) * PT_SCALE < 1 or (b[3] - b[1]) * PT_SCALE < 1:
                stats["filtered"] += 1
                continue
        kinds.append(b[6])
        texts.append(b[7])
        refs.append(b[8])
        orders.append(a + 1)
    return kinds, texts, refs, orders, stats


def process_page(x0, y0, x1, y1, conf, direction, kind, text, media_ref):
    """Run the full page pipeline.  All array args are length-n in
    arrival (offset) order; direction/kind/text/media_ref are object
    arrays.  Returns (kinds, texts, refs, orders, stats)."""
    n = len(x0)
    stats = {"merged_away": 0, "dedup_removed": 0, "filtered": 0}
    if n == 0:
        return [], [], [], [], stats

    # ---- merge (J3): text-only, same-direction, ratio >= 0.5 ----
    is_text = np.fromiter((k == "text" for k in kind), bool, n)
    same_dir = np.equal.outer(direction, direction)
    mergeable = (
        (_ratio_smaller_matrix(x0, y0, x1, y1) >= MERGE_THRESHOLD)
        & same_dir & is_text[:, None] & is_text[None, :]
    )
    groups: list[list[int]] = []
    used = np.zeros(n, bool)
    for i in range(n):
        if used[i]:
            continue
        used[i] = True
        row = mergeable[i]
        js = [j for j in range(i + 1, n) if not used[j] and row[j]]
        for j in js:
            used[j] = True
        groups.append([i] + js)

    m = len(groups)
    stats["merged_away"] = n - m
    mx0 = np.empty(m); my0 = np.empty(m); mx1 = np.empty(m); my1 = np.empty(m)
    m_dir = np.empty(m, object)
    m_kind = np.empty(m, object)
    m_text = np.empty(m, object)
    m_ref = np.empty(m, object)
    for gi, g in enumerate(groups):
        if len(g) == 1:
            k = g[0]
            mx0[gi], my0[gi], mx1[gi], my1[gi] = x0[k], y0[k], x1[k], y1[k]
            m_dir[gi], m_kind[gi] = direction[k], kind[k]
            m_text[gi], m_ref[gi] = text[k], media_ref[k]
        else:
            # /root/reference/text_block_sorter.py:220-240
            confs = [float(conf[k]) for k in g]
            base = g[max(range(len(g)), key=lambda a: confs[a])]
            mx0[gi] = x0[g].min(); my0[gi] = y0[g].min()
            mx1[gi] = x1[g].max(); my1[gi] = y1[g].max()
            m_text[gi] = max((text[k] for k in g), key=len)
            m_dir[gi] = direction[base]
            m_kind[gi] = "text"
            m_ref[gi] = None

    # ---- direction split (non-h/v silently dropped, :113-114) ----
    v_idx = np.array([i for i in range(m) if m_dir[i] == "vertical"], int)
    h_idx = np.array([i for i in range(m) if m_dir[i] == "horizontal"], int)

    v_sorted: list[int] = []
    if len(v_idx):
        v_sorted = _cluster_sort(
            v_idx, _axis_overlap_matrix(mx0[v_idx], mx1[v_idx]),
            intra_key=my0[v_idx],
            group_key=(mx0[v_idx] + mx1[v_idx]) / 2, group_desc=True)
    h_sorted: list[int] = []
    if len(h_idx):
        h_sorted = _cluster_sort(
            h_idx, _axis_overlap_matrix(my0[h_idx], my1[h_idx]),
            intra_key=mx0[h_idx],
            group_key=(my0[h_idx] + my1[h_idx]) / 2, group_desc=False)

    if len(v_idx) and len(h_idx):
        # group-bbox tops, tie -> vertical first (:123-137)
        if my0[v_idx].min() <= my0[h_idx].min():
            final = v_sorted + h_sorted
        else:
            final = h_sorted + v_sorted
    else:
        final = v_sorted or h_sorted

    f = np.asarray(final, int)
    k_out = len(f)
    block_id = np.arange(1, k_out + 1)  # renumber, :145-146

    # ---- duplicate removal (J2), no renumbering afterwards ----
    if k_out > 1:
        ratio_own, areaF = _ratio_own_matrix(mx0[f], my0[f], mx1[f], my1[f])
        removable = (ratio_own >= REMOVE_THRESHOLD) & \
            (areaF[:, None] < areaF[None, :])
        removed = np.zeros(k_out, bool)
        for i in range(k_out):
            if removed[i]:
                continue
            row = removable[i]
            for j in range(k_out):
                if i == j or removed[j]:
                    continue
                if row[j]:
                    removed[i] = True
                    break
        stats["dedup_removed"] = int(removed.sum())
    else:
        removed = np.zeros(k_out, bool)

    # ---- sink filters: text spans only ----
    kinds, texts, refs, orders = [], [], [], []
    for a in range(k_out):
        if removed[a]:
            continue
        i = f[a]
        if m_kind[i] == "text":
            t = m_text[i]
            if not t.strip():
                stats["filtered"] += 1
                continue
            if (mx1[i] - mx0[i]) * PT_SCALE < 1 or \
               (my1[i] - my0[i]) * PT_SCALE < 1:
                stats["filtered"] += 1
                continue
        kinds.append(m_kind[i])
        texts.append(m_text[i])
        refs.append(m_ref[i])
        orders.append(int(block_id[a]))
    return kinds, texts, refs, orders, stats
