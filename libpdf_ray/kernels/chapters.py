"""Outline → chapter kernels: numbering, fuzzy heading match, referee.

Faithful functional re-derivations of:

- ``chapter_number_giver``        /root/reference/libpdf/catalog.py:177-227
- ``chapter_examiner``            /root/reference/libpdf/textbox.py:298-383
- ``similarity_referee``          /root/reference/libpdf/textbox.py:386-528
- ghost-chapter positioning       /root/reference/libpdf/textbox.py:271-296

The reference mutates nested dicts in place and deletes matched textboxes from
a shared list; here every function is pure — it takes plain dicts/lists and
returns new values — but the *observable* winners, numbers and positions are
identical (the referee's quirky whole-dict max-equality comparison is kept
verbatim because it decides ties).
"""

from __future__ import annotations

import re
from collections import Counter
from difflib import SequenceMatcher

import numpy as np


def _ratio_from(matches: int, length: int) -> float:
    # difflib._calculate_ratio, re-derived from its docs: both empty → 1.0
    return 2.0 * matches / length if length else 1.0


def _char_counts(s: str):
    """Multiset char-frequency representation: a 128-bin numpy vector for
    ASCII strings (virtually all outline/heading text; intersecting is one
    ``np.minimum``), a ``collections.Counter`` otherwise — both represent
    exactly difflib's quick_ratio character multiset."""
    if s.isascii():
        return np.bincount(
            np.frombuffer(s.encode("ascii"), np.uint8), minlength=128
        )
    return Counter(s)


def _multiset_inter(a, b) -> int:
    """Character-multiset overlap across the two representations."""
    if isinstance(a, np.ndarray) and isinstance(b, np.ndarray):
        return int(np.minimum(a, b).sum())
    if isinstance(a, np.ndarray):
        a = Counter({chr(i): int(n) for i, n in enumerate(a) if n})
    if isinstance(b, np.ndarray):
        b = Counter({chr(i): int(n) for i, n in enumerate(b) if n})
    return sum((a & b).values())


def _pruned_ratios(texts: list, counters: list, target: str):
    """Exact ``SequenceMatcher(None, t, target).ratio()`` for every text that
    could reach the maximum; upper-bound placeholders (< max) for the rest.

    Returns ``(exact: dict[idx→ratio], max_ratio, ub: list)``.  Candidates
    are visited in decreasing ``real_quick_ratio`` order (computable from
    lengths alone); each is refined through ``quick_ratio`` (multiset char
    overlap) and only then pays for the full quadratic match.  Both are
    documented upper bounds of ``ratio()``, so every skipped candidate's
    true ratio is strictly below the returned max."""
    lb = len(target)
    cb = _char_counts(target)
    las = [len(t) for t in texts]
    rqr = [_ratio_from(min(la, lb), la + lb) for la in las]
    ub = list(rqr)
    order = sorted(range(len(texts)), key=lambda j: -rqr[j])
    exact: dict = {}
    cur_max = -1.0
    m = None
    for j in order:
        if rqr[j] < cur_max:
            break  # sorted: everything after is lower still
        if texts[j] == target:
            # identical strings: ratio() is exactly 1.0 (all chars match) —
            # the overwhelmingly common case on real outlines, where the
            # heading box renders the outline text verbatim
            exact[j] = 1.0
            cur_max = 1.0
            continue
        inter = _multiset_inter(counters[j], cb)
        q = _ratio_from(inter, las[j] + lb)
        ub[j] = q
        if q < cur_max:
            continue
        if m is None:
            m = SequenceMatcher(None, "", target)
        m.set_seq1(texts[j])
        r = m.ratio()
        exact[j] = r
        if r > cur_max:
            cur_max = r
    return exact, cur_max, ub

# Supported chapter indices: 1.2.3 | 2.a.i | 2.a.IV | 1.2.3. | A | A.a.2
# (verbatim from libpdf/catalog.py:208-209)
CHAPTER_NUMBER_PATTERN = re.compile(
    r"^(?!\.)((^|\.)(([iIvVxX]{1,8})|[a-zA-Z]|[0-9]+))+\.?(?=[ \t]+\S+)"
)
# Standalone-number textbox check (libpdf/textbox.py:446-448)
STANDALONE_NUMBER_PATTERN = re.compile(
    r"^(?=\w)((^|\.)(([iIvVxX]{1,8})|[a-zA-Z]|[0-9]+))+\.?(?!.)"
)


def build_outline_tree(flat_outline: list) -> list:
    """Flat ``{path,title,page,x0,y1}`` rows → nested outline node list.

    ``path`` is the 1-based pre-order position path ("1", "1.2", …) emitted by
    the source stage; nesting mirrors the First/Next walk of
    ``libpdf/catalog.py:230-373`` (resolve_outline).
    """
    roots: list = []
    by_path: dict = {}
    for entry in flat_outline:
        node = {
            "title": entry["title"],
            "number": None,
            "path": entry["path"],
            "position": {
                "page": int(entry["page"]),
                "x0": float(entry["x0"]),
                "y1": float(entry["y1"]),
            },
            "content": [],
        }
        path = entry["path"]
        by_path[path] = node
        parent_path = path.rsplit(".", 1)[0] if "." in path else None
        if parent_path is None:
            roots.append(node)
        else:
            by_path[parent_path]["content"].append(node)
    return roots


def assign_chapter_numbers(chapters: list, virt_hierarchical_level: str = "1") -> None:
    """Number outline chapters from title text or virtual hierarchy level.

    In-place on the tree (mirrors catalog.py:177-227 exactly): a title whose
    prefix matches CHAPTER_NUMBER_PATTERN donates its number (stripped from
    the title); otherwise the chapter gets ``virt.<level path>``.
    """
    levels = virt_hierarchical_level.split(".")
    start_level = int(levels[-1])
    parent_level = ".".join(levels[:-1])
    for idx_chapter, chapter in enumerate(chapters):
        current_level = start_level + idx_chapter
        new_level = f"{parent_level}.{current_level}" if parent_level else f"{current_level}"
        chapter_title = chapter["title"].strip()
        match = CHAPTER_NUMBER_PATTERN.match(chapter["title"].strip())
        if match:
            chapter["number"] = match[0]
            chapter["title"] = chapter_title.replace(match[0], "", 1).strip()
        else:
            chapter["number"] = f"virt.{new_level}"
        if chapter["content"]:
            assign_chapter_numbers(chapter["content"], f"{new_level}.1")


def flatten_outline(tree: list, out: list | None = None) -> list:
    """Pre-order flatten (libpdf/textbox.py: _flatten_outline)."""
    if out is None:
        out = []
    for node in tree:
        out.append(node)
        if node["content"]:
            flatten_outline(node["content"], out)
    return out


def chapter_examiner(
    chapter: dict,
    textboxes: list,
    page_width: float,
    page_height: float,
    min_similarity: float = 0.6,
    rectangle_extend: float = 20.0,
    use_exact_shortcut: bool = True,
) -> list:
    """Find the textbox(es) on the page that render this outline chapter.

    ``textboxes``: dicts with keys x0,y0,x1,y1,text.  Returns the list of
    *winner indices* into ``textboxes`` (empty → ghost chapter).  Semantics of
    libpdf/textbox.py:298-383: candidates are the boxes completely inside a
    half-page-tall window vertically centred on the outline jump point.
    """
    y0w = max(chapter["position"]["y1"] - page_height / 4, 0.0)
    y1w = min(chapter["position"]["y1"] + page_height / 4, page_height)

    cand_idx = [
        i
        for i, tb in enumerate(textboxes)
        if tb["x0"] >= 0.0
        and tb["y0"] >= y0w
        and tb["x1"] <= page_width
        and tb["y1"] <= y1w
    ]
    if not cand_idx:
        return []

    # Full difflib ratio() per (candidate × target) dominated the whole
    # extraction profile (~65% of extract_document).  The referee only ever
    # READS exact values for argmax-winner groups and their tie-breaks, so
    # prune with difflib's documented upper bounds (real_quick_ratio ≥
    # quick_ratio ≥ ratio): exact ratios are computed branch-and-bound in
    # upper-bound order, everything provably below the per-target max keeps
    # its (strictly smaller) upper bound as a placeholder.  Winner groups,
    # whole-dict equality ties and threshold tests are bit-identical to the
    # all-exact reference semantics (textbox.py:357-371): any dict that
    # could equal a group max gets all its keys computed exactly.
    is_virt = "virt." in chapter["number"]
    # stripped text memoized on the textbox dict: the same boxes are
    # candidates for every chapter whose window overlaps them (~3× reuse
    # on outlined manuals); char counters memoize separately and LAZILY —
    # the exact-match short-circuit below usually returns before any
    # multiset work
    texts = []
    for i in cand_idx:
        tb = textboxes[i]
        t = tb.get("_exam_t")
        if t is None:
            t = tb["text"].strip()
            tb["_exam_t"] = t
        texts.append(t)

    # EXACT-MATCH SHORT-CIRCUIT (bit-identical to the full referee, which
    # dominates the extraction profile otherwise).  ratio() == 1.0 iff the
    # strings are identical, so when candidate text equals the decisive
    # target verbatim the winner group is decidable without any ratio:
    # - non-virt: a content-exact candidate has sims.content == 1.0, which
    #   no other candidate can reach (identical text is counted here), so
    #   _argmax_group('content') returns exactly the exact matchers — whose
    #   whole sim dicts are identical (same text ⇒ same ratios for every
    #   key) — and referee branch 1 fires, appending that winner alone;
    # - virt: a title-exact candidate wins _argmax_group('title') the same
    #   way, passes the > min_similarity test (1.0), and only the cheap
    #   standalone-number scan remains.
    # Ties among several exact matchers reduce to the whole-dict-equality
    # tie of _argmax_group ⇒ min vertical distance, replicated here.
    boxes = [textboxes[i] for i in cand_idx]

    def _nearest(idxs):
        return min(
            idxs, key=lambda j: abs(boxes[j]["y1"] - chapter["position"]["y1"])
        )

    if not use_exact_shortcut:
        pass
    elif not is_virt:
        content_target = f"{chapter['number']} {chapter['title']}"
        exact_idx = [j for j, t in enumerate(texts) if t == content_target]
        if exact_idx:
            j = exact_idx[0] if len(exact_idx) == 1 else _nearest(exact_idx)
            return [cand_idx[j]]
    elif 1.0 > min_similarity:
        exact_idx = [j for j, t in enumerate(texts) if t == chapter["title"]]
        if exact_idx:
            j = exact_idx[0] if len(exact_idx) == 1 else _nearest(exact_idx)
            winners = [j]
            potential_number = [
                i
                for i, b in enumerate(boxes)
                if b["x0"] < boxes[j]["x0"]
                and abs(b["y0"] - boxes[j]["y0"]) < rectangle_extend
                and abs(b["y1"] - boxes[j]["y1"]) < rectangle_extend
            ]
            if len(potential_number) == 1 and STANDALONE_NUMBER_PATTERN.match(
                texts[potential_number[0]]
            ):
                winners.append(potential_number[0])
            return [cand_idx[j2] for j2 in winners]
    counters = []
    for i, t in zip(cand_idx, texts):
        tb = textboxes[i]
        c = tb.get("_exam_c")
        if c is None:
            c = _char_counts(t)
            tb["_exam_c"] = c
        counters.append(c)
    keys = ("title",) if is_virt else ("title", "number", "content")
    targets = {"title": chapter["title"]}
    if not is_virt:
        targets["number"] = chapter["number"]
        targets["content"] = f"{chapter['number']} {chapter['title']}"
    res = {k: _pruned_ratios(texts, counters, targets[k]) for k in keys}
    needed = set()
    for k in keys:
        exact, mx, _ = res[k]
        needed |= {j for j, v in exact.items() if v == mx}
    for k in keys:
        exact, _, _ = res[k]
        missing = needed - exact.keys()
        if missing:
            m = SequenceMatcher(None, "", targets[k])
            for j in missing:
                m.set_seq1(texts[j])
                exact[j] = m.ratio()
    sims = []
    for j in range(len(texts)):
        d = {"title": None, "number": None, "content": None}
        for k in keys:
            exact, _, ub = res[k]
            d[k] = exact.get(j, ub[j])
        sims.append(d)

    winners_local = _similarity_referee(
        sims,
        [textboxes[i] for i in cand_idx],
        chapter,
        min_similarity,
        rectangle_extend,
    )
    return [cand_idx[j] for j in winners_local]


def _argmax_group(sims: list, boxes: list, chapter: dict, key: str) -> int:
    """Indices whose whole sim-dict equals the max-by-``key`` element, then
    min vertical distance to the outline jump point as tie-break
    (libpdf/textbox.py:406-421 — the whole-dict equality is intentional)."""
    best = max(sims, key=lambda s: s[key])
    winner_idx = [i for i, s in enumerate(sims) if s == best]
    if len(winner_idx) > 1:
        return min(
            winner_idx,
            key=lambda i: abs(boxes[i]["y1"] - chapter["position"]["y1"]),
        )
    return winner_idx[0]


def _similarity_referee(
    sims: list,
    boxes: list,
    chapter: dict,
    min_similarity: float,
    rectangle_extend: float,
) -> list:
    """libpdf/textbox.py:386-528, returning local winner indices."""
    winners: list = []
    title_winner = _argmax_group(sims, boxes, chapter, "title")

    if "virt." in chapter["number"]:
        if sims[title_winner]["title"] > min_similarity:
            winners.append(title_winner)
            # a standalone number textbox left of the title at the same height
            potential_number = [
                i
                for i, b in enumerate(boxes)
                if b["x0"] < boxes[title_winner]["x0"]
                and abs(b["y0"] - boxes[title_winner]["y0"]) < rectangle_extend
                and abs(b["y1"] - boxes[title_winner]["y1"]) < rectangle_extend
            ]
            if len(potential_number) == 1 and STANDALONE_NUMBER_PATTERN.match(
                boxes[potential_number[0]]["text"].strip()
            ):
                winners.append(potential_number[0])
    else:
        content_winner = _argmax_group(sims, boxes, chapter, "content")
        number_winner = _argmax_group(sims, boxes, chapter, "number")
        if sims[content_winner]["content"] == 1:
            winners.append(content_winner)
        elif (
            sims[content_winner]["content"] < sims[title_winner]["title"]
            and number_winner != title_winner
            and sims[number_winner]["number"] > min_similarity
            and sims[title_winner]["title"] > min_similarity
        ):
            # number and title split into two textboxes by layout analysis
            winners.append(number_winner)
            winners.append(title_winner)
        elif (
            title_winner == content_winner
            and sims[content_winner]["content"] >= sims[title_winner]["title"]
            and sims[content_winner]["content"] > min_similarity
        ):
            winners.append(content_winner)
    return winners


def ghost_chapter_bbox(
    chapter: dict, page_width: float, rectangle_extend: float = 20.0
) -> tuple:
    """Position of an outline chapter with no matched textbox
    (libpdf/textbox.py:271-296)."""
    x0 = chapter["position"]["x0"]
    y1 = chapter["position"]["y1"]
    y0 = y1 - rectangle_extend if y1 - rectangle_extend > 0 else 0.0
    x1 = x0 + rectangle_extend if x0 + rectangle_extend < page_width else page_width
    return (x0, y0, x1, y1)
