"""Smart page crop: repeating header/footer detection and removal.

Functional re-derivation of
``/root/reference/libpdf/extract.py:225-443`` (smart_page_crop_header_footer +
check_false_positive_header_footer).  The detection is a *per-document grouped
aggregate*: for every element whose bbox lies in the top/bottom relative-margin
band, count the pages that carry an element at the same (y0, y1) within 1 pt;
candidates present on ≥ ``occurrence_pct`` of pages are headers/footers,
subject to a false-positive refinement that walks candidate y-levels from the
band edge inward checking page continuity.

The reference's refinement deletes from the list it iterates
(extract.py:427-441), skipping the element right after each deletion — that
observable behavior is preserved deliberately (it decides which elements
survive on sparse candidate sets); fixtures pin it.

Elements are ``{"eid": hashable, "page": int, "y0": float, "y1": float}``;
the return value is the set of ``eid`` to drop.  Pure per-document kernel —
at dataset scale it runs inside ``map_batches``, never as a cross-document
shuffle (the grouping key never leaves the document row).
"""

from __future__ import annotations


def _round4(v: float) -> float:
    return float(f"{v:.4f}")


def _group_by_page(elements: list) -> dict:
    pages: dict = {}
    for el in elements:
        pages.setdefault(el["page"], []).append(el)
    return pages


def _refine_false_positives(elements: list, n_pages: int, cfg) -> list:
    """check_false_positive_header_footer (extract.py:354-443), faithfully
    including the delete-while-iterating recursion."""
    if not elements:
        return elements
    pages = _group_by_page(elements)
    low_pos = {
        page: min(_round4(el["y0"]) for el in els) for page, els in pages.items()
    }
    page_keys = list(low_pos)
    start_page, end_page = page_keys[0], page_keys[-1]
    span = end_page - start_page + 1
    page_breaks = span - len(low_pos)
    lowest = min(set(low_pos.values()))

    def _delete_lowest_and_recurse(els: list) -> list:
        idx = 0
        # replicate `for idx, e in enumerate(lst): del lst[idx]` semantics:
        # after a deletion the next element slides into the freed slot and is
        # skipped because the loop index still advances.
        i = 0
        live = list(els)
        while i < len(live):
            if _round4(live[i]["y0"]) == lowest:
                del live[i]
                i += 1  # skip the slid-in element, as the reference does
            else:
                i += 1
        del idx
        if live:
            return _refine_false_positives(live, n_pages, cfg)
        return live

    if page_breaks / span <= cfg.pages_missing_header_or_footer_percentage:
        if len(set(low_pos.values())) != 1:
            continuous_pages = sorted(
                page for page, v in low_pos.items() if v == lowest
            )
            continuous_span = continuous_pages[-1] - continuous_pages[0] + 1
            if len(continuous_pages) < (
                continuous_span * cfg.header_or_footer_continuous_percentage
            ) and len(set(low_pos.values())) > max(
                1, cfg.unique_header_or_footer_elements_percentage * n_pages
            ):
                return _delete_lowest_and_recurse(elements)
        elif len(elements) == 1:
            return []
    else:
        return _delete_lowest_and_recurse(elements)
    return elements


def _band_candidates(elements: list, in_band, pages: dict, n_pages: int, cfg) -> list:
    """Occurrence counting (extract.py:259-290 / 307-338): a band element is a
    candidate when elements at its (y0, y1) ± 1pt appear on enough pages."""
    candidates = []
    threshold = cfg.header_footer_occurrence_percentage * n_pages
    for page_els in pages.values():
        for el in page_els:
            if not in_band(el):
                continue
            page_cnt = 0
            for other_els in pages.values():
                if any(
                    abs(el["y0"] - o["y0"]) < 1 and abs(el["y1"] - o["y1"]) < 1
                    for o in other_els
                ):
                    page_cnt += 1
            if page_cnt >= threshold:
                candidates.append(el)
    return candidates


def find_header_footer_eids(
    elements: list, n_pages: int, page_height: float, cfg
) -> set:
    """Return the eids of elements the smart crop removes (header pass first,
    then footer pass on the survivors, as extract.py:301-351 does)."""
    removed: set = set()
    header_bottom = (1 - cfg.smart_page_crop_top) * page_height
    footer_top = cfg.smart_page_crop_bottom * page_height

    pages = _group_by_page(elements)
    header_cands = _band_candidates(
        elements, lambda el: el["y0"] >= header_bottom, pages, n_pages, cfg
    )
    real_headers = _refine_false_positives(header_cands, n_pages, cfg)
    removed |= {el["eid"] for el in real_headers}

    survivors = [el for el in elements if el["eid"] not in removed]
    pages = _group_by_page(survivors)
    footer_cands = _band_candidates(
        survivors, lambda el: el["y1"] <= footer_top, pages, n_pages, cfg
    )
    real_footers = _refine_false_positives(footer_cands, n_pages, cfg)
    removed |= {el["eid"] for el in real_footers}
    return removed
