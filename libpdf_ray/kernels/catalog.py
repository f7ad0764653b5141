"""Catalog kernels: Names/Dests tree flattening and First/Next outline walk.

Re-derives, over the raw sidecar encodings (schema.py ``names_nodes`` /
``outline_nodes``):

- ``get_named_destination`` + ``resolve_name_obj``
  /root/reference/libpdf/catalog.py:25-133 — recursive Kids flattening of
  the PDF Names tree into a flat ``{name: (page, x, y)}`` map;
- ``get_outline`` + ``resolve_outline``
  /root/reference/libpdf/catalog.py:136-174,230-373 — the First/Next
  linked-structure walk, handling explicit destinations, named
  destinations (resolved through the names map) and non-GoTo actions.

Reference quirk preserved: an outline node whose action points OUTSIDE the
document (non-GoTo) is not emitted, but its ``First`` children are resolved
into the PREVIOUS emitted sibling's content (resolve_outline appends into
``outline_list[len-1]['content']``, catalog.py:365-371).  The engine guards
the reference's crash case (skipped node with children but no previous
sibling) by attaching at the current level instead.

Unlike the reference these are pure per-document functions — no module
globals (catalog.py:18-22); every Ray task derives the identical catalog
from the row alone.
"""

from __future__ import annotations


def flatten_names_tree(names_nodes: list) -> dict:
    """Raw Names/Kids node list → ``{name: (page, x, y)}``.

    The root is the node no other node's ``kids`` references (falling back
    to node 0, then the first listed node, so legacy encodings keep
    working).  Interior nodes carry ``kids`` (node ids); leaves carry
    ``names``.  Mirrors resolve_name_obj's recursive Kids descent
    (catalog.py:116-133) with a visited-set cycle guard."""
    if not names_nodes:
        return {}
    by_id = {int(n["node_id"]): n for n in names_nodes}
    referenced = {
        int(k) for n in names_nodes for k in (n.get("kids") or [])
    }
    root_candidates = sorted(set(by_id) - referenced)
    if root_candidates:
        root = root_candidates[0] if 0 not in root_candidates else 0
    else:  # fully cyclic encoding — keep the legacy node-0 entry point
        root = 0 if 0 in by_id else next(iter(by_id))
    out: dict = {}
    seen: set = set()

    def visit(node_id: int) -> None:
        if node_id in seen or node_id not in by_id:
            return
        seen.add(node_id)
        node = by_id[node_id]
        for entry in node.get("names") or []:
            out[entry["name"]] = (
                int(entry["page"]),
                float(entry["x"]),
                float(entry["y"]),
            )
        for kid in node.get("kids") or []:
            visit(int(kid))

    visit(root)
    return out


def walk_outline(
    outline_nodes: list, outline_root: int, named_dests: dict
) -> list:
    """First/Next walk → nested outline tree in the engine's node shape.

    Returns a list of ``{"title", "number": None, "path", "position":
    {"page", "x0", "y1"}, "content": [...]}`` nodes, pre-order positional
    paths ("1", "1.2", …) assigned over the EMITTED nodes (skipped external
    nodes do not consume a path slot — they are invisible to numbering,
    exactly as in the reference where they never enter outline_list)."""
    if outline_root is None or outline_root < 0 or not outline_nodes:
        return []
    by_id = {int(n["node_id"]): n for n in outline_nodes}

    def resolve_dest(node: dict):
        kind = node.get("dest_kind") or "explicit"
        if kind in ("explicit", "action_explicit"):
            return (
                int(node["dest_page"]),
                float(node["dest_x"]),
                float(node["dest_y"]),
            )
        if kind in ("named", "action_named"):
            dest = named_dests.get(node.get("dest_name") or "")
            return dest  # None when the name is unknown → node skipped
        return None  # external / non-GoTo action

    def visit(node_id: int, siblings: list, seen: set) -> None:
        nid = node_id
        while nid is not None and nid >= 0 and nid in by_id and nid not in seen:
            seen.add(nid)
            node = by_id[nid]
            dest = resolve_dest(node)
            if dest is not None:
                page, x, y = dest
                entry = {
                    "title": node["title"],
                    "number": None,
                    "position": {"page": page, "x0": x, "y1": y},
                    "content": [],
                }
                siblings.append(entry)
                target = entry["content"]
            elif siblings:
                # reference behavior: children of a skipped node nest under
                # the previous emitted sibling (catalog.py:365-371)
                target = siblings[-1]["content"]
            else:
                target = siblings
            first = int(node.get("first", -1) if node.get("first") is not None else -1)
            if first >= 0:
                visit(first, target, seen)
            nid = int(node.get("next", -1) if node.get("next") is not None else -1)

    roots: list = []
    visit(int(outline_root), roots, set())
    # positional paths reflect the FINAL tree (skipped nodes consume no
    # slot; adopted children sit at their host's tail)
    _assign_paths(roots, "")
    return roots


def _assign_paths(nodes: list, prefix: str) -> None:
    for i, node in enumerate(nodes):
        node["path"] = f"{prefix}{i + 1}"
        _assign_paths(node["content"], f"{node['path']}.")


def resolve_catalog(doc: dict) -> tuple:
    """Per-document catalog resolution (the engine analog of
    ``extract_catalog``, catalog.py:706-741 — minus the module global).

    Returns ``(outline_tree, named_dests_dict)`` where the tree is in the
    walk_outline node shape (unnumbered) and named_dests maps
    ``name → (page, x, y)``."""
    named = flatten_names_tree(list(doc.get("names_nodes") or []))
    root = doc.get("outline_root")
    tree = walk_outline(
        list(doc.get("outline_nodes") or []),
        -1 if root is None else int(root),
        named,
    )
    return tree, named


def resolve_raw_annotations(raw_annots: list, pages: list) -> list:
    """Resolve RAW page-annotation objects into link annos (the engine
    analog of ``annotation_dict_extraction`` + ``update_ann_info``,
    libpdf/catalog.py:403-583):

    - only ``Subtype == Link`` annots are considered (catalog.py:572);
    - an ``/A`` action carrier counts only when the action is ``GoTo`` —
      any other action (URI, Launch, …) targets outside the document and
      the annot is skipped (catalog.py:450,485-490);
    - explicit destinations reference the target page by OBJECT id; the
      page number is found by scanning the page list for a matching id
      (``get_explict_dest``, catalog.py:384-389);
    - ``[page /XYZ x y zoom]`` yields (x, y); any other dest array form
      (``/Fit`` &c.) falls back to x=0 / y=MediaBox top of the TARGET
      page (catalog.py:393-398);
    - named destinations pass through as ``dest_name`` for the Names-tree
      lookup downstream (catalog.py:471-483).

    Returns resolved dicts ``{page, x0, y0, x1, y1, dest_page, dest_x,
    dest_y, dest_name}`` — the shape ``extract_linked_chars`` consumes.
    """
    if not raw_annots:
        return []
    page_by_obj = {}
    for p in pages or []:
        oid = p.get("obj_id")
        if oid is not None:
            page_by_obj[int(oid)] = p
    out: list = []
    for ann in raw_annots:
        if (ann.get("subtype") or "") != "Link":
            continue
        if (ann.get("encoding") or "") == "action" and (
            ann.get("action_type") or ""
        ) != "GoTo":
            continue  # link target is not in this document
        rec = {
            "page": int(ann["page"]),
            "x0": float(ann["x0"]),
            "y0": float(ann["y0"]),
            "x1": float(ann["x1"]),
            "y1": float(ann["y1"]),
            "dest_page": 0,
            "dest_x": 0.0,
            "dest_y": 0.0,
            "dest_name": "",
        }
        kind = ann.get("dest_kind") or ""
        if kind == "named":
            name = ann.get("dest_name") or ""
            if not name:
                continue
            rec["dest_name"] = name
        else:
            target = page_by_obj.get(int(ann.get("dest_page_obj") or -1))
            if target is None:
                # dangling page object reference — the reference would
                # carry dest_page_num=None and fail later; drop the annot
                continue
            rec["dest_page"] = int(target["number"])
            if kind == "xyz":
                rec["dest_x"] = float(ann.get("dest_x") or 0.0)
                rec["dest_y"] = float(ann.get("dest_y") or 0.0)
            else:  # fit (or any non-XYZ dest array): page top
                rec["dest_x"] = 0.0
                rec["dest_y"] = float(target.get("height") or 0.0)
        out.append(rec)
    return out
