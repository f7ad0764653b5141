"""HTML main-content extraction: DOM heuristics over stdlib html.parser.

The north rule names "HTML boilerplate strip … DOM heuristics" alongside
the PDF/layout parse; this kernel is that leg.  It is the HTML analog of
the PDF byte decoder (kernels/pdfobj.py / pdftext.py): pure stdlib,
per-document, deterministic.

Approach (public-knowledge heuristics):

* a tolerant DOM builder over ``html.parser.HTMLParser`` (void elements,
  unclosed tags, stray close tags — all absorbed the way browsers do);
* structural pruning of non-content subtrees — ``<script>``, ``<style>``,
  ``<nav>``, ``<aside>``, ``<footer>``, ``<header>``, forms — plus
  class/id pattern pruning (``sidebar``, ``comment``, ``ad``, ``banner``,
  …), the convention readability-style extractors rely on;
* shallow text features per remaining block — text length and **link
  density** (share of characters under ``<a>``) — in the spirit of
  Boilerpipe (Kohlschütter et al., "Boilerplate Detection using Shallow
  Text Features", WSDM 2010): a block whose text is mostly anchor text is
  navigation, not prose, whatever its markup says.

The module also ships ``render_html`` — a deterministic page-chrome
renderer used as the *generator-as-oracle*: it wraps a known main text in
realistic boilerplate (masthead, nav, sidebar, inline ads, a comments
section, footer), so ``extract(render(text)) == text`` is an exact,
SQL-checkable contract (the same trick as kernels/pdfwrite.py for the
PDF byte path).
"""

from __future__ import annotations

import html as _html
import re
import zlib
from html.parser import HTMLParser

# -- DOM ---------------------------------------------------------------

# tags that never close (HTML5 void elements)
VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# subtrees that are never main content, by tag alone
PRUNE_TAGS = frozenset(
    "script style noscript template svg iframe form button select option "
    "nav aside footer header head".split()
)

# strictly inline phrasing elements: their text belongs to the enclosing
# block; anything NOT listed here (and not pruned) is a container we
# recurse into — unknown/custom tags behave like divs, as in browsers
INLINE_TAGS = frozenset(
    "b i em strong span code small sub sup u s abbr time cite q mark kbd "
    "var samp br img wbr picture data dfn bdi bdo ruby rt rp ins del".split()
)

# class/id vocabulary that marks boilerplate containers (the readability /
# arc90 convention); matched as substrings of the class and id attributes
BOILER_PAT = re.compile(
    r"(?:^|[\s_-])(?:nav|menu|sidebar|footer|header|masthead|comment|banner|"
    r"ads?|advert|sponsor|share|social|related|breadcrumbs?|pagination|"
    r"widget|cookie|promo|popup|subscribe)(?:$|[\s_-])|"
    r"(?:nav|menu|sidebar|footer|masthead|comment|banner|advert|sponsor|"
    r"breadcrumb|widget|cookie)",
    re.I,
)

# elements that delimit a text block (everything else is inline)
BLOCK_TAGS = frozenset(
    "p h1 h2 h3 h4 h5 h6 li td th dd dt pre blockquote figcaption "
    "div section article main body ul ol table tr caption".split()
)

# blocks whose anchor-text share exceeds this are navigation, not prose
LINK_DENSITY_MAX = 0.5


class _Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # _Node | str


class _DomBuilder(HTMLParser):
    """Tolerant tree builder: implicit closes for mismatched tags."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {})
        self.stack = [self.root]
        self.title_parts: list[str] = []
        self._in_title = 0

    # browsers' implicit end tags (HTML5 "optional tags"): a new block
    # closes an open <p>; repeated li/td/th/tr/dd/dt/option close their
    # predecessor.  html.parser does none of this by itself, and without
    # it unclosed-<p> soups nest instead of chaining (wrong text order).
    _SELF_CLOSERS = {
        "li": ("li",),
        "td": ("td", "th"),
        "th": ("td", "th"),
        "tr": ("td", "th", "tr"),
        "dd": ("dd", "dt"),
        "dt": ("dd", "dt"),
        "option": ("option",),
    }

    def handle_starttag(self, tag, attrs):
        top = self.stack[-1].tag
        if top == "p" and (tag == "p" or tag in BLOCK_TAGS):
            self.stack.pop()
        elif top in self._SELF_CLOSERS.get(tag, ()):
            self.stack.pop()
        node = _Node(tag, dict(attrs))
        self.stack[-1].children.append(node)
        if tag == "title":
            self._in_title += 1
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(_Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        if tag == "title" and self._in_title:
            self._in_title -= 1
        if tag in VOID_TAGS:
            return
        # close the nearest matching open tag (browsers' implicit closes);
        # a stray close tag with no match is dropped
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)
        if data:
            self.stack[-1].children.append(data)


def parse_html(text: str) -> tuple[_Node, str]:
    """HTML → (DOM root, page title)."""
    b = _DomBuilder()
    b.feed(text)
    b.close()
    title = " ".join("".join(b.title_parts).split())
    return b.root, title


# -- main-content classification ---------------------------------------


def _is_boiler(node: _Node) -> bool:
    if node.tag in PRUNE_TAGS:
        return True
    marker = node.attrs.get("class", "") or ""
    nid = node.attrs.get("id", "") or ""
    return bool(
        (marker and BOILER_PAT.search(marker)) or (nid and BOILER_PAT.search(nid))
    )


def _collect_blocks(node: _Node, out: list) -> tuple[int, int]:
    """Post-order walk: returns (text_chars, link_chars) contributed by
    inline content directly under ``node`` that was NOT already claimed by
    a nested block element.  Appends finished blocks to ``out`` as
    ``(text, link_chars, total_chars)``."""
    pieces: list[str] = []
    link_chars = 0
    for child in node.children:
        if isinstance(child, str):
            pieces.append(child)
            continue
        if _is_boiler(child):
            continue
        if child.tag == "a":
            # anchors are inline: their text stays, but counts toward the
            # block's link density
            t, lc = _flatten_inline(child)
            pieces.append(t)
            link_chars += len(" ".join(t.split()))
            continue
        if child.tag in INLINE_TAGS:
            t, lc = _flatten_inline(child)
            pieces.append(t)
            link_chars += lc
            continue
        # block element or unknown container: recurse — nested blocks
        # emit themselves in document order
        _collect_blocks(child, out)
    text = " ".join("".join(pieces).split())
    if text and node.tag not in ("#root", "html"):
        out.append((text, link_chars, len(text)))
    return len(text), link_chars


def _flatten_inline(node: _Node) -> tuple[str, int]:
    """Inline subtree → (concatenated text, chars under <a>)."""
    pieces: list[str] = []
    link = 0
    for child in node.children:
        if isinstance(child, str):
            pieces.append(child)
        elif _is_boiler(child):
            continue
        else:
            t, lc = _flatten_inline(child)
            pieces.append(t)
            if child.tag == "a":
                link += len(" ".join(t.split()))
            else:
                link += lc
    return "".join(pieces), link


def extract_blocks(html_text: str) -> tuple[str, list[str], int]:
    """HTML string → (title, kept block texts in document order, n_dropped).

    The block list is the per-paragraph view of the main content — what a
    span-document needs; ``extract_main`` is the joined convenience form.
    """
    root, title = parse_html(html_text)
    blocks: list[tuple[str, int, int]] = []
    _collect_blocks(root, blocks)
    kept: list[str] = []
    dropped = 0
    for text, link_chars, total_chars in blocks:
        if total_chars and link_chars / total_chars > LINK_DENSITY_MAX:
            dropped += 1
            continue
        kept.append(text)
    return title, kept, dropped


def extract_main(html_text: str) -> dict:
    """HTML string → main-content record.

    Returns ``{"main_text", "title", "n_blocks", "n_dropped"}`` where
    ``main_text`` is the space-joined text of the blocks that survive
    structural pruning and the link-density rule, in document order.
    """
    title, kept, dropped = extract_blocks(html_text)
    main_text = " ".join(" ".join(kept).split())
    return {
        "main_text": main_text,
        "title": title,
        "n_blocks": len(kept),
        "n_dropped": dropped,
    }


# -- deterministic page renderer (generator-as-oracle) ------------------

_JUNK_VOCAB = (
    "home about contact login privacy terms sitemap subscribe archive "
    "categories popular trending copyright reserved cookie policy "
    "advertisement sponsored offer deal click here read more related "
    "posts share tweet follow newsletter trending latest featured"
).split()


class _Lcg:
    """Tiny deterministic PRNG (no random module — workers must replay)."""

    def __init__(self, seed: int):
        self.s = seed & 0xFFFFFFFF or 1

    def next(self, n: int) -> int:
        self.s = (self.s * 1103515245 + 12345) & 0x7FFFFFFF
        return self.s % n


def _junk(rng: _Lcg, n: int) -> str:
    return " ".join(_JUNK_VOCAB[rng.next(len(_JUNK_VOCAB))] for _ in range(n))


def _content_paras(paras, rng: _Lcg) -> list[str]:
    """Main-text paragraphs as <p> markup, some words wrapped inline."""
    out = []
    esc = _html.escape
    for para in paras:
        chunk = [esc(w) for w in para]
        if chunk and rng.next(3) == 0:
            j = rng.next(len(chunk))
            # anchors only in paragraphs long enough that one linked word
            # stays under the extractor's link-density rule; the rule is
            # RIGHT to kill a 1-2 word block that is pure anchor text
            wrap = ("b", "em", "a")[rng.next(3) if len(chunk) >= 6 else rng.next(2)]
            attr = ' href="#ref"' if wrap == "a" else ""
            chunk[j] = f"<{wrap}{attr}>{chunk[j]}</{wrap}>"
        out.append("<p>" + " ".join(chunk) + "</p>")
    return out


def render_html(doc_id, text: str, lang: str = "en") -> str:
    """Wrap ``text`` in deterministic page chrome.

    The main text is split into ``<p>`` blocks (some words wrapped in
    inline ``<b>``/``<em>``/``<a>`` markup) and embedded in one of TWO
    page archetypes chosen by the doc seed — a modern semantic layout
    (header/nav/aside/article/footer) or a legacy table layout (nav and
    sidebar in class-marked ``<td>`` cells) — so the extraction
    heuristics cannot overfit a single template.  Both carry junk nav,
    sidebar, inline ads, comments and footer content derived only from
    ``doc_id``.  ``extract_main`` must recover ``text`` exactly and the
    ``<title>`` is ``text[:40]``.
    """
    rng = _Lcg(zlib.crc32(str(doc_id).encode()))
    esc = _html.escape
    words = text.split(" ") if text else []
    paras: list[list[str]] = []
    i = 0
    while i < len(words):
        step = 8 + rng.next(9)  # 8-16 words per paragraph
        paras.append(words[i : i + step])
        i += step
    legacy = rng.next(3) == 0  # ~1/3 of pages use the table archetype

    out: list[str] = [
        "<!DOCTYPE html>",
        f'<html lang="{esc(lang)}">',
        "<head><meta charset=\"utf-8\">",
        f"<title>{esc(text[:40])}</title>",
        "<style>body{margin:0;font:16px serif}.ad{color:#999}</style>",
        "<script>window.__t=Date.now();</script>",
        "</head>",
        "<body>",
    ]

    if legacy:
        # 1999-web archetype: table scaffold, class-marked cells
        out.append('<table width="100%"><tr><td class="nav" colspan="2">')
        for _ in range(3 + rng.next(4)):
            out.append(f'<a href="/{_junk(rng, 1)}">{_junk(rng, 1)}</a>')
        out.append('</td></tr><tr><td class="sidebar" width="20%">')
        for _ in range(2 + rng.next(4)):
            out.append(f'<a href="#">{_junk(rng, 2)}</a><br>')
        out.append("<p>" + _junk(rng, 6) + "</p></td><td>")
        for p in _content_paras(paras, rng):
            out.append(p)
            if rng.next(4) == 0:
                out.append(f'<div class="ad">{_junk(rng, 4)}</div>')
        out.append('</td></tr><tr><td class="footer" colspan="2">'
                   + _junk(rng, 4) + "</td></tr></table>")
        out.append('<div id="comments"><h3>' + _junk(rng, 1) + "</h3>")
        for _ in range(rng.next(3) + 1):
            out.append(
                f'<div class="comment"><p>{_junk(rng, 5 + rng.next(8))}</p></div>'
            )
        out.append("</div>")
    else:
        out.append('<header class="masthead"><h1><a href="/">'
                   f"{_junk(rng, 2)}</a></h1>")
        out.append("<nav><ul>")
        for _ in range(3 + rng.next(4)):
            out.append(f'<li><a href="/{_junk(rng, 1)}">{_junk(rng, 1)}</a></li>')
        out.append("</ul></nav></header>")
        out.append('<div class="wrapper">')
        out.append('<aside class="sidebar"><h3>' + _junk(rng, 1) + "</h3><ul>")
        for _ in range(2 + rng.next(4)):
            out.append(f'<li><a href="#">{_junk(rng, 2)}</a></li>')
        out.append("</ul><p>" + _junk(rng, 6) + "</p></aside>")
        out.append("<main><article>")
        for p in _content_paras(paras, rng):
            out.append(p)
            if rng.next(4) == 0:
                out.append(f'<div class="ad">{_junk(rng, 4)}</div>')
        out.append("</article>")
        out.append('<div id="comments"><h3>' + _junk(rng, 1) + "</h3>")
        for _ in range(rng.next(3) + 1):
            out.append(
                f'<div class="comment"><p>{_junk(rng, 5 + rng.next(8))}</p></div>'
            )
        out.append("</div></main></div>")
        out.append(
            "<footer><p>" + _junk(rng, 4) + '</p><nav><a href="/">'
            + _junk(rng, 1) + "</a></nav></footer>"
        )
    out.append("</body></html>")
    return "\n".join(out)
