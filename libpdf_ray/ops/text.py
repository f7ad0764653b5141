"""Text-analysis operators for large-scale training-data pipelines.

All operators are vectorized batch transforms over the ``documents`` table
shape ``(doc_id, text, lang, source, n_chars)``.  Stateful pieces (compiled
regexes, stopword tables) live in callable classes → actor pools via
``map_batches(Cls, concurrency=N)``; nothing here touches the driver.

Aggregate outputs follow the integer-exact discipline: every aggregate is a
sum/count of integers, with at most one final division — so the DuckDB
oracle computes bit-identical values (no float-association drift).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

TOKEN_SPLIT = re.compile(r"\s+")
# a BPE-ish subword proxy: runs of letters, digits, or single punctuation —
# the cheap deterministic stand-in for a real tokenizer's piece count
BPE_ISH = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")

# tiny per-language stopword tables for the n-gram/stopword language-ID
# heuristic (public-knowledge word lists)
LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "for", "on", "with"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans"},
    "es": {"el", "la", "los", "y", "de", "un", "una", "es", "para", "en"},
}


def add_text_stats(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Vectorized per-document counters: token_count (whitespace tokens),
    alpha_chars ([A-Za-z]), digit_chars, bpe_ish_tokens, len_chars."""
    text = batch[text_col].fillna("")
    stripped = text.str.strip()
    batch["token_count"] = np.where(
        stripped == "", 0, stripped.str.split(TOKEN_SPLIT).str.len()
    ).astype("int64")
    batch["alpha_chars"] = text.str.count(r"[A-Za-z]").astype("int64")
    batch["digit_chars"] = text.str.count(r"[0-9]").astype("int64")
    batch["bpe_ish_tokens"] = text.str.count(BPE_ISH).astype("int64")
    batch["len_chars"] = text.str.len().astype("int64")
    return batch


class LangIdModel:
    """Stopword/character-class language identifier (actor-pool stage).

    ``__init__`` builds the lookup tables once per actor; ``__call__`` scores
    batches.  CJK detection falls back to a unicode-range ratio."""

    def __init__(self):
        self.tables = {lang: frozenset(ws) for lang, ws in LANG_STOPWORDS.items()}
        self.word_re = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.cjk_re = re.compile(r"[一-鿿]")

    def predict_one(self, text: str) -> str:
        if not text:
            return "und"
        cjk = len(self.cjk_re.findall(text))
        if cjk * 2 > len(text.replace(" ", "")):
            return "zh"
        words = [w.lower() for w in self.word_re.findall(text)]
        if not words:
            return "und"
        best_lang, best_hits = "und", 0
        for lang, table in self.tables.items():
            hits = sum(1 for w in words if w in table)
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        return best_lang if best_hits > 0 else "en"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["lang_pred"] = [self.predict_one(t) for t in batch["text"].fillna("")]
        return batch


class QualityScorer:
    """Heuristic document-quality scoring (length / punctuation / stopword
    ratios) — the usual pre-training filter features, one actor-pool stage."""

    def __init__(self):
        self.stop_all = frozenset().union(*LANG_STOPWORDS.values())
        self.token_re = re.compile(r"\S+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        n_tokens, stop_hits, mean_len = [], [], []
        for t in texts:
            toks = self.token_re.findall(t)
            n_tokens.append(len(toks))
            stop_hits.append(sum(1 for w in toks if w.lower() in self.stop_all))
            mean_len.append(
                sum(len(w) for w in toks) / len(toks) if toks else 0.0
            )
        batch["q_tokens"] = np.asarray(n_tokens, dtype="int64")
        batch["q_stop_hits"] = np.asarray(stop_hits, dtype="int64")
        batch["q_mean_token_len"] = np.asarray(mean_len)
        batch["q_keep"] = (
            (batch["q_tokens"] >= 5)
            & (batch["q_mean_token_len"] >= 2.0)
            & (batch["q_mean_token_len"] <= 12.0)
        )
        return batch


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a_64(data: bytes) -> int:
    """FNV-1a 64-bit — the deterministic, dependency-free content hash used
    for fingerprints and shingles (public-domain algorithm).  Vectorized:
    the byte fold runs as numpy uint64 wrap-around arithmetic."""
    if not data:
        return int(_FNV_OFFSET)
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    h = _FNV_OFFSET
    # len(data) iterations of scalar work would be interpreted-Python-slow;
    # a single value still needs the sequential fold, but fingerprints call
    # the windowed form below, which folds ALL windows at once
    for b in arr:
        h = (h ^ b) * _FNV_PRIME
    return int(h)


def rolling_fingerprint(text: str, window: int = 16) -> int:
    """Document fingerprint: min of FNV-1a over sliding char windows — a
    cheap locality-sensitive rolling-hash sketch for near-identity probes.

    Vectorized (round-2 rework of the per-byte/per-window Python loops):
    all windows are materialized as an (n_windows, window) uint8 matrix via
    stride tricks, and the FNV fold runs ``window`` numpy passes over every
    window simultaneously — identical values to the scalar version."""
    data = text.encode("utf-8", "ignore")
    if len(data) <= window:
        return fnv1a_64(data)
    step = max(1, window // 2)
    arr = np.frombuffer(data, dtype=np.uint8)
    wins = np.lib.stride_tricks.sliding_window_view(arr, window)[::step]
    h = np.full(len(wins), _FNV_OFFSET, dtype=np.uint64)
    for j in range(window):
        h = (h ^ wins[:, j].astype(np.uint64)) * _FNV_PRIME
    return int(h.min())


def add_fingerprint(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    batch["fingerprint"] = [
        rolling_fingerprint(t or "") for t in batch[text_col].fillna("")
    ]
    # store as string: uint64 does not round-trip pandas→Arrow cleanly
    batch["fingerprint"] = batch["fingerprint"].map(lambda v: f"{v:016x}")
    return batch


# ---- PII scrubbing ------------------------------------------------------
# Redaction patterns chosen to parse IDENTICALLY under Python re and RE2
# (DuckDB's regexp engine): plain character classes and counted repeats,
# no backreferences / lookaround, ASCII classes only (the corpus is ASCII
# — pinned by test_documents_ascii_precondition).  The literals are shared
# verbatim with the SQL oracle.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d[\d\- ]{7,}\d"

#: scrub order matters (an email eats its digits before the phone pass);
#: fixed here and mirrored step-for-step in the oracle's CTE chain
PII_STEPS = (
    ("email", PII_EMAIL, "<EMAIL>"),
    ("ipv4", PII_IPV4, "<IP>"),
    ("phone", PII_PHONE, "<PHONE>"),
)
_PII_COMPILED = [(n, re.compile(p), r) for n, p, r in PII_STEPS]


def scrub_pii(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Per-document PII redaction — the privacy-scrub step of a
    training-data pipeline.  Sequentially counts and replaces emails,
    IPv4 addresses, and phone-like digit runs (vectorized pandas str
    kernels over compiled patterns), then emits the md5 of the fully
    scrubbed text so engine and SQL oracle agree on the REPLACEMENT
    semantics character-for-character, not just on match counts.

    Output: (doc_id, n_email, n_ipv4, n_phone, scrub_md5).  Stateless,
    embarrassingly parallel, no shuffle; documents leave the stage as a
    32-hex digest."""
    import hashlib

    t = batch[text_col].fillna("")
    out = {"doc_id": batch["doc_id"].astype("int64")}
    for name, pat, repl in _PII_COMPILED:
        out[f"n_{name}"] = t.str.count(pat).astype("int64")
        t = t.str.replace(pat, repl, regex=True)
    out["scrub_md5"] = [
        hashlib.md5(s.encode("utf-8")).hexdigest() for s in t
    ]
    return pd.DataFrame(out)


def q_pii_scrub(sf_dir: str):
    from .util import read_sized

    ds = read_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(scrub_pii, batch_format="pandas")


# ---- text normalization --------------------------------------------------


def _normalized_strings(orig):
    """NFC + whitespace-run collapse + edge trim over an Arrow string
    array (see :func:`normalize_text` for the semantics and the pyarrow
    NFC caveat).  Returns a combined-chunks Arrow string array."""
    import unicodedata

    import pyarrow as pa
    import pyarrow.compute as pc

    ascii_mask = pc.string_is_ascii(orig).to_numpy(zero_copy_only=False)
    if ascii_mask.all():
        t = orig
    else:
        t = pa.array(
            [
                v if is_a else unicodedata.normalize("NFC", v)
                for v, is_a in zip(orig.to_pylist(), ascii_mask)
            ],
            pa.string(),
        )
    t = pc.replace_substring_regex(
        t, pattern="[ \t\n\r\f]+", replacement=" "
    )
    t = pc.utf8_trim(t, characters=" ")
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    return t


def add_normalized_text(batch, text_col: str = "text"):
    """(doc_id, norm_text) — the normalized STRING itself, for stages
    that consume the canonical form (e.g. :func:`~.dedup.exact_dedup_stats`
    over whitespace/unicode-variant duplicates)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    t = _normalized_strings(pc.fill_null(batch.column(text_col), ""))
    return pa.table(
        {"doc_id": batch.column("doc_id"), "norm_text": t}
    )


def normalize_text(batch, text_col: str = "text"):
    """Canonical text normalization — the first stage of any dedup /
    tokenize pipeline: Unicode NFC, whitespace-run collapse to a single
    space, edge trim.  Fully Arrow-native (``utf8_normalize`` /
    ``replace_substring_regex`` / ``utf8_trim`` are zero-copy-in,
    vectorized utf8proc+RE2 kernels — the same libraries DuckDB uses, so
    the md5 pin checks the transform character-for-character).  The
    whitespace class is spelled ASCII-explicit (``[ \\t\\n\\r\\f]``)
    because RE2's ``\\s`` and Python's differ on Unicode spaces.

    NFC caveat (measured, pinned in TestTextNormalize): pyarrow 16's
    ``utf8_normalize(form="NFC")`` does NOT compose combining sequences
    (it leaves ``e + U+0301`` as two codepoints, where DuckDB/unicodedata
    compose to ``é``) — so composition runs through ``unicodedata`` on
    the NON-ASCII rows only.  ASCII strings are NFC fixed points, so the
    dominant path stays a zero-copy vectorized mask check.

    Output: (doc_id, norm_len, changed, norm_md5) — documents leave the
    stage as a 32-hex digest + codepoint length; stateless, no shuffle."""
    import hashlib

    import pyarrow as pa
    import pyarrow.compute as pc

    orig = pc.fill_null(batch.column(text_col), "")
    t = _normalized_strings(orig)
    md5s = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in t.to_pylist()]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "norm_len": pc.cast(pc.utf8_length(t), pa.int64()),
            "changed": pc.cast(pc.not_equal(t, orig), pa.int64()),
            "norm_md5": pa.array(md5s, pa.string()),
        }
    )


def q_text_normalize(sf_dir: str):
    from .util import read_sized

    ds = read_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(normalize_text, batch_format="pyarrow")


# ---- sentence statistics -------------------------------------------------

#: sentence boundary = any run of terminal punctuation; shared verbatim
#: with the SQL oracle's regexp_split_to_array
SENTENCE_SPLIT = re.compile(r"[.!?]+")
#: a "word" inside a sentence = a run of non-whitespace (ASCII class, RE2
#: and Python agree; the corpus is ASCII — see scrub_pii's note)
WORD_RUN = r"[^ \t\n\r\f]+"


def sentence_stats(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Per-document sentence segmentation metrics — the Gopher-rule
    quality signals (mean/max words per sentence) that
    :func:`add_text_stats`'s flat counters can't see.

    Split on terminal-punctuation runs, drop empty segments (leading /
    trailing / consecutive terminators), count word runs per sentence.
    ``mean_words_x100`` is the integer-exact ``(Σwords · 100) // n`` so
    the oracle compares without a float tolerance.  Documents with no
    sentence (empty text) emit no row — same as the SQL GROUP BY.

    Stateless per-batch map: one explode + two vectorized str kernels;
    nothing shuffles, only the 5-int summary row leaves the stage."""
    from itertools import chain

    t = batch[text_col].fillna("")
    segs = t.str.split(SENTENCE_SPLIT)
    counts = segs.str.len().to_numpy(dtype=np.int64)
    total = int(counts.sum())
    flat = pd.Series(
        np.fromiter(chain.from_iterable(segs), dtype=object, count=total)
    )
    ids = np.repeat(batch["doc_id"].to_numpy(), counts)
    stripped = flat.str.strip(" ")
    keep = stripped.ne("").to_numpy()
    n_words = stripped[keep].str.count(WORD_RUN).to_numpy(dtype=np.int64)
    if not keep.any():
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "n_sentences": pd.Series([], dtype="int64"),
                "n_words": pd.Series([], dtype="int64"),
                "mean_words_x100": pd.Series([], dtype="int64"),
                "max_sentence_words": pd.Series([], dtype="int64"),
            }
        )
    g = (
        pd.DataFrame({"doc_id": ids[keep], "w": n_words})
        .groupby("doc_id", as_index=False, sort=False)
        .agg(n_sentences=("w", "size"), n_words=("w", "sum"),
             max_sentence_words=("w", "max"))
    )
    g["mean_words_x100"] = (g["n_words"] * 100) // g["n_sentences"]
    return g[
        ["doc_id", "n_sentences", "n_words", "mean_words_x100",
         "max_sentence_words"]
    ].astype("int64")


def q_sentence_stats(sf_dir: str):
    from .util import read_sized

    ds = read_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(sentence_stats, batch_format="pandas")
