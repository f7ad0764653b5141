"""Property-based differential tests (hypothesis) for the late round-5
kernels: engine kernels vs DuckDB on RANDOM inputs, and the Misra-Gries
merge guarantee under random merge trees.

All tests are kernel-level (no Ray session) so the whole module runs in
seconds.  Alphabets are bounded to codepoints whose Unicode behavior is
stable across utf8proc (DuckDB) and Python's unicodedata — version skew
on exotic codepoints would be vendor noise, not an engine defect."""

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

# latin + digits + whitespace the collapse class targets + combining
# marks + precomposed forms + ligatures + a non-collapsed separator
_NORM_ALPHABET = (
    "abcXYZ019 \t\n\r\f" "é́̊Åﬁ .!?-"
)


def _duck(sql: str, df: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", df)
    return con.sql(sql).df()


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(alphabet=_NORM_ALPHABET, max_size=40), max_size=8))
def test_normalize_text_matches_duckdb(texts):
    from libpdf_ray.ops.text import normalize_text

    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64),
         "text": pd.Series(texts, dtype="string")}
    )
    got = normalize_text(
        pa.table({"doc_id": pa.array(df["doc_id"]),
                  "text": pa.array(texts, pa.string())})
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = _duck(
        """
        WITH n AS (
            SELECT doc_id, text,
                   trim(regexp_replace(nfc_normalize(text),
                        '[ \t\n\r\f]+', ' ', 'g'), ' ') AS t
            FROM documents
        )
        SELECT doc_id, CAST(length(t) AS BIGINT) AS norm_len,
               CAST(t <> text AS BIGINT) AS changed, md5(t) AS norm_md5
        FROM n ORDER BY doc_id
        """,
        df,
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)


@settings(max_examples=25, deadline=None)
@given(st.lists(
    st.text(alphabet="ab c.!?\t\n", max_size=60), min_size=1, max_size=8,
))
def test_sentence_stats_matches_duckdb(texts):
    from libpdf_ray.ops.text import sentence_stats

    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64),
         "text": pd.Series(texts, dtype="string")}
    )
    got = sentence_stats(df).sort_values("doc_id").reset_index(drop=True)
    exp = _duck(
        """
        WITH segs AS (
            SELECT doc_id, trim(unnest(regexp_split_to_array(
                text, '[.!?]+')), ' ') AS seg
            FROM documents
        ),
        w AS (
            SELECT doc_id, len(list_filter(regexp_split_to_array(
                seg, '[ \t\n\r\f]+'), x -> x <> '')) AS n_words
            FROM segs WHERE seg <> ''
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sentences,
               CAST(SUM(n_words) AS BIGINT) AS n_words,
               CAST((SUM(n_words) * 100) // COUNT(*) AS BIGINT)
                   AS mean_words_x100,
               CAST(MAX(n_words) AS BIGINT) AS max_sentence_words
        FROM w GROUP BY doc_id ORDER BY doc_id
        """,
        df,
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 30), st.integers(1, 40)),
             min_size=1, max_size=60),
    st.integers(2, 8),
    st.randoms(use_true_random=False),
)
def test_misra_gries_merge_guarantee(items, k, rng):
    """Any term with true frequency > N/(k+1) must survive ANY random
    tree of _mg_truncate merges (the mergeable-summaries bound the
    heavy_hitters rescue pass relies on)."""
    from libpdf_ray.ops.sketch import _mg_truncate

    frames = [
        pd.DataFrame({"term": [f"t{t}"], "cnt": np.int64(c)})
        for t, c in items
    ]
    true = pd.concat(frames).groupby("term")["cnt"].sum()
    n = int(true.sum())

    summaries = [_mg_truncate(f, k) for f in frames]
    while len(summaries) > 1:
        rng.shuffle(summaries)
        a = summaries.pop()
        b = summaries.pop()
        merged = (
            pd.concat([a, b]).groupby("term", as_index=False)["cnt"].sum()
        )
        summaries.append(_mg_truncate(merged, k))
    survivors = set(summaries[0]["term"])
    heavy = set(true[true * (k + 1) > n].index)
    assert heavy <= survivors


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 2**63 - 1))
def test_train_split_ring_exact(doc_id):
    from libpdf_ray.ops.corpus import (
        _HASH_MOD,
        _HASH_MULT,
        SPLIT_TRAIN_UPPER,
        SPLIT_VAL_UPPER,
    )

    # reference via python big-int (no overflow by construction)
    h = (doc_id * _HASH_MULT) % _HASH_MOD
    want = ("train" if h < SPLIT_TRAIN_UPPER
            else "val" if h < SPLIT_VAL_UPPER else "test")
    # the engine's uint64 arithmetic (the Dataset wrapper is tested
    # elsewhere; this pins the wrap-around congruence for any id)
    hv = (np.uint64(doc_id) * np.uint64(_HASH_MULT)) % np.uint64(_HASH_MOD)
    got_split = ("train" if hv < SPLIT_TRAIN_UPPER
                 else "val" if hv < SPLIT_VAL_UPPER else "test")
    assert got_split == want
