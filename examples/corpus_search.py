"""Corpus exploration cookbook: the search + profiling ops together.

Index → keyword-rank → inspect strata — what a data engineer runs before
(and after) the curation pipeline in ``training_pipeline.py``:

1. vocabulary profile (`vocab_stats`) — what the corpus talks about;
2. inverted index (`posting_lists`) — term → document routing table;
3. BM25 ranked retrieval (`bm25_search`) — audit queries ("which docs
   would leak this benchmark term?");
4. deterministic per-source sample (`source_sample`) — eyeball N docs per
   stratum, identical picks on every run / resume.

Run from the repo root:  python examples/corpus_search.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")

from libpdf_ray.ops.corpus import q_source_sample, q_vocab_stats
from libpdf_ray.ops.search import bm25_search, q_posting_lists
from libpdf_ray.ops.util import read_sized, tune_data_context

tune_data_context()

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001")

# 1. corpus vocabulary: top terms by total frequency with document counts
vocab = q_vocab_stats(SF).to_pandas()
print("top terms:")
print(vocab.head(8).to_string(index=False))

# 2. inverted index: per-term posting lists (here printed; at scale this
#    is written to term-hash-partitioned parquet instead)
postings = q_posting_lists(SF).to_pandas().sort_values("df", ascending=False)
print(f"\nindex: {len(postings)} terms; widest posting has "
      f"{postings['df'].iloc[0]} docs")

# 3. BM25 audit query: rank the corpus for a term set of interest
docs = read_sized(f"{SF}/documents.parquet", columns=["doc_id", "text"])
hits = bm25_search(docs, terms=["spark", "vector"], k=5).to_pandas()
print("\nBM25 top-5 for ['spark', 'vector']:")
print(hits.to_string(index=False))

# 4. deterministic per-source sample for manual inspection
sample = q_source_sample(SF).to_pandas()
print(f"\nper-source sample ({len(sample)} rows):")
print(sample.groupby("source")["doc_id"].apply(list).to_string())

ray.shutdown()
