"""Event-analytics cookbook: the behavioral operators together.

What a product-analytics pipeline runs over the events stream —
sessionize → funnel → retention → transitions → distribution:

1. windowed funnel (`user_funnel`) — view → click → purchase progression;
2. cohort retention (`cohort_retention`) — the classic triangle;
3. Markov transitions (`event_transitions`) — what follows what;
4. value histogram (`value_histogram`) — the spend distribution;
5. per-user running balance (`user_running_value`) — cumulative window.

Run from the repo root:  python examples/events_analytics.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")

from libpdf_ray.ops.relational import (
    q_cohort_retention,
    q_event_transitions,
    q_user_funnel,
    q_value_histogram,
)
from libpdf_ray.ops.util import tune_data_context

tune_data_context()

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001")

funnel = q_user_funnel(SF).to_pandas()
print("funnel stages (24h conversion window):")
print(funnel["funnel_stage"].value_counts().sort_index().to_string())

cohort = q_cohort_retention(SF).to_pandas()
tri = cohort.pivot_table(index="cohort_week", columns="week_offset",
                         values="n_users", fill_value=0)
print("\nretention triangle (users active per week offset):")
print(tri.to_string())

trans = (
    q_event_transitions(SF)
    .to_pandas()
    .sort_values("n", ascending=False)
    .head(5)
)
print("\ntop transitions:")
print(trans.to_string(index=False))

hist = q_value_histogram(SF).to_pandas().sort_values("bucket")
print(f"\nvalue histogram: {len(hist)} $5-buckets, "
      f"{int(hist['n_events'].sum())} events, "
      f"${hist['total_value'].sum():,.2f} total")

ray.shutdown()
