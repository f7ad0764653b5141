"""Full-registry latency sweep — run every `queries()` entry at one scale
factor and print a time-sorted table.

The correctness gates check results; THIS catches what they can't: perf
cliffs and order-dependent failures that only appear at larger inputs or
when many pipelines share one Ray session.  The round-4 sweep at sf0.1
found both kinds in one run — a 91 s per-group-dispatch cliff in the LSH
pair generation (9.4× after the fix) and an intermittent ArrowInvalid
from schema-less empty blocks crossing chained shuffles.

Usage:  python scripts/sweep_queries.py [sf_dir] [num_cpus]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=CPUS, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as em

    rows = []
    for name, fn in em.queries().items():
        t0 = time.time()
        try:
            r = fn(SF)
            df = r.to_pandas() if hasattr(r, "to_pandas") else r
            rows.append((time.time() - t0, name, len(df), ""))
        except Exception as exc:  # noqa: BLE001 - sweep must not stop
            rows.append((time.time() - t0, name, -1,
                         f"{type(exc).__name__}: {exc}"))
    n_fail = 0
    for dt, name, n, err in sorted(rows, reverse=True):
        print(f"{dt:7.2f}s {name:26s} {n:8d} {err[:80]}")
        n_fail += n < 0
    total = sum(r[0] for r in rows)
    print(f"\n{len(rows)} queries, {n_fail} failures, {total:.1f}s total")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
