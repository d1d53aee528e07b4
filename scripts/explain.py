"""Run a registered query and print its Ray Data execution stats.

Usage:
    python scripts/explain.py <query_name> [sf_dir]

The per-stage wall times, block counts, and memory figures come from
``Dataset.stats()`` — the tool the perf notes in BASELINE.md are
derived from.  Queries that return pandas (driver-finished) print the
final shape only.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from prclz_ray.pipelines.queries import registry
    fn = registry()[name][0]
    t0 = time.time()
    out = fn(sf_dir)
    if hasattr(out, "materialize"):
        out = out.materialize()
        n = out.count()
        print(out.stats())
    else:
        n = len(out)
        print("(driver-finished query: no Dataset stats; "
              "pandas result below)")
        print(out.head())
    print(f"\n== {name}: {n} rows in {time.time() - t0:.2f}s ==")
    ray.shutdown()


if __name__ == "__main__":
    main()
