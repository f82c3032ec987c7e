"""Per-query optimization profiler (guide §1): times named queries over
repeated in-session runs, counts the Spark jobs each run launches, and
captures ``explain("formatted")`` to a plans file.

Usage:
    python scripts/profile_queries.py [--reps N] [--plans-dir DIR] q1 q2 ...
    python scripts/profile_queries.py --all --reps 1

Timing methodology matches bench.py exactly (noop sink, same session
factory, same warmups) so numbers are comparable; the job count and the
plan are the noise-free signals the wall-clock lacks on this host
(bench.py's documented host-epoch drift).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_catalog_migrator_spark.queries import all_queries
from iceberg_catalog_migrator_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _warmup(spark) -> None:
    spark.range(1).count()
    spark.range(32).repartition(32).mapInArrow(lambda it: it, "id long").count()
    from iceberg_catalog_migrator_spark.sources import TABLES, load_table

    for t in TABLES:
        try:
            load_table(spark, SF_DIR, t)
        except Exception:  # noqa: BLE001
            pass


def _capture_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans-dir", default=None, help="write <q>_before.txt plans here")
    ap.add_argument("--suffix", default="before", help="plan file suffix (before/after)")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="profile")
    qdefs = all_queries()
    names = list(qdefs) if args.all else args.queries
    unknown = [n for n in names if n not in qdefs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    _warmup(spark)
    sc = spark.sparkContext
    results: dict[str, dict] = {}
    for name in names:
        fn = qdefs[name].fn
        runs = []
        jobs_per_run = []
        for rep in range(args.reps):
            group = f"prof-{name}-{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t_build = time.perf_counter() - t0
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_exec = time.perf_counter() - t1
            runs.append((round(t_build, 3), round(t_exec, 3)))
            tracker = sc.statusTracker()
            jobs_per_run.append(len(tracker.getJobIdsForGroup(group)))
            sc.setJobGroup("idle", "idle")
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            plan = _capture_plan(fn(spark, SF_DIR))
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        results[name] = {
            "runs_build_exec_s": runs,
            "min_total_s": round(min((b + e for b, e in runs), default=-1.0), 3),
            "jobs_per_run": jobs_per_run,
        }
        print(
            f"{name}: min {results[name]['min_total_s']}s "
            f"runs={runs} jobs={jobs_per_run}",
            flush=True,
        )
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
