"""Scale-growth measurement for the STREAMING family (VERDICT round-14
ask #5).

``scale_growth.py`` covers dedup/similarity, ``scale_growth_relational
.py`` the TPC-H/window families; this script gives the drained-stream
jobs (``streaming/jobs.py``) the same one-measured-datapoint treatment:
synthesize 10x events in /tmp, replay both volumes through the file
source as real multi-micro-batch streams, and record per-job wall
times + growth ratios under ``streaming_growth`` in SCALE.local.json
(merged — the other harnesses' keys are preserved).

Growth mode: MORE USERS OVER THE SAME TIME SPAN (event_id and user_id
shift per replica, timestamps stay) — traffic densifies 10x, which is
what a streaming deployment actually sees, and it grows exactly the
thing streaming state is sized by: keys live inside the watermark
(sessionization sessions, dedup ids, CDC latest-state rows, interval-
join buffers, per-user counters). A linear pipeline on fixed cores
grows <= ~10x; with availableNow draining a fixed micro-batch count,
per-batch trigger overhead amortizes and healthy growth lands well
under that. Anything near 100x would mean state or join work
accidentally quadratic in keys.

Usage: python scripts/scale_growth_streaming.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _scale_common import BASE_SF_DIR, merge_scale_report, warm_sf_dir  # noqa: E402

SCALE_ROOT = "/tmp/spark_graft_scale_stream"
REPLICAS = 10
REPLICA_ID_OFFSET = 10_000_000


def build_events(scale_dir: str, replicas: int) -> None:
    """events.parquet with ``replicas`` densified copies: ids shift,
    timestamps (and therefore windows/watermarks) stay. The documents
    stream is deliberately NOT replicated here: its event time is
    synthesized from doc_id, so id-shifted replicas would extend the
    time span instead of densifying traffic — the wrong growth mode."""
    os.makedirs(scale_dir, exist_ok=True)
    con = duckdb.connect()
    parts = []
    for k in range(replicas):
        off = k * REPLICA_ID_OFFSET
        parts.append(
            f"SELECT event_id + {off} AS event_id, ts, "
            f"user_id + {off} AS user_id, event_type, value, props "
            f"FROM '{BASE_SF_DIR}/events.parquet'"
        )
    con.sql(
        "COPY (" + " UNION ALL ".join(parts) + ") TO "
        f"'{scale_dir}/events.parquet' (FORMAT PARQUET)"
    )
    con.close()


def jobs():
    """(name, stream-builder, output-mode): the drained-stream family —
    windowed agg, sessionization, within-watermark dedup, CDC upsert,
    event-time interval joins (inner AND left-outer), Misra-Gries
    heavy hitters, and the custom applyInPandasWithState counter
    (eight jobs; the documents ingest stream is excluded, see
    build_events)."""
    from iceberg_catalog_migrator_spark.streaming.jobs import (
        cdc_latest_state_stream,
        click_purchase_join_stream,
        click_purchase_outer_join_stream,
        events_stream,
        heavy_hitters_stream,
        hourly_counts_stream,
        session_window_stream,
        stateful_user_counter_stream,
        stream_dedup,
    )

    return [
        (
            "hourly_counts",
            lambda sp, d: hourly_counts_stream(events_stream(sp, d)),
            "complete",
        ),
        (
            "sessionization",
            lambda sp, d: session_window_stream(events_stream(sp, d)),
            "append",
        ),
        (
            "dedup_within_watermark",
            lambda sp, d: stream_dedup(events_stream(sp, d)),
            "append",
        ),
        (
            "cdc_latest_state",
            lambda sp, d: cdc_latest_state_stream(events_stream(sp, d)),
            "update",
        ),
        (
            "interval_join",
            lambda sp, d: click_purchase_join_stream(
                events_stream(sp, d), events_stream(sp, d)
            ),
            "append",
        ),
        (
            "heavy_hitters_mg",
            lambda sp, d: heavy_hitters_stream(events_stream(sp, d)),
            "update",
        ),
        (
            "outer_interval_join",
            lambda sp, d: click_purchase_outer_join_stream(
                events_stream(sp, d), events_stream(sp, d)
            ),
            "append",
        ),
        (
            "stateful_user_counter",
            lambda sp, d: stateful_user_counter_stream(
                events_stream(sp, d)
            ),
            "update",
        ),
    ]


def main() -> int:
    from iceberg_catalog_migrator_spark.session import get_spark
    from iceberg_catalog_migrator_spark.streaming.jobs import (
        prepare_stream_input,
        run_stream_to_memory,
    )

    shutil.rmtree(SCALE_ROOT, ignore_errors=True)
    dirs = {
        1: os.path.join(SCALE_ROOT, "x1"),
        REPLICAS: os.path.join(SCALE_ROOT, f"x{REPLICAS}"),
    }
    t0 = time.time()
    build_events(dirs[1], 1)
    build_events(dirs[REPLICAS], REPLICAS)
    print(f"table build: {time.time()-t0:.1f}s")

    spark = get_spark(app_name="scale-growth-streaming")
    spark.range(1).count()
    family = jobs()
    # warm codegen/JVM/state-store machinery on the tiny fixture so x1
    # doesn't carry session startup
    warm_stream = prepare_stream_input(
        spark, warm_sf_dir(), os.path.join(SCALE_ROOT, "warm"), 8
    )
    for name, build, mode in family:
        run_stream_to_memory(
            build(spark, warm_stream),
            f"warm_{name}",
            mode,
            os.path.join(SCALE_ROOT, "warm_ckpt", name),
        )

    results: dict[str, dict[str, float]] = {}
    totals: dict[str, float] = {}
    for scale, d in dirs.items():
        # the stream input (chunked, time-ordered) is part of the
        # deployment, not the job: built once per volume, not timed
        stream_dir = prepare_stream_input(
            spark, d, os.path.join(d, "stream"), 8
        )
        t_scale = time.time()
        for name, build, mode in family:
            t1 = time.time()
            run_stream_to_memory(
                build(spark, stream_dir),
                f"scale_{name}_{scale}",
                mode,
                os.path.join(d, "ckpt", name),
            )
            sec = round(time.time() - t1, 2)
            results.setdefault(name, {})[f"x{scale}"] = sec
            print(f"x{scale} {name}: {sec}s")
        totals[f"x{scale}"] = round(time.time() - t_scale, 2)

    hi, lo = f"x{REPLICAS}", "x1"
    report = {
        "base_dir": BASE_SF_DIR,
        "replicas": REPLICAS,
        "note": (
            "drained-stream (availableNow, 8 micro-batches) wall-time "
            "growth for 10x events (ids shifted, time span fixed -> "
            "10x denser traffic and 10x in-watermark state keys) on "
            "local[32]; linear <= ~10x, quadratic ~100x"
        ),
        "family_total": {
            **totals,
            "growth": round(totals[hi] / max(totals[lo], 0.01), 1),
        },
        "jobs": {
            name: {
                **vals,
                "growth": round(vals[hi] / max(vals[lo], 0.01), 1),
            }
            for name, vals in results.items()
        },
    }
    merge_scale_report("streaming_growth", report)
    print(json.dumps(report, indent=1, sort_keys=True))
    worst = max(v["growth"] for v in report["jobs"].values())
    print(
        f"worst growth ratio: {worst}x for 10x events "
        "(quadratic would be ~100x)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
