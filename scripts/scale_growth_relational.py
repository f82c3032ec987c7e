"""Scale-growth measurement for the RELATIONAL families (VERDICT
round-13 ask #4).

``scripts/scale_growth.py`` covers the dedup/similarity/events
operators; this script gives the classic relational surface the same
one-measured-datapoint treatment: synthesize a 10x TPC-H-shaped
dataset (sf1-equivalent) in /tmp and run the TPC-H suite plus the
window/aggregation families at 1x and 10x, recording wall-times and
growth ratios under the ``relational_growth`` key of SCALE.local.json
(merged — the dedup harness's keys are preserved).

Growth mode is the realistic one: MORE TRANSACTIONS OVER THE SAME
CATALOG. Customers and orders replicate with shifted keys (replica
orders reference replica customers, so per-customer distributions are
preserved); lineitem follows its orders while part/supplier keys stay
in the fixed catalog (item-side joins see 10x probe volume against an
unchanged build side — exactly what broadcast dims face at 100 TB);
nation/region/part/supplier are shared verbatim.

A linear plan on fixed cores grows <= ~10x; at this absolute scale
fixed per-query overheads (planning, stage launch) still dominate many
sub-second queries, so healthy growth lands well under that. Anything
near 100x would mean an accidental quadratic.

Usage: python scripts/scale_growth_relational.py
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

SCALE_ROOT = "/tmp/spark_graft_scale_rel"
REPLICAS = 10
REPLICA_ID_OFFSET = 10_000_000
#: the relational families, selected by module (TPC-H adaptations live
#: in relational/tpch_more; ranking/analytic/distribution windows in
#: windowed)
FAMILY_MODULES = ("relational", "tpch_more", "windowed")


def build_tables(scale_dir: str, replicas: int) -> None:
    os.makedirs(scale_dir, exist_ok=True)
    con = duckdb.connect()

    def replicate(table: str, key_shifts: dict[str, str], passthrough: str):
        parts = []
        for k in range(replicas):
            off = k * REPLICA_ID_OFFSET
            shifted = ", ".join(
                f"{col} + {off} AS {col}" for col in key_shifts
            )
            sel = ", ".join(x for x in (shifted, passthrough) if x)
            parts.append(
                f"SELECT {sel} FROM '{BASE_SF_DIR}/{table}.parquet'"
            )
        con.sql(
            "COPY (" + " UNION ALL ".join(parts) + ") TO "
            f"'{scale_dir}/{table}.parquet' (FORMAT PARQUET)"
        )

    # customers: 10x people over the same nations
    replicate(
        "customer",
        {"c_custkey": ""},
        "c_name, c_nationkey, c_acctbal, c_mktsegment",
    )
    # orders: 10x transactions referencing the replica's customers
    replicate(
        "orders",
        {"o_orderkey": "", "o_custkey": ""},
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
    )
    # lineitem follows its orders; part/supplier keys stay fixed
    replicate(
        "lineitem",
        {"l_orderkey": ""},
        "l_partkey, l_suppkey, l_linenumber, l_quantity, "
        "l_extendedprice, l_discount, l_tax, l_returnflag, "
        "l_linestatus, l_shipdate",
    )
    con.close()
    for t in (
        "region",
        "nation",
        "part",
        "supplier",
        "documents",
        "embeddings",
        "events",
    ):
        src = os.path.join(BASE_SF_DIR, f"{t}.parquet")
        dst = os.path.join(scale_dir, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)


def main() -> int:
    from iceberg_catalog_migrator_spark.queries import all_queries
    from iceberg_catalog_migrator_spark.session import get_spark

    shutil.rmtree(SCALE_ROOT, ignore_errors=True)
    dirs = {
        1: os.path.join(SCALE_ROOT, "x1"),
        REPLICAS: os.path.join(SCALE_ROOT, f"x{REPLICAS}"),
    }
    t0 = time.time()
    build_tables(dirs[1], 1)
    build_tables(dirs[REPLICAS], REPLICAS)
    print(f"table build: {time.time()-t0:.1f}s")

    spark = get_spark(app_name="scale-growth-relational")
    spark.range(1).count()
    queries = all_queries()
    names = sorted(
        n
        for n, qd in queries.items()
        if qd.fn.__module__.rsplit(".", 1)[-1] in FAMILY_MODULES
    )
    print(f"{len(names)} relational-family queries")
    # warm codegen/JVM on the tiny fixture (different dir: the scale
    # dirs' own caches stay cold, x1 doesn't carry session startup)
    for name in names:
        queries[name].fn(spark, warm_sf_dir()).write.format(
            "noop"
        ).mode("overwrite").save()
    results: dict[str, dict[str, float]] = {}
    totals: dict[str, float] = {}
    per_module_totals: dict[str, dict[str, float]] = {}
    for scale, d in dirs.items():
        for fn in os.listdir(d):
            p = os.path.join(d, fn)
            if os.path.isfile(p) and not os.path.islink(p):
                with open(p, "rb") as fh:
                    while fh.read(1 << 24):
                        pass
        t_scale = time.time()
        for name in names:
            mod = queries[name].fn.__module__.rsplit(".", 1)[-1]
            t1 = time.time()
            queries[name].fn(spark, d).write.format("noop").mode(
                "overwrite"
            ).save()
            sec = round(time.time() - t1, 2)
            results.setdefault(name, {})[f"x{scale}"] = sec
            per_module_totals.setdefault(mod, {}).setdefault(f"x{scale}", 0.0)
            per_module_totals[mod][f"x{scale}"] = round(
                per_module_totals[mod][f"x{scale}"] + sec, 2
            )
            print(f"x{scale} {name}: {sec}s")
        totals[f"x{scale}"] = round(time.time() - t_scale, 2)

    hi, lo = f"x{REPLICAS}", "x1"
    report = {
        "base_dir": BASE_SF_DIR,
        "replicas": REPLICAS,
        "note": (
            "wall-time growth for 10x transactions (orders/lineitem/"
            "customer replicated, catalog fixed) on local[32]; linear "
            "<= ~10x, quadratic ~100x. Families selected by module: "
            + ", ".join(FAMILY_MODULES)
        ),
        "family_total": {
            **totals,
            "growth": round(totals[hi] / max(totals[lo], 0.01), 1),
        },
        "per_family": {
            mod: {
                **vals,
                "growth": round(vals[hi] / max(vals[lo], 0.01), 1),
            }
            for mod, vals in per_module_totals.items()
        },
        "queries": {
            name: {
                **vals,
                "growth": round(vals[hi] / max(vals[lo], 0.01), 1),
            }
            for name, vals in results.items()
        },
    }
    merge_scale_report("relational_growth", report)
    print(json.dumps(report["per_family"], indent=1, sort_keys=True))
    worst = max(v["growth"] for v in report["queries"].values())
    print(
        f"worst growth ratio: {worst}x for 10x data "
        "(quadratic would be ~100x)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
