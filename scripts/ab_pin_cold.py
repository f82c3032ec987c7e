"""Cold per-pin A/B (VERDICT r16 item 1): time ONE query in a fresh
JVM with a named shared-subtree pin enabled vs disabled
(SPARK_GRAFT_DISABLE_PINS), interleaved A/B/A/B, min-of-N per arm.

Each arm runs in a fresh subprocess (fresh JVM, fresh caches) so the
measurement is the bench-identical COLD cost — the r16 A/Bs measured
warm in-session reps and missed the driver's 32-core cold behaviour.

Usage:
    python scripts/ab_pin_cold.py <query> <pin_tag> [reps=3]

Prints one JSON line: {"query":..., "tag":..., "pin_s":[...],
"nopin_s":[...], "pin_min":..., "nopin_min":...}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
from iceberg_catalog_migrator_spark.queries import all_queries
from iceberg_catalog_migrator_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="ab-pin")
spark.range(1).count()
spark.range(32).repartition(32).mapInArrow(lambda it: it, "id long").count()
from iceberg_catalog_migrator_spark.sources import TABLES, load_table
for t in TABLES:
    load_table(spark, SF_DIR, t)
qd = all_queries()[%(query)r]
# JIT/codegen warmup: same query at sf0.001 (different sf_dir key, so
# no sf0.1 stage/cache is touched) — mirrors bench conditions, where a
# query runs in a session already warmed by ~200 prior queries
try:
    qd.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
except Exception:
    pass
t0 = time.perf_counter()
qd.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
print("COLD_S=%%.3f" %% (time.perf_counter() - t0), flush=True)
"""


def run_arm(query: str, disable: str) -> float:
    env = dict(os.environ)
    env["SPARK_GRAFT_DISABLE_PINS"] = disable
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    code = _CHILD % {"repo": REPO, "query": query}
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("COLD_S="):
            return float(line.split("=", 1)[1])
    raise RuntimeError(f"arm failed: {out.stderr[-2000:]}")


def main() -> None:
    query = sys.argv[1]
    tag = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    pin_s, nopin_s = [], []
    for i in range(reps):
        pin_s.append(run_arm(query, ""))
        print(f"  rep{i} pin   {pin_s[-1]:.2f}s", flush=True)
        nopin_s.append(run_arm(query, tag))
        print(f"  rep{i} nopin {nopin_s[-1]:.2f}s", flush=True)
    print(
        json.dumps(
            {
                "query": query,
                "tag": tag,
                "pin_s": pin_s,
                "nopin_s": nopin_s,
                "pin_min": min(pin_s),
                "nopin_min": min(nopin_s),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
