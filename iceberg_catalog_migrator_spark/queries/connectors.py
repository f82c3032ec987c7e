"""Queries over the Python Data Source connector (sources/synthetic.py).

The connector generates rows as a pure function of the row index, so
DuckDB replays the identical dataset from ``range(n)`` — a zero-input
partition-parallel source whose output is still fully value-checked
cross-engine. ``sf_dir`` is accepted (registry contract) but unused:
the source's size comes from its options, not the fixture directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum, dsum_expr
from ..sources.synthetic import (
    SYNTH_SOURCE_NAME,
    register_synthetic_source,
    synthetic_oracle_cte,
)
from .registry import register_query

_ROWS = 120_000
_USERS = 997


@register_query(
    "synthetic_source_type_stats",
    oracle=f"""
    WITH {synthetic_oracle_cte(_ROWS, _USERS)}
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           {dsum_expr("value")} AS sum_value,
           MIN(ts) AS min_ts, MAX(ts) AS max_ts
    FROM ev
    GROUP BY event_type
    """,
    description=(
        "per-type stats over the zero-input Python Data Source connector "
        "(Arrow-batched partition-parallel generator, DuckDB replays from range())"
    ),
)
def synthetic_source_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_synthetic_source(spark)
    ev = (
        spark.read.format(SYNTH_SOURCE_NAME)
        .option("rows", str(_ROWS))
        .option("n_users", str(_USERS))
        .load()
    )
    return ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        dsum("value").alias("sum_value"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


# ------------------------------------------------------------ snapshots
# Oracle-visible rendering of the snapshot-table layer: two commits
# (even orderkeys, then odd), read INCREMENTALLY between them — the
# CDC-consumption path — and aggregate. DuckDB replays the delta as a
# plain filter, so the file-set difference is value-checked end to end.
_SNAP_CACHE_ROOT = "/tmp/spark_graft_snaptbl"


def _rest_req(uri: str, method: str, path: str, body=None):
    """The stock-client simulator's one HTTP verb (stdlib only — the
    queries exercising the REST endpoint share this instead of three
    drifting copies): returns ``(status, parsed-json)`` for success
    AND error envelopes alike."""
    import json as _json
    import urllib.error
    import urllib.request

    data = _json.dumps(body).encode() if body is not None else None
    r = urllib.request.Request(
        uri + path,
        data=data,
        method=method,
        headers={"Content-Type": "application/json"} if data else {},
    )
    try:
        with urllib.request.urlopen(r, timeout=10) as resp:
            return resp.status, _json.loads(resp.read() or b"{}")
    except urllib.error.HTTPError as e:
        return e.code, _json.loads(e.read() or b"{}")


def _icfr_exported(spark: SparkSession, sf_dir: str) -> dict:
    """The shared even/odd orders SnapshotTable (cache key '-icfr')
    exported as Iceberg metadata; returns the parsed metadata doc.
    Every REST-conformance query publishes these snapshots through the
    endpoint, so the build block must stay ONE definition — divergent
    copies over the shared cache dir would corrupt each other's
    oracle expectations."""
    import hashlib
    import json as _json
    import os
    import shutil

    from ..sources import load_table
    from ..sources.iceberg_format import export_iceberg_metadata
    from ..sources.snapshots import SnapshotTable

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    src = SnapshotTable(
        spark, os.path.join(_SNAP_CACHE_ROOT, key + "-icfr")
    )
    if src.current_snapshot_id() != 2:
        shutil.rmtree(src.path, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        src.append(orders.filter(F.col("o_orderkey") % 2 == 0).coalesce(2))
        src.append(orders.filter(F.col("o_orderkey") % 2 == 1).coalesce(1))
    with open(
        export_iceberg_metadata(src, reuse=True)["metadata_location"]
    ) as f:
        return _json.load(f)


def _snapshot_fixture(spark: SparkSession, sf_dir: str):
    import hashlib
    import os

    from pyspark.sql import functions as F

    from ..sources import load_table
    from ..sources.snapshots import SnapshotTable

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tbl = SnapshotTable(spark, os.path.join(_SNAP_CACHE_ROOT, key))
    # valid cached states: 2 (both appends) or 3 (+ the MOR delete the
    # delete-read query stacks on) — anything else is a stale/partial
    # build from another run and gets recreated
    if tbl.current_snapshot_id() not in (2, 3):
        import shutil

        shutil.rmtree(tbl.path, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        tbl.append(orders.filter(F.col("o_orderkey") % 2 == 0))
        tbl.append(orders.filter(F.col("o_orderkey") % 2 == 1))
    return tbl


@register_query(
    "snapshot_incremental_orders",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
           {dsum_expr("o_totalprice")} AS total
    FROM orders WHERE o_orderkey % 2 = 1
    """,
    description=(
        "incremental (CDC) read between two table snapshots — file-set "
        "difference scans only the second commit's files; oracle replays the delta"
    ),
)
def snapshot_incremental_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl = _snapshot_fixture(spark, sf_dir)
    inc = tbl.read_incremental(1, 2)
    return inc.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_custs"),
        dsum("o_totalprice").alias("total"),
    )


@register_query(
    "snapshot_mor_delete_read",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           {dsum_expr("o_totalprice")} AS total
    FROM orders WHERE o_orderkey % 2 = 1 OR o_orderkey % 5 <> 0
    """,
    description=(
        "merge-on-read table state: equality-delete file applied as a "
        "read-time anti-join; oracle replays the surviving predicate"
    ),
)
def snapshot_mor_delete_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reads the 2-snapshot fixture with an equality delete stacked on
    top: even orderkeys divisible by 5 are deleted via an O(keys)
    delete file (no data rewrite), and the read applies one
    broadcastable anti-join. Cached per sf_dir alongside the
    incremental fixture (snapshot 3 = the delete)."""
    from ..sources.snapshots import read_with_deletes

    tbl = _mor_fixture(spark, sf_dir)
    return read_with_deletes(tbl).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        dsum("o_totalprice").alias("total"),
    )


def _mor_fixture(spark: SparkSession, sf_dir: str):
    """The shared fixture advanced to state 3: snapshot 1 = even
    orderkeys, 2 = + odd, 3 = equality delete of even keys % 5 == 0."""
    from pyspark.sql import functions as F2

    from ..sources.snapshots import delete_where

    tbl = _snapshot_fixture(spark, sf_dir)
    if tbl.current_snapshot_id() == 2:
        doomed = (
            tbl.read(2)
            .filter((F2.col("o_orderkey") % 2 == 0) & (F2.col("o_orderkey") % 5 == 0))
            .select("o_orderkey")
        )
        delete_where(tbl, ["o_orderkey"], doomed)
    return tbl


@register_query(
    "snapshot_changelog_orders",
    oracle=f"""
    SELECT _change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {dsum_expr("o_totalprice")} AS total
    FROM (
      SELECT 'insert' AS _change_type, o_totalprice
      FROM orders WHERE o_orderkey % 2 = 1
      UNION ALL
      SELECT 'delete' AS _change_type, o_totalprice
      FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 5 = 0
    ) GROUP BY _change_type
    """,
    description=(
        "row-level changelog between snapshots (net inserts/deletes, "
        "Iceberg create_changelog_view shape): append + equality-delete "
        "commits diffed via bounded file/visibility sets; oracle replays both predicates"
    ),
)
def snapshot_changelog_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog from snapshot 1 (evens) to snapshot 3 (evens+odds with
    even%5 equality-deleted): nets out to odd-key inserts plus the
    deleted even keys. The diff scans only the added files and the
    carried rows matching a delete key (sources/snapshots.py
    read_changelog) — never the unchanged remainder."""
    tbl = _mor_fixture(spark, sf_dir)
    log = tbl.read_changelog(1, 3)
    return log.groupBy("_change_type").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        dsum("o_totalprice").alias("total"),
    )


@register_query(
    "snapshot_stream_drain_orders",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           {dsum_expr("o_totalprice")} AS total
    FROM orders
    """,
    description=(
        "Structured Streaming tail of a snapshot table (offsets = snapshot "
        "ids, one input partition per added file) drained availableNow into a "
        "file sink; oracle sees the union of both commits"
    ),
)
def snapshot_stream_drain_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streams the shared 2-commit fixture through the snapshot_commits
    connector (sources/snapshot_stream.py) and aggregates the drained
    rows. Equality-delete commits add no data files, so the fixture's
    optional MOR state does not change the appended row stream."""
    import tempfile

    from ..sources.snapshot_stream import (
        SNAPSHOT_STREAM_NAME,
        register_snapshot_stream_source,
    )

    tbl = _snapshot_fixture(spark, sf_dir)
    register_snapshot_stream_source(spark)
    with tempfile.TemporaryDirectory(prefix="snapstream_") as tmp:
        out, ckpt = f"{tmp}/out", f"{tmp}/ckpt"
        q = (
            spark.readStream.format(SNAPSHOT_STREAM_NAME)
            .option("path", tbl.path)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        drained = spark.read.parquet(out).agg(
            F.count("*").cast("bigint").alias("n_rows"),
            dsum("o_totalprice").alias("total"),
        )
        # materialize before the sink dir vanishes with the context
        rows = drained.collect()
    return spark.createDataFrame(rows, drained.schema)


_PART_CACHE_ROOT = "/tmp/spark_graft_parttbl"


@register_query(
    "snapshot_partition_pruned_orders",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           {dsum_expr("o_totalprice")} AS total
    FROM orders WHERE o_custkey = (SELECT MIN(o_custkey) FROM orders)
    """,
    description=(
        "hidden-partitioned snapshot table (bucket[8] on o_custkey, transform "
        "recorded per file): a point lookup scans ONE bucket file; oracle "
        "replays the predicate over the full table"
    ),
)
def snapshot_partition_pruned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writes orders once with Iceberg-style hidden partitioning
    (sources/snapshots.py append_partitioned) and reads back the
    smallest custkey through partition_pruned_scan — asserting inside
    the query that pruning actually hit one file, so the oracle match
    also certifies the metadata plan, not just the row values."""
    import hashlib
    import os

    from ..sources import load_table
    from ..sources.snapshots import (
        SnapshotTable,
        append_partitioned,
        partition_pruned_scan,
    )

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tbl = SnapshotTable(spark, os.path.join(_PART_CACHE_ROOT, key))
    snap_ok = False
    if tbl.current_snapshot_id() == 1:
        snap_ok = tbl._load_snap(1).get("partition_spec") == [["o_custkey", "bucket[8]"]]
    if not snap_ok:
        import shutil

        shutil.rmtree(tbl.path, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        append_partitioned(tbl, orders, [("o_custkey", "bucket[8]")])
    target = tbl.read().agg(F.min("o_custkey").alias("m")).first()["m"]
    pruned, summary = partition_pruned_scan(tbl, {"o_custkey": target})
    if summary["scanned_files"] != 1:  # pragma: no cover - plan regression guard
        raise RuntimeError(f"expected 1-file prune, planned {summary}")
    return pruned.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        dsum("o_totalprice").alias("total"),
    )


_WAP_CACHE_ROOT = "/tmp/spark_graft_waptbl"


@register_query(
    "snapshot_refs_metadata_table",
    oracle="""
    SELECT kind, name, CAST(snapshot_id AS BIGINT) AS snapshot_id
    FROM (VALUES ('branch', 'audit', 2), ('branch', 'main', 2)) t(kind, name, snapshot_id)
    """,
    description=(
        "refs metadata table (tbl.refs introspection) over the published "
        "write-audit-publish fixture: both branches at the published snapshot; "
        "oracle pins the expected ref census"
    ),
)
def snapshot_refs_metadata_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs AFTER snapshot_wap_publish_orders' fixture logic (same cache,
    same published end state: main fast-forwarded to the audit branch's
    snapshot 2), then reads the ref census through metadata_table —
    driver-side manifest reads, no data files opened."""
    from ..sources.snapshots import metadata_table

    snapshot_wap_publish_orders(spark, sf_dir)  # ensure published state
    key = _wap_table(spark, sf_dir)
    return metadata_table(key, "refs")


def _wap_table(spark: SparkSession, sf_dir: str):
    import hashlib
    import os

    from ..sources.snapshots import SnapshotTable

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return SnapshotTable(spark, os.path.join(_WAP_CACHE_ROOT, key))


@register_query(
    "snapshot_wap_publish_orders",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
           {dsum_expr("o_totalprice")} AS total
    FROM orders
    """,
    description=(
        "write-audit-publish via branch refs (Nessie-style git-for-data): "
        "stage on an audit branch, validate, fast-forward main; oracle sees the "
        "published union"
    ),
)
def snapshot_wap_publish_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stages the odd-key half on an ``audit`` branch (main still serves
    the even half), runs the audit checks against the branch head, then
    publishes by fast-forwarding main — a metadata-only pointer move,
    no data rewrite. Cached per sf_dir at the published state."""
    import hashlib
    import os

    from pyspark.sql import functions as F2

    from ..sources import load_table
    from ..sources.snapshots import MAIN, SnapshotTable

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tbl = SnapshotTable(spark, os.path.join(_WAP_CACHE_ROOT, key))
    published = tbl.current_snapshot_id() == 2 and tbl.refs()["branches"].get("audit") == 2
    if not published:
        import shutil

        shutil.rmtree(tbl.path, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        tbl.append(orders.filter(F2.col("o_orderkey") % 2 == 0))
        tbl.create_branch("audit")
        tbl.append(orders.filter(F2.col("o_orderkey") % 2 == 1), ref="audit")
        staged = tbl.read(ref="audit")
        audit_ok = (
            staged.filter(
                F2.col("o_orderkey").isNull() | (F2.col("o_totalprice") < 0)
            ).count()
            == 0
        )
        if not audit_ok:  # pragma: no cover - fixture data always passes
            raise RuntimeError("audit failed: not publishing the staged branch")
        tbl.fast_forward(MAIN, "audit")
    return tbl.read().agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_custs"),
        dsum("o_totalprice").alias("total"),
    )


# ------------------------------------------------------------ schema evolution
_EVO_CACHE_ROOT = "/tmp/spark_graft_evotbl"


@register_query(
    "snapshot_schema_evolution_orders",
    oracle=f"""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_sum,
           {dsum_expr("o_totalprice")} AS total_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    description=(
        "field-id schema evolution across commits: first half written under "
        "an old column name and a narrower key type, then rename + int-to-bigint "
        "widen (both metadata-only), second half appended in the new shape; the "
        "resolved read unifies both eras and the oracle replays the final schema"
    ),
)
def snapshot_schema_evolution_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture history (cached per sf_dir at snapshot 5):

    1. append even orderkeys as (o_orderkey INT, o_orderstatus, price)
    2. track_schema            — field ids recorded
    3. rename price -> o_totalprice   (metadata-only)
    4. widen o_orderkey int -> bigint (metadata-only)
    5. append odd orderkeys in the new shape (bigint key, new name)

    ``read()`` resolves era-1 files BY FIELD ID: the renamed column
    comes back under its new name, the narrow key casts up. Zero data
    files were rewritten for steps 3-4 (asserted by the snapshot test
    suite; here the oracle value-checks the unified result).

    Reference tie-in: the schema travels in the metadata docs the
    migration plane registers (`CatalogMigrator.java:208-224`) — this
    is the table-format capability those docs exist to carry."""
    import hashlib
    import os

    from pyspark.sql import functions as F2

    from ..sources import load_table
    from ..sources.snapshots import (
        SnapshotTable,
        rename_column,
        track_schema,
        widen_column,
    )

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tbl = SnapshotTable(spark, os.path.join(_EVO_CACHE_ROOT, key))

    def _built() -> bool:
        if tbl.current_snapshot_id() != 5:
            return False
        snap = tbl._load_snap(5)
        if not snap.get("schemas"):
            return False
        cur = {
            f["name"]: f["type"]
            for s in snap["schemas"]
            if s["schema_id"] == snap["current_schema_id"]
            for f in s["fields"]
        }
        return cur.get("o_totalprice") == "double" and cur.get("o_orderkey") == "bigint"

    if not _built():
        import shutil

        shutil.rmtree(tbl.path, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders")
        era1 = orders.filter(F2.col("o_orderkey") % 2 == 0).select(
            F2.col("o_orderkey").cast("int").alias("o_orderkey"),
            "o_orderstatus",
            F2.col("o_totalprice").alias("price"),
        )
        tbl.append(era1)
        track_schema(tbl)
        rename_column(tbl, "price", "o_totalprice")
        widen_column(tbl, "o_orderkey", "bigint")
        era2 = orders.filter(F2.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        tbl.append(era2)
    return tbl.read().groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("o_orderkey").cast("bigint").alias("key_sum"),
        dsum("o_totalprice").alias("total_price"),
    )


# ------------------------------------------------------------ branch merge WAP
_MWAP_CACHE_ROOT = "/tmp/spark_graft_mwaptbl"


@register_query(
    "snapshot_merge_on_branch_publish",
    oracle=f"""
    WITH merged AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
                  ELSE o_totalprice END AS o_totalprice
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(CASE WHEN o_orderkey % 7 = 0 THEN 1 END) AS BIGINT)
             AS n_updated,
           {dsum_expr("o_totalprice")} AS total
    FROM merged
    WHERE o_orderkey % 11 <> 0
    """,
    description=(
        "full write-audit-publish with data-plane ops on the branch: a MERGE "
        "(doubled price for every 7th key) and an equality DELETE (every 11th "
        "key) staged on the audit branch, then fast-forwarded to main; oracle "
        "replays merge+delete as CASE + filter"
    ),
)
def snapshot_merge_on_branch_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference org's Nessie model is every operation on any ref —
    not just appends. This fixture stages a copy-on-write MERGE and a
    merge-on-read DELETE on ``audit`` while main still serves the
    original rows, audits the staged state, then publishes with one
    metadata-only fast-forward. Cached per sf_dir at the published
    state (main == audit head, deletes pending)."""
    import hashlib
    import os

    from pyspark.sql import functions as F2

    from ..sources import load_table
    from ..sources.snapshots import (
        MAIN,
        SnapshotTable,
        delete_where,
        merge_upsert,
        read_with_deletes,
    )

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tbl = SnapshotTable(spark, os.path.join(_MWAP_CACHE_ROOT, key))

    def _built() -> bool:
        head = tbl.current_snapshot_id()
        if head is None or tbl.refs()["branches"].get("audit") != head:
            return False
        return tbl._load_snap(head)["operation"] == "delete"

    if not _built():
        import shutil

        shutil.rmtree(tbl.path, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        tbl.append(orders)
        tbl.create_branch("audit")
        updates = orders.filter(F2.col("o_orderkey") % 7 == 0).select(
            "o_orderkey", (F2.col("o_totalprice") * 2).alias("o_totalprice")
        )
        merge_upsert(tbl, updates, ["o_orderkey"], ref="audit")
        doomed = orders.filter(F2.col("o_orderkey") % 11 == 0).select("o_orderkey")
        delete_where(tbl, ["o_orderkey"], doomed, ref="audit")
        # audit gate: staged row count is exactly the expected survivors
        staged = read_with_deletes(tbl, ref="audit")
        if staged.filter(F2.col("o_totalprice") <= 0).count() != 0:  # pragma: no cover
            raise RuntimeError("audit failed: not publishing")
        tbl.fast_forward(MAIN, "audit")
    published = read_with_deletes(tbl)
    return published.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.count(F.when(F.col("o_orderkey") % 7 == 0, 1)).cast("bigint").alias("n_updated"),
        dsum("o_totalprice").alias("total"),
    )


@register_query(
    "snapshot_changelog_stream_orders",
    oracle=f"""
    SELECT _change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {dsum_expr("o_totalprice")} AS total
    FROM (
      SELECT 'insert' AS _change_type, o_totalprice FROM orders
      UNION ALL
      SELECT 'delete' AS _change_type, o_totalprice
      FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 5 = 0
    ) GROUP BY _change_type
    """,
    description=(
        "CDC tail of a snapshot table (changelog=true): append commits stream "
        "their rows as inserts, the equality-delete commit streams the newly-"
        "hidden rows as deletes — per commit identical to the batch changelog; "
        "oracle replays all three commits"
    ),
)
def snapshot_changelog_stream_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drains the 3-commit MOR fixture (evens, odds, equality-delete of
    even%5) through the snapshot_commits connector in changelog mode:
    inserts for both appends, delete rows (full values, not bare keys)
    for the delete commit — planned as one input partition per affected
    data file, delete-key filtering executor-side."""
    import tempfile

    from ..sources.snapshot_stream import (
        SNAPSHOT_STREAM_NAME,
        register_snapshot_stream_source,
    )

    tbl = _mor_fixture(spark, sf_dir)
    register_snapshot_stream_source(spark)
    with tempfile.TemporaryDirectory(prefix="snapcdc_") as tmp:
        out, ckpt = f"{tmp}/out", f"{tmp}/ckpt"
        q = (
            spark.readStream.format(SNAPSHOT_STREAM_NAME)
            .option("path", tbl.path)
            .option("changelog", "true")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        drained = spark.read.parquet(out).groupBy("_change_type").agg(
            F.count("*").cast("bigint").alias("n_rows"),
            dsum("o_totalprice").alias("total"),
        )
        rows = drained.collect()
    return spark.createDataFrame(rows, drained.schema)


_PARTMETA_CACHE_ROOT = "/tmp/spark_graft_partmeta"


@register_query(
    "snapshot_partitions_metadata_events",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events
    GROUP BY 1
    """,
    description=(
        "partitions metadata table (tbl.partitions introspection): per-"
        "partition row counts rolled up from manifests + parquet footers only "
        "(no data page decoded) over a day(ts)-hidden-partitioned events table; "
        "oracle replays the day rollup from the raw rows"
    ),
)
def snapshot_partitions_metadata_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-priced per-partition census: the day() transform routed
    every event into its day's files at write time, so the partition
    rollup needs only the manifest's recorded tuples and each file's
    footer row count — the introspection a 100 TB maintenance planner
    runs before choosing what to compact."""
    import hashlib
    import os

    from ..sources import load_table
    from ..sources.snapshots import SnapshotTable, append_partitioned, metadata_table

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tbl = SnapshotTable(spark, os.path.join(_PARTMETA_CACHE_ROOT, key))
    if tbl.current_snapshot_id() != 1:
        import shutil

        shutil.rmtree(tbl.path, ignore_errors=True)
        events = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        append_partitioned(tbl, events, [("ts", "day")])
    parts = metadata_table(tbl, "partitions")
    return parts.select(
        F.element_at("partition_values", 1).alias("day"),
        F.col("n_rows"),
    )


_SORT_CACHE_ROOT = "/tmp/spark_graft_sorttbl"


@register_query(
    "snapshot_sorted_scan_orders",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
           {dsum_expr("o_totalprice")} AS total
    FROM orders
    WHERE o_totalprice BETWEEN 50000 AND 100000
    """,
    description=(
        "sort-order maintenance + manifest-stats scan planning: the table is "
        "range-clustered on o_totalprice (rewrite_sorted records per-file "
        "min/max in the same commit) and a range predicate plans driver-side "
        "against the manifest, scanning a slice of the files; oracle replays "
        "the plain filter"
    ),
)
def snapshot_sorted_scan_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture: orders appended unclustered (8 full-domain files), then
    rewrite_sorted on o_totalprice — one range shuffle, stats recorded
    in the rewrite commit. planned_scan then opens only the files whose
    recorded envelope intersects [50k, 100k]; the exact filter still
    applies (envelopes are lossy). Asserted scannable-file reduction
    lives in test_snapshots.py; here the VALUES are oracle-checked."""
    import hashlib
    import os

    from ..sources import load_table
    from ..sources.snapshots import SnapshotTable, planned_scan, rewrite_sorted

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tbl = SnapshotTable(spark, os.path.join(_SORT_CACHE_ROOT, key))

    def _built() -> bool:
        sid = tbl.current_snapshot_id()
        return sid == 2 and tbl._load_snap(sid)["operation"] == "rewrite-sorted"

    if not _built():
        import shutil

        shutil.rmtree(tbl.path, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        tbl.append(orders.repartition(8))
        rewrite_sorted(tbl, ["o_totalprice"], n_files=8)
    df, _summary = planned_scan(tbl, "o_totalprice", 50000.0, 100000.0)
    return df.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.min("o_orderkey").cast("bigint").alias("min_key"),
        F.max("o_orderkey").cast("bigint").alias("max_key"),
        dsum("o_totalprice").alias("total"),
    )


@register_query(
    "snapshot_connector_time_travel_orders",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
           {dsum_expr("o_totalprice")} AS total
    FROM orders
    WHERE o_totalprice BETWEEN 30000 AND 60000
    """,
    description=(
        "batch connector read (spark.read.format('snapshot_commits')) pinned "
        "to a snapshot id, with the WHERE clause pushed into pushFilters and "
        "pruning files against the sorted fixture's recorded [min, max] "
        "envelopes before any file opens; oracle replays the range predicate"
    ),
)
def snapshot_connector_time_travel_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reads the RANGE-CLUSTERED fixture (built by
    snapshot_sorted_scan_orders: append + rewrite_sorted, per-file
    stats recorded in the rewrite commit) AT ITS SORTED SNAPSHOT
    through the Python Data Source batch reader. The price predicate
    reaches ``pushFilters`` and prunes files by the manifest envelopes
    — actual file skipping, pinned at the partition-planner level in
    test_snapshot_stream.py — then Spark re-applies it exactly."""
    import hashlib
    import os

    from ..sources.snapshot_stream import (
        SNAPSHOT_STREAM_NAME,
        register_snapshot_stream_source,
    )
    from ..sources.snapshots import SnapshotTable

    snapshot_sorted_scan_orders(spark, sf_dir)  # ensure the sorted fixture
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tbl = SnapshotTable(spark, os.path.join(_SORT_CACHE_ROOT, key))
    register_snapshot_stream_source(spark)
    df = (
        spark.read.format(SNAPSHOT_STREAM_NAME)
        .option("path", tbl.path)
        .option("snapshot_id", str(tbl.current_snapshot_id()))
        .load()
        .filter(F.col("o_totalprice").between(30000, 60000))
    )
    return df.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("o_orderkey").cast("bigint").alias("n_keys"),
        dsum("o_totalprice").alias("total"),
    )


_REPL_CACHE_ROOT = "/tmp/spark_graft_repltbl"


@register_query(
    "snapshot_cdc_replication_orders",
    oracle=f"""
    WITH state AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 8 = 4 THEN o_totalprice + 2000
                  ELSE o_totalprice END AS o_totalprice
      FROM orders
      WHERE o_orderkey % 2 = 1
         OR o_orderkey % 10 <> 0
         OR o_orderkey % 8 = 4
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
           {dsum_expr("o_totalprice")} AS total
    FROM state
    """,
    description=(
        "CDC table replication value-checked end to end: source history "
        "(append evens, equality-delete every 10th key, append odds, then "
        "a MERGE over the pending MOR deletes that bumps the %8==4 keys "
        "and REVIVES the deleted ones among them) is mirrored through the "
        "changelog stream into a replica — the merge commit streams as "
        "non-net delete+insert pairs tie-broken per key — and the "
        "REPLICA's state is what the oracle replays"
    ),
)
def snapshot_cdc_replication_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builds (cached per sf_dir) a source snapshot table with an
    append/delete/append history, replicates it via
    ``replicate_snapshot_table_stream`` (the changelog stream applied
    as per-epoch net effects), and aggregates the replica through the
    merge-on-read read path. The drained replica — not the source — is
    the value-checked side, so the whole loop (changelog planning,
    executor-side delete filtering, ordinal-ordered apply, epoch
    idempotence) sits under the oracle gate."""
    import hashlib
    import os

    from pyspark.sql import functions as F2

    from ..sources import load_table
    from ..sources.snapshots import SnapshotTable, delete_where, read_with_deletes
    from ..streaming.jobs import replicate_snapshot_table_stream

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(_REPL_CACHE_ROOT, key)
    src = SnapshotTable(spark, os.path.join(root, "src"))
    dst = SnapshotTable(spark, os.path.join(root, "dst"))

    def _built() -> bool:
        if src.current_snapshot_id() != 4 or dst.current_snapshot_id() is None:
            return False
        if src._load_snap(4)["operation"] != "merge":
            return False
        return dst._load_snap(dst.current_snapshot_id())["operation"] in (
            "replicate-epoch",
            "append",
            "merge",
        )

    if not _built():
        import shutil

        from ..sources.snapshots import merge_upsert

        shutil.rmtree(root, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        src.append(orders.filter(F2.col("o_orderkey") % 2 == 0))
        doomed = orders.filter(F2.col("o_orderkey") % 10 == 0).select("o_orderkey")
        delete_where(src, ["o_orderkey"], doomed)
        src.append(orders.filter(F2.col("o_orderkey") % 2 == 1))
        # a MERGE straight over the pending MOR deletes: bumps the
        # %8==4 keys and REVIVES the deleted ones among them; streams
        # to the replica as the non-net rewrite emission
        delta = orders.filter(F2.col("o_orderkey") % 8 == 4).withColumn(
            "o_totalprice", F2.col("o_totalprice") + 2000
        )
        merge_upsert(src, delta, ["o_orderkey"])
        q = replicate_snapshot_table_stream(
            spark, src.path, dst, ["o_orderkey"], os.path.join(root, "ckpt")
        )
        q.awaitTermination(300)
    return read_with_deletes(dst).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_custs"),
        dsum("o_totalprice").alias("total"),
    )


# ------------------------------------------------------------ catalog CAS
_CAS_CACHE_ROOT = "/tmp/spark_graft_castbl"


@register_query(
    "snapshot_catalog_cas_commit_orders",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
           {dsum_expr("o_totalprice")} AS total
    FROM orders
    """,
    description=(
        "catalog-arbitrated commits: two appends land through the pointer "
        "catalog's compare-and-swap (no flock/O_EXCL in the arbitration "
        "path — the reference's registerTable model), a deliberately stale "
        "third commit loses the CAS and leaves no trace, and the table "
        "reads back exactly the two winners' rows"
    ),
)
def snapshot_catalog_cas_commit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-arbitrated snapshot table value-checked end to end: the
    head pointer lives in a ``SqlCatalog`` row and every commit CASes
    it (`CatalogMigrator.java:208-224` delegates exactly this to its
    catalogs). The fixture also replays a STALE-parent commit, which
    must raise ``CommitConflictError`` and roll back its staged
    manifest — so conflict cleanup sits under the oracle gate too."""
    import hashlib
    import os

    from pyspark.sql import functions as F2

    from ..catalog import SqlCatalog, TableIdentifier
    from ..sources import load_table
    from ..sources.snapshots import (
        CatalogArbitratedTable,
        CommitConflictError,
    )

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(_CAS_CACHE_ROOT, key)
    cat = SqlCatalog("arbiter", os.path.join(root, "cat.db"))
    ident = TableIdentifier.of("lake", "orders_cas")

    def _built(tbl) -> bool:
        return tbl.current_snapshot_id() == 2 and tbl.history_ids() == [1, 2]

    try:
        tbl = CatalogArbitratedTable(spark, cat, ident)
    except Exception:
        tbl = None
    if tbl is None or not _built(tbl):
        import shutil

        cat.close()
        shutil.rmtree(root, ignore_errors=True)
        cat = SqlCatalog("arbiter", os.path.join(root, "cat.db"))
        cat.create_namespace(("lake",))
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        tbl = CatalogArbitratedTable.create(
            spark, cat, ident, os.path.join(root, "tbl")
        )
        s1 = tbl.append(orders.filter(F2.col("o_orderkey") % 2 == 0))
        tbl.append(orders.filter(F2.col("o_orderkey") % 2 == 1))
        # a stale writer races off the old head: the CAS (parent check
        # against the catalog pointer) must refuse and clean up
        try:
            tbl._commit(tbl._load_snap(s1)["files"], "append", s1)
            raise RuntimeError("stale commit unexpectedly won the CAS")
        except CommitConflictError:
            pass
    out = tbl.read().agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_custs"),
        dsum("o_totalprice").alias("total"),
    )
    cat.close()
    return out


# ------------------------------------------------------------ positional deletes
_DV_CACHE_ROOT = "/tmp/spark_graft_dvtbl"


@register_query(
    "snapshot_positional_delete_orders",
    oracle="""
    SELECT CAST(COUNT(*) FILTER (WHERE NOT (o_totalprice < 20000)
                                   AND NOT (o_orderkey % 4 = 2)) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_pre_delete,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                        FILTER (WHERE NOT (o_totalprice < 20000)
                                  AND NOT (o_orderkey % 4 = 2)),
                      2) AS DOUBLE) AS total
    FROM orders WHERE o_orderkey % 2 = 0
    """,
    description=(
        "positional deletes (Iceberg v2 position-delete / v3 deletion-vector "
        "model): (file, row_ordinal) vectors recorded from the parquet "
        "_metadata.row_index, applied as a read-time anti-join on the row "
        "identity; an equality delete stacked on top must carry the pending "
        "vectors; time travel to the pre-delete snapshot sees every row"
    ),
)
def snapshot_positional_delete_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-vector fixture (cached per sf_dir): append even orders,
    positionally delete the cheap rows (``o_totalprice < 20000`` — the
    vectors record exact (file, pos) coordinates, O(matched rows), no
    key columns needed), then stack an equality delete (keys with
    ``o_orderkey % 4 = 2``) on top — the commit must carry the pending
    vectors or every pos-deleted row silently resurrects. The result
    exposes the post-delete aggregate AND the pre-delete row count via
    time travel, both value-checked by the oracle's filter replay."""
    import hashlib
    import os

    from pyspark.sql import functions as F2

    from ..sources import load_table
    from ..sources.snapshots import (
        SnapshotTable,
        delete_where,
        delete_where_positional,
        read_with_deletes,
    )

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tbl = SnapshotTable(spark, os.path.join(_DV_CACHE_ROOT, key))

    def _built() -> bool:
        if tbl.current_snapshot_id() != 3:
            return False
        head = tbl._load_snap(3)
        return bool(head.get("pos_deletes")) and bool(head.get("deletes"))

    if not _built():
        import shutil

        shutil.rmtree(tbl.path, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        tbl.append(orders.filter(F2.col("o_orderkey") % 2 == 0))
        delete_where_positional(tbl, "o_totalprice < 20000")
        doomed = (
            orders.filter(
                (F2.col("o_orderkey") % 2 == 0) & (F2.col("o_orderkey") % 4 == 2)
            ).select("o_orderkey")
        )
        delete_where(tbl, ["o_orderkey"], doomed)
    post = read_with_deletes(tbl)
    pre_n = read_with_deletes(tbl, snapshot_id=1).count()
    return post.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.lit(pre_n).cast("bigint").alias("n_pre_delete"),
        dsum("o_totalprice").alias("total"),
    )


# ------------------------------------------------------------ MERGE clause surface
_MERGE_CACHE_ROOT = "/tmp/spark_graft_mergetbl"


@register_query(
    "snapshot_merge_matched_delete_orders",
    oracle=f"""
    WITH tgt AS (
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
    ), src AS (
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_orderkey % 4 = 0 OR (o_orderkey % 2 = 1 AND o_orderkey % 3 = 0)
    ), merged AS (
      SELECT t.o_orderkey, t.o_custkey,
             CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice + 1000
                  ELSE t.o_totalprice END AS o_totalprice
      FROM tgt t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
      WHERE s.o_orderkey IS NULL OR NOT (s.o_totalprice < 30000)
      UNION ALL
      SELECT s.o_orderkey, s.o_custkey, s.o_totalprice
      FROM src s LEFT JOIN tgt t ON t.o_orderkey = s.o_orderkey
      WHERE t.o_orderkey IS NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
           {dsum_expr("o_totalprice")} AS total
    FROM merged
    """,
    description=(
        "full MERGE clause surface: WHEN MATCHED AND cond THEN DELETE / "
        "WHEN MATCHED THEN UPDATE SET expr / WHEN NOT MATCHED THEN INSERT, "
        "first-clause-wins, file-granular copy-on-write; oracle replays the "
        "three-way outcome with joins"
    ),
)
def snapshot_merge_matched_delete_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO with the full ordered clause list (the ANSI surface
    ``merge_upsert`` specializes): cheap matched rows are DELETED,
    remaining matched rows take an UPDATE expression over both sides,
    unmatched source rows INSERT. Cached per sf_dir; the oracle
    replays the clause semantics with plain joins."""
    import hashlib
    import os

    from pyspark.sql import functions as F2

    from ..sources import load_table
    from ..sources.snapshots import MergeClause, SnapshotTable, merge_into

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tbl = SnapshotTable(spark, os.path.join(_MERGE_CACHE_ROOT, key))

    def _built() -> bool:
        return (
            tbl.current_snapshot_id() == 2
            and tbl._load_snap(2)["operation"] == "merge"
        )

    if not _built():
        import shutil

        shutil.rmtree(tbl.path, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        tbl.append(orders.filter(F2.col("o_orderkey") % 2 == 0))
        src = orders.filter(
            (F2.col("o_orderkey") % 4 == 0)
            | ((F2.col("o_orderkey") % 2 == 1) & (F2.col("o_orderkey") % 3 == 0))
        )
        merge_into(
            tbl,
            src,
            ["o_orderkey"],
            [
                MergeClause("delete", "src_o_totalprice < 30000"),
                MergeClause(
                    "update", None, {"o_totalprice": "src_o_totalprice + 1000"}
                ),
                MergeClause("insert"),
            ],
        )
    return tbl.read().agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_custs"),
        dsum("o_totalprice").alias("total"),
    )


@register_query(
    "snapshot_merge_over_mor_orders",
    oracle=f"""
    WITH tgt AS (
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
    ), delta AS (
      SELECT o_orderkey, o_custkey, o_totalprice + 5000 AS o_totalprice
      FROM tgt WHERE o_orderkey % 20 = 0 OR o_orderkey % 10 = 4
    ), visible AS (
      -- rows surviving the equality delete (k %% 10 = 0), with the
      -- merge's updates applied and its revived keys (k %% 20 = 0) back
      SELECT t.o_orderkey, t.o_custkey,
             COALESCE(d.o_totalprice, t.o_totalprice) AS o_totalprice
      FROM tgt t LEFT JOIN delta d ON t.o_orderkey = d.o_orderkey
      WHERE t.o_orderkey % 10 <> 0 OR t.o_orderkey % 20 = 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           {dsum_expr("o_totalprice")} AS total,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM tgt
             WHERE o_orderkey % 10 = 0 AND o_orderkey % 20 <> 0
           ) AS n_surviving_delete_keys
    FROM visible
    """,
    description=(
        "MERGE over pending merge-on-read deletes: the upsert applies the "
        "equality-delete state during its touched-file read (a MOR-hidden "
        "key is NOT MATCHED and gets re-inserted), consumes the delete "
        "entries its source keys name in the same commit, and carries the "
        "surviving entries — no compact_deletes full-table rewrite; the "
        "oracle replays delete+merge with plain joins"
    ),
)
def snapshot_merge_over_mor_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture (cached per sf_dir): append even orders, equality-delete
    keys with ``o_orderkey % 10 = 0``, then merge_upsert a delta that
    REVIVES the ``% 20 = 0`` half of the deleted keys and updates the
    live ``% 10 = 4`` keys (price + 5000) — all in ONE merge commit
    made directly over the pending delete state. The result also
    surfaces the count of delete keys the merge did NOT consume, read
    from the head manifest's surviving delete files."""
    import hashlib
    import os

    from pyspark.sql import functions as F2

    from ..sources import load_table
    from ..sources.snapshots import (
        SnapshotTable,
        delete_where,
        merge_upsert,
        read_with_deletes,
    )

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tbl = SnapshotTable(spark, os.path.join(_MERGE_CACHE_ROOT, key + "-mor"))

    def _built() -> bool:
        if tbl.current_snapshot_id() != 3:
            return False
        head = tbl._load_snap(3)
        return head["operation"] == "merge" and bool(head.get("deletes"))

    if not _built():
        import shutil

        shutil.rmtree(tbl.path, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        evens = orders.filter(F2.col("o_orderkey") % 2 == 0)
        tbl.append(evens)
        delete_where(
            tbl,
            ["o_orderkey"],
            evens.filter(F2.col("o_orderkey") % 10 == 0).select("o_orderkey"),
        )
        delta = evens.filter(
            (F2.col("o_orderkey") % 20 == 0) | (F2.col("o_orderkey") % 10 == 4)
        ).withColumn("o_totalprice", F2.col("o_totalprice") + 5000)
        merge_upsert(tbl, delta, ["o_orderkey"])
    head = tbl._load_snap(tbl.current_snapshot_id())
    surviving = (
        tbl._read_files(head["deletes"]).distinct().count()
        if head.get("deletes")
        else 0
    )
    return read_with_deletes(tbl).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        dsum("o_totalprice").alias("total"),
        F.lit(surviving).cast("bigint").alias("n_surviving_delete_keys"),
    )


@register_query(
    "snapshot_row_lineage_orders",
    oracle=f"""
    WITH tgt AS (
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
    ), merged AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 10 = 2 THEN o_totalprice + 1000
                  ELSE o_totalprice END AS o_totalprice
      FROM tgt
      UNION ALL
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_orderkey % 2 = 1 AND o_orderkey % 9 = 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_ids,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM tgt) AS n_kept_ids,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
             WHERE o_orderkey % 2 = 1 AND o_orderkey % 9 = 0) AS n_new_ids,
           {dsum_expr("o_totalprice")} AS total
    FROM merged
    """,
    description=(
        "row lineage (Iceberg v3 _row_id model): ids derive from per-file "
        "first_row_id + ordinal, a MERGE UPDATE keeps every updated row's "
        "id while inserts allocate fresh counter ids and the rewrite "
        "materializes ids physically; the oracle pins the id arithmetic "
        "(all pre-merge ids kept, exactly the inserts minted new ones, "
        "all distinct) plus the merged content"
    ),
)
def snapshot_row_lineage_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture (cached per sf_dir): append even orders, enable row
    lineage (ids 0..N-1 assigned, metadata-only), then one merge_upsert
    that updates the ``% 10 = 2`` keys (price + 1000) and inserts the
    odd ``% 9 = 0`` orders. Ids are 0-based consecutive, so stability
    is fully arithmetic: kept ids are exactly those < N, new ids are
    exactly the insert count at >= N, and all ids stay distinct."""
    import hashlib
    import os

    from pyspark.sql import functions as F2

    from ..sources import load_table
    from ..sources.snapshots import (
        SnapshotTable,
        enable_row_lineage,
        merge_upsert,
        read_with_lineage,
    )

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tbl = SnapshotTable(spark, os.path.join(_MERGE_CACHE_ROOT, key + "-lineage"))

    def _built() -> bool:
        if tbl.current_snapshot_id() != 3:
            return False
        head = tbl._load_snap(3)
        return head["operation"] == "merge" and bool(head.get("row_lineage"))

    if not _built():
        import shutil

        shutil.rmtree(tbl.path, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        tbl.append(orders.filter(F2.col("o_orderkey") % 2 == 0))
        enable_row_lineage(tbl)
        delta = orders.filter(
            (F2.col("o_orderkey") % 2 == 0) & (F2.col("o_orderkey") % 10 == 2)
        ).withColumn("o_totalprice", F2.col("o_totalprice") + 1000).unionByName(
            orders.filter(
                (F2.col("o_orderkey") % 2 == 1) & (F2.col("o_orderkey") % 9 == 0)
            )
        )
        merge_upsert(tbl, delta, ["o_orderkey"])
    n0 = tbl._load_snap(2)["next_row_id"]  # ids minted at enable time
    rows = read_with_lineage(tbl)
    return rows.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("_row_id").cast("bigint").alias("n_distinct_ids"),
        F.count(F.when(F.col("_row_id") < n0, 1)).cast("bigint").alias("n_kept_ids"),
        F.count(F.when(F.col("_row_id") >= n0, 1)).cast("bigint").alias("n_new_ids"),
        dsum("o_totalprice").alias("total"),
    )


@register_query(
    "snapshot_metadata_count_orders",
    oracle="""
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
             WHERE o_orderkey % 2 = 0) AS n_pre,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
             WHERE o_orderkey % 2 = 0
               AND NOT (o_totalprice < 20000)) AS n_after_vectors
    """,
    description=(
        "metadata-only COUNT(*): per-file row counts recorded in the "
        "manifest at commit time sum driver-side with zero data/footer "
        "reads, and positional deletion vectors subtract their exact "
        "coordinate sets — the oracle replays both counts from the data"
    ),
)
def snapshot_metadata_count_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture (cached per sf_dir): append even orders, then a
    positional delete of the cheap rows. Both counts come from
    :func:`metadata_count` — manifest row counts minus the vector
    coordinate set, no scan — and are value-checked against DuckDB
    counting the real data."""
    import hashlib
    import os

    from pyspark.sql import functions as F2

    from ..sources import load_table
    from ..sources.snapshots import (
        SnapshotTable,
        delete_where_positional,
        metadata_count,
    )

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tbl = SnapshotTable(spark, os.path.join(_MERGE_CACHE_ROOT, key + "-count"))

    def _built() -> bool:
        return (
            tbl.current_snapshot_id() == 2
            and bool(tbl._load_snap(2).get("pos_deletes"))
        )

    if not _built():
        import shutil

        shutil.rmtree(tbl.path, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        tbl.append(orders.filter(F2.col("o_orderkey") % 2 == 0))
        delete_where_positional(tbl, "o_totalprice < 20000")
    n_pre = metadata_count(tbl, snapshot_id=1)
    n_after = metadata_count(tbl)  # head: vectors subtract exactly
    return spark.range(1).select(
        F.lit(n_pre).cast("bigint").alias("n_pre"),
        F.lit(n_after).cast("bigint").alias("n_after_vectors"),
    )


@register_query(
    "snapshot_catalog_wap_publish_orders",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
           {dsum_expr("o_totalprice")} AS total
    FROM orders WHERE o_orderkey % 2 = 0 OR o_orderkey % 3 = 0
    """,
    description=(
        "write-audit-publish entirely through catalog CAS: the audit branch "
        "is its own scope-partitioned catalog entry (Nessie model) whose "
        "commits CAS independently of main; publish is a CASed fast-forward "
        "of MAIN's entry; the oracle replays the published state"
    ),
)
def snapshot_catalog_wap_publish_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAP on a catalog-arbitrated table: evens land on main, the odd
    multiples of 3 stage on the ``audit`` branch's own catalog entry
    (commits CAS that entry, main never sees them), then main adopts
    the audited snapshots via a fast-forward routed through MAIN's
    catalog CAS. Cached per sf_dir."""
    import hashlib
    import os

    from pyspark.sql import functions as F2

    from ..catalog import SqlCatalog, TableIdentifier
    from ..sources import load_table
    from ..sources.snapshots import CatalogArbitratedTable

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(_CAS_CACHE_ROOT, key + "-wap")
    cat = SqlCatalog("arbiter", os.path.join(root, "cat.db"))
    ident = TableIdentifier.of("lake", "orders_wap")

    def _built(tbl) -> bool:
        return (
            tbl.current_snapshot_id() == 2
            and tbl.head("audit") == 2
            and tbl.history_ids() == [1, 2]
        )

    try:
        tbl = CatalogArbitratedTable(spark, cat, ident)
    except Exception:
        tbl = None
    if tbl is None or not _built(tbl):
        import shutil

        cat.close()
        shutil.rmtree(root, ignore_errors=True)
        cat = SqlCatalog("arbiter", os.path.join(root, "cat.db"))
        cat.create_namespace(("lake",))
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        tbl = CatalogArbitratedTable.create(
            spark, cat, ident, os.path.join(root, "tbl")
        )
        s1 = tbl.append(orders.filter(F2.col("o_orderkey") % 2 == 0))
        tbl.create_branch("audit")
        s2 = tbl.append(
            orders.filter(
                (F2.col("o_orderkey") % 2 == 1) & (F2.col("o_orderkey") % 3 == 0)
            ),
            ref="audit",
        )
        assert tbl.current_snapshot_id() == s1  # staged, not published
        published = tbl.fast_forward("main", "audit")
        assert published == s2
    out = tbl.read().agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_custs"),
        dsum("o_totalprice").alias("total"),
    )
    cat.close()
    return out


@register_query(
    "snapshot_sequence_revive_orders",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(CASE WHEN o_orderkey % 14 = 0 THEN 1 END) AS BIGINT)
               AS n_revived,
           {dsum_expr("o_totalprice")} AS total
    FROM (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0
      UNION ALL
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 14 = 0
    )
    """,
    description=(
        "Iceberg data-sequence-number rule end to end: an equality delete "
        "hides only files sequenced BEFORE it, so re-appending a deleted "
        "key revives it — the oracle replays delete-then-revive as "
        "surviving-predicate UNION re-append"
    ),
)
def snapshot_sequence_revive_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-aware MOR read: append all orders (seq 1), equality-
    delete keys ``%7 == 0`` (seq 2), re-append the ``%14 == 0`` subset
    (seq 3). The delete file is sequenced BEFORE the third commit, so
    the re-appended rows revive while the rest of the deleted keys stay
    hidden — Iceberg's data-sequence rule (spec: 'equality delete files
    applied to data files from strictly prior sequence numbers').
    Cached per sf_dir; rebuilt when the cached chain is stale."""
    import hashlib
    import os

    from pyspark.sql import functions as F2

    from ..sources import load_table
    from ..sources.snapshots import SnapshotTable, delete_where, read_with_deletes

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tbl = SnapshotTable(spark, os.path.join(_SNAP_CACHE_ROOT, key + "-seq"))
    if tbl.current_snapshot_id() != 3:
        import shutil

        shutil.rmtree(tbl.path, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        tbl.append(orders)
        delete_where(
            tbl,
            ["o_orderkey"],
            orders.filter(F2.col("o_orderkey") % 7 == 0).select("o_orderkey"),
        )
        tbl.append(orders.filter(F2.col("o_orderkey") % 14 == 0))
    return read_with_deletes(tbl).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.count(F.when(F.col("o_orderkey") % 14 == 0, 1))
        .cast("bigint")
        .alias("n_revived"),
        dsum("o_totalprice").alias("total"),
    )


@register_query(
    "snapshot_add_files_lineitem",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           {dsum_expr("l_extendedprice")} AS total
    FROM lineitem
    """,
    description=(
        "Iceberg add_files procedure: existing parquet registers into a "
        "snapshot table as one append commit with ZERO data movement "
        "(hard-link + footer-only bookkeeping); the oracle reads the "
        "same file directly — byte-identical data proves the adoption"
    ),
)
def snapshot_add_files_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adopts ``lineitem.parquet`` in place via :func:`add_files` —
    the data-plane sibling of the reference's register-don't-move
    model (CatalogMigrator.java:208-224 moves pointers, never data).
    Cached per sf_dir; rebuilt when the cached state is stale."""
    import hashlib
    import os

    from ..sources.snapshots import SnapshotTable, add_files

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tbl = SnapshotTable(spark, os.path.join(_SNAP_CACHE_ROOT, key + "-addf"))
    if tbl.current_snapshot_id() != 1:
        import shutil

        shutil.rmtree(tbl.path, ignore_errors=True)
        add_files(tbl, [os.path.join(sf_dir, "lineitem.parquet")])
    return tbl.read().agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("l_suppkey").cast("bigint").alias("n_supps"),
        dsum("l_extendedprice").alias("total"),
    )


@register_query(
    "snapshot_iceberg_export_orders",
    oracle="""
    SELECT 1 AS snapshot_id, 1 AS sequence_number, 2 AS n_files,
           CAST(COUNT(*) AS BIGINT) AS total_records,
           CAST(NULL AS BIGINT) AS min_key, CAST(NULL AS BIGINT) AS max_key
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT 2, 2, 3, CAST(COUNT(*) AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 3, 3, 3, CAST(COUNT(*) AS BIGINT),
           CAST(MIN(o_orderkey) AS BIGINT), CAST(MAX(o_orderkey) AS BIGINT)
    FROM orders
    """,
    description=(
        "Iceberg-v2 metadata EXPORT round trip: spec-shaped "
        "metadata.json + Avro manifest lists + Avro manifests (pure-"
        "Python writer) read back through the package Avro reader — "
        "snapshot chain, sequence numbers, per-manifest row totals and "
        "field-id-keyed stats bounds all recomputed by DuckDB from the "
        "base table"
    ),
)
def snapshot_iceberg_export_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exports the three-commit fixture (even orders x2 files, odd x1,
    then record-stats) as Iceberg-shaped metadata and re-derives every
    output column FROM THE EXPORT: totals from the snapshot summaries,
    file counts from the manifests, min/max keys from the field-id-
    keyed bounds (present only once stats are recorded — the NULL rows
    pin the honest absence)."""
    import hashlib
    import json
    import os
    import struct

    from ..sources import load_table
    from ..sources.iceberg_format import export_iceberg_metadata, read_avro
    from ..sources.snapshots import SnapshotTable, record_file_stats

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tbl = SnapshotTable(spark, os.path.join(_SNAP_CACHE_ROOT, key + "-icex"))
    if tbl.current_snapshot_id() != 3:
        import shutil

        shutil.rmtree(tbl.path, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        # repartition, NOT coalesce: the oracle pins n_files = 2 for the
        # even commit, and coalesce(2) silently yields ONE file whenever
        # the scan has a single split (tiny SFs / unchunked fixtures) —
        # found as an inherited stale-fixture failure at sf0.001
        tbl.append(orders.filter(F.col("o_orderkey") % 2 == 0).repartition(2))
        tbl.append(orders.filter(F.col("o_orderkey") % 2 == 1).coalesce(1))
        record_file_stats(tbl, ["o_orderkey"])
    out = export_iceberg_metadata(tbl, reuse=True)
    meta = json.load(open(out["metadata_location"]))
    key_fid = next(
        f["id"]
        for f in meta["schemas"][0]["fields"]
        if f["name"] == "o_orderkey"
    )
    rows = []
    for s in meta["snapshots"]:
        _, (ml,) = read_avro(s["manifest-list"])
        _, entries = read_avro(ml["manifest_path"])
        los, his = [], []
        for e in entries:
            for kv in e["data_file"]["lower_bounds"] or []:
                if kv["key"] == key_fid:
                    los.append(struct.unpack("<q", kv["value"])[0])
            for kv in e["data_file"]["upper_bounds"] or []:
                if kv["key"] == key_fid:
                    his.append(struct.unpack("<q", kv["value"])[0])
        # bounds only count when EVERY file carries them (else the
        # manifest min would understate the table min)
        complete = len(los) == len(entries) and len(his) == len(entries)
        rows.append(
            (
                s["snapshot-id"],
                s["sequence-number"],
                ml["added_files_count"] + ml["existing_files_count"],
                int(s["summary"]["total-records"]),
                min(los) if complete else None,
                max(his) if complete else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "snapshot_id int, sequence_number int, n_files int, "
        "total_records bigint, min_key bigint, max_key bigint",
    )


@register_query(
    "snapshot_iceberg_import_orders",
    oracle=f"""
    WITH mid AS (
        SELECT CAST(FLOOR((MIN(o_orderkey) + MAX(o_orderkey)) / 2.0) AS BIGINT) AS m
        FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows_head,
           {dsum_expr("o_totalprice")} AS total_head,
           CAST(
               (SELECT COUNT(*) FROM orders, mid WHERE o_orderkey < m)
               AS BIGINT
           ) AS n_rows_snap1,
           (SELECT {dsum_expr("o_totalprice")}
            FROM orders, mid WHERE o_orderkey >= m) AS total_pruned
    FROM orders
    """,
    description=(
        "Iceberg-v2 metadata IMPORT: a pointer exported by "
        "export_iceberg_metadata is opened by IcebergTable — data "
        "round-trips exactly, snapshot-1 time travel returns the first "
        "commit, and a range read is MANIFEST-STATS-pruned (the two "
        "range-disjoint lower files never reach the scan) — every "
        "number recomputed by DuckDB from the base table"
    ),
)
def snapshot_iceberg_import_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opens an exported metadata pointer with the read-side complement
    of the exporter (sources/iceberg_read.py): the pointer the
    reference migrates between catalogs (CatalogMigrator.java:212-213)
    becomes an operable Spark scan. The pruned read plans from manifest
    bounds alone — the assert pins that the plan kept exactly one of
    the three range-disjoint files without opening any parquet footer."""
    import hashlib
    import os

    from ..sources import load_table
    from ..sources.iceberg_format import export_iceberg_metadata
    from ..sources.iceberg_read import IcebergTable
    from ..sources.snapshots import SnapshotError, SnapshotTable, record_file_stats

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tbl = SnapshotTable(spark, os.path.join(_SNAP_CACHE_ROOT, key + "-icim2"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    mn, mx = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    mid = (int(mn) + int(mx)) // 2
    if tbl.current_snapshot_id() != 3:
        import shutil

        shutil.rmtree(tbl.path, ignore_errors=True)
        tbl.append(
            orders.filter(F.col("o_orderkey") < mid).repartitionByRange(
                2, "o_orderkey"
            )
        )
        tbl.append(orders.filter(F.col("o_orderkey") >= mid).coalesce(1))
        record_file_stats(tbl, ["o_orderkey"])
    out = export_iceberg_metadata(tbl, reuse=True)
    it = IcebergTable(spark, out["metadata_location"])
    head = it.read()
    snap1 = it.read(snapshot_id=1)
    prune = [("o_orderkey", ">=", mid)]
    kept, pruned = it.plan_files(it.snapshot(), prune)
    if (len(kept), pruned) != (1, 2):  # stats must serve the plan
        raise SnapshotError(
            f"expected 1 kept / 2 pruned files, got {len(kept)}/{pruned}"
        )
    upper = it.read(filters=prune)
    return (
        head.agg(
            F.count("*").cast("bigint").alias("n_rows_head"),
            dsum("o_totalprice").alias("total_head"),
        )
        .crossJoin(
            F.broadcast(
                snap1.agg(F.count("*").cast("bigint").alias("n_rows_snap1"))
            )
        )
        .crossJoin(
            F.broadcast(upper.agg(dsum("o_totalprice").alias("total_pruned")))
        )
    )


@register_query(
    "snapshot_rest_transaction_orders",
    oracle=f"""
    SELECT CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_rows_a,
           (SELECT {dsum_expr("o_totalprice")} FROM orders
            WHERE o_orderkey % 2 = 0) AS total_a,
           CAST(COUNT(*) AS BIGINT) AS n_rows_b
    FROM orders
    """,
    description=(
        "Multi-table REST transaction (round-15): one "
        "POST /v1/transactions/commit atomically publishes snapshots "
        "to TWO tables (the SQL store applies every pointer swap in "
        "one transaction); a follow-up transaction with a stale "
        "requirement on one table 409s the WHOLE batch leaving both "
        "untouched; the engine's reader opens both REST-served docs — "
        "per-table aggregates recomputed by DuckDB"
    ),
)
def snapshot_rest_transaction_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The spec's ``CommitTransaction`` route
    (catalog/rest_server.py `_commit_transaction` + the SQL store's
    atomic multi-CAS `swap_table_metadata_locations`): N table-changes
    validate against current state, then ONE ``BEGIN IMMEDIATE``
    transaction applies every pointer swap — all-or-nothing, the same
    arbitration the reference's stock-client REST type needs
    (CatalogMigrationUtil.java:36-46)."""
    import os
    import shutil
    import tempfile

    from ..catalog import SqlCatalog
    from ..catalog.rest_server import IcebergRestCatalogServer
    from ..sources.iceberg_read import IcebergTable

    exported = _icfr_exported(spark, sf_dir)
    snap_a, snap_b = exported["snapshots"][0], exported["snapshots"][1]
    _req = _rest_req

    def _change(name, snap, prev=None):
        return {
            "identifier": {"namespace": ["lake"], "name": name},
            "requirements": [
                {
                    "type": "assert-ref-snapshot-id",
                    "ref": "main",
                    "snapshot-id": prev,
                }
            ],
            "updates": [
                {"action": "add-snapshot", "snapshot": snap},
                {
                    "action": "set-snapshot-ref",
                    "ref-name": "main",
                    "type": "branch",
                    "snapshot-id": snap["snapshot-id"],
                },
            ],
        }

    tmp = tempfile.mkdtemp(prefix="rest-txn-")
    server = IcebergRestCatalogServer(
        SqlCatalog("store", os.path.join(tmp, "store.db")),
        owns_store=True,
        warehouse=os.path.join(tmp, "wh"),
    )
    try:
        uri = server.start()
        _req(uri, "POST", "/v1/namespaces", {"namespace": ["lake"]})
        for name in ("a", "b"):
            st, out = _req(
                uri,
                "POST",
                "/v1/namespaces/lake/tables",
                {"name": name, "schema": exported["schemas"][0]},
            )
            if st != 200:
                raise RuntimeError(f"createTable {name} failed: {st} {out}")
        # ---- ONE transaction advances both tables atomically
        st, out = _req(
            uri,
            "POST",
            "/v1/transactions/commit",
            {
                "table-changes": [
                    _change("a", snap_a),
                    _change("b", snap_b),
                ]
            },
        )
        if st != 204:
            raise RuntimeError(f"transaction failed: {st} {out}")
        # ---- a stale requirement on table a 409s the WHOLE batch
        st, err = _req(
            uri,
            "POST",
            "/v1/transactions/commit",
            {
                "table-changes": [
                    _change("a", snap_b),  # stale: main moved already
                    _change(
                        "b", snap_a, prev=snap_b["snapshot-id"]
                    ),
                ]
            },
        )
        if st != 409 or err["error"]["type"] != "CommitFailedException":
            raise RuntimeError(f"stale transaction did not 409: {st}")
        st, got_a = _req(uri, "GET", "/v1/namespaces/lake/tables/a")
        st2, got_b = _req(uri, "GET", "/v1/namespaces/lake/tables/b")
        if st != 200 or st2 != 200:
            raise RuntimeError(f"loadTable failed: {st}/{st2}")
        if (
            got_a["metadata"]["current-snapshot-id"]
            != snap_a["snapshot-id"]
            or got_b["metadata"]["current-snapshot-id"]
            != snap_b["snapshot-id"]
        ):
            raise RuntimeError("stale transaction leaked partial state")
        ta = IcebergTable(spark, got_a["metadata-location"]).read()
        tb = IcebergTable(spark, got_b["metadata-location"]).read()
        a = ta.agg(
            F.count("*").cast("bigint").alias("n_rows_a"),
            dsum("o_totalprice").alias("total_a"),
        )
        b = tb.agg(F.count("*").cast("bigint").alias("n_rows_b"))
        return a.crossJoin(F.broadcast(b)).localCheckpoint()
    finally:
        server.close()
        shutil.rmtree(tmp, ignore_errors=True)


@register_query(
    "snapshot_iceberg_zstd_export_orders",
    oracle=f"""
    WITH mid AS (
        SELECT CAST(FLOOR((MIN(o_orderkey) + MAX(o_orderkey)) / 2.0) AS BIGINT) AS m
        FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows_head,
           {dsum_expr("o_totalprice")} AS total_head,
           CAST(
               (SELECT COUNT(*) FROM orders, mid WHERE o_orderkey < m)
               AS BIGINT
           ) AS n_rows_snap1
    FROM orders
    """,
    description=(
        "zstd-compressed Iceberg export (round-15): "
        "export_iceberg_metadata(compression='zstd') writes every "
        "manifest/manifest-list as a zstandard Avro container "
        "(pure-Python RFC 8878 encoder, sources/zstd_encode.py), the "
        "container headers are verified to carry the codec, and the "
        "import path decodes them back — head aggregates and "
        "snapshot-1 time travel recomputed by DuckDB"
    ),
)
def snapshot_iceberg_zstd_export_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Write-side zstd (VERDICT round-14 ask #3-adjacent: decode-only
    was half the interop story): the engine's own RFC 8878 encoder
    emits the most common modern manifest codec, and the engine's own
    RFC 8878 decoder — independently pinned against libzstd — reads
    it back through the standard import plane."""
    import hashlib
    import os

    from ..sources import load_table
    from ..sources.iceberg_format import export_iceberg_metadata
    from ..sources.iceberg_read import IcebergTable
    from ..sources.snapshots import SnapshotTable, record_file_stats

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tbl = SnapshotTable(spark, os.path.join(_SNAP_CACHE_ROOT, key + "-icim2"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    if tbl.current_snapshot_id() != 3:
        import shutil

        mn, mx = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
        mid = (int(mn) + int(mx)) // 2
        shutil.rmtree(tbl.path, ignore_errors=True)
        tbl.append(
            orders.filter(F.col("o_orderkey") < mid).repartitionByRange(
                2, "o_orderkey"
            )
        )
        tbl.append(orders.filter(F.col("o_orderkey") >= mid).coalesce(1))
        record_file_stats(tbl, ["o_orderkey"])
    out = export_iceberg_metadata(tbl, reuse=True, compression="zstd")
    avros = [f for f in out["files"] if f.endswith(".avro")]
    if not avros:
        raise RuntimeError("zstd export produced no Avro manifests")
    for f in avros:
        with open(f, "rb") as fh:
            if b"avro.codec\x12zstandard" not in fh.read(8192):
                raise RuntimeError(f"manifest not zstd-coded: {f}")
    it = IcebergTable(spark, out["metadata_location"])
    head = it.read().agg(
        F.count("*").cast("bigint").alias("n_rows_head"),
        dsum("o_totalprice").alias("total_head"),
    )
    snap1 = it.read(snapshot_id=1).agg(
        F.count("*").cast("bigint").alias("n_rows_snap1")
    )
    return head.crossJoin(F.broadcast(snap1))


@register_query(
    "snapshot_iceberg_mor_roundtrip_orders",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_visible,
           {dsum_expr("o_totalprice")} AS total_visible,
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_predelete
    FROM orders WHERE o_orderkey % 10 <> 3 AND o_orderkey % 10 <> 6
    """,
    description=(
        "merge-on-read deletes (BOTH flavors, stacked) survive the "
        "Iceberg export/import round trip: positional vectors export "
        "as position-delete manifests (file_path/pos, content=1) and "
        "equality key files as content=2 entries with equality_ids, "
        "each scoped by its own sequence number; the import applies "
        "them executor-side — visible rows and pre-delete time travel "
        "recomputed by DuckDB from the base table"
    ),
)
def snapshot_iceberg_mor_roundtrip_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pins the MOR interop path end-to-end: delete_where_positional →
    export_iceberg_metadata (delete manifest, converted vectors) →
    IcebergTable.read (distributed coordinate anti-join) — plus
    snapshot-1 time travel still seeing the pre-delete rows. The
    reference's pointer (CatalogMigrator.java:212-213) stays fully
    operable under pending deletes instead of refusing."""
    import hashlib
    import os

    from ..sources import load_table
    from ..sources.iceberg_format import export_iceberg_metadata
    from ..sources.iceberg_read import IcebergTable
    from ..sources.snapshots import (
        SnapshotTable,
        delete_where,
        delete_where_positional,
    )

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tbl = SnapshotTable(spark, os.path.join(_SNAP_CACHE_ROOT, key + "-icmor"))
    if tbl.current_snapshot_id() != 3:
        import shutil

        shutil.rmtree(tbl.path, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        tbl.append(orders.repartition(3))
        delete_where_positional(tbl, "o_orderkey % 10 = 3")
        delete_where(
            tbl,
            ["o_orderkey"],
            orders.filter(F.col("o_orderkey") % 10 == 6).select("o_orderkey"),
        )
    out = export_iceberg_metadata(tbl, reuse=True)
    it = IcebergTable(spark, out["metadata_location"])
    return (
        it.read()
        .agg(
            F.count("*").cast("bigint").alias("n_visible"),
            dsum("o_totalprice").alias("total_visible"),
        )
        .crossJoin(
            F.broadcast(
                it.read(snapshot_id=1).agg(
                    F.count("*").cast("bigint").alias("n_predelete")
                )
            )
        )
    )


@register_query(
    "snapshot_iceberg_adopt_orders",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           {dsum_expr("o_totalprice")} AS total,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM orders
    """,
    description=(
        "Iceberg pointer adopted INBOUND: a spec-shaped metadata tree "
        "converts into an engine snapshot table with zero data movement "
        "(hard-linked add_files commit + re-recorded manifest stats); "
        "the adopted table's rows recomputed by DuckDB from the base"
    ),
)
def snapshot_iceberg_adopt_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trips the migration pointer in BOTH directions: export a
    snapshot table to Iceberg-shaped metadata, adopt that pointer into
    a fresh engine table (add_files hard links, stats re-recorded),
    and aggregate the adopted table. Zero bytes of data copied or
    rewritten end to end."""
    import hashlib
    import os

    from ..sources import load_table
    from ..sources.iceberg_format import export_iceberg_metadata
    from ..sources.iceberg_read import adopt_iceberg_table
    from ..sources.snapshots import SnapshotTable, record_file_stats

    import shutil

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    src = SnapshotTable(spark, os.path.join(_SNAP_CACHE_ROOT, key + "-icsrc"))
    if src.current_snapshot_id() != 2:
        shutil.rmtree(src.path, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        src.append(orders.repartition(2))
        record_file_stats(src, ["o_orderkey"])
    mpath = export_iceberg_metadata(src, reuse=True)["metadata_location"]
    dest = os.path.join(_SNAP_CACHE_ROOT, key + "-icdst")
    adopted = SnapshotTable(spark, dest)
    if adopted.current_snapshot_id() != 2:  # add_files + stats commits
        shutil.rmtree(dest, ignore_errors=True)
        adopted = adopt_iceberg_table(spark, mpath, dest)
    return adopted.read().agg(
        F.count("*").cast("bigint").alias("n_rows"),
        dsum("o_totalprice").alias("total"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_custs"),
    )


@register_query(
    "snapshot_iceberg_publish_orders",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           {dsum_expr("o_totalprice")} AS total,
           2 AS published_version
    FROM orders
    """,
    description=(
        "continuous Iceberg metadata publication: a streaming job tails "
        "the commit stream and re-exports the pointer per epoch "
        "(metadata-only; a version minted only when the head moved) — "
        "the externally-polled vN.metadata.json follows the live table, "
        "values recomputed by DuckDB from the base"
    ),
)
def snapshot_iceberg_publish_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two commits, two publication triggers (plus one no-op trigger in
    between): the published pointer lands on v2 at head 2, and reading
    THROUGH the published metadata reproduces the base table."""
    import hashlib
    import os
    import shutil

    from ..sources import load_table
    from ..sources.iceberg_read import IcebergTable
    from ..sources.snapshots import SnapshotTable
    from ..streaming.jobs import publish_iceberg_metadata_stream

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tbl = SnapshotTable(spark, os.path.join(_SNAP_CACHE_ROOT, key + "-icpub"))
    ckpt = tbl.path + "-ckpt"
    out_dir = os.path.join(tbl.path, "metadata", "iceberg")
    if tbl.current_snapshot_id() != 2:
        shutil.rmtree(tbl.path, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        tbl.append(orders.filter(F.col("o_orderkey") % 2 == 0))
        q = publish_iceberg_metadata_stream(spark, tbl.path, ckpt)
        q.awaitTermination(300)
        q = publish_iceberg_metadata_stream(spark, tbl.path, ckpt)  # no-op
        q.awaitTermination(300)
        tbl.append(orders.filter(F.col("o_orderkey") % 2 == 1))
    q = publish_iceberg_metadata_stream(spark, tbl.path, ckpt)
    q.awaitTermination(300)
    it = IcebergTable(spark, out_dir)
    version = int(
        os.path.basename(it.metadata_location).split(".")[0][1:]
    )
    return it.read().agg(
        F.count("*").cast("bigint").alias("n_rows"),
        dsum("o_totalprice").alias("total"),
        F.lit(version).cast("int").alias("published_version"),
    )


@register_query(
    "snapshot_iceberg_adopt_mor_orders",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           {dsum_expr("o_totalprice")} AS total,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM orders
    WHERE o_orderkey % 10 NOT IN (3, 6)
    """,
    description=(
        "Iceberg pointer with PENDING MERGE-ON-READ deletes adopted "
        "inbound: position coordinates re-key to the adopted file "
        "names, equality deletes land at their recorded sequence "
        "numbers — metadata-only, zero data rows read; visible rows "
        "recomputed by DuckDB from the base"
    ),
)
def snapshot_iceberg_adopt_mor_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Adopt a LIVE pointer (both delete flavors pending — the state
    real tables carry between compactions) and aggregate the adopted
    table's visible rows. Round 10 refused this shape; the conversion
    is file-level like the data files themselves."""
    import hashlib
    import os
    import shutil

    from ..sources import load_table
    from ..sources.iceberg_format import export_iceberg_metadata
    from ..sources.iceberg_read import adopt_iceberg_table
    from ..sources.snapshots import (
        SnapshotTable,
        delete_where,
        delete_where_positional,
        read_with_deletes,
    )

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    src = SnapshotTable(
        spark, os.path.join(_SNAP_CACHE_ROOT, key + "-icmorsrc")
    )
    if src.current_snapshot_id() != 3:
        shutil.rmtree(src.path, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        src.append(orders.repartition(2))
        delete_where_positional(src, "o_orderkey % 10 = 3")
        delete_where(
            src,
            ["o_orderkey"],
            orders.filter(F.col("o_orderkey") % 10 == 6).select(
                "o_orderkey"
            ),
        )
    mpath = export_iceberg_metadata(src, reuse=True)["metadata_location"]
    dest = os.path.join(_SNAP_CACHE_ROOT, key + "-icmordst")
    adopted = SnapshotTable(spark, dest)
    if adopted.current_snapshot_id() != 2:  # adopt commit + stats
        shutil.rmtree(dest, ignore_errors=True)
        adopted = adopt_iceberg_table(spark, mpath, dest)
    return read_with_deletes(adopted).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        dsum("o_totalprice").alias("total"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_custs"),
    )


@register_query(
    "snapshot_iceberg_v1_import_orders",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           {dsum_expr("o_totalprice")} AS total,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM orders
    """,
    description=(
        "Iceberg FORMAT-VERSION 1 metadata imported read-only: flat "
        "schema/partition-spec, manifests without content or sequence "
        "fields — still common in the wild; values recomputed by "
        "DuckDB from the base"
    ),
)
def snapshot_iceberg_v1_import_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Read a hand-shaped v1 metadata tree (the pre-row-level-deletes
    format real lakes still carry) over a projected orders parquet:
    the reader treats v1's absent sequence numbers as the legacy 0
    default and serves the same plan surface as v2."""
    import hashlib
    import json
    import os
    import struct

    import pyarrow.parquet as _pq

    from ..sources.iceberg_read import IcebergTable

    src_pq = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src_pq)
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:12]
    root = os.path.join(_SNAP_CACHE_ROOT, key + "-icv1")
    mpath = os.path.join(root, "metadata", "v1.metadata.json")
    if not os.path.exists(mpath):
        from ..sources.iceberg_format import write_avro

        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
        cols = ["o_orderkey", "o_custkey", "o_totalprice"]
        tbl = _pq.read_table(src_pq, columns=cols)
        data = os.path.join(root, "data", "orders-projected.parquet")
        _pq.write_table(tbl, data)
        import pyarrow.compute as _pc

        mm = _pc.min_max(tbl.column("o_orderkey")).as_py()
        lo, hi = mm["min"], mm["max"]
        entry_schema = {
            "type": "record",
            "name": "manifest_entry",
            "fields": [
                {"name": "status", "type": "int", "field-id": 0},
                {
                    "name": "snapshot_id",
                    "type": ["null", "long"],
                    "field-id": 1,
                },
                {
                    "name": "data_file",
                    "type": {
                        "type": "record",
                        "name": "r2",
                        "fields": [
                            {
                                "name": "file_path",
                                "type": "string",
                                "field-id": 100,
                            },
                            {
                                "name": "file_format",
                                "type": "string",
                                "field-id": 101,
                            },
                            {
                                "name": "partition",
                                "type": {
                                    "type": "record",
                                    "name": "r102",
                                    "fields": [],
                                },
                                "field-id": 102,
                            },
                            {
                                "name": "record_count",
                                "type": "long",
                                "field-id": 103,
                            },
                            {
                                "name": "file_size_in_bytes",
                                "type": "long",
                                "field-id": 104,
                            },
                            {
                                "name": "lower_bounds",
                                "type": [
                                    "null",
                                    {
                                        "type": "array",
                                        "items": {
                                            "type": "record",
                                            "name": "k126_v127",
                                            "fields": [
                                                {
                                                    "name": "key",
                                                    "type": "int",
                                                    "field-id": 126,
                                                },
                                                {
                                                    "name": "value",
                                                    "type": "bytes",
                                                    "field-id": 127,
                                                },
                                            ],
                                        },
                                        "logicalType": "map",
                                    },
                                ],
                                "field-id": 125,
                            },
                            {
                                "name": "upper_bounds",
                                "type": [
                                    "null",
                                    {
                                        "type": "array",
                                        "items": {
                                            "type": "record",
                                            "name": "k129_v130",
                                            "fields": [
                                                {
                                                    "name": "key",
                                                    "type": "int",
                                                    "field-id": 129,
                                                },
                                                {
                                                    "name": "value",
                                                    "type": "bytes",
                                                    "field-id": 130,
                                                },
                                            ],
                                        },
                                        "logicalType": "map",
                                    },
                                ],
                                "field-id": 128,
                            },
                        ],
                    },
                    "field-id": 2,
                },
            ],
        }
        mp = os.path.join(root, "metadata", "m0.avro")
        write_avro(
            mp,
            entry_schema,
            [
                {
                    "status": 1,
                    "snapshot_id": 1,
                    "data_file": {
                        "file_path": data,
                        "file_format": "PARQUET",
                        "partition": {},
                        "record_count": tbl.num_rows,
                        "file_size_in_bytes": os.path.getsize(data),
                        "lower_bounds": [
                            {"key": 1, "value": struct.pack("<q", lo)}
                        ],
                        "upper_bounds": [
                            {"key": 1, "value": struct.pack("<q", hi)}
                        ],
                    },
                }
            ],
        )
        meta = {
            "format-version": 1,
            "table-uuid": "00000000-0000-0000-0000-000000000101",
            "location": root,
            "last-updated-ms": 1,
            "last-column-id": 3,
            "schema": {
                "type": "struct",
                "fields": [
                    {
                        "id": 1,
                        "name": "o_orderkey",
                        "required": False,
                        "type": "long",
                    },
                    {
                        "id": 2,
                        "name": "o_custkey",
                        "required": False,
                        "type": "long",
                    },
                    {
                        "id": 3,
                        "name": "o_totalprice",
                        "required": False,
                        "type": "double",
                    },
                ],
            },
            "partition-spec": [],
            "properties": {},
            "current-snapshot-id": 1,
            "snapshots": [
                {"snapshot-id": 1, "timestamp-ms": 1, "manifests": [mp]}
            ],
            "snapshot-log": [{"snapshot-id": 1, "timestamp-ms": 1}],
        }
        tmp = mpath + f".tmp.{os.getpid()}"
        # explicit close before the rename: relying on refcount
        # finalization to flush would rename a truncated file on
        # non-CPython runtimes
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, mpath)
    return IcebergTable(spark, mpath).read().agg(
        F.count("*").cast("bigint").alias("n_rows"),
        dsum("o_totalprice").alias("total"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_custs"),
    )


@register_query(
    "snapshot_iceberg_v3_dv_orders",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           {dsum_expr("o_totalprice")} AS total,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM orders
    WHERE o_orderkey % 10 <> 4
    """,
    description=(
        "Iceberg format-version 3 DELETION VECTORS end to end: pending "
        "position-delete vectors export as puffin roaring-bitmap blobs "
        "(one per referenced data file), and the foreign read decodes "
        "each blob EXECUTOR-side (mapInPandas) into the anti-join — "
        "visible rows recomputed by DuckDB from the base"
    ),
)
def snapshot_iceberg_v3_dv_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """v3 deletion-vector round trip on orders: engine table with row
    lineage takes a positional MOR delete, exports format-version 3
    (the spec replaced position-delete files with DVs — see
    sources/puffin.py for the public formats), and the exported
    pointer reads back through IcebergTable with the bitmaps applied
    distributed-side."""
    import hashlib
    import os
    import shutil

    from ..sources import load_table
    from ..sources.iceberg_format import export_iceberg_metadata
    from ..sources.iceberg_read import IcebergTable
    from ..sources.snapshots import (
        SnapshotTable,
        delete_where_positional,
        enable_row_lineage,
    )

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    src = SnapshotTable(
        spark, os.path.join(_SNAP_CACHE_ROOT, key + "-icdvsrc")
    )
    if src.current_snapshot_id() != 3:  # append + lineage + pos-delete
        shutil.rmtree(src.path, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        src.append(orders.repartition(2))
        enable_row_lineage(src)
        delete_where_positional(src, "o_orderkey % 10 = 4")
    mpath = export_iceberg_metadata(src, reuse=True)["metadata_location"]
    it = IcebergTable(spark, mpath)
    assert it.format_version == 3 and it.deletion_vectors(it.snapshot())
    return it.read().agg(
        F.count("*").cast("bigint").alias("n_rows"),
        dsum("o_totalprice").alias("total"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_custs"),
    )


@register_query(
    "snapshot_iceberg_stats_ndv_orders",
    oracle="""
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_ndv,
           TRUE AS ndv_within_5pct
    FROM orders
    """,
    description=(
        "Iceberg table STATISTICS round trip: a one-pass distributed "
        "theta/KMV sketch (mergeable per-partition partials) records "
        "o_custkey's ndv, exports as a puffin statistics file "
        "(apache-datasketches-theta-v1), and the importer reads it "
        "back metadata-only — gated against DuckDB's exact distinct "
        "count (the oracle pins the gate's exactness, not the sketch)"
    ),
)
def snapshot_iceberg_stats_ndv_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The statistics plane end to end (sources/sketches.py,
    record_table_statistics -> export statistics list ->
    IcebergTable.ndv_estimates): at 100 TB a COUNT(DISTINCT) is a
    full shuffle; the recorded sketch answers from kilobytes of
    metadata, within theta's ~1.6% rse at k=4096."""
    import hashlib
    import os
    import shutil

    from ..sources import load_table
    from ..sources.iceberg_format import export_iceberg_metadata
    from ..sources.iceberg_read import IcebergTable
    from ..sources.snapshots import (
        SnapshotTable,
        record_table_statistics,
    )

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    src = SnapshotTable(
        spark, os.path.join(_SNAP_CACHE_ROOT, key + "-icndvsrc")
    )
    if src.current_snapshot_id() != 2:  # append + set-statistics
        shutil.rmtree(src.path, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey"
        )
        src.append(orders.repartition(4))
        record_table_statistics(src, ["o_custkey"])
    mpath = export_iceberg_metadata(src, reuse=True)["metadata_location"]
    ndv = IcebergTable(spark, mpath).ndv_estimates()["o_custkey"]
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").cast("bigint").alias("exact_ndv")
    ).select(
        "exact_ndv",
        (
            F.abs(F.lit(int(ndv)) - F.col("exact_ndv"))
            <= 0.05 * F.col("exact_ndv")
        ).alias("ndv_within_5pct"),
    )


@register_query(
    "snapshot_iceberg_partition_stats_orders",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM orders
    GROUP BY o_orderpriority
    """,
    description=(
        "Iceberg PARTITION STATISTICS file: per-partition record "
        "counts aggregated from manifest metadata alone (recorded "
        "tuples + row counts, zero data reads), exported as the "
        "spec's partition-statistics parquet and read back through "
        "the imported pointer — recomputed by DuckDB as a GROUP BY"
    ),
)
def snapshot_iceberg_partition_stats_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hidden-partitioned orders exported with partition statistics:
    at 100 TB 'how big is each partition' should never be a scan —
    the stats file answers per partition from kilobytes."""
    import hashlib
    import os
    import shutil

    from ..sources import load_table
    from ..sources.iceberg_format import export_iceberg_metadata
    from ..sources.iceberg_read import IcebergTable
    from ..sources.snapshots import SnapshotTable, append_partitioned

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    src = SnapshotTable(
        spark, os.path.join(_SNAP_CACHE_ROOT, key + "-icpstat")
    )
    if src.current_snapshot_id() != 1:
        shutil.rmtree(src.path, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        append_partitioned(src, orders, [("o_orderpriority", "identity")])
    mpath = export_iceberg_metadata(src, reuse=True)["metadata_location"]
    ps = IcebergTable(spark, mpath).partition_stats()
    return ps.select(
        F.col("partition.o_orderpriority").alias("o_orderpriority"),
        F.col("data_record_count").alias("n_rows"),
    )


_MAINT_CACHE_ROOT = "/tmp/spark_graft_mainttbl"


@register_query(
    "snapshot_run_maintenance_orders",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           {dsum_expr("o_totalprice")} AS total,
           CAST(0 AS BIGINT) AS n_pending_deletes,
           CAST(0 AS BIGINT) AS n_recommended_after
    FROM orders
    WHERE o_orderkey % 97 <> 0
    """,
    description=(
        "executable table maintenance (Iceberg's maintenance procedures, "
        "closed-loop): a dirty table — pending merge-on-read delete + "
        "deliberately small files — goes through run_maintenance "
        "(compact_deletes, rewrite_small_files, vacuum under commit-locked "
        "retries), after which the advisor recommends nothing and the rows "
        "equal the oracle's plain anti-filter"
    ),
)
def snapshot_run_maintenance_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture: orders appended as 4 single-file commits, every 97th
    order key MOR-deleted, then :func:`run_maintenance` applies the
    advisor's plan. The result pins BOTH the data (visible rows equal
    the oracle's filter) and the closed loop (zero pending delete
    files, zero remaining recommendations) — cache validity is the
    clean end state itself, so a stale/dirty cache re-runs."""
    import hashlib
    import os

    from ..sources import load_table
    from ..sources.snapshots import (
        SnapshotTable,
        delete_where,
        plan_maintenance,
        run_maintenance,
    )

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tbl = SnapshotTable(spark, os.path.join(_MAINT_CACHE_ROOT, key))

    def _built() -> bool:
        sid = tbl.current_snapshot_id()
        if sid is None:
            return False
        snap = tbl._load_snap(sid)
        return snap["operation"] == "rewrite-small-files" and not snap.get(
            "deletes"
        )

    if not _built():
        import shutil

        shutil.rmtree(tbl.path, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        for i in range(4):  # four deliberately small files
            tbl.append(
                orders.filter(F.col("o_orderkey") % 4 == i).repartition(1)
            )
        delete_where(
            tbl,
            ["o_orderkey"],
            orders.filter(F.col("o_orderkey") % 97 == 0).select("o_orderkey"),
        )
        run_maintenance(tbl)
    snap = tbl._load_snap(tbl.current_snapshot_id())
    after = plan_maintenance(tbl)
    return tbl.read().agg(
        F.count("*").cast("bigint").alias("n_rows"),
        dsum("o_totalprice").alias("total"),
        F.lit(len(snap.get("deletes", []))).cast("bigint").alias(
            "n_pending_deletes"
        ),
        F.lit(len(after["recommended"])).cast("bigint").alias(
            "n_recommended_after"
        ),
    )


_V3_CACHE_ROOT = "/tmp/spark_graft_v3tbl"


@register_query(
    "snapshot_iceberg_v3_lineage_orders",
    oracle=f"""
    WITH ranked AS (
        SELECT o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rid
        FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(rid) AS BIGINT) AS sum_row_id,
           {dsum_expr("o_totalprice")} AS total
    FROM ranked
    WHERE o_orderkey % 97 <> 0
    """,
    description=(
        "Iceberg v3 row-lineage round-trip: a lineage-enabled snapshot table "
        "(orders written sorted, so _row_id = rank-1) MOR-deletes every 97th "
        "key, exports format-version 3 (next-row-id, snapshot first-row-id, "
        "per-entry first_row_id), and the imported pointer reconstructs every "
        "surviving row's stable _row_id via read(with_row_ids=True); the "
        "oracle replays the rank arithmetic in SQL"
    ),
)
def snapshot_iceberg_v3_lineage_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture: ONE sorted file so row ids are the sort ranks, lineage
    enabled, an equality delete pending at export time (the v3 tree
    carries the delete manifest; the import applies it sequence-
    scoped). Cache validity = lineage head with the delete pending."""
    import hashlib
    import os

    from ..sources.iceberg_format import export_iceberg_metadata
    from ..sources.iceberg_read import IcebergTable
    from ..sources.snapshots import (
        SnapshotTable,
        delete_where,
        enable_row_lineage,
    )
    from ..sources import load_table

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    tbl = SnapshotTable(spark, os.path.join(_V3_CACHE_ROOT, key))

    def _built() -> bool:
        sid = tbl.current_snapshot_id()
        if sid is None:
            return False
        snap = tbl._load_snap(sid)
        return (
            snap["operation"] == "delete"
            and bool(snap.get("row_lineage"))
            and bool(snap.get("deletes"))
        )

    if not _built():
        import shutil

        shutil.rmtree(tbl.path, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        tbl.append(orders.coalesce(1).sortWithinPartitions("o_orderkey"))
        enable_row_lineage(tbl)
        delete_where(
            tbl,
            ["o_orderkey"],
            orders.filter(F.col("o_orderkey") % 97 == 0).select("o_orderkey"),
        )
    out = export_iceberg_metadata(tbl, reuse=True)  # auto v3: lineage
    it = IcebergTable(spark, out["metadata_location"])
    df = it.read(with_row_ids=True)
    return df.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("_row_id").cast("bigint").alias("sum_row_id"),
        dsum("o_totalprice").alias("total"),
    )


@register_query(
    "snapshot_iceberg_v3_default_orders",
    oracle=f"""
    SELECT flag_val,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {dsum_expr("o_totalprice")} AS total
    FROM (
        SELECT CASE WHEN o_orderkey % 2 = 0 THEN 7
                    ELSE o_orderkey % 3 END AS flag_val,
               o_totalprice
        FROM orders
    ) t
    GROUP BY flag_val
    ORDER BY flag_val
    """,
    description=(
        "Iceberg v3 column INITIAL-DEFAULTS: a column added with a "
        "non-null initial-default reads as the declared value for "
        "files written BEFORE the column existed and as the stored "
        "values for files that carry it — which files lack the column "
        "is probed from parquet footers EXECUTOR-side; DuckDB "
        "recomputes both vintages from the base"
    ),
)
def snapshot_iceberg_v3_default_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """A hand-shaped v3 tree over orders split in two vintages: even
    keys predate column ``flag`` (schema declares initial-default 7),
    odd keys carry ``flag = o_orderkey % 3`` — the read must serve 7
    for the old file and the stored values for the new one
    (sources/iceberg_read.py _apply_initial_defaults)."""
    import hashlib
    import json
    import os

    import pyarrow as _pa
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    from ..sources.iceberg_read import IcebergTable

    src_pq = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src_pq)
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:12]
    root = os.path.join(_SNAP_CACHE_ROOT, key + "-icv3dflt")
    mpath = os.path.join(root, "metadata", "v1.metadata.json")
    if not os.path.exists(mpath):
        from ..sources.iceberg_format import write_avro

        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
        tbl = _pq.read_table(
            src_pq, columns=["o_orderkey", "o_totalprice"]
        )
        keys = tbl.column("o_orderkey")
        even = tbl.filter(
            _pc.equal(_pc.bit_wise_and(keys, _pa.scalar(1)), 0)
        )
        odd = tbl.filter(
            _pc.equal(_pc.bit_wise_and(keys, _pa.scalar(1)), 1)
        )
        odd = odd.append_column(
            "flag",
            _pc.cast(
                _pc.subtract(
                    odd.column("o_orderkey"),
                    _pc.multiply(
                        _pc.divide(odd.column("o_orderkey"), _pa.scalar(3)),
                        _pa.scalar(3),
                    ),
                ),
                _pa.int64(),
            ),
        )
        fa = os.path.join(root, "data", "pre-addition.parquet")
        fb = os.path.join(root, "data", "post-addition.parquet")
        _pq.write_table(even, fa)
        _pq.write_table(odd, fb)
        entry_schema = {
            "type": "record",
            "name": "manifest_entry",
            "fields": [
                {"name": "status", "type": "int", "field-id": 0},
                {
                    "name": "snapshot_id",
                    "type": ["null", "long"],
                    "field-id": 1,
                },
                {
                    "name": "data_file",
                    "type": {
                        "type": "record",
                        "name": "r2",
                        "fields": [
                            {
                                "name": "content",
                                "type": "int",
                                "field-id": 134,
                            },
                            {
                                "name": "file_path",
                                "type": "string",
                                "field-id": 100,
                            },
                            {
                                "name": "file_format",
                                "type": "string",
                                "field-id": 101,
                            },
                            {
                                "name": "partition",
                                "type": {
                                    "type": "record",
                                    "name": "r102",
                                    "fields": [],
                                },
                                "field-id": 102,
                            },
                            {
                                "name": "record_count",
                                "type": "long",
                                "field-id": 103,
                            },
                            {
                                "name": "file_size_in_bytes",
                                "type": "long",
                                "field-id": 104,
                            },
                        ],
                    },
                    "field-id": 2,
                },
            ],
        }
        mp = os.path.join(root, "metadata", "m0.avro")
        write_avro(
            mp,
            entry_schema,
            [
                {
                    "status": 1,
                    "snapshot_id": 1,
                    "data_file": {
                        "content": 0,
                        "file_path": p,
                        "file_format": "PARQUET",
                        "partition": {},
                        "record_count": t.num_rows,
                        "file_size_in_bytes": os.path.getsize(p),
                    },
                }
                for p, t in ((fa, even), (fb, odd))
            ],
            codec="snappy",  # exercises the foreign-codec path too
        )
        meta = {
            "format-version": 3,
            "next-row-id": 0,
            "table-uuid": "00000000-0000-0000-0000-000000000301",
            "location": root,
            "last-sequence-number": 1,
            "last-updated-ms": 1,
            "last-column-id": 3,
            "current-schema-id": 0,
            "schemas": [
                {
                    "type": "struct",
                    "schema-id": 0,
                    "fields": [
                        {
                            "id": 1,
                            "name": "o_orderkey",
                            "required": False,
                            "type": "long",
                        },
                        {
                            "id": 2,
                            "name": "o_totalprice",
                            "required": False,
                            "type": "double",
                        },
                        {
                            "id": 3,
                            "name": "flag",
                            "required": False,
                            "type": "long",
                            "initial-default": 7,
                            "write-default": 7,
                        },
                    ],
                }
            ],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "last-partition-id": 999,
            "properties": {},
            "current-snapshot-id": 1,
            "snapshots": [
                {"snapshot-id": 1, "timestamp-ms": 1, "manifests": [mp]}
            ],
            "snapshot-log": [{"snapshot-id": 1, "timestamp-ms": 1}],
        }
        tmp = mpath + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, mpath)
    return (
        IcebergTable(spark, mpath)
        .read()
        .groupBy(F.col("flag").alias("flag_val"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            dsum("o_totalprice").alias("total"),
        )
        .orderBy("flag_val")
    )


@register_query(
    "snapshot_rest_catalog_cas_orders",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
           {dsum_expr("o_totalprice")} AS total
    FROM orders
    WHERE o_orderkey % 3 <> 2
    """,
    description=(
        "WIRE-REAL REST catalog arbitration: the table's head pointer "
        "lives behind an Iceberg REST-catalog endpoint on localhost "
        "HTTP (catalog/rest_server.py, the public OpenAPI routes), "
        "every commit CASes it through the spec's commit envelope, a "
        "stale third commit loses with the spec's 409 "
        "CommitFailedException, and the table reads back exactly the "
        "two winners' rows"
    ),
)
def snapshot_rest_catalog_cas_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """snapshot_catalog_cas_commit_orders's scenario with the catalog
    REPLACED by the wire-real REST client (catalog/service.py
    RestCatalog): arbitration rides
    assert/set-current-metadata-location over real HTTP, so the
    reference's most consequential catalog type
    (CatalogMigrationUtil.java:36-46) sits under the oracle gate."""
    import hashlib
    import os

    from pyspark.sql import functions as F2

    from ..catalog import TableIdentifier
    from ..catalog.service import RestCatalog
    from ..sources import load_table
    from ..sources.snapshots import (
        CatalogArbitratedTable,
        CommitConflictError,
    )

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(_CAS_CACHE_ROOT, key + "-rest")
    os.makedirs(root, exist_ok=True)
    cat = RestCatalog("arbiter", {"uri": os.path.join(root, "cat.db")})
    ident = TableIdentifier.of("lake", "orders_rest_cas")

    def _built(tbl) -> bool:
        return tbl.current_snapshot_id() == 2 and tbl.history_ids() == [1, 2]

    try:
        tbl = CatalogArbitratedTable(spark, cat, ident)
    except Exception:  # noqa: BLE001 - first run: not registered yet
        tbl = None
    if tbl is None or not _built(tbl):
        import shutil

        cat.close()
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
        cat = RestCatalog("arbiter", {"uri": os.path.join(root, "cat.db")})
        cat.create_namespace(("lake",))
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        tbl = CatalogArbitratedTable.create(
            spark, cat, ident, os.path.join(root, "tbl")
        )
        s1 = tbl.append(orders.filter(F2.col("o_orderkey") % 3 == 0))
        tbl.append(orders.filter(F2.col("o_orderkey") % 3 == 1))
        # a stale writer races off the old head: the commit route's
        # 409 CommitFailedException surfaces as a lost CAS and the
        # staged manifest rolls back
        try:
            tbl._commit(tbl._load_snap(s1)["files"], "append", s1)
            raise RuntimeError("stale commit unexpectedly won the CAS")
        except CommitConflictError:
            pass
    served = cat._server.requests_served if cat._server else -1
    if cat._server is not None and served <= 0:
        raise RuntimeError("REST catalog never touched the wire")
    out = tbl.read().agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_custs"),
        dsum("o_totalprice").alias("total"),
    )
    cat.close()
    return out


@register_query(
    "snapshot_rest_foreign_client_orders",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows_head,
           {dsum_expr("o_totalprice")} AS total_head,
           CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_rows_s1
    FROM orders
    """,
    description=(
        "FOREIGN-client REST conformance: a stock-client simulator "
        "(raw HTTP, spec CreateTable + assert-ref-snapshot-id/"
        "add-snapshot/set-snapshot-ref commits, a stale CAS losing "
        "with the spec 409) publishes two engine-exported snapshots "
        "through the endpoint; the engine's reader opens the "
        "REST-served metadata — head aggregate and snapshot-1 time "
        "travel recomputed by DuckDB from the base table"
    ),
)
def snapshot_rest_foreign_client_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The reference's REST type exists to serve STOCK clients
    (CatalogMigrationUtil.java:36-46,70-96 builds
    org.apache.iceberg.rest.RESTCatalog); this query drives the
    engine's endpoint with exactly that vocabulary — hand-rolled HTTP
    on the client side (catalog/rest_managed.py on the server) — and
    gates the round-trip through the oracle. The exported tree is
    cached per sf_dir; the REST dance re-runs every call, so the
    requests_served assertion always proves live wire traffic."""
    import os
    import shutil
    import tempfile

    from ..catalog import SqlCatalog
    from ..catalog.rest_server import IcebergRestCatalogServer
    from ..sources.iceberg_read import IcebergTable

    exported = _icfr_exported(spark, sf_dir)
    _req = _rest_req
    tmp = tempfile.mkdtemp(prefix="rest-foreign-")
    server = IcebergRestCatalogServer(
        SqlCatalog("store", os.path.join(tmp, "store.db")),
        owns_store=True,
        warehouse=os.path.join(tmp, "wh"),
    )
    try:
        uri = server.start()
        st, _ = _req(uri, "POST", "/v1/namespaces", {"namespace": ["lake"]})
        if st != 200:
            raise RuntimeError(f"createNamespace failed: {st}")
        st, out = _req(
            uri,
            "POST",
            "/v1/namespaces/lake/tables",
            {
                "name": "adopted",
                "schema": exported["schemas"][0],
                "properties": exported["properties"],
            },
        )
        if st != 200:
            raise RuntimeError(f"createTable failed: {st} {out}")
        prev = None
        for snap in exported["snapshots"]:
            st, out = _req(
                uri,
                "POST",
                "/v1/namespaces/lake/tables/adopted",
                {
                    "requirements": [
                        {
                            "type": "assert-ref-snapshot-id",
                            "ref": "main",
                            "snapshot-id": prev,
                        }
                    ],
                    "updates": [
                        {"action": "add-snapshot", "snapshot": snap},
                        {
                            "action": "set-snapshot-ref",
                            "ref-name": "main",
                            "type": "branch",
                            "snapshot-id": snap["snapshot-id"],
                        },
                    ],
                },
            )
            if st != 200:
                raise RuntimeError(f"commit failed: {st} {out}")
            prev = snap["snapshot-id"]
        # a stale writer asserting the pre-head branch state must lose
        # with the spec's 409 CommitFailedException
        st, err = _req(
            uri,
            "POST",
            "/v1/namespaces/lake/tables/adopted",
            {
                "requirements": [
                    {
                        "type": "assert-ref-snapshot-id",
                        "ref": "main",
                        "snapshot-id": None,
                    }
                ],
                "updates": [],
            },
        )
        if st != 409 or err["error"]["type"] != "CommitFailedException":
            raise RuntimeError(f"stale CAS did not 409: {st} {err}")
        st, served = _req(uri, "GET", "/v1/namespaces/lake/tables/adopted")
        if st != 200:
            raise RuntimeError(f"loadTable failed: {st}")
        if server.requests_served <= 0:
            raise RuntimeError("foreign client never touched the wire")
        t = IcebergTable(spark, served["metadata-location"])
        first = exported["snapshots"][0]["snapshot-id"]
        head = t.read().agg(
            F.count("*").cast("bigint").alias("n_rows_head"),
            dsum("o_totalprice").alias("total_head"),
        )
        s1 = t.read(snapshot_id=first).agg(
            F.count("*").cast("bigint").alias("n_rows_s1")
        )
        # force both reads while the server-side tree is still alive
        return head.crossJoin(F.broadcast(s1)).localCheckpoint()
    finally:
        server.close()
        shutil.rmtree(tmp, ignore_errors=True)


@register_query(
    "snapshot_rest_stage_create_orders",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
           {dsum_expr("o_totalprice")} AS total,
           CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_rows_s1
    FROM orders
    """,
    description=(
        "Staged creation (CTAS) through the REST endpoint: a stock-"
        "client simulator stages a table (stage-create: true — NO "
        "pointer minted, load 404s), then commits assert-create with "
        "the createChanges vocabulary + two engine-exported snapshots "
        "in ONE atomic mint; a second assert-create commit loses with "
        "the spec 409; the engine's reader opens the REST-minted "
        "metadata — head aggregates and snapshot-1 time travel "
        "recomputed by DuckDB from the base table"
    ),
)
def snapshot_rest_stage_create_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CTAS is the second verb a stock Iceberg writer issues after
    CREATE (the reference's REST type exists to serve stock clients,
    CatalogMigrationUtil.java:36-46,70-96): stage-create returns
    endpoint-shaped metadata WITHOUT durable state, and the follow-up
    CommitTable carrying ``assert-create`` + the client's full
    ``createChanges`` mints pointer and doc atomically
    (catalog/rest_server.py `_commit_staged_create`)."""
    import os
    import shutil
    import tempfile

    from ..catalog import SqlCatalog
    from ..catalog.rest_server import IcebergRestCatalogServer
    from ..sources.iceberg_read import IcebergTable

    exported = _icfr_exported(spark, sf_dir)
    _req = _rest_req
    tmp = tempfile.mkdtemp(prefix="rest-ctas-")
    server = IcebergRestCatalogServer(
        SqlCatalog("store", os.path.join(tmp, "store.db")),
        owns_store=True,
        warehouse=os.path.join(tmp, "wh"),
    )
    try:
        uri = server.start()
        st, _ = _req(uri, "POST", "/v1/namespaces", {"namespace": ["lake"]})
        if st != 200:
            raise RuntimeError(f"createNamespace failed: {st}")
        st, staged = _req(
            uri,
            "POST",
            "/v1/namespaces/lake/tables",
            {
                "name": "ctas",
                "schema": exported["schemas"][0],
                "stage-create": True,
            },
        )
        if st != 200 or "metadata-location" in staged:
            raise RuntimeError(f"stage-create failed: {st} {staged}")
        st, _ = _req(uri, "GET", "/v1/namespaces/lake/tables/ctas")
        if st != 404:
            raise RuntimeError(f"staged table must not exist yet: {st}")
        changes = [
            {
                "action": "assign-uuid",
                "uuid": staged["metadata"]["table-uuid"],
            },
            {"action": "upgrade-format-version", "format-version": 2},
            {
                "action": "add-schema",
                "schema": exported["schemas"][0],
                "last-column-id": exported["last-column-id"],
            },
            {"action": "set-current-schema", "schema-id": -1},
            {"action": "add-spec", "spec": {"spec-id": 0, "fields": []}},
            {"action": "set-default-spec", "spec-id": -1},
            {
                "action": "add-sort-order",
                "sort-order": {"order-id": 0, "fields": []},
            },
            {"action": "set-default-sort-order", "sort-order-id": -1},
            {"action": "set-properties", "updates": {"created-by": "ctas"}},
        ]
        for snap in exported["snapshots"]:
            changes.append({"action": "add-snapshot", "snapshot": snap})
        changes.append(
            {
                "action": "set-snapshot-ref",
                "ref-name": "main",
                "type": "branch",
                "snapshot-id": exported["snapshots"][-1]["snapshot-id"],
            }
        )
        body = {
            "requirements": [{"type": "assert-create"}],
            "updates": changes,
        }
        st, out = _req(
            uri, "POST", "/v1/namespaces/lake/tables/ctas", body
        )
        if st != 200:
            raise RuntimeError(f"staged commit failed: {st} {out}")
        # a second staged create of the same name must lose: spec 409
        st, err = _req(
            uri, "POST", "/v1/namespaces/lake/tables/ctas", body
        )
        if st != 409 or err["error"]["type"] != "CommitFailedException":
            raise RuntimeError(f"double assert-create did not 409: {st}")
        if server.requests_served <= 0:
            raise RuntimeError("stage-create never touched the wire")
        t = IcebergTable(spark, out["metadata-location"])
        first = exported["snapshots"][0]["snapshot-id"]
        head = t.read().agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_custs"),
            dsum("o_totalprice").alias("total"),
        )
        s1 = t.read(snapshot_id=first).agg(
            F.count("*").cast("bigint").alias("n_rows_s1")
        )
        return head.crossJoin(F.broadcast(s1)).localCheckpoint()
    finally:
        server.close()
        shutil.rmtree(tmp, ignore_errors=True)


@register_query(
    "snapshot_add_column_defaults_orders",
    oracle=f"""
    SELECT CAST(SUM(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_initial,
           CAST(SUM(CASE WHEN o_orderkey % 3 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_write,
           CAST(SUM(CASE WHEN o_orderkey % 3 = 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_explicit,
           (SELECT {dsum_expr("o_totalprice")} FROM orders
            WHERE o_orderkey % 3 = 0) AS total_initial
    FROM orders
    """,
    description=(
        "v3 column defaults on the ENGINE write path (round-14 "
        "stretch): add_column(initial_default=7, write_default=9) "
        "between appends — pre-addition files read 7, a writer "
        "omitting the column lands 9 physically, explicit values "
        "stay; the per-vintage census recomputed by DuckDB from the "
        "base table"
    ),
)
def snapshot_add_column_defaults_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """sources/snapshots.py add_column/_fill_write_defaults/
    _resolve_files: initial-default serves files predating the column;
    write-default fills omitted columns at write time (the spec's
    writer rule, v3 schema vocabulary)."""
    import hashlib
    import os
    import shutil

    from ..sources import load_table
    from ..sources.snapshots import SnapshotTable, add_column, track_schema

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    t = SnapshotTable(spark, os.path.join(_SNAP_CACHE_ROOT, key + "-acdflt"))
    # the build mints FIVE commits: append, track-schema, add-column,
    # and two more appends — a wrong head count here would silently
    # rebuild the fixture on every call
    if t.current_snapshot_id() != 5:
        shutil.rmtree(t.path, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        t.append(orders.filter(F.col("o_orderkey") % 3 == 0).coalesce(2))
        track_schema(t)
        add_column(t, "flag", "bigint", initial_default=7, write_default=9)
        # a writer omitting the column -> write_default lands physically
        t.append(orders.filter(F.col("o_orderkey") % 3 == 1).coalesce(1))
        # a writer carrying it -> stored values win
        t.append(
            orders.filter(F.col("o_orderkey") % 3 == 2)
            .withColumn("flag", F.lit(5))
            .coalesce(1)
        )
    df = t.read()
    return df.agg(
        F.sum(F.when(F.col("flag") == 7, 1).otherwise(0))
        .cast("bigint")
        .alias("n_initial"),
        F.sum(F.when(F.col("flag") == 9, 1).otherwise(0))
        .cast("bigint")
        .alias("n_write"),
        F.sum(F.when(F.col("flag") == 5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_explicit"),
        dsum(F.when(F.col("flag") == 7, F.col("o_totalprice"))).alias(
            "total_initial"
        ),
    )
