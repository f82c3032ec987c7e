"""Columnar scan-plan index: per-snapshot file stats as PARQUET.

The resolved snapshot manifest is a Python dict — measured 23.1 MB per
100k files (SCALE.local.json ``manifest_memory``), i.e. ~2.3 GB at 10^7
files, the last 100x-scale ceiling in the metadata plane. Iceberg's
answer is to keep per-file stats in Avro manifests and distribute the
manifest reads; this module is the single-driver rendering of the same
idea: per-file planning state lives in a columnar sidecar
(``metadata/plan-index-<sid>.parquet``) and scan planning runs as a
predicate-pushdown read of that sidecar — the driver only ever holds
the Arrow buffers of the MATCHING rows, never a per-file Python object.

Layout: one row per data file with columns ``path`` (table-relative),
``rows``, ``seq`` (nullable int64) and, per stats column ``c``,
``min:c`` / ``max:c`` (nullable, Arrow-typed from the recorded JSON
values). Files without recorded stats carry nulls and are always KEPT
by plans (absence of stats never un-matches — same rule as the dict
planner and the Iceberg import pruner). Stats columns whose values
cannot type as one Arrow array (mixed JSON types) are listed in the
``unindexed_cols`` metadata and plans on them fall back to the dict
path.

Freshness: the sidecar records the snapshot doc's stat fingerprint
(mtime_ns:size). A stale or missing sidecar rebuilds lazily from the
resolved dict — one O(files) materialization, amortized over every
later plan (the same trade Iceberg makes building its manifest
caches). ``expire_snapshots`` unlinks sidecars with their docs.

Reference anchor: the reference migrates a metadata POINTER
(`CatalogMigrator.java:212-213`); this module keeps the pointer's
planning state pointer-sized in driver memory at 10^6-10^7 files.
"""

from __future__ import annotations

import json
import os

_FORMAT_VERSION = "2"  # v2: partition tuple columns (v1 sidecars rebuild once)


def sidecar_path(table_path: str, snapshot_id: int) -> str:
    return os.path.join(
        table_path, "metadata", f"plan-index-{snapshot_id}.parquet"
    )


def _doc_fingerprint(table_path: str, snapshot_id: int) -> str | None:
    fp = os.path.join(
        table_path, "metadata", f"snap-{snapshot_id}.json"
    )
    try:
        st = os.stat(fp)
    except FileNotFoundError:
        return None
    return f"{st.st_mtime_ns}:{st.st_size}"


def write_plan_index(table_path: str, snap: dict) -> str | None:
    """Build the columnar sidecar from a RESOLVED snapshot dict (the
    only moment the dict must exist — callers already hold it) and
    write it atomically. Returns the path, or None when the snapshot
    doc vanished underneath (expired mid-build)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sid = snap["snapshot_id"]
    fingerprint = _doc_fingerprint(table_path, sid)
    if fingerprint is None:
        return None
    files = snap["files"]
    stats = snap.get("file_stats")
    rows_map = snap.get("file_rows") or {}
    seqs_map = snap.get("file_seqs") or {}
    cols: dict[str, pa.Array] = {
        "path": pa.array(files, pa.string()),
        "rows": pa.array(
            [rows_map.get(f) for f in files], pa.int64()
        ),
        "seq": pa.array([seqs_map.get(f) for f in files], pa.int64()),
    }
    # partition tuples (string-rendered, positional per the file's
    # spec) so partition_pruned_scan's equality probes push down too;
    # non-string values (never written by this engine) skip the
    # columns and the dict path answers instead
    parts_map = snap.get("file_partitions") or {}
    specs = snap.get("partition_specs") or (
        [{"spec_id": 0, "spec": [list(p) for p in snap["partition_spec"]]}]
        if snap.get("partition_spec")
        else []
    )
    cur_spec_id = snap.get(
        "current_spec_id", max((s["spec_id"] for s in specs), default=0)
    )
    part_meta = None
    if specs:
        try:
            max_k = max((len(t) for t in parts_map.values()), default=0)
            fsid_map = snap.get("file_spec_ids") or {}
            cols["has_part"] = pa.array(
                [f in parts_map for f in files], pa.bool_()
            )
            cols["part_spec_id"] = pa.array(
                [
                    fsid_map.get(f, cur_spec_id) if f in parts_map else None
                    for f in files
                ],
                pa.int64(),
            )
            for i in range(max_k):
                cols[f"part:{i}"] = pa.array(
                    [
                        parts_map[f][i]
                        if f in parts_map and i < len(parts_map[f])
                        else None
                        for f in files
                    ],
                    pa.string(),
                )
            part_meta = {
                "specs": specs,
                "current_spec_id": cur_spec_id,
                "max_k": max_k,
                # schema-tracked tables may carry files written under
                # WIDENED source-column types; bucket's hash is
                # type-sensitive, so one probe value cannot serve
                # mixed vintages — the columnar partition path defers
                # to the dict planner there
                "schema_tracked": bool(snap.get("schemas")),
            }
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            for k in [c for c in cols if c.startswith(("has_part", "part"))]:
                cols.pop(k)
            part_meta = None
    stat_cols: list[str] = []
    unindexed: list[str] = []
    if stats is not None:
        names = sorted({c for per in stats.values() for c in per})
        for c in names:
            mins = [
                (stats.get(f, {}).get(c) or (None, None))[0] for f in files
            ]
            maxs = [
                (stats.get(f, {}).get(c) or (None, None))[1] for f in files
            ]
            try:
                cols[f"min:{c}"] = pa.array(mins)
                cols[f"max:{c}"] = pa.array(maxs)
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                cols.pop(f"min:{c}", None)
                unindexed.append(c)
                continue
            stat_cols.append(c)
    meta = {
        b"plan_index_version": _FORMAT_VERSION.encode(),
        b"doc_fingerprint": fingerprint.encode(),
        b"has_file_stats": b"1" if stats is not None else b"0",
        b"stat_cols": json.dumps(stat_cols).encode(),
        b"unindexed_cols": json.dumps(unindexed).encode(),
        b"partition_specs": json.dumps(part_meta).encode(),
    }
    table = pa.table(cols).replace_schema_metadata(meta)
    out = sidecar_path(table_path, sid)
    tmp = f"{out}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, out)
    return out


def _sidecar_meta(path: str) -> dict | None:
    import pyarrow.parquet as pq

    try:
        md = pq.read_schema(path).metadata or {}
    except Exception:  # torn/foreign file: rebuild
        return None
    if md.get(b"plan_index_version") != _FORMAT_VERSION.encode():
        return None
    return {
        "fingerprint": (md.get(b"doc_fingerprint") or b"").decode(),
        "has_file_stats": md.get(b"has_file_stats") == b"1",
        "stat_cols": json.loads(md.get(b"stat_cols") or b"[]"),
        "unindexed_cols": json.loads(md.get(b"unindexed_cols") or b"[]"),
        "partition_specs": json.loads(md.get(b"partition_specs") or b"null"),
    }


def ensure_plan_index(table_path: str, snapshot_id: int) -> dict | None:
    """The sidecar's metadata if fresh, building it first when missing
    or stale (the doc was rewritten in place — rebase — or this
    snapshot never had one). Returns None only when the snapshot is
    gone."""
    out = sidecar_path(table_path, snapshot_id)
    want = _doc_fingerprint(table_path, snapshot_id)
    if want is None:
        return None
    meta = _sidecar_meta(out) if os.path.exists(out) else None
    if meta is not None and meta["fingerprint"] == want:
        return meta
    from .snapshots import load_manifest

    snap = load_manifest(table_path, snapshot_id)
    if write_plan_index(table_path, snap) is None:
        return None
    return _sidecar_meta(out)


def first_path(table_path: str, snapshot_id: int) -> str | None:
    """Any one file path of the snapshot (schema anchor for empty
    plans) without materializing the file list."""
    import pyarrow.dataset as ds

    if ensure_plan_index(table_path, snapshot_id) is None:
        return None
    head = ds.dataset(
        sidecar_path(table_path, snapshot_id), format="parquet"
    ).head(1, columns=["path"])
    vals = head.column("path").to_pylist()
    return vals[0] if vals else None


def _keep_expr(col: str, op: str, lit):
    """The pushdown predicate keeping files whose [min, max] MAY hold a
    row matching ``col <op> lit`` — null bounds (no recorded stats for
    the file) always keep."""
    import pyarrow.compute as pc

    lo = pc.field(f"min:{col}")
    hi = pc.field(f"max:{col}")
    nulls = lo.is_null() | hi.is_null()
    if op == "=":
        return nulls | ((lo <= lit) & (hi >= lit))
    if op == "<":
        return nulls | (lo < lit)
    if op == "<=":
        return nulls | (lo <= lit)
    if op == ">":
        return nulls | (hi > lit)
    if op == ">=":
        return nulls | (hi >= lit)
    raise ValueError(f"unsupported plan operator {op!r}")


def plan_paths(
    table_path: str,
    snapshot_id: int,
    filters: list[tuple],
) -> tuple[list[str], dict] | None:
    """Columnar scan plan: the table-relative paths surviving
    ``filters`` (``[(col, op, literal), ...]`` with ops ``= < <= >
    >=``), plus a summary dict. The read pushes the keep-predicate
    into the parquet scan, so driver memory is O(matching files) — the
    full file list is never materialized as Python objects.

    Returns None when a columnar plan can't answer exactly — no/stale
    sidecar unbuildable, a filtered column recorded but unindexable,
    or a literal that won't compare against the indexed type — and the
    caller falls back to the dict planner."""
    import pyarrow.dataset as ds

    meta = ensure_plan_index(table_path, snapshot_id)
    if meta is None:
        return None
    side = sidecar_path(table_path, snapshot_id)
    for col, _, _ in filters:
        if col in meta["unindexed_cols"]:
            return None
    try:
        dataset = ds.dataset(side, format="parquet")
        expr = None
        for col, op, lit in filters:
            if col not in meta["stat_cols"]:
                # no stats recorded for this column at all: every file
                # is conservatively kept — the filter prunes nothing
                continue
            e = _keep_expr(col, op, lit)
            expr = e if expr is None else (expr & e)
        total = dataset.count_rows()
        if expr is None:
            kept = dataset.to_table(columns=["path"])
        else:
            kept = dataset.to_table(columns=["path"], filter=expr)
    except Exception:
        # incomparable literal/type or a torn sidecar: the plan is an
        # optimization — answer exactly via the dict path instead
        return None
    paths = kept.column("path").to_pylist()
    return paths, {
        "total_files": total,
        "scanned_files": len(paths),
        "columnar": True,
        "has_file_stats": meta["has_file_stats"],
    }


def plan_partition_paths(
    table_path: str,
    snapshot_id: int,
    wanted_by_spec: dict[int, dict[int, str]],
) -> tuple[list[str], int] | None:
    """Columnar partition-equality plan: paths whose recorded tuple
    agrees with ``wanted_by_spec`` (spec_id -> {tuple position:
    rendered value}), plus the total file count. Tuple-less files
    (pre-partitioning commits) and files under spec ids outside the
    map conservatively keep — exactly the dict planner's rule. None
    when the sidecar can't answer (no partition columns indexed)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as ds

    meta = ensure_plan_index(table_path, snapshot_id)
    if meta is None or not meta.get("partition_specs"):
        return None
    max_k = meta["partition_specs"]["max_k"]
    side = sidecar_path(table_path, snapshot_id)
    try:
        dataset = ds.dataset(side, format="parquet")
        keep = ~pc.field("has_part")
        known = list(wanted_by_spec)
        if known:
            keep = keep | ~pc.field("part_spec_id").isin(known)
        for spec_id, wanted in wanted_by_spec.items():
            e = pc.field("part_spec_id") == spec_id
            dead = False
            for i, v in wanted.items():
                if i >= max_k:
                    # no recorded tuple reaches this position: nothing
                    # under this spec can match the predicate
                    dead = True
                    break
                e = e & (pc.field(f"part:{i}") == v)
            if not dead:
                keep = keep | e
        total = dataset.count_rows()
        kept = dataset.to_table(columns=["path"], filter=keep)
    except Exception:
        return None
    return kept.column("path").to_pylist(), total
