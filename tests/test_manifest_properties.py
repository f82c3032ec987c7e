"""Property-based delta-manifest round-trip: hypothesis-generated
snapshot chains (random file churn, per-file-map churn, scalar-state
appearance/clearing, per-commit keys) must encode through
``_encode_manifest`` and resolve through ``_apply_delta`` back to the
exact full snapshot, link by link along the chain. Pure Python — no
Spark session."""

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_catalog_migrator_spark.sources.snapshots import (
    _apply_delta,
    _encode_manifest,
)

file_names = st.integers(0, 60).map(lambda i: f"data/f{i:03d}.parquet")
file_sets = st.sets(file_names, min_size=1, max_size=30)

# per-file map values and inheritable scalar values
stat_val = st.fixed_dictionaries({"k": st.tuples(st.integers(0, 9), st.integers(10, 99)).map(list)})
scalar_state = st.fixed_dictionaries(
    {},
    optional={
        "deletes": st.lists(st.sampled_from(["data/d0.parquet", "data/d1.parquet"]), max_size=2, unique=True),
        "delete_keys": st.just(["k"]),
        "next_field_id": st.integers(1, 9),
    },
)
per_commit = st.fixed_dictionaries(
    {},
    optional={"epoch": st.integers(0, 5), "stream_id": st.just("s")},
)


@st.composite
def snapshot_chain(draw):
    """A list of FULL snapshots where each is derived from the previous
    with random churn."""
    n = draw(st.integers(2, 6))
    chain = []
    files = sorted(draw(file_sets))
    for i in range(n):
        if i > 0:
            keep = draw(st.sets(st.sampled_from(files), max_size=len(files))) if files else set()
            extra_files = draw(file_sets)
            files = sorted(set(keep) | extra_files)
        snap = {
            "snapshot_id": i + 1,
            "parent": i if i else None,
            "timestamp_ms": 1000 + i,
            "operation": draw(st.sampled_from(["append", "merge", "delete"])),
            "files": files,
            **draw(scalar_state),
            **draw(per_commit),
        }
        if snap.get("deletes") is not None and "delete_keys" not in snap:
            snap["delete_keys"] = ["k"]
        # a per-file map over a random subset of this snapshot's files
        stats_files = draw(st.sets(st.sampled_from(files), max_size=len(files))) if files else set()
        if stats_files:
            snap["file_stats"] = {f: draw(stat_val) for f in sorted(stats_files)}
        chain.append(snap)
    return chain


@settings(max_examples=200, deadline=None)
@given(snapshot_chain())
def test_encode_resolve_roundtrip_along_chain(chain):
    resolved_prev = None
    depth = 0
    for snap in chain:
        doc = _encode_manifest(snap, resolved_prev, depth)
        if "delta_base" in doc:
            assert doc["delta_base"] == resolved_prev["snapshot_id"]
            resolved = _apply_delta(resolved_prev, doc)
            depth = doc["delta_depth"]
        else:
            resolved = doc
            depth = 0
        # exact round trip: the resolved snapshot IS the full snapshot
        assert resolved == snap, (doc, resolved, snap)
        # per-commit keys never inherited
        if resolved_prev is not None:
            for k in ("epoch", "stream_id"):
                assert (k in resolved) == (k in snap)
        resolved_prev = resolved


@settings(max_examples=100, deadline=None)
@given(file_sets, st.integers(1, 5))
def test_single_file_append_is_small(files, n_new):
    """Delta docs for small appends onto large tables stay O(changed)."""
    files = sorted(files)
    base = {
        "snapshot_id": 1,
        "parent": None,
        "timestamp_ms": 1,
        "operation": "append",
        "files": files,
        "file_stats": {f: {"k": [0, 1]} for f in files},
    }
    new = [f"data/new{i}.parquet" for i in range(n_new)]
    child = {
        "snapshot_id": 2,
        "parent": 1,
        "timestamp_ms": 2,
        "operation": "append",
        "files": sorted(files + new),
        "file_stats": {**base["file_stats"], **{f: {"k": [5, 6]} for f in new}},
    }
    doc = _encode_manifest(child, base, 0)
    if 2 * (2 * n_new) < len(child["files"]) + 1:
        assert "delta_base" in doc
        assert len(doc["files_added"]) == n_new
        assert set(doc.get("file_stats", {})) == set(new)
    assert _apply_delta(base, doc) == child if "delta_base" in doc else doc == child
