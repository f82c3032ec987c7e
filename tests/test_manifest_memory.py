"""Driver-memory bounds for manifest-chain resolution (no Spark).

Round 9 made COMMITS O(changed files); this pins the round-10 claim
that cold-chain RESOLUTION is memory-bounded too: resolving a deep
delta chain over a large table peaks at a couple of resolved
snapshots plus the raw deltas, and caches only the requested snapshot
and the chain's full-form base — not a fully resolved dict per chain
level."""

from __future__ import annotations

import json
import os
import tracemalloc

from hypothesis import given, settings

from iceberg_catalog_migrator_spark.sources.snapshots import (
    _DEPTH_CACHE,
    _MANIFEST_CACHE,
    _apply_delta,
    _encode_manifest,
    _load_resolved,
    load_manifest,
)
from tests.test_manifest_properties import snapshot_chain

N_FILES = 100_000
DEPTH = 64


def _write_doc(meta: str, doc: dict) -> None:
    with open(os.path.join(meta, f"snap-{doc['snapshot_id']}.json"), "w") as f:
        json.dump(doc, f)


def _build_chain(tmp_path, n_files: int, depth: int) -> tuple[str, int]:
    """A full-form base with ``n_files`` + ``depth`` one-file-append
    deltas, written straight to disk (no Spark)."""
    path = str(tmp_path / "tbl")
    meta = os.path.join(path, "metadata")
    os.makedirs(meta)
    files = [f"data/base-{i:06d}.parquet" for i in range(n_files)]
    snap = {
        "snapshot_id": 1,
        "parent": None,
        "timestamp_ms": 1,
        "operation": "append",
        "files": files,
        "file_rows": {f: 100 for f in files},
        "file_seqs": {f: 1 for f in files},
        "sequence_number": 1,
    }
    _write_doc(meta, snap)  # full form
    resolved = snap
    for d in range(depth):
        sid = d + 2
        child = dict(resolved)
        child.update(
            snapshot_id=sid,
            parent=sid - 1,
            timestamp_ms=sid,
            sequence_number=sid,
        )
        new = f"data/delta-{d:04d}.parquet"
        child["files"] = resolved["files"] + [new]
        child["file_rows"] = {**resolved["file_rows"], new: 7}
        child["file_seqs"] = {**resolved["file_seqs"], new: sid}
        doc = _encode_manifest(child, resolved, d)
        assert "delta_base" in doc and len(doc["files_added"]) == 1
        _write_doc(meta, doc)
        resolved = child
    return path, depth + 1


def test_cold_chain_resolution_is_memory_bounded(tmp_path):
    path, head = _build_chain(tmp_path, N_FILES, DEPTH)
    _MANIFEST_CACHE.clear()
    _DEPTH_CACHE.clear()
    # size of ONE resolved snapshot, measured by resolving the base
    tracemalloc.start()
    base = _load_resolved(path, 1)
    one_size, _ = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert len(base["files"]) == N_FILES
    _MANIFEST_CACHE.clear()
    _DEPTH_CACHE.clear()
    tracemalloc.start()
    resolved = _load_resolved(path, head)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert len(resolved["files"]) == N_FILES + DEPTH
    # the requested snapshot and the chain's full-form base are cached;
    # NO intermediate delta level is (O(1) entries, not O(depth))
    assert (len(_MANIFEST_CACHE), len(_DEPTH_CACHE)) == (2, 2)
    # peak ~ a couple of resolved dicts (+ raw deltas + transient file
    # set), not DEPTH of them: the recursive resolver held ~DEPTH * size
    assert peak < 5 * one_size, (peak, one_size)


def test_warm_head_resolution_is_one_delta(tmp_path):
    """Steady state: with the parent cached, resolving the child costs
    one delta fold — and reuses the cache without re-walking."""
    path, head = _build_chain(tmp_path, 1000, 8)
    _MANIFEST_CACHE.clear()
    _DEPTH_CACHE.clear()
    _load_resolved(path, head - 1)  # parent now cached
    before = len(_MANIFEST_CACHE)
    r = _load_resolved(path, head)
    assert len(r["files"]) == 1000 + 8
    assert len(_MANIFEST_CACHE) == before + 1


@settings(max_examples=60, deadline=None)
@given(snapshot_chain())
def test_cold_disk_resolution_matches_linkwise(tmp_path_factory, chain):
    """The iterative fold over ON-DISK chains equals link-by-link
    _apply_delta resolution for arbitrary churn (the hypothesis chain
    generator from the round-trip property suite)."""
    tmp = tmp_path_factory.mktemp("chain")
    path = str(tmp / "tbl")
    meta = os.path.join(path, "metadata")
    os.makedirs(meta)
    resolved_prev = None
    depth = 0
    for snap in chain:
        doc = _encode_manifest(snap, resolved_prev, depth)
        if "delta_base" in doc:
            resolved_prev = _apply_delta(resolved_prev, doc)
            depth = doc["delta_depth"]
        else:
            resolved_prev = doc
            depth = 0
        _write_doc(meta, doc)
    _MANIFEST_CACHE.clear()
    _DEPTH_CACHE.clear()
    cold = load_manifest(path, chain[-1]["snapshot_id"])
    assert cold == chain[-1]
