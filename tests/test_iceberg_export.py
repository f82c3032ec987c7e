"""Iceberg-v2 metadata export round-trip.

The parser here is INDEPENDENT: it decodes the Avro object-container
format and the zigzag/varint primitives from the Avro spec directly,
sharing no code with the writer — two implementations of the spec
must meet in the middle. The round-trip then checks the exported
metadata tree (metadata.json → manifest lists → manifests) against
the snapshot table's own state: schema + field ids, snapshot chain +
sequence numbers, per-file record counts, sizes and stats bounds."""

from __future__ import annotations

import json
import os
import struct

import pytest
from pyspark.sql import functions as F

from iceberg_catalog_migrator_spark.sources import load_table
from iceberg_catalog_migrator_spark.sources.iceberg_format import (
    export_iceberg_metadata,
)
from iceberg_catalog_migrator_spark.sources.snapshots import (
    SnapshotError,
    SnapshotTable,
    delete_where,
    record_file_stats,
)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------ independent parser


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        assert len(b) == n, "truncated avro stream"
        self.pos += n
        return b

    def long(self) -> int:
        shift = acc = 0
        while True:
            b = self.take(1)[0]
            acc |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        return (acc >> 1) ^ -(acc & 1)  # un-zigzag

    def string(self) -> str:
        return self.take(self.long()).decode("utf-8")

    def bytes_(self) -> bytes:
        return self.take(self.long())

    def decode(self, schema):
        if isinstance(schema, list):  # union
            return self.decode(schema[self.long()])
        t = schema["type"] if isinstance(schema, dict) else schema
        if t == "null":
            return None
        if t == "boolean":
            return self.take(1) == b"\x01"
        if t in ("int", "long"):
            return self.long()
        if t == "string":
            return self.string()
        if t == "bytes":
            return self.bytes_()
        if t == "record":
            return {f["name"]: self.decode(f["type"]) for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = self.long()
                if n == 0:
                    return out
                if n < 0:  # block with byte size
                    self.long()
                    n = -n
                out.extend(self.decode(schema["items"]) for _ in range(n))
        raise AssertionError(f"unsupported type {t}")


def read_avro_file(path: str):
    r = _Reader(open(path, "rb").read())
    assert r.take(4) == b"Obj\x01"
    meta = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            r.long()
            n = -n
        for _ in range(n):
            k = r.string()  # key BEFORE value: subscript assignment
            meta[k] = r.bytes_()  # evaluates its RHS first in Python
    schema = json.loads(meta["avro.schema"])
    assert meta.get("avro.codec", b"null") == b"null"
    sync = r.take(16)
    records = []
    while r.pos < len(r.data):
        cnt = r.long()
        r.long()  # byte size
        records.extend(r.decode(schema) for _ in range(cnt))
        assert r.take(16) == sync
    return schema, records


def _bound(v: bytes, typ: str):
    return {
        "long": lambda b: struct.unpack("<q", b)[0],
        "int": lambda b: struct.unpack("<i", b)[0],
        "double": lambda b: struct.unpack("<d", b)[0],
        "string": lambda b: b.decode(),
    }[typ](v)


# ------------------------------------------------------------- tests


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    t.append(orders.filter(F.col("o_orderkey") % 2 == 0).coalesce(2))
    t.append(orders.filter(F.col("o_orderkey") % 2 == 1).coalesce(1))
    record_file_stats(t, ["o_orderkey"])
    return t


def test_round_trip_schema_snapshots_and_stats(spark, table):
    out = export_iceberg_metadata(table)
    meta = json.load(open(out["metadata_location"]))
    assert meta["format-version"] == 2
    # --- schema: names, iceberg types, field ids
    fields = meta["schemas"][0]["fields"]
    assert [f["name"] for f in fields] == ["o_orderkey", "o_custkey", "o_totalprice"]
    assert [f["type"] for f in fields] == ["long", "long", "double"]
    assert [f["id"] for f in fields] == [1, 2, 3]
    assert meta["last-column-id"] == 3

    # --- snapshot chain: ids, parents, sequence numbers
    head = table.current_snapshot_id()
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    assert meta["current-snapshot-id"] == head
    chain_ids = sorted(snaps)
    for sid in chain_ids:
        own = table._load_snap(sid)
        assert snaps[sid]["sequence-number"] == own["sequence_number"]
        assert snaps[sid]["timestamp-ms"] == own["timestamp_ms"]
        if own.get("parent") is not None:
            assert snaps[sid]["parent-snapshot-id"] == own["parent"]
        assert snaps[sid]["summary"]["total-records"] == str(own["visible_rows"])

    # --- per snapshot: manifest list -> manifest -> data files + stats
    for sid in chain_ids:
        own = table._load_snap(sid)
        mls, mlists = read_avro_file(snaps[sid]["manifest-list"])
        assert mls["name"] == "manifest_file"
        (ml,) = mlists
        assert ml["added_snapshot_id"] == sid
        assert ml["content"] == 0
        assert ml["sequence_number"] == own["sequence_number"]
        assert (
            ml["added_rows_count"] + ml["existing_rows_count"]
            == sum(own["file_rows"][f] for f in own["files"])
        )
        ms, entries = read_avro_file(ml["manifest_path"])
        assert ms["name"] == "manifest_entry"
        assert ml["added_files_count"] + ml["existing_files_count"] == len(entries)
        got_paths = sorted(e["data_file"]["file_path"] for e in entries)
        assert got_paths == sorted(
            os.path.join(table.path, f) for f in own["files"]
        )
        parent_files = (
            set(table._load_snap(own["parent"])["files"])
            if own.get("parent") is not None
            else set()
        )
        for e in entries:
            rel = os.path.relpath(e["data_file"]["file_path"], table.path)
            assert e["data_file"]["record_count"] == own["file_rows"][rel]
            assert e["data_file"]["file_size_in_bytes"] == os.path.getsize(
                e["data_file"]["file_path"]
            )
            assert e["status"] == (0 if rel in parent_files else 1)
            assert e["sequence_number"] == own["file_seqs"][rel]
            stats = (own.get("file_stats") or {}).get(rel) or {}
            if "o_orderkey" in stats:
                lo = next(
                    kv for kv in e["data_file"]["lower_bounds"] if kv["key"] == 1
                )
                hi = next(
                    kv for kv in e["data_file"]["upper_bounds"] if kv["key"] == 1
                )
                assert _bound(lo["value"], "long") == stats["o_orderkey"][0]
                assert _bound(hi["value"], "long") == stats["o_orderkey"][1]


def test_pending_equality_deletes_export_as_delete_manifests(spark, table):
    delete_where(
        table, ["o_orderkey"], spark.createDataFrame([(2,)], "o_orderkey long")
    )
    out = export_iceberg_metadata(table)
    meta = json.load(open(out["metadata_location"]))
    head = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, ml = read_avro_file(head["manifest-list"])
    dm = [m for m in ml if m["content"] == 1]
    assert len(dm) == 1
    _, entries = read_avro_file(dm[0]["manifest_path"])
    assert [e["data_file"]["content"] for e in entries] == [2]
    # an UNSTAMPED legacy delete has no spec sequence: refuse loudly
    from iceberg_catalog_migrator_spark.sources.snapshots import (
        _MANIFEST_CACHE,
    )

    sid = table.current_snapshot_id()
    doc_path = os.path.join(table.path, "metadata", f"snap-{sid}.json")
    doc = json.load(open(doc_path))
    doc.pop("delete_seqs", None)
    json.dump(doc, open(doc_path, "w"))
    _MANIFEST_CACHE.clear()
    with pytest.raises(SnapshotError, match="UNSTAMPED equality deletes"):
        export_iceberg_metadata(table)


def test_tracked_schema_field_ids_survive_rename(spark, table):
    from iceberg_catalog_migrator_spark.sources.snapshots import (
        rename_column,
        track_schema,
    )

    from iceberg_catalog_migrator_spark.sources.snapshots import (
        rewrite_sorted,
    )

    track_schema(table)
    rename_column(table, "o_totalprice", "price")
    # the retained files still store the column as o_totalprice: the
    # name-resolved export refuses until the files are rewritten —
    # our parquet carries no field-id annotations, so no reader of the
    # export could resolve the old physical name
    with pytest.raises(SnapshotError, match="name-resolved export"):
        export_iceberg_metadata(table)
    rewrite_sorted(table, ["o_orderkey"])  # files now carry `price`
    out = export_iceberg_metadata(table)
    meta = json.load(open(out["metadata_location"]))
    fields = meta["schemas"][0]["fields"]
    by_name = {f["name"]: f["id"] for f in fields}
    # the renamed column keeps its ORIGINAL field id — Iceberg's rule
    assert by_name["price"] == 3
    assert "o_totalprice" not in by_name


def test_zigzag_varint_against_reference_vectors():
    """Spec vectors: Avro's own documented long encodings."""
    from iceberg_catalog_migrator_spark.sources.iceberg_format import _enc_long

    vectors = {
        0: b"\x00",
        -1: b"\x01",
        1: b"\x02",
        -2: b"\x03",
        2: b"\x04",
        -64: b"\x7f",
        64: b"\x80\x01",
    }
    for n, b in vectors.items():
        assert _enc_long(n) == b, n
        r = _Reader(b)
        assert r.long() == n


# ------------------------------------- strict Avro schema validation

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}


def _validate_avro_schema(schema, defined=None):
    """Enforce the Avro spec rules a strict parser (Java Avro,
    fastavro) applies at schema-parse time and that the permissive
    in-repo reader does not: every named type's fullname is defined at
    most once per schema; a bare string type is either a primitive or
    a reference to a PREVIOUSLY defined name; structural shapes hold.
    Guards the export's external-reader contract (round 10 shipped
    lower/upper bounds inlining the same named record twice, which
    real readers reject)."""
    defined = set() if defined is None else defined
    if isinstance(schema, str):
        assert schema in _PRIMITIVES or schema in defined, (
            f"unresolvable type reference {schema!r}"
        )
        return defined
    if isinstance(schema, list):  # union: no nested unions, no dup branches
        kinds = []
        for branch in schema:
            assert not isinstance(branch, list), "nested union"
            defined = _validate_avro_schema(branch, defined)
            kinds.append(branch if isinstance(branch, str) else branch["type"])
        assert len(kinds) == len(set(kinds)), "duplicate union branch kinds"
        return defined
    assert isinstance(schema, dict), f"bad schema node {schema!r}"
    t = schema["type"]
    if t in ("record", "enum", "fixed"):
        name = schema["name"]
        assert name not in _PRIMITIVES, f"named type shadows primitive {name}"
        assert name not in defined, f"fullname {name!r} defined twice"
        defined = defined | {name}
        if t == "record":
            for f in schema["fields"]:
                defined = _validate_avro_schema(f["type"], defined)
        return defined
    if t == "array":
        return _validate_avro_schema(schema["items"], defined)
    if t == "map":
        return _validate_avro_schema(schema["values"], defined)
    return _validate_avro_schema(t, defined)


def test_emitted_avro_schemas_parse_strictly(spark, table):
    """Every Avro container the export writes carries a schema a
    strict parser accepts, and the bounds entries use the spec's
    k126_v127 / k129_v130 names and field ids."""
    doomed = (
        load_table(spark, SF, "orders")
        .filter(F.col("o_orderkey") % 7 == 3)
        .select("o_orderkey")
    )
    delete_where(table, ["o_orderkey"], doomed)
    out = export_iceberg_metadata(table)
    meta = json.load(open(out["metadata_location"]))
    root = os.path.dirname(out["metadata_location"])
    checked = 0
    for snap in meta["snapshots"]:
        mls, mlist = read_avro_file(snap["manifest-list"])
        _validate_avro_schema(mls)
        checked += 1
        for mf in mlist:
            ms, _ = read_avro_file(mf["manifest_path"])
            _validate_avro_schema(ms)
            checked += 1
            txt = json.dumps(ms)
            for fname, rec, kid, vid in (
                ("lower_bounds", "k126_v127", 126, 127),
                ("upper_bounds", "k129_v130", 129, 130),
            ):
                df = next(
                    f
                    for f in ms["fields"]
                    if f["name"] == "data_file"
                )["type"]
                bf = next(
                    f for f in df["fields"] if f["name"] == fname
                )
                arr = next(b for b in bf["type"] if b != "null")
                assert arr["logicalType"] == "map"
                assert arr["items"]["name"] == rec
                ids = [f["field-id"] for f in arr["items"]["fields"]]
                assert ids == [kid, vid]
    assert checked >= 3  # at least the chain's lists + one manifest
    # sanity: the validator itself rejects the round-10 shape
    dup = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": {"type": "record", "name": "k_v",
                                   "fields": []}},
            {"name": "b", "type": {"type": "record", "name": "k_v",
                                   "fields": []}},
        ],
    }
    with pytest.raises(AssertionError, match="defined twice"):
        _validate_avro_schema(dup)


def test_summary_operation_maps_to_spec_values(spark, tmp_path):
    """summary.operation carries the spec's four values: deletes are
    'delete', rewrites/compactions 'replace', merges 'overwrite' —
    not a binary append/overwrite collapse (CDC readers key off it)."""
    from iceberg_catalog_migrator_spark.sources.snapshots import (
        compact_deletes,
        rewrite_small_files,
    )

    t = SnapshotTable(spark, str(tmp_path / "ops"))
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t.append(orders.coalesce(2))
    delete_where(
        t,
        ["o_orderkey"],
        orders.filter(F.col("o_orderkey") % 5 == 0).select("o_orderkey"),
    )
    compact_deletes(t)
    rewrite_small_files(t)
    out = export_iceberg_metadata(t)
    meta = json.load(open(out["metadata_location"]))
    ops = [s["summary"]["operation"] for s in meta["snapshots"]]
    # rewrite may no-op (nothing small after compaction): assert the
    # committed prefix, not a fixed length
    assert ops[:3] == ["append", "delete", "replace"]
    assert set(ops) <= {"append", "replace", "overwrite", "delete"}
