"""Iceberg format-version 1 READ-ONLY import: a hand-written v1
metadata tree (flat schema/partition-spec, manifests without content
or sequence fields, plus the older inline-manifests snapshot form)
must read correctly through IcebergTable, prune on bounds, adopt, and
refuse v2-only shapes. The fixture is written with the engine's own
Avro writer against v1-shaped schemas — the reader sees exactly what a
v1 writer would produce (including historical fields like
block_size_in_bytes it must tolerate)."""

import json
import os
import struct

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_catalog_migrator_spark.sources.iceberg_format import (
    write_avro,
)
from iceberg_catalog_migrator_spark.sources.iceberg_read import (
    IcebergTable,
    adopt_iceberg_table,
)
from iceberg_catalog_migrator_spark.sources.snapshots import SnapshotError


def _opt(t):
    return ["null", t]


_V1_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": _opt("long"), "field-id": 1},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "file_path", "type": "string", "field-id": 100},
                    {"name": "file_format", "type": "string", "field-id": 101},
                    {
                        "name": "partition",
                        "type": {"type": "record", "name": "r102", "fields": []},
                        "field-id": 102,
                    },
                    {"name": "record_count", "type": "long", "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                    # v1-only historical field the reader must tolerate
                    {"name": "block_size_in_bytes", "type": "long", "field-id": 105},
                    {
                        "name": "lower_bounds",
                        "type": _opt({
                            "type": "array",
                            "items": {
                                "type": "record",
                                "name": "k126_v127",
                                "fields": [
                                    {"name": "key", "type": "int", "field-id": 126},
                                    {"name": "value", "type": "bytes", "field-id": 127},
                                ],
                            },
                            "logicalType": "map",
                        }),
                        "field-id": 125,
                    },
                    {
                        "name": "upper_bounds",
                        "type": _opt({
                            "type": "array",
                            "items": {
                                "type": "record",
                                "name": "k129_v130",
                                "fields": [
                                    {"name": "key", "type": "int", "field-id": 129},
                                    {"name": "value", "type": "bytes", "field-id": 130},
                                ],
                            },
                            "logicalType": "map",
                        }),
                        "field-id": 128,
                    },
                ],
            },
            "field-id": 2,
        },
    ],
}

_V1_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "added_snapshot_id", "type": _opt("long"), "field-id": 503},
    ],
}


def _long(v):
    return struct.pack("<q", v)


@pytest.fixture()
def v1_table(tmp_path):
    root = str(tmp_path / "v1tbl")
    os.makedirs(os.path.join(root, "data"))
    os.makedirs(os.path.join(root, "metadata"))
    files = []
    for i, lo in enumerate((0, 1000)):
        keys = list(range(lo, lo + 100))
        p = os.path.join(root, "data", f"f{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(keys, pa.int64()),
                    "v": pa.array([k * 2.0 for k in keys], pa.float64()),
                }
            ),
            p,
        )
        files.append((p, lo, lo + 99))
    # one manifest per file, v1-shaped (no content / sequence fields)
    manifests = []
    for i, (p, lo, hi) in enumerate(files):
        mp = os.path.join(root, "metadata", f"m{i}.avro")
        write_avro(
            mp,
            _V1_ENTRY_SCHEMA,
            [
                {
                    "status": 1,
                    "snapshot_id": 10 + i,
                    "data_file": {
                        "file_path": p,
                        "file_format": "PARQUET",
                        "partition": {},
                        "record_count": 100,
                        "file_size_in_bytes": os.path.getsize(p),
                        "block_size_in_bytes": 67108864,
                        "lower_bounds": [{"key": 1, "value": _long(lo)}],
                        "upper_bounds": [{"key": 1, "value": _long(hi)}],
                    },
                }
            ],
        )
        manifests.append(mp)
    # snapshot 10: older inline-manifests form, first file only
    # snapshot 11: manifest-list form, both files
    ml = os.path.join(root, "metadata", "snap-11.avro")
    write_avro(
        ml,
        _V1_LIST_SCHEMA,
        [
            {
                "manifest_path": mp,
                "manifest_length": os.path.getsize(mp),
                "partition_spec_id": 0,
                "added_snapshot_id": 10 + i,
            }
            for i, mp in enumerate(manifests)
        ],
    )
    meta = {
        "format-version": 1,
        "table-uuid": "00000000-0000-0000-0000-000000000001",
        "location": root,
        "last-updated-ms": 1000,
        "last-column-id": 2,
        "schema": {
            "type": "struct",
            "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"},
                {"id": 2, "name": "v", "required": False, "type": "double"},
            ],
        },
        "partition-spec": [],
        "properties": {},
        "current-snapshot-id": 11,
        "snapshots": [
            {
                "snapshot-id": 10,
                "timestamp-ms": 500,
                "manifests": [manifests[0]],
            },
            {
                "snapshot-id": 11,
                "parent-snapshot-id": 10,
                "timestamp-ms": 1000,
                "manifest-list": ml,
            },
        ],
        "snapshot-log": [
            {"snapshot-id": 10, "timestamp-ms": 500},
            {"snapshot-id": 11, "timestamp-ms": 1000},
        ],
    }
    mpath = os.path.join(root, "metadata", "v1.metadata.json")
    json.dump(meta, open(mpath, "w"))
    return mpath


def test_v1_reads_and_time_travels(spark, v1_table):
    it = IcebergTable(spark, v1_table)
    assert it.format_version == 1
    df = it.read()
    assert df.count() == 200
    assert df.columns == ["k", "v"]
    # the older inline-manifests snapshot form
    assert it.read(snapshot_id=10).count() == 100
    assert it.read(as_of_timestamp_ms=600).count() == 100


def test_v1_bounds_prune(spark, v1_table):
    it = IcebergTable(spark, v1_table)
    snap = it.snapshot()
    kept, pruned = it.plan_files(snap, [("k", ">=", 1000)])
    assert (len(kept), pruned) == (1, 1)
    got = it.read(filters=[("k", "<", 50)])
    assert got.count() == 50


def test_v1_adopts_with_legacy_sequence(spark, v1_table, tmp_path):
    adopted = adopt_iceberg_table(
        spark, v1_table, str(tmp_path / "adopted")
    )
    assert adopted.read().count() == 200
    # v1 entries carry no sequence numbers: adopted files stamp at the
    # engine's legacy default (the commit path assigns its own seq to
    # NEW files via add_files — both files visible either way)
    from iceberg_catalog_migrator_spark.sources.snapshots import (
        delete_where,
        read_with_deletes,
    )

    doomed = adopted.read().filter("k < 10").select("k")
    delete_where(adopted, ["k"], doomed)
    assert read_with_deletes(adopted).count() == 190


def test_v1_refuses_delete_manifests(spark, v1_table, tmp_path):
    meta = json.load(open(v1_table))
    ml = meta["snapshots"][1]["manifest-list"]
    # forge a v2-style content=1 manifest entry into the v1 list
    list_schema = json.loads(json.dumps(_V1_LIST_SCHEMA))
    list_schema["fields"].append(
        {"name": "content", "type": "int", "field-id": 517}
    )
    from iceberg_catalog_migrator_spark.sources.iceberg_format import (
        read_avro,
    )

    _, records = read_avro(ml)
    for r in records:
        r["content"] = 0
    records[0]["content"] = 1
    write_avro(ml, list_schema, records)
    with pytest.raises(SnapshotError, match="v2 feature"):
        IcebergTable(spark, v1_table).read()


def test_future_format_version_still_refuses(spark, v1_table, tmp_path):
    # v3 reads as of round 12 (tests/test_iceberg_v3.py); the version
    # gate now sits at 4
    meta = json.load(open(v1_table))
    meta["format-version"] = 4
    p = str(tmp_path / "v4.metadata.json")
    json.dump(meta, open(p, "w"))
    with pytest.raises(SnapshotError, match="format-version"):
        IcebergTable(spark, p)
