"""Iceberg format-version 3 interop (round-12 verdict ask #4): a
hand-written v3 metadata tree reads through IcebergTable with row
lineage reconstructed (explicit per-entry first_row_id AND the spec's
manifest-level inheritance rule), REAL puffin deletion vectors apply
at read/adopt time and export from pending position vectors, non-null
column initial-defaults are SERVED per file vintage at read time
(nested/non-scalar shapes refuse loudly; adoption materializes), the
exporter emits v3 with lineage fields when the table tracks them
(refusing the inexpressible shapes), and adoption carries the
assigned row ids metadata-only."""

import json
import os
import struct

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from iceberg_catalog_migrator_spark.sources.iceberg_format import (
    export_iceberg_metadata,
    write_avro,
)
from iceberg_catalog_migrator_spark.sources.iceberg_read import (
    IcebergTable,
    adopt_iceberg_table,
)
from iceberg_catalog_migrator_spark.sources.snapshots import (
    SnapshotError,
    SnapshotTable,
    delete_where,
    enable_row_lineage,
    merge_upsert,
    read_with_lineage,
)


def _opt(t):
    return ["null", t]


def _long(v):
    return struct.pack("<q", v)


_V3_DATA_FILE = {
    "type": "record",
    "name": "r2",
    "fields": [
        {"name": "content", "type": "int", "field-id": 134},
        {"name": "file_path", "type": "string", "field-id": 100},
        {"name": "file_format", "type": "string", "field-id": 101},
        {
            "name": "partition",
            "type": {"type": "record", "name": "r102", "fields": []},
            "field-id": 102,
        },
        {"name": "record_count", "type": "long", "field-id": 103},
        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
        {"name": "first_row_id", "type": _opt("long"), "field-id": 142},
        {
            "name": "referenced_data_file",
            "type": _opt("string"),
            "field-id": 143,
        },
        {"name": "content_offset", "type": _opt("long"), "field-id": 144},
        {
            "name": "content_size_in_bytes",
            "type": _opt("long"),
            "field-id": 145,
        },
    ],
}

_V3_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": _opt("long"), "field-id": 1},
        {"name": "sequence_number", "type": _opt("long"), "field-id": 3},
        {"name": "file_sequence_number", "type": _opt("long"), "field-id": 4},
        {"name": "data_file", "type": _V3_DATA_FILE, "field-id": 2},
    ],
}

_V3_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "first_row_id", "type": _opt("long"), "field-id": 520},
    ],
}


def _write_parquet(root, name, lo, n):
    keys = list(range(lo, lo + n))
    p = os.path.join(root, "data", name)
    pq.write_table(
        pa.table(
            {
                "k": pa.array(keys, pa.int64()),
                "v": pa.array([k * 2.0 for k in keys], pa.float64()),
            }
        ),
        p,
    )
    return p


def _entry(path, n, first=None, content=0, fmt="PARQUET", **extra):
    return {
        "status": 1,
        "snapshot_id": 1,
        "sequence_number": 1,
        "file_sequence_number": 1,
        "data_file": {
            "content": content,
            "file_path": path,
            "file_format": fmt,
            "partition": {},
            "record_count": n,
            "file_size_in_bytes": os.path.getsize(path)
            if os.path.exists(path)
            else 0,
            "first_row_id": first,
            **extra,
        },
    }


def _metadata(root, ml, next_row_id=10_000, extra_schema_field=None):
    fields = [
        {"id": 1, "name": "k", "required": False, "type": "long"},
        {"id": 2, "name": "v", "required": False, "type": "double"},
    ]
    if extra_schema_field is not None:
        fields.append(extra_schema_field)
    return {
        "format-version": 3,
        "next-row-id": next_row_id,
        "table-uuid": "00000000-0000-0000-0000-000000000003",
        "location": root,
        "last-sequence-number": 1,
        "last-updated-ms": 1000,
        "last-column-id": max(f["id"] for f in fields),
        "current-schema-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": fields}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "properties": {},
        "current-snapshot-id": 1,
        "snapshots": [
            {
                "snapshot-id": 1,
                "sequence-number": 1,
                "timestamp-ms": 1000,
                "first-row-id": 0,
                "manifest-list": ml,
                "schema-id": 0,
            }
        ],
        "snapshot-log": [{"snapshot-id": 1, "timestamp-ms": 1000}],
    }


@pytest.fixture()
def v3_table(tmp_path):
    """Two manifests: one with an EXPLICIT per-entry first_row_id, one
    with null entry ids inheriting the manifest's first_row_id
    sequentially (the spec's assignment rule)."""
    root = str(tmp_path / "v3tbl")
    os.makedirs(os.path.join(root, "data"))
    os.makedirs(os.path.join(root, "metadata"))
    f0 = _write_parquet(root, "f0.parquet", 0, 100)
    f1 = _write_parquet(root, "f1.parquet", 1000, 100)
    f2 = _write_parquet(root, "f2.parquet", 2000, 50)
    m0 = os.path.join(root, "metadata", "m0.avro")
    write_avro(m0, _V3_ENTRY_SCHEMA, [_entry(f0, 100, first=0)])
    m1 = os.path.join(root, "metadata", "m1.avro")
    write_avro(
        m1,
        _V3_ENTRY_SCHEMA,
        [_entry(f1, 100, first=None), _entry(f2, 50, first=None)],
    )
    ml = os.path.join(root, "metadata", "snap-1.avro")
    write_avro(
        ml,
        _V3_LIST_SCHEMA,
        [
            {
                "manifest_path": m0,
                "manifest_length": os.path.getsize(m0),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 1,
                "min_sequence_number": 1,
                "added_snapshot_id": 1,
                "first_row_id": None,
            },
            {
                "manifest_path": m1,
                "manifest_length": os.path.getsize(m1),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 1,
                "min_sequence_number": 1,
                "added_snapshot_id": 1,
                "first_row_id": 1000,
            },
        ],
    )
    mpath = os.path.join(root, "metadata", "v1.metadata.json")
    with open(mpath, "w") as f:
        json.dump(_metadata(root, ml), f)
    return mpath


def test_v3_reads_and_reconstructs_row_ids(spark, v3_table):
    it = IcebergTable(spark, v3_table)
    assert it.format_version == 3
    assert it.next_row_id() == 10_000
    assert it.read().count() == 250
    got = it.read(with_row_ids=True)
    rows = {r.k: r._row_id for r in got.collect()}
    # explicit: f0 rows are ids 0..99 in key order (written sorted)
    assert rows[0] == 0 and rows[99] == 99
    # inherited: f1 starts at the manifest's 1000, f2 follows at 1100
    assert rows[1000] == 1000 and rows[1099] == 1099
    assert rows[2000] == 1100 and rows[2049] == 1149
    assert len(set(rows.values())) == 250  # all distinct


def _attach_dvs(v3_table, dv_entries, suffix="dv"):
    """Append a delete manifest with the given DV entries to the
    fixture tree and mint a new metadata version; returns its path.
    Each dv_entries item: (puffin_path, offset, length, cardinality,
    referenced_data_file)."""
    root = os.path.dirname(os.path.dirname(v3_table))
    dm = os.path.join(root, "metadata", f"{suffix}-manifest.avro")
    write_avro(
        dm,
        _V3_ENTRY_SCHEMA,
        [
            _entry(
                p,
                card,
                first=None,
                content=1,
                fmt="PUFFIN",
                referenced_data_file=ref_file,
                content_offset=off,
                content_size_in_bytes=ln,
            )
            for p, off, ln, card, ref_file in dv_entries
        ],
    )
    with open(v3_table) as f:
        meta = json.load(f)
    ml_old = meta["snapshots"][0]["manifest-list"]
    _, old_records = __import__(
        "iceberg_catalog_migrator_spark.sources.iceberg_format",
        fromlist=["read_avro"],
    ).read_avro(ml_old)
    ml2 = os.path.join(root, "metadata", f"snap-1-{suffix}.avro")
    write_avro(
        ml2,
        _V3_LIST_SCHEMA,
        old_records
        + [
            {
                "manifest_path": dm,
                "manifest_length": os.path.getsize(dm),
                "partition_spec_id": 0,
                "content": 1,
                "sequence_number": 1,
                "min_sequence_number": 1,
                "added_snapshot_id": 1,
                "first_row_id": None,
            }
        ],
    )
    meta["snapshots"][0]["manifest-list"] = ml2
    m2 = os.path.join(root, "metadata", f"v2-{suffix}.metadata.json")
    with open(m2, "w") as f:
        json.dump(meta, f)
    return m2


def _real_dv_tree(v3_table):
    """The fixture tree plus a REAL puffin deletion vector: positions
    {0, 1, 97} of f0 (keys 0, 1, 97) and {10} of f1 (key 1010)."""
    import numpy as np

    from iceberg_catalog_migrator_spark.sources.puffin import (
        DV_BLOB_TYPE,
        dv_blob,
        write_puffin,
    )

    root = os.path.dirname(os.path.dirname(v3_table))
    f0 = os.path.join(root, "data", "f0.parquet")
    f1 = os.path.join(root, "data", "f1.parquet")
    b0 = dv_blob(np.array([0, 1, 97], np.int64))
    b1 = dv_blob(np.array([10], np.int64))
    ppath = os.path.join(root, "data", "dv.puffin")
    descs = write_puffin(
        ppath,
        [
            {
                "type": DV_BLOB_TYPE,
                "snapshot-id": 1,
                "sequence-number": 1,
                "payload": b0,
                "properties": {
                    "referenced-data-file": f0,
                    "cardinality": "3",
                },
            },
            {
                "type": DV_BLOB_TYPE,
                "snapshot-id": 1,
                "sequence-number": 1,
                "payload": b1,
                "properties": {
                    "referenced-data-file": f1,
                    "cardinality": "1",
                },
            },
        ],
    )
    return _attach_dvs(
        v3_table,
        [
            (ppath, descs[0]["offset"], descs[0]["length"], 3, f0),
            (ppath, descs[1]["offset"], descs[1]["length"], 1, f1),
        ],
    )


def test_v3_deletion_vector_reads(spark, v3_table):
    """A REAL puffin deletion vector (roaring-bitmap blob) applies at
    read time: exactly the referenced positions disappear, every other
    row (including same-position rows of OTHER files) survives."""
    m2 = _real_dv_tree(v3_table)
    it = IcebergTable(spark, m2)
    got = {r.k for r in it.read().collect()}
    assert got == (
        set(range(100)) - {0, 1, 97}
    ) | (set(range(1000, 1100)) - {1010}) | set(range(2000, 2050))
    # row lineage composes with DVs: survivors keep their assigned ids
    rows = {r.k: r._row_id for r in it.read(with_row_ids=True).collect()}
    assert 0 not in rows and 1010 not in rows
    assert rows[2] == 2 and rows[1011] == 1011 and rows[2000] == 1100


def test_v3_dv_total_records_metadata_only(spark, v3_table):
    """A foreign v3 tree whose only pending deletes are DVs counts
    exactly from metadata: each DV is the COMPLETE position set for
    its file, so net = record counts minus live-file cardinalities."""
    m2 = _real_dv_tree(v3_table)
    it = IcebergTable(spark, m2)
    # fixture summary carries no total-records: add one (gross = 250)
    meta = json.load(open(m2))
    meta["snapshots"][0]["summary"] = {
        "operation": "append",
        "total-records": "250",
    }
    m3 = os.path.join(os.path.dirname(m2), "v3-tr.metadata.json")
    json.dump(meta, open(m3, "w"))
    it = IcebergTable(spark, m3)
    assert it.total_records() == 250 - 4  # 3 from f0 + 1 from f1
    assert it.total_records() == it.read().count()


def test_v3_dv_filters_compose(spark, v3_table):
    m2 = _real_dv_tree(v3_table)
    it = IcebergTable(spark, m2)
    got = {r.k for r in it.read(filters=[("k", "<", 100)]).collect()}
    assert got == set(range(100)) - {0, 1, 97}


def test_v3_dv_adopts_metadata_only(spark, tmp_path, v3_table):
    """Adoption converts each DV into the engine's position-vector
    parquet re-keyed to the adopted names — the adopted table serves
    the same visible rows."""
    from iceberg_catalog_migrator_spark.sources.snapshots import (
        read_with_deletes,
    )

    m2 = _real_dv_tree(v3_table)
    t = adopt_iceberg_table(spark, m2, str(tmp_path / "adopted"))
    got = {r.k for r in read_with_deletes(t).collect()}
    want = {r.k for r in IcebergTable(spark, m2).read().collect()}
    assert got == want and 0 not in got and 1010 not in got


def test_v3_dv_duplicate_reference_refuses(spark, v3_table):
    """The spec allows at most ONE deletion vector per data file."""
    import numpy as np

    from iceberg_catalog_migrator_spark.sources.puffin import (
        DV_BLOB_TYPE,
        dv_blob,
        write_puffin,
    )

    root = os.path.dirname(os.path.dirname(v3_table))
    f0 = os.path.join(root, "data", "f0.parquet")
    blob = dv_blob(np.array([5], np.int64))
    ppath = os.path.join(root, "data", "dv-dup.puffin")
    descs = write_puffin(
        ppath,
        [
            {"type": DV_BLOB_TYPE, "payload": blob},
            {"type": DV_BLOB_TYPE, "payload": blob},
        ],
    )
    m2 = _attach_dvs(
        v3_table,
        [
            (ppath, d["offset"], d["length"], 1, f0)
            for d in descs
        ],
        suffix="dvdup",
    )
    with pytest.raises(SnapshotError, match="at most one"):
        IcebergTable(spark, m2).read()


def test_v3_parquet_position_delete_refuses(spark, v3_table):
    """v3 replaced position-delete FILES with deletion vectors — a v3
    tree carrying a parquet position-delete file is spec-invalid."""
    root = os.path.dirname(os.path.dirname(v3_table))
    pd_path = os.path.join(root, "data", "posdel.parquet")
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array(
                    [os.path.join(root, "data", "f0.parquet")], pa.string()
                ),
                "pos": pa.array([0], pa.int64()),
            }
        ),
        pd_path,
    )
    dm = os.path.join(root, "metadata", "pd-manifest.avro")
    write_avro(
        dm,
        _V3_ENTRY_SCHEMA,
        [_entry(pd_path, 1, first=None, content=1, fmt="PARQUET")],
    )
    with open(v3_table) as f:
        meta = json.load(f)
    ml_old = meta["snapshots"][0]["manifest-list"]
    _, old_records = __import__(
        "iceberg_catalog_migrator_spark.sources.iceberg_format",
        fromlist=["read_avro"],
    ).read_avro(ml_old)
    ml2 = os.path.join(root, "metadata", "snap-1-pd.avro")
    write_avro(
        ml2,
        _V3_LIST_SCHEMA,
        old_records
        + [
            {
                "manifest_path": dm,
                "manifest_length": os.path.getsize(dm),
                "partition_spec_id": 0,
                "content": 1,
                "sequence_number": 1,
                "min_sequence_number": 1,
                "added_snapshot_id": 1,
                "first_row_id": None,
            }
        ],
    )
    meta["snapshots"][0]["manifest-list"] = ml2
    m2 = os.path.join(root, "metadata", "v2-pd.metadata.json")
    with open(m2, "w") as f:
        json.dump(meta, f)
    with pytest.raises(SnapshotError, match="position-delete"):
        IcebergTable(spark, m2).read()


def test_v3_initial_default_fills_pre_addition_files(spark, tmp_path, v3_table):
    """A column added with a non-null ``initial-default`` reads as the
    declared value for files written BEFORE the column existed — and
    as the STORED values (including real nulls) for files that carry
    it. The fixture's three parquet files all predate 'w'; a fourth
    file carries it with a mix of real values and a real null."""
    with open(v3_table) as f:
        meta = json.load(f)
    meta["schemas"][0]["fields"].append(
        {
            "id": 3,
            "name": "w",
            "required": False,
            "type": "long",
            "initial-default": 42,
        }
    )
    root = os.path.dirname(os.path.dirname(v3_table))
    # a post-addition file carrying real w values (incl. a real null)
    f3 = os.path.join(root, "data", "f3.parquet")
    pq.write_table(
        pa.table(
            {
                "k": pa.array([9000, 9001, 9002], pa.int64()),
                "v": pa.array([1.0, 2.0, 3.0], pa.float64()),
                "w": pa.array([7, None, 9], pa.int64()),
            }
        ),
        f3,
    )
    m3 = os.path.join(root, "metadata", "m3.avro")
    write_avro(m3, _V3_ENTRY_SCHEMA, [_entry(f3, 3, first=5000)])
    from iceberg_catalog_migrator_spark.sources.iceberg_format import (
        read_avro,
    )

    _, old = read_avro(meta["snapshots"][0]["manifest-list"])
    ml2 = os.path.join(root, "metadata", "snap-1-dflt.avro")
    write_avro(
        ml2,
        _V3_LIST_SCHEMA,
        old
        + [
            {
                "manifest_path": m3,
                "manifest_length": os.path.getsize(m3),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 1,
                "min_sequence_number": 1,
                "added_snapshot_id": 1,
                "first_row_id": None,
            }
        ],
    )
    meta["snapshots"][0]["manifest-list"] = ml2
    m2 = os.path.join(os.path.dirname(v3_table), "v2.metadata.json")
    with open(m2, "w") as f:
        json.dump(meta, f)
    df = IcebergTable(spark, m2).read()
    rows = {r.k: r.w for r in df.collect()}
    # pre-addition vintages read the default...
    assert rows[0] == 42 and rows[1000] == 42 and rows[2000] == 42
    # ...the post-addition file reads its stored values, real null kept
    assert rows[9000] == 7 and rows[9001] is None and rows[9002] == 9
    assert len(rows) == 253
    # filters observe the filled value too
    assert (
        IcebergTable(spark, m2).read().filter("w = 42").count() == 250
    )


def test_v3_initial_default_unsupported_shape_refuses(
    spark, tmp_path, v3_table
):
    """Defaults this reader cannot serve exactly (nested types,
    non-scalar JSON) still refuse up front, never misread as null."""
    with open(v3_table) as f:
        meta = json.load(f)
    meta["schemas"][0]["fields"].append(
        {
            "id": 3,
            "name": "w",
            "required": False,
            "type": {"type": "struct", "fields": []},
            "initial-default": {"x": 1},
        }
    )
    m2 = os.path.join(os.path.dirname(v3_table), "v2-bad.metadata.json")
    with open(m2, "w") as f:
        json.dump(meta, f)
    with pytest.raises(SnapshotError, match="initial-default"):
        IcebergTable(spark, m2)


@pytest.fixture()
def lineage_table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "lin"))
    t.append(
        spark.range(0, 100)
        .select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
        .sortWithinPartitions("k")
        .coalesce(1)
    )
    enable_row_lineage(t)
    t.append(
        spark.range(100, 150)
        .select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
        .coalesce(1)
    )
    return t


def test_export_v3_round_trips_row_ids(spark, lineage_table):
    t = lineage_table
    delete_where(t, ["k"], spark.range(10, 20).select(F.col("id").alias("k")))
    out = export_iceberg_metadata(t)  # auto-picks v3: lineage tracked
    meta = json.load(open(out["metadata_location"]))
    assert meta["format-version"] == 3
    assert meta["next-row-id"] == 150
    assert all("first-row-id" in s for s in meta["snapshots"])
    it = IcebergTable(spark, out["metadata_location"])
    got = {(r.k, r._row_id) for r in it.read(with_row_ids=True).collect()}
    eng = {(r.k, r._row_id) for r in read_with_lineage(t).collect()}
    assert got == eng and len(got) == 140


def test_export_v3_writes_deletion_vectors(spark, lineage_table, tmp_path):
    """Pending position-delete vectors export as spec deletion vectors
    (one puffin blob per referenced file), and the full round trip —
    export, foreign read, adopt — serves the same visible rows."""
    from iceberg_catalog_migrator_spark.sources.snapshots import (
        delete_where_positional,
        read_with_deletes,
    )

    t = lineage_table
    delete_where_positional(t, "k >= 30 AND k < 45")
    out = export_iceberg_metadata(t)  # auto-picks v3: lineage tracked
    meta = json.load(open(out["metadata_location"]))
    assert meta["format-version"] == 3
    it = IcebergTable(spark, out["metadata_location"])
    dvs = it.deletion_vectors(it.snapshot())
    assert dvs and all(d["puffin"].endswith(".puffin") for d in dvs)
    assert sum(d["cardinality"] for d in dvs) == 15
    # ONE puffin per snapshot; at most one DV per referenced file
    assert len({d["puffin"] for d in dvs}) == 1
    assert len({d["referenced"] for d in dvs}) == len(dvs)
    got = {r.k for r in it.read().collect()}
    eng = {r.k for r in read_with_deletes(t).collect()}
    assert got == eng and not (got & set(range(30, 45)))
    # lineage composes: survivors keep their engine-assigned row ids
    a = {(r.k, r._row_id) for r in it.read(with_row_ids=True).collect()}
    b = {(r.k, r._row_id) for r in read_with_lineage(t).collect()}
    assert a == b
    # and the inbound leg: adoption converts the DVs back
    t2 = adopt_iceberg_table(
        spark, out["metadata_location"], str(tmp_path / "re-adopted")
    )
    assert {r.k for r in read_with_deletes(t2).collect()} == eng


def test_export_v3_refuses_inexpressible_shapes(spark, lineage_table, tmp_path):
    t = lineage_table
    # materialized-id files (a merge rewrite) have no contiguous range
    merge_upsert(
        t,
        spark.range(5, 8).select(F.col("id").alias("k"), F.lit(9).alias("v")),
        ["k"],
    )
    with pytest.raises(SnapshotError, match="materialized"):
        export_iceberg_metadata(t, format_version=3)
    # v2 export of the same table still works
    out = export_iceberg_metadata(t, format_version=2)
    assert json.load(open(out["metadata_location"]))["format-version"] == 2
    # and a lineage-less table refuses v3 explicitly
    t2 = SnapshotTable(spark, str(tmp_path / "plain"))
    t2.append(spark.range(5).select(F.col("id").alias("k")))
    with pytest.raises(SnapshotError, match="row lineage"):
        export_iceberg_metadata(t2, format_version=3)


def test_export_reuse_distinguishes_format_versions(spark, lineage_table):
    t = lineage_table
    v3 = export_iceberg_metadata(t, reuse=True)
    v2 = export_iceberg_metadata(t, format_version=2, reuse=True)
    assert v3["metadata_location"] != v2["metadata_location"]
    # reuse serves each format its own latest doc
    again = export_iceberg_metadata(t, format_version=2, reuse=True)
    assert again["metadata_location"] == v2["metadata_location"]


def test_adopt_v3_carries_row_ids_metadata_only(spark, lineage_table, tmp_path):
    t = lineage_table
    out = export_iceberg_metadata(t)
    dest = str(tmp_path / "adopted")
    t2 = adopt_iceberg_table(spark, out["metadata_location"], dest)
    a = {(r.k, r._row_id) for r in read_with_lineage(t2).collect()}
    b = {(r.k, r._row_id) for r in read_with_lineage(t).collect()}
    assert a == b
    # and future appends keep assigning PAST the adopted ranges
    t2.append(
        spark.range(200, 210)
        .select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
        .coalesce(1)
    )
    ids = [r._row_id for r in read_with_lineage(t2).collect()]
    assert len(ids) == len(set(ids)) == 160


def test_v3_dv_basename_collision_refuses(spark, v3_table):
    """DV coordinates join data rows on the file BASENAME — a foreign
    layout where two distinct data files share a basename across
    partition directories (Hive-style 000000_0) would cross-apply one
    file's deletion vector to every same-named file. The driver-side
    collision check must refuse loudly BEFORE any delete applies."""
    import numpy as np

    from iceberg_catalog_migrator_spark.sources.puffin import (
        DV_BLOB_TYPE,
        dv_blob,
        write_puffin,
    )

    root = os.path.dirname(os.path.dirname(v3_table))
    # a second data file with the SAME basename as f0, other directory
    os.makedirs(os.path.join(root, "data", "part=1"), exist_ok=True)
    twin = os.path.join(root, "data", "part=1", "f0.parquet")
    keys = list(range(5000, 5100))
    pq.write_table(
        pa.table(
            {
                "k": pa.array(keys, pa.int64()),
                "v": pa.array([k * 2.0 for k in keys], pa.float64()),
            }
        ),
        twin,
    )
    f0 = os.path.join(root, "data", "f0.parquet")
    ppath = os.path.join(root, "data", "dv-twin.puffin")
    descs = write_puffin(
        ppath,
        [
            {
                "type": DV_BLOB_TYPE,
                "snapshot-id": 1,
                "sequence-number": 1,
                "payload": dv_blob(np.array([0, 1], np.int64)),
                "properties": {
                    "referenced-data-file": f0,
                    "cardinality": "2",
                },
            }
        ],
    )
    m_twin = os.path.join(root, "metadata", "m-twin.avro")
    write_avro(m_twin, _V3_ENTRY_SCHEMA, [_entry(twin, 100, first=5000)])
    with open(v3_table) as f:
        meta = json.load(f)
    from iceberg_catalog_migrator_spark.sources.iceberg_format import (
        read_avro,
    )

    _, old = read_avro(meta["snapshots"][0]["manifest-list"])
    ml2 = os.path.join(root, "metadata", "snap-1-twin.avro")
    write_avro(
        ml2,
        _V3_LIST_SCHEMA,
        old
        + [
            {
                "manifest_path": m_twin,
                "manifest_length": os.path.getsize(m_twin),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 1,
                "min_sequence_number": 1,
                "added_snapshot_id": 1,
                "first_row_id": None,
            }
        ],
    )
    meta["snapshots"][0]["manifest-list"] = ml2
    m2 = os.path.join(root, "metadata", "v2-twin.metadata.json")
    with open(m2, "w") as f:
        json.dump(meta, f)
    m3 = _attach_dvs(
        m2, [(ppath, descs[0]["offset"], descs[0]["length"], 2, f0)],
        suffix="twin-dv",
    )
    with pytest.raises(SnapshotError, match="duplicate data file basename"):
        IcebergTable(spark, m3).read().collect()
    # without deletes the same layout reads fine (full paths disjoint)
    assert IcebergTable(spark, m2).read().count() == 350


def test_adopt_materializes_initial_defaults(spark, tmp_path, v3_table):
    """Adopting a source whose schema carries non-null initial-defaults
    cannot be metadata-only: hard-linked files have no marker of which
    columns must fill which value, so the adopt falls back to the
    copy-on-write materialization and the adopted table serves the
    filled values (not silent nulls)."""
    from iceberg_catalog_migrator_spark.sources.iceberg_read import (
        adopt_iceberg_table,
    )

    with open(v3_table) as f:
        meta = json.load(f)
    meta["schemas"][0]["fields"].append(
        {
            "id": 3,
            "name": "w",
            "required": False,
            "type": "long",
            "initial-default": 42,
        }
    )
    m2 = os.path.join(os.path.dirname(v3_table), "v2-adopt.metadata.json")
    with open(m2, "w") as f:
        json.dump(meta, f)
    t2 = adopt_iceberg_table(spark, m2, str(tmp_path / "adopted-dflt"))
    rows = {r.k: r.w for r in t2.read().collect()}
    assert len(rows) == 250
    assert set(rows.values()) == {42}  # every pre-addition row filled


def test_adopt_metadata_only_when_all_files_carry_default_column(
    spark, tmp_path, v3_table
):
    """If every live file's footer already contains the defaulted
    column (post-compaction shape), the default can never fill — the
    adopt stays METADATA-ONLY (hard links, no Spark rewrite)."""
    from iceberg_catalog_migrator_spark.sources.iceberg_read import (
        adopt_iceberg_table,
    )

    root = os.path.dirname(os.path.dirname(v3_table))
    # rewrite the three fixture files IN PLACE with the w column present
    for name, lo, n in (("f0", 0, 100), ("f1", 1000, 100), ("f2", 2000, 50)):
        p = os.path.join(root, "data", f"{name}.parquet")
        keys = list(range(lo, lo + n))
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(keys, pa.int64()),
                    "v": pa.array([k * 2.0 for k in keys], pa.float64()),
                    "w": pa.array([k % 5 for k in keys], pa.int64()),
                }
            ),
            p,
        )
    with open(v3_table) as f:
        meta = json.load(f)
    meta["schemas"][0]["fields"].append(
        {
            "id": 3,
            "name": "w",
            "required": False,
            "type": "long",
            "initial-default": 42,
        }
    )
    m2 = os.path.join(os.path.dirname(v3_table), "v2-allw.metadata.json")
    with open(m2, "w") as f:
        json.dump(meta, f)
    t2 = adopt_iceberg_table(spark, m2, str(tmp_path / "adopted-allw"))
    # metadata-only: the adopted files are hard links of the source
    snap = t2._load_snap(t2.current_snapshot_id())
    linked = [os.path.join(t2.path, f) for f in snap["files"]]
    assert all(os.stat(p).st_nlink >= 2 for p in linked)
    rows = {r.k: r.w for r in t2.read().collect()}
    assert rows[3] == 3 and rows[2002] == 2  # stored values, no fills


def test_v3_struct_initial_default_served(spark, tmp_path, v3_table):
    """Round-14 stretch: a STRUCT-typed initial-default in the spec's
    unambiguous single-value JSON form (object keyed by field id over
    all-primitive subfields) is SERVED — pre-addition files read the
    struct literal; a post-addition file keeps stored values including
    a whole-struct null."""
    with open(v3_table) as f:
        meta = json.load(f)
    meta["schemas"][0]["fields"].append(
        {
            "id": 3,
            "name": "w",
            "required": False,
            "type": {
                "type": "struct",
                "fields": [
                    {"id": 4, "name": "a", "required": False, "type": "long"},
                    {"id": 5, "name": "b", "required": False, "type": "string"},
                ],
            },
            "initial-default": {"4": 11, "5": "x"},
        }
    )
    root = os.path.dirname(os.path.dirname(v3_table))
    f3 = os.path.join(root, "data", "f3s.parquet")
    st = pa.struct([("a", pa.int64()), ("b", pa.string())])
    pq.write_table(
        pa.table(
            {
                "k": pa.array([9000, 9001, 9002], pa.int64()),
                "v": pa.array([1.0, 2.0, 3.0], pa.float64()),
                "w": pa.array(
                    [{"a": 1, "b": "p"}, None, {"a": None, "b": "q"}], st
                ),
            }
        ),
        f3,
    )
    m3 = os.path.join(root, "metadata", "m3s.avro")
    write_avro(m3, _V3_ENTRY_SCHEMA, [_entry(f3, 3, first=5000)])
    from iceberg_catalog_migrator_spark.sources.iceberg_format import (
        read_avro,
    )

    _, old = read_avro(meta["snapshots"][0]["manifest-list"])
    ml2 = os.path.join(root, "metadata", "snap-1-sdflt.avro")
    write_avro(
        ml2,
        _V3_LIST_SCHEMA,
        old
        + [
            {
                "manifest_path": m3,
                "manifest_length": os.path.getsize(m3),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 1,
                "min_sequence_number": 1,
                "added_snapshot_id": 1,
                "first_row_id": None,
            }
        ],
    )
    meta["snapshots"][0]["manifest-list"] = ml2
    m2 = os.path.join(os.path.dirname(v3_table), "v2-sdflt.metadata.json")
    with open(m2, "w") as f:
        json.dump(meta, f)
    df = IcebergTable(spark, m2).read()
    rows = {r.k: r.w for r in df.collect()}
    # pre-addition vintages read the struct literal
    assert rows[0] == (11, "x") and rows[2000] == (11, "x")
    # the post-addition file keeps stored values incl. whole-struct null
    assert rows[9000] == (1, "p")
    assert rows[9001] is None
    assert rows[9002] == (None, "q")
    # subfield filters observe the fill
    assert df.filter("w.a = 11").count() == 250


def test_v3_nested_struct_initial_default_served(spark, tmp_path, v3_table):
    """Round-15 (VERDICT ask #6): a struct-OF-struct initial-default
    whose leaves are all primitives serves through the same id-keyed
    single-value JSON form — the nested member's value is itself an
    id-keyed object (or absent = whole member null). Pre-addition
    files read the full nested literal; a post-addition file keeps
    stored values."""
    with open(v3_table) as f:
        meta = json.load(f)
    meta["schemas"][0]["fields"].append(
        {
            "id": 3,
            "name": "w",
            "required": False,
            "type": {
                "type": "struct",
                "fields": [
                    {"id": 4, "name": "a", "required": False, "type": "long"},
                    {
                        "id": 5,
                        "name": "inner",
                        "required": False,
                        "type": {
                            "type": "struct",
                            "fields": [
                                {
                                    "id": 6,
                                    "name": "c",
                                    "required": False,
                                    "type": "int",
                                },
                                {
                                    "id": 7,
                                    "name": "d",
                                    "required": False,
                                    "type": "string",
                                },
                            ],
                        },
                    },
                    {
                        "id": 8,
                        "name": "ghost",
                        "required": False,
                        "type": {
                            "type": "struct",
                            "fields": [
                                {
                                    "id": 9,
                                    "name": "e",
                                    "required": False,
                                    "type": "double",
                                }
                            ],
                        },
                    },
                ],
            },
            # 'inner' recurses; 'ghost' is absent -> whole member null;
            # inner.d is absent -> scalar null inside the literal
            "initial-default": {"4": 7, "5": {"6": 3}},
        }
    )
    root = os.path.dirname(os.path.dirname(v3_table))
    f3 = os.path.join(root, "data", "f3n.parquet")
    inner_t = pa.struct([("c", pa.int32()), ("d", pa.string())])
    ghost_t = pa.struct([("e", pa.float64())])
    st = pa.struct([("a", pa.int64()), ("inner", inner_t), ("ghost", ghost_t)])
    pq.write_table(
        pa.table(
            {
                "k": pa.array([9000, 9001], pa.int64()),
                "v": pa.array([1.0, 2.0], pa.float64()),
                "w": pa.array(
                    [
                        {
                            "a": 1,
                            "inner": {"c": 5, "d": "q"},
                            "ghost": {"e": 2.5},
                        },
                        None,
                    ],
                    st,
                ),
            }
        ),
        f3,
    )
    m3 = os.path.join(root, "metadata", "m3n.avro")
    write_avro(m3, _V3_ENTRY_SCHEMA, [_entry(f3, 3, first=5000)])
    from iceberg_catalog_migrator_spark.sources.iceberg_format import (
        read_avro,
    )

    _, old = read_avro(meta["snapshots"][0]["manifest-list"])
    ml2 = os.path.join(root, "metadata", "snap-1-ndflt.avro")
    write_avro(
        ml2,
        _V3_LIST_SCHEMA,
        old
        + [
            {
                "manifest_path": m3,
                "manifest_length": os.path.getsize(m3),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 1,
                "min_sequence_number": 1,
                "added_snapshot_id": 1,
                "first_row_id": None,
            }
        ],
    )
    meta["snapshots"][0]["manifest-list"] = ml2
    m2 = os.path.join(os.path.dirname(v3_table), "v2-ndflt.metadata.json")
    with open(m2, "w") as f:
        json.dump(meta, f)
    df = IcebergTable(spark, m2).read()
    rows = {r.k: r.w for r in df.collect()}
    # pre-addition vintages read the full nested literal
    assert rows[0] == (7, (3, None), None)
    assert rows[2000] == (7, (3, None), None)
    # the post-addition file keeps stored values incl. whole-struct null
    assert rows[9000] == (1, (5, "q"), (2.5,))
    assert rows[9001] is None
    # nested subfield filters observe the fill
    assert df.filter("w.inner.c = 3").count() == 250
    assert df.filter("w.ghost is null").count() == 251


def test_v3_struct_default_ambiguous_shapes_refuse(spark, v3_table):
    """Struct defaults outside the unambiguous id-keyed primitive-leaf
    form keep refusing: zero-field struct members, list-typed members,
    keys that match no field id (outer or nested), non-scalar member
    values, scalars where an id-keyed object belongs."""
    bad_shapes = [
        # a zero-field struct member has no literal to build
        {
            "type": {
                "type": "struct",
                "fields": [
                    {
                        "id": 4,
                        "name": "inner",
                        "required": False,
                        "type": {"type": "struct", "fields": []},
                    }
                ],
            },
            "initial-default": {"4": {}},
        },
        # a LIST-typed member is not served (round 15: structs of
        # primitives recurse, parameterized types never)
        {
            "type": {
                "type": "struct",
                "fields": [
                    {
                        "id": 4,
                        "name": "xs",
                        "required": False,
                        "type": {
                            "type": "list",
                            "element-id": 5,
                            "element": "long",
                            "element-required": False,
                        },
                    }
                ],
            },
            "initial-default": {"4": [1]},
        },
        # an unknown field id INSIDE a nested struct member
        {
            "type": {
                "type": "struct",
                "fields": [
                    {
                        "id": 4,
                        "name": "inner",
                        "required": False,
                        "type": {
                            "type": "struct",
                            "fields": [
                                {
                                    "id": 5,
                                    "name": "c",
                                    "required": False,
                                    "type": "int",
                                }
                            ],
                        },
                    }
                ],
            },
            "initial-default": {"4": {"99": 1}},
        },
        # a scalar where a nested member's id-keyed object belongs
        {
            "type": {
                "type": "struct",
                "fields": [
                    {
                        "id": 4,
                        "name": "inner",
                        "required": False,
                        "type": {
                            "type": "struct",
                            "fields": [
                                {
                                    "id": 5,
                                    "name": "c",
                                    "required": False,
                                    "type": "int",
                                }
                            ],
                        },
                    }
                ],
            },
            "initial-default": {"4": 7},
        },
        # key naming no subfield id
        {
            "type": {
                "type": "struct",
                "fields": [
                    {"id": 4, "name": "a", "required": False, "type": "long"}
                ],
            },
            "initial-default": {"99": 1},
        },
        # non-scalar member value
        {
            "type": {
                "type": "struct",
                "fields": [
                    {"id": 4, "name": "a", "required": False, "type": "long"}
                ],
            },
            "initial-default": {"4": [1, 2]},
        },
        # type-mismatched member scalar: casting "xyz" to long would
        # serve a silent null (code-review round-14)
        {
            "type": {
                "type": "struct",
                "fields": [
                    {"id": 4, "name": "a", "required": False, "type": "long"}
                ],
            },
            "initial-default": {"4": "xyz"},
        },
        # type-mismatched PRIMITIVE default, same hazard
        {"type": "long", "initial-default": "seven"},
        {"type": "date", "initial-default": "not-a-date"},
        # calendar-invalid date and wrapping int (review round-14b)
        {"type": "date", "initial-default": "2020-02-30"},
        {"type": "int", "initial-default": 4294967296},
    ]
    with open(v3_table) as f:
        base = json.load(f)
    for i, shape in enumerate(bad_shapes):
        meta = json.loads(json.dumps(base))
        meta["schemas"][0]["fields"].append(
            {"id": 3, "name": "w", "required": False, **shape}
        )
        m2 = os.path.join(
            os.path.dirname(v3_table), f"v2-sbad{i}.metadata.json"
        )
        with open(m2, "w") as f:
            json.dump(meta, f)
        with pytest.raises(SnapshotError, match="initial-default"):
            IcebergTable(spark, m2)


def test_v3_nested_initial_default_refuses(spark, v3_table):
    """An initial-default on a field INSIDE a struct (legal v3
    evolution: a subfield added to an existing struct) is not served —
    it must refuse loudly instead of silently reading null (review
    round-14b)."""
    with open(v3_table) as f:
        meta = json.load(f)
    meta["schemas"][0]["fields"].append(
        {
            "id": 3,
            "name": "w",
            "required": False,
            "type": {
                "type": "struct",
                "fields": [
                    {
                        "id": 4,
                        "name": "a",
                        "required": False,
                        "type": "long",
                        "initial-default": 5,
                    }
                ],
            },
        }
    )
    m2 = os.path.join(os.path.dirname(v3_table), "v2-nested.metadata.json")
    with open(m2, "w") as f:
        json.dump(meta, f)
    with pytest.raises(SnapshotError, match="NESTED"):
        IcebergTable(spark, m2)
