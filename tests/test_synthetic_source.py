"""Python Data Source connector: batch parallelism, determinism, and
streaming offset bookkeeping (drain == generator, multiple micro-batches)."""

import pytest
from pyspark.sql import functions as F

from iceberg_catalog_migrator_spark.sources.synthetic import (
    SYNTH_SOURCE_NAME,
    SYNTH_TYPES,
    register_synthetic_source,
)


@pytest.fixture(scope="module")
def synth(spark):
    register_synthetic_source(spark)
    return spark


def _read(spark, **opts):
    r = spark.read.format(SYNTH_SOURCE_NAME)
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_batch_rows_and_splits(synth):
    df = _read(synth, rows=10_000, partitions=6)
    assert df.count() == 10_000
    assert df.rdd.getNumPartitions() == 6
    # no duplicate or missing indices across splits
    assert df.select("event_id").distinct().count() == 10_000
    assert df.agg(F.min("event_id"), F.max("event_id")).first() == (0, 9_999)


def test_batch_deterministic_across_reads(synth):
    a = _read(synth, rows=5_000, partitions=4)
    b = _read(synth, rows=5_000, partitions=2)  # different split count, same rows
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_generator_scheme(synth):
    row = _read(synth, rows=100, partitions=1).filter(F.col("event_id") == 42).first()
    assert row.user_id == 42 % 997
    assert row.event_type == SYNTH_TYPES[42 % 5]
    assert row.value == (42 * 31 % 1000) / 10.0
    assert row.props == '{"k": 42}'


def test_stream_drains_to_generator(synth, tmp_path):
    sdf = (
        synth.readStream.format(SYNTH_SOURCE_NAME)
        .option("rows", "4000")
        .option("batch_rows", "900")
        .load()
    )
    # NOT availableNow: that trigger snapshots latestOffset once, so a
    # progressive source would drain a single step. The default trigger
    # re-polls latestOffset per micro-batch — the offset path under test.
    q = (
        sdf.writeStream.format("memory")
        .queryName("synth_drain")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        if synth.table("synth_drain").count() >= 4000:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination()
    got = synth.table("synth_drain")
    assert got.count() == 4000
    assert got.select("event_id").distinct().count() == 4000
    # batch_rows < rows forces multiple micro-batches through the offset path
    assert len(q.recentProgress) >= 2
    # streamed rows == batch rows (same pure generator behind both readers)
    batch = _read(synth, rows=4000)
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_stream_checkpoint_restart_no_duplicates(synth, tmp_path):
    """Kill mid-stream, restart on the same checkpoint: the fresh reader
    re-derives its position (idle triggers until past the committed
    offset), finishes the remainder, and never re-emits a row."""
    import time

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")  # durable sink: memory doesn't recover

    def run_until(target, rows=3000, step=500):
        sdf = (
            synth.readStream.format(SYNTH_SOURCE_NAME)
            .option("rows", str(rows))
            .option("batch_rows", str(step))
            .load()
        )
        q = (
            sdf.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if synth.read.parquet(out).count() >= target:
                    break
            except Exception:
                pass  # sink dir not created yet
            time.sleep(0.5)
        q.stop()
        q.awaitTermination()
        try:
            return synth.read.parquet(out).count()
        except Exception:
            return 0

    first = run_until(target=1000)
    assert first >= 1000
    if first >= 3000:  # drained fully before the stop landed; nothing to resume
        pytest.skip("first run drained the source before mid-stream stop")
    run_until(target=3000)
    got = synth.read.parquet(out)
    # the file sink commits per epoch exactly-once: ids must cover
    # [0, 3000) with no duplicates even across the crash boundary
    assert got.count() == 3000
    assert got.select("event_id").distinct().count() == 3000
    batch = _read(synth, rows=3000)
    assert batch.select("event_id").exceptAll(got.select("event_id")).count() == 0
