"""Streaming slice: stream results must equal the batch rendering of the
same logic once fully drained (availableNow)."""

import pytest
from pyspark.sql import functions as F

from iceberg_catalog_migrator_spark.sources import load_table
from iceberg_catalog_migrator_spark.streaming import (
    events_stream,
    hourly_counts_stream,
    run_stream_to_memory,
    session_window_stream,
    stateful_user_counter_stream,
    stream_dedup,
)
from iceberg_catalog_migrator_spark.streaming.jobs import (
    click_purchase_join_stream,
    prepare_stream_input,
)


@pytest.fixture(scope="module")
def stream_input(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_stream"))
    return prepare_stream_input(spark, sf_dir, out, chunks=8)


def test_hourly_counts_stream_matches_batch(spark, sf_dir, stream_input, tmp_path):
    st = hourly_counts_stream(events_stream(spark, stream_input))
    # complete mode: windows still inside the final watermark are
    # emitted too, so the drained stream equals the batch aggregation
    run_stream_to_memory(st, "hourly_mem", "complete", str(tmp_path / "ckpt"))
    got = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("hourly_mem").collect()
    }
    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2).cast("double").alias("total_value"),
        )
    )
    want = {(r.hour, r.event_type): (r.n_events, r.total_value) for r in batch.collect()}
    assert got == want


def test_stream_dedup_total(spark, sf_dir, stream_input, tmp_path):
    st = stream_dedup(events_stream(spark, stream_input))
    run_stream_to_memory(st, "dedup_mem", "append", str(tmp_path / "ckpt"))
    got = spark.table("dedup_mem").count()
    want = load_table(spark, sf_dir, "events").dropDuplicates(["user_id", "event_type", "ts"]).count()
    assert got == want


def test_session_window_stream_runs(spark, stream_input, tmp_path):
    st = session_window_stream(events_stream(spark, stream_input))
    run_stream_to_memory(st, "sess_mem", "append", str(tmp_path / "ckpt"))
    rows = spark.table("sess_mem")
    assert rows.count() > 0
    # session invariant: start <= end, positive event counts
    bad = rows.filter((F.col("session_start") > F.col("session_end")) | (F.col("n_events") <= 0))
    assert bad.count() == 0


def test_stream_stream_join_matches_batch(spark, sf_dir, stream_input, tmp_path):
    # two independent readers over the same replayed files act as the
    # two streams; drained results must equal the batch interval join
    st = click_purchase_join_stream(
        events_stream(spark, stream_input), events_stream(spark, stream_input)
    )
    run_stream_to_memory(st, "ssjoin_mem", "append", str(tmp_path / "ckpt"))
    got = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in spark.table("ssjoin_mem").collect()
    }
    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    want = {(r.c_user, r.click_id, r.purchase_id) for r in batch.collect()}
    assert got == want
    assert len(got) > 0  # the fixture must actually exercise the join


def test_stateful_counter_final_totals(spark, sf_dir, stream_input, tmp_path):
    st = stateful_user_counter_stream(events_stream(spark, stream_input))
    run_stream_to_memory(st, "counter_mem", "update", str(tmp_path / "ckpt"))
    # in update mode the memory sink appends a row per user per batch;
    # the final (max) total per user must equal the batch count
    final = (
        spark.table("counter_mem")
        .groupBy("user_id")
        .agg(F.max("total_events").alias("total_events"))
    )
    got = {r.user_id: r.total_events for r in final.collect()}
    ev = load_table(spark, sf_dir, "events")
    want = {r.user_id: r.cnt for r in ev.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()}
    assert got == want


@pytest.fixture(scope="module")
def docs_stream_input(spark, sf_dir, tmp_path_factory):
    from iceberg_catalog_migrator_spark.streaming import prepare_documents_stream_input

    out = str(tmp_path_factory.mktemp("docs_stream"))
    return prepare_documents_stream_input(spark, sf_dir, out, chunks=6)


def test_document_ingest_dedup_and_gate(spark, sf_dir, docs_stream_input, tmp_path):
    from iceberg_catalog_migrator_spark.streaming import (
        document_ingest_stream,
        documents_stream,
    )

    st = document_ingest_stream(documents_stream(spark, docs_stream_input))
    run_stream_to_memory(st, "ingest_mem", "append", str(tmp_path / "ckpt"))
    out = spark.table("ingest_mem")
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))
    batch_expected = (
        docs.select("text", F.size(toks).alias("n_tokens"))
        .filter(F.col("n_tokens") >= 5)
        .select("text")
        .distinct()
        .count()
    )
    # content dedup: the planted re-crawls (same text, later ts) are
    # dropped, so the stream output equals distinct-passing batch count
    assert out.count() == batch_expected
    # first arrival wins: no accepted doc carries a re-crawl id
    assert out.filter(F.col("doc_id") >= 1_000_000).count() == 0


def test_idempotent_parquet_sink_epochs(spark, docs_stream_input, tmp_path):
    import os

    from iceberg_catalog_migrator_spark.streaming import (
        document_ingest_stream,
        documents_stream,
        write_stream_idempotent_parquet,
    )

    out_dir = str(tmp_path / "out")
    st = document_ingest_stream(documents_stream(spark, docs_stream_input))
    write_stream_idempotent_parquet(st, out_dir, str(tmp_path / "ckpt"))
    epochs = [d for d in os.listdir(out_dir) if d.startswith("epoch=")]
    assert len(epochs) >= 2  # one per micro-batch (maxFilesPerTrigger=1)
    total = spark.read.option("basePath", out_dir).parquet(
        *(os.path.join(out_dir, e) for e in epochs)
    )
    assert total.count() == spark.table("ingest_mem").count()


def test_restart_recovery_exactly_once(spark, docs_stream_input, tmp_path):
    """Kill the sink mid-run (after the epoch's files are written but
    before its commit), resume from the same checkpoint, and assert the
    recovered output is exactly-once — the retry-from-failure contract
    the reference documents for failed_identifiers.txt re-runs
    (README.md:286,298), rendered as checkpoint recovery."""
    import os

    from pyspark.sql.streaming import StreamingQueryException

    from iceberg_catalog_migrator_spark.streaming import (
        document_ingest_stream,
        documents_stream,
        write_stream_idempotent_parquet,
    )

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    crash_after = 2  # die on the third micro-batch

    def crashing_epoch(batch_df, epoch_id):
        # the write lands, then the "process" dies before Spark commits
        # the epoch — the worst-ordered crash for a file sink
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={epoch_id}")
        )
        if epoch_id == crash_after:
            raise RuntimeError("injected crash after write, before commit")

    q = (
        document_ingest_stream(documents_stream(spark, docs_stream_input))
        .writeStream.foreachBatch(crashing_epoch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.awaitTermination()

    # resume from the same checkpoint with the healthy sink: the
    # uncommitted epoch replays (its directory is overwritten, not
    # appended) and the remaining micro-batches drain
    st = document_ingest_stream(documents_stream(spark, docs_stream_input))
    write_stream_idempotent_parquet(st, out_dir, ckpt)

    epochs = [d for d in os.listdir(out_dir) if d.startswith("epoch=")]
    recovered = spark.read.option("basePath", out_dir).parquet(
        *(os.path.join(out_dir, e) for e in epochs)
    )
    # reference: one clean end-to-end run into a fresh sink
    ref_out, ref_ckpt = str(tmp_path / "ref_out"), str(tmp_path / "ref_ckpt")
    st2 = document_ingest_stream(documents_stream(spark, docs_stream_input))
    write_stream_idempotent_parquet(st2, ref_out, ref_ckpt)
    ref_epochs = [d for d in os.listdir(ref_out) if d.startswith("epoch=")]
    reference = spark.read.option("basePath", ref_out).parquet(
        *(os.path.join(ref_out, e) for e in ref_epochs)
    )

    assert recovered.count() == reference.count()
    # exactly-once: no doc delivered twice across epochs, none missing
    assert recovered.select("doc_id").distinct().count() == recovered.count()
    assert (
        recovered.select("doc_id")
        .exceptAll(reference.select("doc_id"))
        .unionByName(reference.select("doc_id").exceptAll(recovered.select("doc_id")))
        .count()
        == 0
    )


def test_stream_join_horizon_beyond_old_default(spark, sf_dir, stream_input, tmp_path):
    # the watermark is derived from horizon (+lateness); with a 3-hour
    # horizon, pairs whose purchase trails the click by >2h — which a
    # hardcoded 2h watermark could silently drop — must be attributed
    st = click_purchase_join_stream(
        events_stream(spark, stream_input),
        events_stream(spark, stream_input),
        horizon="3 hours",
    )
    run_stream_to_memory(st, "ssjoin3h_mem", "append", str(tmp_path / "ckpt"))
    got = spark.table("ssjoin3h_mem")
    long_gap = got.filter(
        F.col("purchase_ts") > F.col("click_ts") + F.expr("INTERVAL 2 HOURS")
    )
    assert long_gap.count() > 0, "fixture must exercise the >2h attribution window"
    # and the drained stream must equal the batch interval join exactly
    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 3 HOURS")),
    )
    want = {(r.c_user, r.click_id, r.purchase_id) for r in batch.collect()}
    assert {
        (r.user_id, r.click_id, r.purchase_id) for r in got.collect()
    } == want


def test_curate_documents_end_to_end(spark, sf_dir, tmp_path):
    import glob

    from iceberg_catalog_migrator_spark.streaming.jobs import (
        curate_documents_end_to_end,
    )

    published = curate_documents_end_to_end(spark, sf_dir, str(tmp_path / "curate"))
    out = spark.read.parquet(published)
    rows = out.count()
    assert rows > 0
    # curation invariants: content-unique, quality-gated
    assert out.select("content_md5").distinct().count() == rows
    assert out.filter(F.col("n_tokens") < 5).count() == 0
    # equals the batch rendition: distinct-by-content quality-passing docs
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))
    batch = (
        docs.withColumn("n_tokens", F.size(toks))
        .filter(F.col("n_tokens") >= 5)
        .select(F.md5("text").alias("content_md5"))
        .distinct()
    )
    assert rows == batch.count()
    # the epoch sink stays append-only; publication is a separate snapshot
    assert glob.glob(str(tmp_path / "curate" / "epochs" / "epoch=*"))
    assert len(glob.glob(published + "/*.parquet")) >= 1


def test_hourly_anomaly_stream_matches_batch(spark, sf_dir, stream_input, tmp_path):
    from iceberg_catalog_migrator_spark.queries.events import (
        events_hourly_anomaly_zscore,
    )
    from iceberg_catalog_migrator_spark.streaming.jobs import hourly_anomaly_stream

    got = {
        (r.event_type, r.hour): (r.n_events, r.zscore)
        for r in hourly_anomaly_stream(
            spark, events_stream(spark, stream_input), str(tmp_path)
        ).collect()
    }
    want = {
        (r.event_type, r.hour): (r.n_events, r.zscore)
        for r in events_hourly_anomaly_zscore(spark, sf_dir).collect()
    }
    assert got == want
    assert got  # the fixture contains >=1 anomalous hour at every sf


def test_cdc_latest_state_stream_matches_batch(spark, sf_dir, stream_input, tmp_path):
    from iceberg_catalog_migrator_spark.queries.events import events_cdc_latest_state
    from iceberg_catalog_migrator_spark.streaming import cdc_latest_state_stream

    st = cdc_latest_state_stream(events_stream(spark, stream_input))
    run_stream_to_memory(st, "cdc_mem", "update", str(tmp_path / "cdc_ckpt"))
    # update mode appends one row per key per batch that touched it; the
    # final state per key is the (ts, event_id)-max emit — identical
    # rows may repeat when late data doesn't advance the state
    final = (
        spark.table("cdc_mem")
        .groupBy("user_id", "event_type")
        .agg(F.max(F.struct("last_ts", "last_event_id", "last_value")).alias("s"))
        .select(
            "user_id",
            "event_type",
            F.col("s.last_ts").alias("last_ts"),
            F.col("s.last_value").alias("last_value"),
        )
    )
    got = {
        (r.user_id, r.event_type): (r.last_ts, r.last_value) for r in final.collect()
    }
    want = {
        (r.user_id, r.event_type): (r.last_ts, r.last_value)
        for r in events_cdc_latest_state(spark, sf_dir).collect()
    }
    assert got == want


def test_heavy_hitters_stream_mg_guarantees(spark, sf_dir, stream_input, tmp_path):
    from iceberg_catalog_migrator_spark.streaming import heavy_hitters_stream
    from iceberg_catalog_migrator_spark.streaming.jobs import MG_CAPACITY

    # plant skew: ~60% of each type's events collapse onto user 0, the
    # rest spread over 100 users — user 0 must be a guaranteed hitter
    skewed = F.when(F.col("user_id") % 5 < 3, F.lit(0)).otherwise(
        F.col("user_id") % 100
    ).cast("long")
    st = heavy_hitters_stream(
        events_stream(spark, stream_input).withColumn("user_id", skewed)
    )
    run_stream_to_memory(st, "mg_mem", "update", str(tmp_path / "mg_ckpt"))
    rows = spark.table("mg_mem").collect()
    # the final summary per group = the emit with the highest processed
    # count (update mode re-emits the whole summary each touched batch)
    max_n = {}
    for r in rows:
        max_n[r.event_type] = max(max_n.get(r.event_type, 0), r.n_processed)
    got = {
        (r.event_type, r.user_id): (r.mg_count, r.n_processed)
        for r in rows
        if r.n_processed == max_n[r.event_type]
    }
    ev = load_table(spark, sf_dir, "events").withColumn("user_id", skewed)
    exact = {
        (r.event_type, r.user_id): r.cnt
        for r in ev.groupBy("event_type", "user_id")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    totals = {}
    for (t, _), c in exact.items():
        totals[t] = totals.get(t, 0) + c
    # (1) every true heavy hitter (freq > n/(k+1)) is tracked
    for (t, u), c in exact.items():
        if c > totals[t] / (MG_CAPACITY + 1):
            assert (t, u) in got, f"missing heavy hitter {t}/{u} ({c}/{totals[t]})"
    # (2) tracked counts never overcount and undercount by at most the
    # total-decrement bound n/(k+1)
    for (t, u), (mg, n) in got.items():
        ex = exact.get((t, u), 0)
        assert mg <= ex
        assert ex - mg <= n / (MG_CAPACITY + 1)
        assert n == totals[t]


def test_heavy_hitters_state_survives_restart(spark, sf_dir, stream_input, tmp_path):
    """Crash the MG monitor mid-stream and resume from the checkpoint:
    the array-typed sketch state (users/counts/n) must round-trip the
    state store exactly — after the resumed drain, every group's
    processed count equals the exact batch total, so no event was lost
    to the crash or double-counted on replay."""
    from pyspark.sql.streaming import StreamingQueryException

    from iceberg_catalog_migrator_spark.streaming import heavy_hitters_stream

    ckpt = str(tmp_path / "hh_ckpt")
    crash_after = 1

    def crashing_sink(batch_df, epoch_id):
        batch_df.collect()
        if epoch_id == crash_after:
            raise RuntimeError("injected crash in heavy-hitter sink")

    q = (
        heavy_hitters_stream(events_stream(spark, stream_input))
        .writeStream.foreachBatch(crashing_sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.awaitTermination()

    emitted = []

    def sink(batch_df, epoch_id):
        emitted.extend(batch_df.collect())

    q2 = (
        heavy_hitters_stream(events_stream(spark, stream_input))
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    final_n = {}
    for r in emitted:
        final_n[r.event_type] = max(final_n.get(r.event_type, 0), r.n_processed)
    ev = load_table(spark, sf_dir, "events")
    want = {
        r.event_type: r.cnt
        for r in ev.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert final_n == want


def test_user_type_census_tws_matches_batch(spark, sf_dir, stream_input, tmp_path):
    """transformWithStateInPandas census: drained-final == batch census.

    Skips (auditably) when the TWS protobuf dependency is absent — the
    guard's error message names the exact missing package."""
    import importlib.util

    from iceberg_catalog_migrator_spark.streaming.jobs import (
        require_transform_with_state,
        user_type_census_stream,
    )

    try:
        have_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        have_protobuf = False
    if not have_protobuf:
        with pytest.raises(RuntimeError, match="protobuf"):
            require_transform_with_state(spark)
        pytest.skip("transformWithState needs the protobuf package (not installed)")

    require_transform_with_state(spark)
    st = user_type_census_stream(events_stream(spark, stream_input))
    run_stream_to_memory(st, "tws_census_mem", "update", str(tmp_path / "ckpt"))
    final = (
        spark.table("tws_census_mem")
        .groupBy("user_id")
        .agg(F.max("total_events").alias("total_events"), F.max("n_types").alias("n_types"))
    )
    batch = (
        spark.read.parquet(stream_input)
        .groupBy("user_id")
        .agg(F.count("*").alias("b_total"), F.countDistinct("event_type").alias("b_types"))
    )
    bad = final.join(batch, "user_id").filter(
        (F.col("total_events") != F.col("b_total")) | (F.col("n_types") != F.col("b_types"))
    )
    assert final.count() == batch.count()
    assert bad.count() == 0


def test_outer_interval_join_stream(spark, sf_dir, stream_input, tmp_path):
    """LEFT OUTER interval join: matched pairs equal the batch inner
    join exactly; null-extended clicks are exactly the purchase-less
    ones, complete up to the final watermark (a trailing click may
    legally still be buffered when the drain ends)."""
    from iceberg_catalog_migrator_spark.streaming.jobs import (
        click_purchase_outer_join_stream,
    )

    ev_stream = events_stream(spark, stream_input)
    st = click_purchase_outer_join_stream(ev_stream, ev_stream)
    q = run_stream_to_memory(st, "outer_join_mem", "append", str(tmp_path / "ckpt"))
    got = spark.table("outer_join_mem")

    ev = spark.read.parquet(stream_input)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id"), F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    pairs = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
    )

    # 1) matched rows == batch inner join, exactly
    got_matched = {(r.click_id, r.purchase_id) for r in got.filter(F.col("purchase_id").isNotNull()).collect()}
    want_matched = {(r.click_id, r.purchase_id) for r in pairs.collect()}
    assert got_matched == want_matched

    # 2) no false unmatched: a null row's click must have zero horizon purchases
    matched_clicks = {c for c, _ in want_matched}
    null_clicks = {r.click_id for r in got.filter(F.col("purchase_id").isNull()).collect()}
    assert null_clicks.isdisjoint(matched_clicks)

    # 3) completeness up to the final watermark the query ACTUALLY
    # reached (the last batch's events only advance it at the next
    # batch boundary, so deriving it from max(ts) overshoots): every
    # purchase-less click with click_ts + horizon < watermark must
    # have been emitted
    import datetime

    wm_str = q.lastProgress["eventTime"]["watermark"]
    watermark = datetime.datetime.fromisoformat(wm_str.replace("Z", "+00:00")).replace(
        tzinfo=None
    )
    safe_cutoff = watermark - datetime.timedelta(hours=1)  # minus horizon
    want_null = {
        r.click_id
        for r in clicks.join(
            pairs.select("click_id").distinct(), "click_id", "left_anti"
        )
        .filter(F.col("click_ts") < F.lit(safe_cutoff))
        .collect()
    }
    assert want_null <= null_clicks
