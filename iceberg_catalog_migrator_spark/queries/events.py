"""Event-stream analytics in batch form.

Each query here is the batch rendering of a streaming pattern (the live
Structured Streaming versions are in ``streaming/``): tumbling windows,
sessionization, as-of lookups, semi-structured extraction. Batch and
stream share the same column logic so the oracle validates both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dsum, dsum_expr
from ..sources import load_table
from .registry import register_query

SESSION_GAP_MIN = 30


@register_query(
    "events_hourly_by_type",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS hour, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY hour, event_type
    """,
    description="tumbling hourly window aggregation (batch form of streaming window agg)",
)
def events_hourly_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        ).agg(
            F.count("*").alias("n_events"),
            dsum("value", 4).alias("total_value"),
        )
    )


@register_query(
    "events_sessionization",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL
                       OR FLOOR(EPOCH(ts)) - FLOOR(EPOCH(prev_ts)) > {SESSION_GAP_MIN} * 60
                  THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ), sessions AS (
      SELECT user_id, ts, event_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           CAST(FLOOR(EPOCH(MAX(ts))) - FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS duration_sec
    FROM sessions
    GROUP BY user_id, session_id
    """,
    description=f"gap-based sessionization ({SESSION_GAP_MIN} min), lag + cumulative flag",
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts) > SESSION_GAP_MIN * 60),
        1,
    ).otherwise(0)
    flagged = ev.select("user_id", "ts", "event_id", new_session.alias("new_session"))
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(wrun).cast("bigint")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("bigint")
        .alias("duration_sec"),
    )


@register_query(
    "events_asof_purchase_after_click",
    oracle="""
    WITH tagged AS (
      SELECT event_id, user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS last_click_ts
      FROM events
      WHERE event_type IN ('click', 'purchase')
    )
    SELECT event_id, user_id, ts,
           CAST(FLOOR(EPOCH(ts)) - FLOOR(EPOCH(last_click_ts)) AS BIGINT) AS sec_since_click
    FROM tagged
    WHERE event_type = 'purchase'
    """,
    description="as-of join: each purchase matched to the latest prior click (Spark lacks a native as-of join; running-max window is the shuffle-minimal composition)",
)
def events_asof_purchase_after_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(w)
    return (
        ev.withColumn("last_click_ts", last_click)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            (F.unix_timestamp("ts") - F.unix_timestamp("last_click_ts"))
            .cast("bigint")
            .alias("sec_since_click"),
        )
    )


@register_query(
    "events_json_extraction",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY k_bucket
    """,
    description="semi-structured JSON extraction + aggregate over derived key",
)
def events_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select((k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"), dsum("value", 4).alias("total_value"))
    )


@register_query(
    "events_user_activity_pivot",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
           COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
           COUNT(*) FILTER (WHERE event_type = 'error') AS n_error
    FROM events
    GROUP BY user_id
    """,
    description="pivot-style conditional aggregation per user",
)
def events_user_activity_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    aggs = [
        F.count(F.when(F.col("event_type") == t, True)).alias(f"n_{t}")
        for t in ("click", "view", "purchase", "signup", "error")
    ]
    return ev.groupBy("user_id").agg(*aggs)


@register_query(
    "events_dedup_exact",
    oracle="""
    SELECT user_id, event_type, ts, MIN(event_id) AS event_id
    FROM events
    GROUP BY user_id, event_type, ts
    """,
    description="exact event dedup: keep lowest event_id per (user, type, ts)",
)
def events_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type", "ts").agg(
        F.min("event_id").alias("event_id")
    )


@register_query(
    "events_sliding_window_counts",
    oracle="""
    WITH e AS (
      SELECT event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS es FROM events
    ),
    assigned AS (
      SELECT event_type, (es - es % 900) - k * 900 AS window_start_epoch
      FROM e, LATERAL UNNEST(GENERATE_SERIES(0, 3)) AS g(k)
    )
    SELECT window_start_epoch, event_type, COUNT(*) AS n_events
    FROM assigned
    GROUP BY window_start_epoch, event_type
    """,
    description="sliding window (1h window, 15min slide): each event lands in 4 overlapping windows (batch form of streaming sliding agg)",
)
def events_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``F.window(ts, '1 hour', '15 minutes')`` — Spark replicates each
    row into its 4 overlapping epoch-aligned windows before the
    aggregation shuffle. Window starts are emitted as epoch seconds so
    the comparison is timezone-proof."""
    events = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "15 minutes")
    return (
        events.groupBy(win.alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("window_start_epoch"),
            "event_type",
            "n_events",
        )
    )


@register_query(
    "events_funnel_conversion",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events
      GROUP BY user_id
    ),
    staged AS (
      SELECT user_id,
             CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END AS viewed,
             CASE WHEN first_view IS NOT NULL AND first_click > first_view
                  THEN 1 ELSE 0 END AS clicked_after_view,
             CASE WHEN first_view IS NOT NULL AND first_click > first_view
                       AND first_purchase > first_click
                  THEN 1 ELSE 0 END AS purchased_after_click
      FROM per_user
    )
    SELECT CAST(SUM(viewed) AS BIGINT) AS n_viewed,
           CAST(SUM(clicked_after_view) AS BIGINT) AS n_clicked_after_view,
           CAST(SUM(purchased_after_click) AS BIGINT) AS n_purchased_after_click,
           ROUND(CAST(SUM(purchased_after_click) AS DOUBLE)
                 / NULLIF(SUM(viewed), 0), 6) AS view_to_purchase_rate
    FROM staged
    """,
    description="ordered conversion funnel: first view -> click after view -> purchase after click, one pass",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic ordered funnel in ONE aggregation pass: conditional-min
    timestamps per user (no self-joins — the naive 3-way join per stage
    shuffles the event table once per stage; this shuffles once total).
    NULL comparisons discard users missing a stage, matching the SQL
    three-valued logic on both engines."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    viewed = F.when(F.col("first_view").isNotNull(), 1).otherwise(0)
    clicked = F.when(
        F.col("first_view").isNotNull() & (F.col("first_click") > F.col("first_view")), 1
    ).otherwise(0)
    purchased = F.when(
        F.col("first_view").isNotNull()
        & (F.col("first_click") > F.col("first_view"))
        & (F.col("first_purchase") > F.col("first_click")),
        1,
    ).otherwise(0)
    staged = per_user.select(
        viewed.alias("viewed"),
        clicked.alias("clicked_after_view"),
        purchased.alias("purchased_after_click"),
    )
    return staged.agg(
        F.sum("viewed").cast("bigint").alias("n_viewed"),
        F.sum("clicked_after_view").cast("bigint").alias("n_clicked_after_view"),
        F.sum("purchased_after_click").cast("bigint").alias("n_purchased_after_click"),
        F.round(
            F.sum("purchased_after_click").cast("double")
            / F.nullif(F.sum("viewed"), F.lit(0)),
            6,
        ).alias("view_to_purchase_rate"),
    )


@register_query(
    "events_cdc_latest_state",
    oracle="""
    SELECT user_id, event_type, ts AS last_ts, value AS last_value FROM (
      SELECT user_id, event_type, ts, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) t WHERE rn = 1
    """,
    description="CDC compaction: latest row per (user, event_type) key by event time (upsert-materialization primitive)",
)
def events_cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture compaction: collapse an append-only event log
    to the latest state per key — the batch rendering of a streaming
    upsert sink. One shuffle on the key; the window never sorts globally
    (per-key ordering only), and event_id breaks timestamp ties so the
    winner is deterministic in both engines. At warehouse scale this is
    the standard SCD-1 materialization pattern."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("last_ts"),
            F.col("value").alias("last_value"),
        )
    )


@register_query(
    "events_retention_cohorts",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS DATE) AS week
      FROM events
    ),
    cohorts AS (
      SELECT user_id, MIN(week) AS cohort_week FROM activity GROUP BY user_id
    )
    SELECT CAST(c.cohort_week AS VARCHAR) AS cohort_week,
           CAST(DATE_DIFF('day', c.cohort_week, a.week) // 7 AS INT) AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM activity a JOIN cohorts c ON a.user_id = c.user_id
    GROUP BY 1, 2
    """,
    description="retention cohort matrix: users bucketed by first-seen week x activity-week offset (exact distinct counts)",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort/retention analysis: assign each user to their
    first-active week, then count distinct users active at each week
    offset. Activity distinct-collapses to one row per (user, week)
    before anything joins — the shuffle moves user-week pairs, never
    events — and the cohort table is user-dimension-sized, so the join
    broadcasts or co-partitions on user_id. Week truncation (Monday
    start) and day-difference // 7 are engine-identical integer ops."""
    ev = load_table(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    # first-seen week via a window over user_id: the groupBy+self-join
    # rendering computed the events-distinct subtree twice (two scans,
    # two dedup shuffles) before joining; the window shares one
    # partitioning and the scan runs once
    # the join this window replaces was INNER on user_id: drop null
    # keys to stay join-exact on any data (no-op on this fixture)
    wu = Window.partitionBy("user_id")
    return (
        activity.filter(F.col("user_id").isNotNull())
        .withColumn("cohort_week", F.min("week").over(wu))
        .select(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            (F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register_query(
    "events_pivot_type_counts",
    oracle=f"""
    SELECT user_id,
           {", ".join(
             f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
             for t in EVENT_TYPES)}
    FROM events
    GROUP BY user_id
    """,
    description="pivot (long->wide): per-user event counts fanned into one column per event type, fixed value list (the pair of unpivot_lineitem_metrics)",
)
def events_pivot_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot with an EXPLICIT value list: passing the types to
    ``pivot()`` skips the extra distinct-collection job Spark otherwise
    runs, and (the 100 TB point) keeps the output schema static instead
    of data-dependent — a schema that changes when a new event type
    appears is an incident, not a feature. One shuffle (the groupBy);
    the pivot aggregation is map-side partial like any other."""
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0, list(EVENT_TYPES))
    )
    return wide.select(
        "user_id", *[F.col(t).cast("bigint").alias(f"n_{t}") for t in EVENT_TYPES]
    )


# z-score threshold for the anomaly gate. The test is evaluated in EXACT
# integer arithmetic — z >= Z  ⟺  (c·n − S) > 0 ∧ (c·n − S)² >= Z²·(n·Q − S²)
# with S = Σc, Q = Σc² over the type's hourly counts — so the flagged
# set is engine-exact; only the reported z value touches doubles (one
# sqrt + one divide, correctly rounded in both engines).
ANOMALY_Z = 3


@register_query(
    "events_hourly_anomaly_zscore",
    oracle=f"""
    WITH hc AS (
      SELECT event_type, DATE_TRUNC('hour', ts) AS hour,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    st AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS s, CAST(SUM(c * c) AS BIGINT) AS q
      FROM hc GROUP BY event_type
    )
    SELECT hc.event_type, hc.hour, hc.c AS n_events,
           ROUND(CAST(hc.c * st.n - st.s AS DOUBLE)
                 / SQRT(CAST(st.n * st.q - st.s * st.s AS DOUBLE)), 6) AS zscore
    FROM hc JOIN st USING (event_type)
    WHERE hc.c * st.n - st.s > 0
      AND (hc.c * st.n - st.s) * (hc.c * st.n - st.s)
          >= {ANOMALY_Z * ANOMALY_Z} * (st.n * st.q - st.s * st.s)
    """,
    description=(
        f"time-series anomaly gate: hours whose event count sits >= {ANOMALY_Z} sigma "
        "above the type's mean, decided in exact integer arithmetic"
    ),
)
def events_hourly_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type hourly volume anomalies. The z >= Z test is cross-
    multiplied into integers (counts and their squares), so membership
    never depends on float summation order; the cosmetic z column is a
    single sqrt+divide on exact-in-double integers.

    Scale shape: one keyed shuffle builds the (type, hour) counts; the
    per-type moment table is a handful of rows and broadcasts back —
    raw events are never shuffled twice, and nothing iterates. At
    100 TB the c·n and n·Q products outgrow int64 for very hot types;
    the same plan carries decimal(38,0) columns there."""
    ev = load_table(spark, sf_dir, "events")
    hc = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").cast("bigint").alias("c"))
    return hourly_anomaly_gate(hc)


def hourly_anomaly_gate(hc: DataFrame) -> DataFrame:
    """The shared alert gate over an (event_type, hour, c) count table —
    used by the batch query above and the streaming monitor
    (``streaming.jobs.hourly_anomaly_stream``), so both surfaces flag
    the identical hour set."""
    st = hc.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("q"),
    )
    j = hc.join(F.broadcast(st), "event_type")
    num = F.col("c") * F.col("n") - F.col("s")
    var_n2 = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    return (
        j.filter((num > 0) & (num * num >= ANOMALY_Z * ANOMALY_Z * var_n2))
        .select(
            "event_type",
            "hour",
            F.col("c").alias("n_events"),
            F.round(num.cast("double") / F.sqrt(var_n2.cast("double")), 6).alias("zscore"),
        )
    )


@register_query(
    "events_hourly_gap_fill",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, DATE_TRUNC('hour', ts) AS hour,
             COUNT(*) AS n, {dsum_expr('value')} AS v
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1
      FROM hourly GROUP BY event_type
    ),
    spine AS (
      SELECT event_type,
             UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      FROM bounds
    )
    SELECT s.event_type, s.hour,
           CAST(COALESCE(h.n, 0) AS BIGINT) AS n_events,
           LAST_VALUE(h.v IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_known_value
    FROM spine s LEFT JOIN hourly h
      ON s.event_type = h.event_type AND s.hour = h.hour
    """,
    description="time-series gap filling: dense hourly spine per type, zero-filled counts, forward-filled last value",
)
def events_hourly_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling, the step every downstream time-series consumer
    (anomaly gates, forecasting features) needs before window math: a
    missing hour must read as zero volume, not as a skipped row. The
    spine is generated per type from that type's own [min, max] hour
    bounds (sequence + explode — pure expressions over the already
    aggregated hourly table, never over raw events), and the forward
    fill is last-ignore-nulls over the type-keyed window."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("n"), dsum("value", 4).alias("v"))
    bounds = hourly.groupBy("event_type").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return spine.join(hourly, ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
        F.last("v", ignorenulls=True).over(w).alias("last_known_value"),
    )


@register_query(
    "events_rolling_7d_active_users",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT DATE_TRUNC('day', ts) AS day, user_id FROM events
    ),
    spine AS (SELECT DISTINCT day FROM daily)
    SELECT s.day,
           CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS wau_7d,
           CAST(COUNT(DISTINCT CASE WHEN d.day = s.day THEN d.user_id END) AS BIGINT)
             AS dau
    FROM spine s
    JOIN daily d
      ON d.day <= s.day AND d.day >= s.day - INTERVAL 6 DAY
    GROUP BY s.day
    """,
    description="rolling 7-day distinct active users per day (windowed COUNT DISTINCT via bounded spine range-join)",
)
def events_rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling DAU/WAU — the one windowed aggregate Spark's window
    functions cannot express (COUNT DISTINCT over a moving frame is
    unsupported). The scalable composition: dedup to (day, user) pairs
    first (bounds everything downstream at |days| x |users|), broadcast
    the day spine, and let each pair fan out to at most 7 spine days
    before the distinct count. Raw events are never range-joined."""
    ev = load_table(spark, sf_dir, "events")
    # NOTE(r16): the spine's second pass over events is day-pruned and
    # cheap; pinning daily was measured slower than the recompute, so
    # the two-subtree shape stays (guide §5 caching caveat)
    daily = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    spine = daily.select(F.col("day").alias("s_day")).distinct()
    joined = daily.join(
        F.broadcast(spine),
        (F.col("day") <= F.col("s_day"))
        & (F.col("day") >= F.col("s_day") - F.expr("INTERVAL 6 DAY")),
    )
    return joined.groupBy(F.col("s_day").alias("day")).agg(
        F.countDistinct("user_id").cast("bigint").alias("wau_7d"),
        F.countDistinct(
            F.when(F.col("day") == F.col("s_day"), F.col("user_id"))
        )
        .cast("bigint")
        .alias("dau"),
    )


SLO_ERROR_BP = 2500  # breach when >25% of an hour's events are errors


@register_query(
    "events_error_rate_slo",
    oracle=f"""
    SELECT DATE_TRUNC('hour', ts) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_errors,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') * 10000 // COUNT(*)
                AS BIGINT) AS error_bp,
           CAST(CASE WHEN COUNT(*) FILTER (WHERE event_type = 'error') * 10000
                          > {SLO_ERROR_BP} * COUNT(*)
                THEN 1 ELSE 0 END AS INT) AS slo_breach
    FROM events
    GROUP BY hour
    """,
    description=f"reliability SLI: hourly error-rate basis points with an exact-integer {SLO_ERROR_BP}bp breach gate",
)
def events_error_rate_slo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SLO burn gate every event pipeline runs: one conditional
    aggregate per hour, breach decided by cross-multiplication so no
    float ratio ever reaches the comparison."""
    ev = load_table(spark, sf_dir, "events")
    n_err = F.count(F.when(F.col("event_type") == "error", True))
    return ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").cast("bigint").alias("n_events"),
        n_err.cast("bigint").alias("n_errors"),
        F.expr(
            "CAST(count(CASE WHEN event_type = 'error' THEN TRUE END) * 10000"
            " div count(*) AS BIGINT)"
        ).alias("error_bp"),
        F.when(n_err * 10000 > SLO_ERROR_BP * F.count("*"), 1)
        .otherwise(0)
        .cast("int")
        .alias("slo_breach"),
    )


@register_query(
    "events_variant_props_stats",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    description="semi-structured props via Spark 4 VARIANT (parse_json + typed variant_get) with per-type stats",
)
def events_variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed stats over the JSON ``props`` column through the VARIANT type.

    Unlike :func:`events_json_extraction` (per-row string pathing via
    ``get_json_object``), this parses each payload once into Spark 4's
    binary VARIANT encoding and extracts with ``try_variant_get`` — the
    engine path a lakehouse uses for shredded semi-structured columns,
    where repeated field access costs a binary offset lookup instead of
    a re-parse. At 100 TB the parse happens in the scan's projection
    (one pass, whole-stage codegen); the aggregate is an ordinary
    map-side-combined groupBy on the low-cardinality event_type key."""
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


ATTRIB_HORIZON_MIN = 60


@register_query(
    "events_attribution_multitouch",
    oracle=f"""
    WITH clicks AS (
      SELECT event_id AS click_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT event_id AS purchase_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT p.purchase_id, p.user_id, c.click_id,
             ROW_NUMBER() OVER (PARTITION BY p.purchase_id ORDER BY c.ts, c.click_id) AS rn_first,
             ROW_NUMBER() OVER (PARTITION BY p.purchase_id ORDER BY c.ts DESC, c.click_id DESC) AS rn_last
      FROM purchases p JOIN clicks c
        ON c.user_id = p.user_id
       AND c.ts <= p.ts
       AND c.ts > p.ts - INTERVAL {ATTRIB_HORIZON_MIN} MINUTE
    )
    SELECT purchase_id, user_id,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(MAX(CASE WHEN rn_first = 1 THEN click_id END) AS BIGINT) AS first_click_id,
           CAST(MAX(CASE WHEN rn_last = 1 THEN click_id END) AS BIGINT) AS last_click_id
    FROM touches
    GROUP BY purchase_id, user_id
    """,
    description=f"multi-touch attribution: per purchase, the click touchpoints within {ATTRIB_HORIZON_MIN} minutes — touch count + deterministic first/last-touch credit",
)
def events_attribution_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-attribution primitive over the events stream.

    Same interval-join shape as :func:`events_asof_purchase_after_click`
    (shuffle both sides on user_id, in-partition time-range filter — at
    100 TB the horizon bounds pair fan-out), then one purchase-keyed
    window pass ranks touches from both ends; (ts, event_id) tiebreaks
    make first/last credit engine-identical."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    pairs = purchases.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr(f"INTERVAL {ATTRIB_HORIZON_MIN} MINUTES")),
    )
    w_first = Window.partitionBy("purchase_id").orderBy(F.asc("c_ts"), F.asc("click_id"))
    w_last = Window.partitionBy("purchase_id").orderBy(F.desc("c_ts"), F.desc("click_id"))
    ranked = pairs.select(
        "purchase_id",
        "user_id",
        "click_id",
        F.row_number().over(w_first).alias("rn_first"),
        F.row_number().over(w_last).alias("rn_last"),
    )
    return ranked.groupBy("purchase_id", "user_id").agg(
        F.count("*").cast("bigint").alias("n_touches"),
        F.max(F.when(F.col("rn_first") == 1, F.col("click_id"))).cast("bigint").alias("first_click_id"),
        F.max(F.when(F.col("rn_last") == 1, F.col("click_id"))).cast("bigint").alias("last_click_id"),
    )


EWMA_WINDOW_H = 16  # dyadic decay: weight 2^(15-k) for lag k in [0, 16)


@register_query(
    "events_hourly_ewma",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, DATE_TRUNC('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    offs AS (SELECT range AS k FROM range({EWMA_WINDOW_H})),
    contrib AS (
      SELECT b.event_type, b.h + to_hours(o.k) AS hour,
             b.n * (1 << ({EWMA_WINDOW_H} - 1 - o.k)) AS w
      FROM hourly b CROSS JOIN offs o
    )
    SELECT a.event_type, a.h AS hour,
           CAST(a.n AS BIGINT) AS n_events,
           CAST(SUM(c.w) AS BIGINT) AS ewma_w32768
    FROM hourly a JOIN contrib c ON c.event_type = a.event_type AND c.hour = a.h
    GROUP BY 1, 2, 3
    """,
    description=f"integer-exact EWMA: dyadic-decay ({EWMA_WINDOW_H}h half-life-1) trailing volume per event type, no float accumulation",
)
def events_hourly_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted trailing volume with dyadic integer
    weights (2^(15-k) for lag k) — the smoothing primitive behind
    alerting baselines, with zero float accumulation so every engine
    agrees bit-for-bit.

    Window functions can't weight by row offset, so each hourly count
    EXPANDS into its {16} forward anchor contributions via a broadcast
    offset spine (bounded 16x fan-out of the hour-grain aggregate, not
    of raw events), then one (type, hour) regroup; anchors are the
    observed hours, joined back co-partitioned."""
    ev = load_table(spark, sf_dir, "events")
    # hourly feeds the contribution fan-out AND the anchor side of the
    # final join; pin the (type x hour)-sized aggregate once instead of
    # scanning + aggregating the events twice
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n")).localCheckpoint()
    # weights precomputed into the VALUES spine (shiftleft needs a
    # literal bit count, and a 16-row literal beats a range+compute)
    offs = spark.sql(
        "SELECT k, CAST(w AS BIGINT) AS wt FROM VALUES "
        + ", ".join(
            f"({k}, {1 << (EWMA_WINDOW_H - 1 - k)})" for k in range(EWMA_WINDOW_H)
        )
        + " AS t(k, w)"
    )
    contrib = (
        hourly.crossJoin(F.broadcast(offs))
        .select(
            "event_type",
            (F.col("h") + F.make_interval(hours=F.col("k").cast("int"))).alias("hour"),
            (F.col("n") * F.col("wt")).alias("w"),
        )
        .groupBy("event_type", "hour")
        .agg(F.sum("w").cast("bigint").alias("ewma_w32768"))
    )
    anchors = hourly.select(
        F.col("event_type").alias("a_type"),
        F.col("h").alias("a_hour"),
        F.col("n").cast("bigint").alias("n_events"),
    )
    return anchors.join(
        contrib,
        (F.col("a_type") == contrib.event_type) & (F.col("a_hour") == contrib.hour),
    ).select(
        F.col("a_type").alias("event_type"),
        F.col("a_hour").alias("hour"),
        "n_events",
        "ewma_w32768",
    )
