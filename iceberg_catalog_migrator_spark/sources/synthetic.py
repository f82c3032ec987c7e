"""Deterministic synthetic-events connector via Spark 4's Python Data
Source API (batch + streaming).

Why a generator source belongs in the engine: scale testing and
load-shedding drills need N× data *without* materializing N× parquet.
Every row here is a pure function of its global row index, so

- the batch reader is **partition-parallel with zero input**: each of
  the ``partitions`` splits generates its contiguous index range as
  Arrow RecordBatches (the Data Source API's vectorized path — tuples
  would cross the Python boundary row-at-a-time);
- a DuckDB oracle can replay the identical rows from ``range(n)``,
  which makes queries over this source fully value-checkable — the
  same cross-engine contract every parquet-backed query in the repo
  honors;
- the streaming reader exposes the same rows behind real offset
  bookkeeping (``initialOffset`` / ``latestOffset`` advancing by
  ``batch_rows`` per micro-batch, ``commit`` a no-op because the data
  is re-derivable from the offset alone — the idempotent-replay
  property checkpoint recovery needs).

At 100 TB-scale clusters the batch source fans out to any number of
splits (``partitions`` option); no driver-side data ever materializes.

Row scheme (index ``i``, all arithmetic exact int):
  event_id = i
  ts       = 2024-01-01 00:00:00 + (i * 37 mod 86400) seconds
  user_id  = i mod n_users            (default 997, prime -> even mix)
  event_type = TYPES[i mod 5]
  value    = (i * 31 mod 1000) / 10   (one-decimal double, exact)
  props    = '{"k": <i mod 100>}'
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

import pyarrow as pa

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql import SparkSession

SYNTH_SOURCE_NAME = "synthetic_events"
SYNTH_TYPES = ("click", "view", "purchase", "signup", "error")
SYNTH_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double, props string"
)
_EPOCH_US = int(
    datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp() * 1_000_000
)
_TS_SPREAD_SEC = 86_400
_TS_STRIDE = 37

_DEFAULTS = {"rows": "120000", "partitions": "8", "n_users": "997", "batch_rows": "20000"}


def _opt(options, key: str) -> int:
    return int(options.get(key, _DEFAULTS[key]))


def _event_batch(lo: int, hi: int, n_users: int) -> pa.RecordBatch:
    """Rows [lo, hi) as one Arrow batch — pure function of the range.

    Vectorized end-to-end (numpy index arithmetic, dictionary-encoded
    types, prebuilt props strings): generation must never be the
    bottleneck of the source it exists to stress."""
    import numpy as np

    ids = np.arange(lo, hi, dtype=np.int64)
    ts = _EPOCH_US + (ids * _TS_STRIDE % _TS_SPREAD_SEC) * 1_000_000
    props_table = np.array([json.dumps({"k": k}) for k in range(100)])
    types_table = np.array(SYNTH_TYPES)
    return pa.record_batch(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(ids % n_users, pa.int64()),
            "event_type": pa.array(types_table[ids % 5]),
            "value": pa.array((ids * 31 % 1000) / 10.0, pa.float64()),
            "props": pa.array(props_table[ids % 100]),
        }
    )


class _SyntheticBatchReader(DataSourceReader):
    def __init__(self, options):
        self.rows = _opt(options, "rows")
        self.splits = max(1, _opt(options, "partitions"))
        self.n_users = _opt(options, "n_users")

    def partitions(self):
        return [InputPartition(i) for i in range(self.splits)]

    def read(self, partition):
        i = partition.value
        lo = self.rows * i // self.splits
        hi = self.rows * (i + 1) // self.splits
        if hi > lo:
            yield _event_batch(lo, hi, self.n_users)


class _SyntheticStreamReader(DataSourceStreamReader):
    """Offset = global row index; each micro-batch covers ``batch_rows``.

    ``latestOffset`` advances monotonically from the last *returned*
    offset (not the committed one), capping at ``rows`` — under the
    default trigger each poll admits one more step until the source is
    exhausted. Caveat: ``availableNow`` snapshots ``latestOffset`` once
    at start, so it drains exactly ONE step; use the default trigger (or
    ``batch_rows >= rows``) to drain everything.

    Checkpoint restart: a fresh reader instance restarts ``_pos`` at 0
    while Spark resumes from the CHECKPOINTED offset — and the engine
    trusts whatever ``latestOffset`` returns, so a stale low value
    would make it re-plan (and re-emit) already-committed ranges.
    ``partitions``/``commit`` therefore resync ``_pos`` to the
    engine-provided offsets (the replayed batch's bounds are the
    durable high-water mark); emission resumes forward with no
    external offset storage and no duplicate rows — pinned by the
    crash-restart test in ``tests/test_synthetic_source.py``."""

    def __init__(self, options):
        self.rows = _opt(options, "rows")
        self.step = max(1, _opt(options, "batch_rows"))
        self.n_users = _opt(options, "n_users")
        self._pos = 0

    def initialOffset(self):
        return {"pos": 0}

    def latestOffset(self):
        self._pos = min(self.rows, self._pos + self.step)
        return {"pos": self._pos}

    def partitions(self, start, end):
        lo, hi = int(start["pos"]), int(end["pos"])
        # restart resync: the engine plans from its durable offsets;
        # never let the session-local position fall behind them
        self._pos = max(self._pos, lo, hi)
        return [InputPartition((lo, hi))]

    def read(self, partition):
        lo, hi = partition.value
        if hi > lo:
            yield _event_batch(lo, hi, self.n_users)

    def commit(self, end):
        # rows re-derive from the offset range, so there is nothing to
        # ack — but keep the high-water mark in sync (see partitions)
        self._pos = max(self._pos, int(end["pos"]))


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return SYNTH_SOURCE_NAME

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def reader(self, schema):
        return _SyntheticBatchReader(self.options)

    def streamReader(self, schema):
        return _SyntheticStreamReader(self.options)


def register_synthetic_source(spark: SparkSession) -> None:
    """Idempotent per-session registration of the connector."""
    spark.dataSource.register(SyntheticEventsDataSource)


def synthetic_oracle_cte(rows: int, n_users: int) -> str:
    """DuckDB CTE ``ev`` replaying the generator from ``range(rows)``—
    keep in lockstep with :func:`_event_batch`."""
    types_case = " ".join(
        f"WHEN {k} THEN '{t}'" for k, t in enumerate(SYNTH_TYPES)
    )
    return f"""
    ev AS (
      SELECT i AS event_id,
             TIMESTAMP '2024-01-01 00:00:00'
               + to_seconds(i * {_TS_STRIDE} % {_TS_SPREAD_SEC}) AS ts,
             i % {n_users} AS user_id,
             CASE i % 5 {types_case} END AS event_type,
             CAST(i * 31 % 1000 AS DOUBLE) / 10.0 AS value,
             '{{"k": ' || CAST(i % 100 AS VARCHAR) || '}}' AS props
      FROM (SELECT range AS i FROM range({rows}))
    )"""
