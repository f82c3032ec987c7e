"""Fast in-repo replica of the driver's duckdb-oracle gate.

`scripts/check_correctness.py` runs every query at sf0.01; this test
runs a representative sample at sf0.001 so `pytest tests/` alone
catches oracle drift (wrong aliases, nondeterministic aggregation,
engine/oracle divergence) without the full gate's runtime. One query
per operator family; the driver still checks all of them per round.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from iceberg_catalog_migrator_spark.queries import all_queries
from iceberg_catalog_migrator_spark.sources import TABLES

SAMPLE = [
    "q1_pricing_summary",          # decimal-sum aggregation
    "q8_market_share",             # multi-join share-of-total
    "q21_blocking_suppliers",      # windows + double-correlated shape
    "outer_join_nation_order_counts",
    "exceptall_priority_orders",   # set ops
    "grouping_sets_revenue",       # SQL front-end grouping sets
    "window_top3_parts_per_brand",
    "events_sessionization",
    "dedup_minhash_lsh_candidates",
    "dedup_embedding_cosine",      # applyInPandas kernel
    "text_fingerprint",
    "percentile_acctbal_by_nation",
    # round-5 families
    "similarity_ivf_topk",         # fitted k-means quantizer, both engines
    "dedup_sketch_containment_candidates",  # bottom-k inverted-index probe
    "multimodal_bmp_decode_stats", # real binary decoder round-trip
    "events_pivot_type_counts",    # pivot with explicit value list
    # round-6 families
    "dedup_semdedup_keep_one",     # SemDeDup greedy keep-one on fitted cells
    "chunk_documents_sliding",     # sliding-window LM chunker
    "multimodal_phash_groups",     # dHash census over real PPM decode
    # Spark-4-native surfaces
    "graph_reachability_recursive",  # WITH RECURSIVE / UnionLoopExec
    "events_variant_props_stats",    # VARIANT parse_json + variant_get
    # round-5 continuation families
    "snapshot_changelog_orders",     # refs/changelog over snapshot tables
    "sql_pipe_syntax_priority_stats",  # |> pipe-operator SQL front-end
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    qd = all_queries()[name]
    assert qd.oracle is not None, f"{name} has no oracle"
    got = _normalize(qd.fn(spark, sf_dir).toPandas())
    want = _normalize(duck.sql(qd.oracle).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"rowcount {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
