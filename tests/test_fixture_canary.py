"""Fixture-drift canary: the r4 incident was the driver regenerating
/root/testdata with a changed events.ts physical type, silently breaking
12 queries mid-round. This canary makes any future regeneration fail
HERE first, with a message naming the drift, instead of as a scatter of
AnalysisExceptions. Names must match exactly; types are checked by
category (numeric/string/timestamp/array) so benign physical changes
(int32->int64, micros<->nanos) pass."""

import pytest
from pyspark.sql import types as T

from iceberg_catalog_migrator_spark.sources import TABLES, load_table

SF = "/root/testdata/sf0.001"

EXPECTED = {
    "region": {"r_regionkey": "num", "r_name": "str"},
    "nation": {"n_nationkey": "num", "n_name": "str", "n_regionkey": "num"},
    "customer": {
        "c_custkey": "num",
        "c_name": "str",
        "c_nationkey": "num",
        "c_acctbal": "num",
        "c_mktsegment": "str",
    },
    "supplier": {"s_suppkey": "num", "s_name": "str", "s_nationkey": "num"},
    "part": {
        "p_partkey": "num",
        "p_name": "str",
        "p_brand": "str",
        "p_type": "str",
        "p_size": "num",
        "p_retailprice": "num",
    },
    "orders": {
        "o_orderkey": "num",
        "o_custkey": "num",
        "o_orderstatus": "str",
        "o_totalprice": "num",
        "o_orderdate": "ts",
        "o_orderpriority": "str",
    },
    "lineitem": {
        "l_orderkey": "num",
        "l_partkey": "num",
        "l_suppkey": "num",
        "l_quantity": "num",
        "l_extendedprice": "num",
        "l_discount": "num",
        "l_shipdate": "ts",
        "l_returnflag": "str",
        "l_linestatus": "str",
    },
    "events": {
        "event_id": "num",
        "ts": "ts",
        "user_id": "num",
        "event_type": "str",
        "value": "num",
        "props": "str",
    },
    "documents": {
        "doc_id": "num",
        "text": "str",
        "lang": "str",
        "source": "str",
        "n_chars": "num",
    },
    "embeddings": {"vec_id": "num", "embedding": "arr", "label": "num"},
}


def _category(dt: T.DataType) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                       T.FloatType, T.DoubleType, T.DecimalType)):
        return "num"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "ts"
    if isinstance(dt, T.ArrayType):
        return "arr"
    return type(dt).__name__


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_schema_matches_contract(spark, table):
    assert table in TABLES
    schema = {f.name: f.dataType for f in load_table(spark, SF, table).schema}
    for col, want in EXPECTED[table].items():
        assert col in schema, f"{table}.{col} missing — fixture regenerated?"
        got = _category(schema[col])
        assert got == want, f"{table}.{col} drifted: expected {want}, got {schema[col]}"
