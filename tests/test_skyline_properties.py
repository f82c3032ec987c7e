"""Skyline sweep kernel vs brute-force dominance on random inputs.

The distributed operator is only as correct as (a) the per-partition
sweep and (b) skyline-of-skylines closure; both are checked here
without a Spark session (pure pandas kernel), so hypothesis can afford
hundreds of cases.
"""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_catalog_migrator_spark.queries.extras import _skyline_sweep


def brute_skyline(rows):
    """O(n^2) reference: keep rows no other row dominates."""
    out = []
    for i, (p, s) in enumerate(rows):
        dominated = any(
            (p2 <= p and s2 >= s and (p2 < p or s2 > s)) for p2, s2 in rows
        )
        if not dominated:
            out.append((p, s))
    return sorted(out)


def sweep(rows):
    pdf = pd.DataFrame(
        {
            "p_partkey": range(len(rows)),
            "p_retailprice": [float(p) for p, _ in rows],
            "p_size": [s for _, s in rows],
        }
    )
    got = list(_skyline_sweep(iter([pdf])))
    if not got:
        return []
    res = pd.concat(got)
    return sorted(zip(res["p_retailprice"], res["p_size"]))


points = st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 20)), min_size=0, max_size=40
)


@settings(max_examples=300, deadline=None)
@given(points)
def test_sweep_matches_bruteforce(rows):
    assert sweep(rows) == brute_skyline(rows)


@settings(max_examples=150, deadline=None)
@given(points, st.integers(1, 5))
def test_skyline_of_skylines_closure(rows, n_parts):
    # two-phase = global: sweeping each chunk then sweeping the union of
    # survivors must equal the one-shot skyline
    chunks = [rows[i::n_parts] for i in range(n_parts)]
    survivors = []
    for c in chunks:
        survivors.extend(sweep(c))
    assert sweep(survivors) == brute_skyline(rows)
