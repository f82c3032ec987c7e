"""Pins the columnar planner's memory bound: planning a selective
predicate over a 50k-file snapshot must peak an order of magnitude
under the dict path (json.load + per-file loop). The 10^6-file run
lives in scripts/scale_plan_index.py (recorded in SCALE.local.json:
712.9 MB dict vs 0.5 MB columnar)."""

import sys


def test_columnar_plan_memory_order_of_magnitude_under_dict(tmp_path):
    sys.path.insert(0, "scripts")
    from scale_plan_index import build_table, columnar_plan, dict_plan

    n = 50_000
    root = str(tmp_path / "bigplan")
    build_table(root, n)
    lo, hi = (n // 2) * 100, (n // 2) * 100 + 250
    kept_c, col_mb = columnar_plan(root, lo, hi)
    kept_d, dict_mb = dict_plan(root, lo, hi)
    assert sorted(kept_c) == sorted(kept_d)
    assert len(kept_c) == 3
    assert col_mb * 10 < dict_mb, (col_mb, dict_mb)
