"""Shared plumbing for the scale-growth harnesses (dedup/relational/
streaming): each measures one family and MERGES its report under its
own key of SCALE.local.json, so the others' datapoints survive."""

from __future__ import annotations

import json
import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_PATH = os.path.join(REPO_ROOT, "SCALE.local.json")
BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def warm_sf_dir() -> str:
    """The tiny fixture used to warm codegen/JVM before timing: the
    sibling sf0.001 of the measured base dir when it exists (the
    driver's standard layout), else the base dir itself — never a
    hardcoded path that breaks under SPARK_GRAFT_SF_DIR overrides."""
    sibling = os.path.join(os.path.dirname(BASE_SF_DIR.rstrip("/")), "sf0.001")
    return sibling if os.path.isdir(sibling) else BASE_SF_DIR


def merge_scale_report(key: str, report: dict) -> None:
    """Write ``report`` under ``key`` in SCALE.local.json, preserving
    every other harness's keys."""
    existing: dict = {}
    if os.path.exists(OUT_PATH):
        try:
            with open(OUT_PATH) as f:
                existing = json.load(f)
        except (OSError, ValueError):
            existing = {}
    existing[key] = report
    with open(OUT_PATH, "w") as f:
        json.dump(existing, f, indent=1, sort_keys=True)
        f.write("\n")
