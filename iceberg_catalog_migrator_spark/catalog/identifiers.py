"""Table identifiers and the three identifier-selection sources.

Parity targets (behavior, not code):
- dotted-string parsing tolerant of odd names
  (reference ``cli/.../IdentifierOptions.java:68-84``, tested by
  ``cli/src/test/.../ProcessIdentifiersTest.java:74-84``)
- comma-list / newline-file / regex selection, trim + drop-blank + dedup
  with first-seen order preserved
  (``IdentifierOptions.java:70-98``, dup semantics
  ``ProcessIdentifiersTest.java:85-94``)
- regex is FULL-match over the dotted identifier
  (``api/.../CatalogMigrator.java:99-111``); when the filter runs in a
  DataFrame ``rlike`` (find semantics) it must be anchored ``^(?:...)$``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True, order=True)
class TableIdentifier:
    """namespace levels + table name; str() is the dotted form."""

    namespace: tuple[str, ...]
    name: str

    @classmethod
    def parse(cls, s: str) -> "TableIdentifier":
        parts = s.split(".")
        return cls(namespace=tuple(parts[:-1]), name=parts[-1])

    @classmethod
    def of(cls, *parts: str) -> "TableIdentifier":
        return cls(namespace=tuple(parts[:-1]), name=parts[-1])

    def __str__(self) -> str:
        return ".".join((*self.namespace, self.name))


def _dedup_preserving_order(ids: list[TableIdentifier]) -> list[TableIdentifier]:
    return list(dict.fromkeys(ids))


def identifiers_from_csv(value: str) -> list[TableIdentifier]:
    """Comma-separated identifier list → parsed, trimmed, deduped."""
    items = [s.strip() for s in value.split(",")]
    return _dedup_preserving_order([TableIdentifier.parse(s) for s in items if s])


def identifiers_from_file(path: str, spark=None) -> list[TableIdentifier]:
    """Line-delimited identifier file → trimmed, blanks dropped, deduped.

    When a SparkSession is given the file is read through
    ``spark.read.text`` (so the same code path works for a distributed
    filesystem); identifier lists are metadata-sized, so ordering is
    restored driver-side to keep first-seen order.
    """
    if spark is not None:
        rows = spark.read.text(path).collect()
        lines = [r.value for r in rows]
    else:
        with open(path, encoding="utf-8") as f:
            lines = f.read().splitlines()
    items = [ln.strip() for ln in lines]
    return _dedup_preserving_order([TableIdentifier.parse(s) for s in items if s])


def compile_full_match(pattern: str | None):
    """Predicate factory with the reference's full-match semantics.

    Returns a function ``TableIdentifier -> bool``; ``None`` pattern
    matches everything (fast path, no regex engine involved).
    """
    if pattern is None:
        return lambda _id: True
    compiled = re.compile(pattern)
    return lambda tid: compiled.fullmatch(str(tid)) is not None


def anchored(pattern: str) -> str:
    """Anchor a pattern for Spark ``rlike`` (find) ≡ full-match parity."""
    return f"^(?:{pattern})$"
