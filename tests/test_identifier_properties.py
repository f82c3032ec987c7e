"""Property-based identifier tests (hypothesis).

The reference pins odd-name handling with a handful of examples
(``ProcessIdentifiersTest.java:74-94``); these properties pin the whole
input space: parse/str round-trips, csv selection is trim+dedup with
first-seen order, and regex filtering is full-match.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_catalog_migrator_spark.catalog.identifiers import (
    TableIdentifier,
    compile_full_match,
    identifiers_from_csv,
)

# names as the reference tolerates them: anything non-empty without the
# separator dot; may contain spaces, %, digits (e.g. "abc 123", "xyz%n123")
name_st = st.text(
    alphabet=st.characters(blacklist_characters=".,\n", blacklist_categories=("Cs",)),
    min_size=1,
).filter(lambda s: s.strip() == s and s.strip() != "")

identifier_st = st.builds(
    lambda parts: TableIdentifier.of(*parts),
    st.lists(name_st, min_size=1, max_size=4),
)


@settings(max_examples=200, deadline=None)
@given(identifier_st)
def test_parse_str_roundtrip(tid):
    assert TableIdentifier.parse(str(tid)) == tid


@settings(max_examples=100, deadline=None)
@given(st.lists(identifier_st, min_size=1, max_size=10))
def test_csv_selection_dedup_preserves_first_seen_order(ids):
    csv = ",".join(str(i) for i in ids)
    got = identifiers_from_csv(csv)
    assert got == list(dict.fromkeys(ids))


@settings(max_examples=100, deadline=None)
@given(identifier_st)
def test_regex_is_full_match_not_find(tid):
    # a pattern matching a strict substring of the identifier must NOT
    # select it (reference uses Matcher.matches, not find)
    s = str(tid)
    if len(s) < 2:
        return
    import re

    sub = re.escape(s[:-1])
    pred = compile_full_match(sub)
    assert not pred(tid) or s[:-1] == s
    assert compile_full_match(re.escape(s))(tid)
