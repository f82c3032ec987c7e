"""BPE tokenizer properties: fold-greedy ≡ scan-greedy, encode
round-trip, the DuckDB unrolled-SQL oracle vs an independent
pure-Python reference trainer, and the Spark trainer vs the same
reference. The reference implementation here is written against
Sennrich's algorithm statement, NOT the module under test — two
independent derivations must agree."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_catalog_migrator_spark.operators.bpe import (
    EOW,
    BpeMerge,
    BpeTrainingError,
    apply_merges_to_word,
    bpe_oracle_with,
    encode_words,
    fold_merge_pass,
    train_bpe,
    word_frequencies,
)

# ---------------------------------------------------------- reference


def ref_train(word_freqs: dict[str, int], n_merges: int):
    """Independent sequential BPE trainer (Sennrich get_stats/merge)."""
    segs = {w: tuple(list(w) + [EOW]) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            s = segs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, cnt))
        for w in segs:
            s, out, i = segs[w], [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = tuple(out)
    return merges, segs


words_st = st.text(alphabet="ab0", min_size=1, max_size=8)
corpus_st = st.lists(words_st, min_size=1, max_size=12)


# ------------------------------------------------- kernel properties


@given(
    syms=st.lists(st.sampled_from(["a", "b", "ab", "ba", "aa", EOW]), min_size=1, max_size=12),
    left=st.sampled_from(["a", "b", "ab", "aa"]),
    right=st.sampled_from(["a", "b", "ba", EOW]),
)
def test_fold_equals_scan_greedy(syms, left, right):
    """The fold-accumulator pass (what Spark aggregate and DuckDB
    list_reduce execute) must equal the scan-greedy pass (what the
    encoder and the reference trainer execute)."""
    out, i, n = [], 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    assert fold_merge_pass(syms, left, right) == out


@given(word=words_st, corpus=corpus_st)
@settings(max_examples=50)
def test_encode_round_trip(word, corpus):
    """Tokens always concatenate back to word + EOW, whatever merge
    list a corpus produces."""
    wf: dict[str, int] = {}
    for w in corpus:
        wf[w] = wf.get(w, 0) + 1
    merges = [(m[0], m[1]) for m in ref_train(wf, 8)[0]]
    toks = apply_merges_to_word(word, merges)
    assert "".join(toks) == word + EOW
    assert all(t for t in toks)


@given(corpus=corpus_st)
@settings(max_examples=40)
def test_rank_order_encode_reproduces_training_state(corpus):
    """For in-corpus words, rank-order encoding == the trainer's final
    incremental segmentation (the contract the oracle queries rely on)."""
    wf: dict[str, int] = {}
    for w in corpus:
        wf[w] = wf.get(w, 0) + 1
    merges, segs = ref_train(wf, 10)
    pairs = [(m[0], m[1]) for m in merges]
    for w in wf:
        assert tuple(apply_merges_to_word(w, pairs)) == segs[w]


# --------------------------------------------- oracle SQL vs reference


@given(corpus=corpus_st)
@settings(max_examples=25, deadline=None)
def test_duckdb_unrolled_oracle_matches_reference(corpus):
    """The generated unrolled-SQL replay IS a second trainer; it must
    agree with the sequential reference on arbitrary corpora."""
    n = 6
    con = duckdb.connect()
    rows = "\nUNION ALL\n".join(
        f"SELECT {k} AS rank, l AS left, r AS right, cnt AS pair_count FROM b{k}"
        for k in range(1, n + 1)
    )
    corpus_sql = "SELECT UNNEST(?) AS w"  # placeholder not usable in CTE; inline
    vals = ",".join("'" + w + "'" for w in corpus)
    sql = (
        bpe_oracle_with(n).replace(
            "LOWER(text)", "text"  # not used: corpus comes from VALUES below
        )
    )
    # swap the documents-based corpus for the generated one
    import re

    sql = re.sub(
        r"FROM \(\n.*?WHERE u\.w <> ''\n\) GROUP BY word",
        f"FROM (SELECT UNNEST([{vals}]) AS word) GROUP BY word",
        sql,
        flags=re.S,
    )
    assert "UNNEST([" in sql, "corpus splice failed"
    got = con.sql(sql + "\nSELECT * FROM (" + rows + ") ORDER BY rank").fetchall()
    wf: dict[str, int] = {}
    for w in corpus:
        wf[w] = wf.get(w, 0) + 1
    merges, _ = ref_train(wf, n)
    exp = [(k + 1, m[0], m[1], m[2]) for k, m in enumerate(merges)]
    assert got == exp[: len(got)]
    # the SQL replay runs all n rounds unconditionally; if the corpus
    # exhausts earlier the UNION arm for that round is empty — both
    # sides must have stopped at the same round
    assert len(got) == len(exp)


# ----------------------------------------------------- Spark trainer


def test_spark_trainer_matches_reference(spark):
    corpus = [
        "low", "low", "lower", "lowest", "newer", "newer", "newest",
        "wide", "wider", "a", "ab", "abab",
    ]
    docs = spark.createDataFrame([(i, w) for i, w in enumerate(corpus)],
                                 "doc_id long, text string")
    merges = train_bpe(word_frequencies(docs), 10)
    wf: dict[str, int] = {}
    for w in corpus:
        wf[w] = wf.get(w, 0) + 1
    exp, segs = ref_train(wf, 10)
    assert [(m.left, m.right, m.pair_count) for m in merges] == exp
    assert [m.rank for m in merges] == list(range(1, len(exp) + 1))
    # and the mapInPandas encoder reproduces the trainer's final state
    enc = {
        r.word: tuple(r.tokens)
        for r in encode_words(
            docs.select(docs.text.alias("word")).distinct(), merges
        ).collect()
    }
    assert enc == segs


def test_spark_trainer_strict_exhaustion(spark):
    docs = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    # 'ab' exhausts after 2 merges: (a,b)? counts: (a,b)=1,(b,</w>)=1 →
    # argmax (a,b); then (ab,</w>); then nothing
    merges = train_bpe(word_frequencies(docs), 10)
    assert len(merges) == 2
    with pytest.raises(BpeTrainingError, match="exhausted at merge 3/10"):
        train_bpe(word_frequencies(docs), 10, strict=True)
