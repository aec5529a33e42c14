"""Distributed BPE training (operators/bpe.py) against a pure-Python
reference: identical merge sequence (same greedy left-to-right apply,
same max-count / lexicographic tie-break), plus the separator-guard
edge cases (overlapping pairs, symbols that are suffixes of neighbors).
"""

from __future__ import annotations

from collections import Counter

from migrate_cassandra_to_mysql_spark.operators.bpe import (
    bpe_merge_table,
    train_bpe,
)
from migrate_cassandra_to_mysql_spark.sources.parquet import table as T


def _ref_bpe(texts: list[str], n_merges: int):
    """Reference implementation: word-frequency BPE with greedy
    left-to-right merge application."""
    wf = Counter()
    for t in texts:
        for w in t.strip().split():
            if w:
                wf[w] += 1
    vocab = {tuple(w): f for w, f in wf.items()}
    # identical words collapse to the same symbol tuple; combine freqs
    combined: Counter = Counter()
    for syms, f in vocab.items():
        combined[syms] += f
    vocab = dict(combined)
    merges = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), n = best
        merges.append((rank, l, r, n))
        new_vocab: dict = {}
        for syms, f in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


def test_matches_python_reference_on_corpus(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    got = train_bpe(docs, n_merges=8)
    texts = [r["text"] for r in docs.select("text").collect()]
    want = _ref_bpe(texts, 8)
    assert got == want


def test_greedy_overlap_semantics(spark):
    # 'aaaa': after merging (a,a) greedily left-to-right -> [aa, aa], so
    # the next round's top pair is (aa, aa)
    docs = spark.createDataFrame(
        [(0, "aaaa aaaa")], "doc_id long, text string"
    )
    got = train_bpe(docs, n_merges=2)
    assert got[0][1:3] == ("a", "a")
    assert got[1][1:3] == ("aa", "aa")
    assert got == _ref_bpe(["aaaa aaaa"], 2)


def test_suffix_symbol_does_not_false_match(spark):
    # after merging (x,a), the symbol 'xa' must not let pattern (a,b)
    # match inside it: 'xab' = [xa, b] has pair (xa, b), NOT (a, b)
    docs = spark.createDataFrame(
        [(0, "xa xa xab ab")], "doc_id long, text string"
    )
    got = train_bpe(docs, n_merges=3)
    assert got == _ref_bpe(["xa xa xab ab"], 3)


def test_quote_and_backslash_tokens_train_safely(spark):
    # corpus tokens containing SQL-hostile characters: the in-loop
    # rewrite uses Column literals, so a learned symbol with ' or \
    # must not crash the generated plan (ADVICE r6: interpolated SQL
    # literals failed to parse data-dependently on such corpora)
    texts = ["don't don't don't can't", "a\\b a\\b 'quoted' 'quoted'"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = train_bpe(docs, n_merges=6)
    assert got == _ref_bpe(texts, 6)


def test_apply_merges_sql_quotes_symbols():
    import duckdb
    import pytest

    from migrate_cassandra_to_mysql_spark.operators.bpe import (
        SEP,
        _sql_str_literal,
        apply_merges_sql,
    )

    # a trained merge containing a single quote must embed portably:
    # the same expression string parses and agrees in DuckDB
    base = SEP + SEP + (SEP + SEP).join("don't") + SEP + SEP
    expr = apply_merges_sql(
        f"'{_sql_str_literal(base)}'", [("n", "'"), ("n'", "t")]
    )
    out = duckdb.sql(f"select {expr} as s").fetchone()[0]
    assert f"{SEP}n't{SEP}" in out
    # backslash symbols cannot be spelled portably -> loud error
    with pytest.raises(ValueError):
        apply_merges_sql("x", [("a\\b", "c")])


def test_catalog_entry_shape(spark, sf_dir):
    df = bpe_merge_table(
        spark, T(spark, sf_dir, "documents"), n_merges=4
    ).toPandas()
    assert list(df.columns) == ["rank", "left", "right", "pair_freq"]
    assert list(df["rank"]) == [0, 1, 2, 3]
    assert (df["pair_freq"] > 0).all()
    # merged symbols grow: later merges may reference earlier outputs
    assert df[["left", "right"]].map(len).to_numpy().min() >= 1


def test_fixed_apply_merges_actually_fire(spark, sf_dir):
    # the oracle-checked apply path must exercise real merges: BPE token
    # count strictly below char count for docs containing 'the'/'than'
    from migrate_cassandra_to_mysql_spark.plans.textplans import (
        bpe_apply_fixed,
    )

    out = bpe_apply_fixed(spark, sf_dir).toPandas()
    assert (out["n_bpe_tokens"] <= out["n_chars"]).all()
    assert (out["n_bpe_tokens"] < out["n_chars"]).any()
    assert (out["n_bpe_tokens"] >= out["n_words"]).all()
