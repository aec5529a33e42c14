"""Bigram-LM perplexity (operators/textops.bigram_lm_perplexity):
semantics against a pure-Python reference, sanity bounds, and the
repetition-vs-gibberish ordering the filter exists to produce.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from migrate_cassandra_to_mysql_spark.operators.textops import (
    bigram_lm_perplexity,
)
from migrate_cassandra_to_mysql_spark.sources.parquet import table as T


def _ref(docs: pd.DataFrame) -> dict:
    """Pure-Python add-0.5 bigram LM perplexity, per language."""
    out = {}
    for lang, g in docs.groupby("lang"):
        bi = Counter()
        for _, row in g.iterrows():
            t = row["text"].strip().split()
            bi.update(zip(t, t[1:]))
        pre = Counter()
        for (w1, _), c in bi.items():
            pre[w1] += c
        v = len({w2 for _, w2 in bi})
        for _, row in g.iterrows():
            t = row["text"].strip().split()
            if len(t) < 2:
                continue
            s, n = 0.0, 0
            for w1, w2 in zip(t, t[1:]):
                p = (bi[(w1, w2)] + 0.5) / (pre[w1] + 0.5 * v)
                s += round(-math.log(p), 12)
                n += 1
            out[row["doc_id"]] = (n, s / n, math.exp(s / n))
    return out


def test_matches_python_reference(spark, sf_dir):
    got = bigram_lm_perplexity(T(spark, sf_dir, "documents")).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    ref = _ref(docs)
    assert set(got["doc_id"]) == set(ref)
    for _, r in got.iterrows():
        n, avg, ppl = ref[r["doc_id"]]
        assert r["n_bigrams"] == n
        assert abs(r["avg_nll"] - avg) < 1e-7
        assert abs(r["ppl"] - ppl) < 1e-4


def test_bounds_and_coverage(spark, sf_dir):
    out = bigram_lm_perplexity(T(spark, sf_dir, "documents")).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert len(out) == len(docs)  # synthetic docs all have >= 2 tokens
    assert (out["avg_nll"] > 0).all()
    assert (out["ppl"] > 1).all()
    # perplexity can't exceed the smoothed-model worst case ~2V+max_prefix
    assert out["ppl"].max() < 1e6


def test_repetitive_doc_scores_lower_than_gibberish(spark):
    # A doc made of one repeated bigram is maximally predictable under
    # the corpus LM; a doc of singleton tokens is maximally surprising.
    rows = [(i, "en", "a b a b a b a b a b") for i in range(8)]
    rows.append((100, "en", "q w e r t y u i o p"))
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )
    out = bigram_lm_perplexity(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "ppl"] < out.loc[100, "ppl"]
