"""Spark-side property-based tests (hypothesis): distributed operators
checked against independently-written pure-Python derivations for ANY
random input (tests/test_properties.py keeps the pure-kernel ones).

SCD2 incremental fold — the invariants the streaming store's
exactly-once convergence rests on, for ANY generation sequence (random
key subsets, values, deletes and re-inserts), not just the fixed cases
in test_snapshot_diff:

  1. current slice == the last generation, value-exact;
  2. per-key version intervals partition the key's timeline: strictly
     ordered, non-overlapping (gaps only across delete/re-insert);
  3. re-applying the last generation is a NO-OP (fold idempotency — what
     makes crash replay converge byte-identically);
  4. a no-change generation leaves the history unchanged.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from migrate_cassandra_to_mysql_spark.operators.merge import (
    scd2_apply_increment,
    scd2_init,
)

_GDATES = [f"2024-{m:02d}-01 00:00:00" for m in range(1, 6)]


@st.composite
def _gen_seq(draw):
    n_gens = draw(st.integers(min_value=2, max_value=4))
    gens = []
    for _ in range(n_gens):
        keys = draw(
            st.lists(
                st.integers(min_value=1, max_value=5),
                unique=True,
                min_size=0,
                max_size=5,
            )
        )
        gens.append(
            [(k, draw(st.sampled_from(["a", "b", "c"]))) for k in sorted(keys)]
        )
    # the first generation must be non-empty (scd2_init of zero rows is a
    # separate guarded path, covered in test_scd2_stream)
    if not gens[0]:
        gens[0] = [(1, "a")]
    return gens


def _fold(spark, gens):
    def snap(rows):
        return spark.createDataFrame(rows or [(None, None)], "k long, v string").where(
            "k IS NOT NULL"
        )

    hist = scd2_init(snap(gens[0]), ["k"], ["v"], t0=_GDATES[0])
    for gi, rows in enumerate(gens[1:], start=1):
        hist = scd2_apply_increment(
            hist, snap(rows), ["k"], ["v"], t_new=_GDATES[gi]
        )
    return hist


def _rows(hist):
    return sorted(
        (
            r["k"],
            r["v"],
            str(r["valid_from"]),
            str(r["valid_to"]),
            bool(r["is_current"]),
        )
        for r in hist.collect()
    )


@given(gens=_gen_seq())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scd2_fold_invariants_for_any_generation_sequence(spark, gens):
    hist = _fold(spark, gens)
    rows = _rows(hist)
    # (1) current slice == last generation exactly
    cur = {(k, v) for k, v, _, _, c in rows if c}
    assert cur == set(gens[-1])
    # (2) per-key timeline partition
    by_key: dict = {}
    for k, v, vf, vt, c in rows:
        by_key.setdefault(k, []).append((vf, vt, c))
    for k, ivs in by_key.items():
        ivs.sort()
        assert sum(1 for _, _, c in ivs if c) <= 1, k
        for (f1, t1, c1), (f2, t2, c2) in zip(ivs, ivs[1:]):
            assert not c1, (k, ivs)  # only the LAST interval may be open
            assert t1 != "None" and t1 <= f2, (k, ivs)
        for f, t, c in ivs:
            if c:
                assert t == "None", (k, ivs)
            else:
                assert f < t, (k, ivs)
    # (3) re-applying the last generation is a no-op
    last_date = _GDATES[len(gens) - 1]
    again = scd2_apply_increment(
        hist,
        _fold(hist.sparkSession, [gens[-1]]).where("is_current").select("k", "v"),
        ["k"],
        ["v"],
        t_new=last_date,
    )
    assert _rows(again) == rows
    # (4) a LATER no-change generation leaves values and current flags
    # intact (timestamps of open rows unchanged: unchanged rows pass
    # through, they are not re-opened)
    noop = scd2_apply_increment(
        hist,
        hist.sparkSession.createDataFrame(
            gens[-1] or [(None, None)], "k long, v string"
        ).where("k IS NOT NULL"),
        ["k"],
        ["v"],
        t_new=_GDATES[len(gens)],
    )
    assert _rows(noop) == rows


# --- dup_ngram_spans randomized reference (same hypothesis discipline) --


def _spans_reference(corpus, k=3, min_docs=2):
    """Pure-Python re-derivation of operators/dedup.dup_ngram_spans."""
    grams: dict = {}
    per_doc: dict = {}
    for doc_id, text in corpus:
        toks = text.split()
        pgs = [
            (i, " ".join(toks[i : i + k]))
            for i in range(max(len(toks) - k + 1, 0))
        ]
        per_doc[doc_id] = pgs
        for _, g in pgs:
            grams.setdefault(g, set()).add(doc_id)
    frequent = {g for g, docs in grams.items() if len(docs) >= min_docs}
    out = set()
    for doc_id, pgs in per_doc.items():
        hits = sorted(i for i, g in pgs if g in frequent)
        if not hits:
            continue
        start = prev = hits[0]
        n = 1
        for p in hits[1:]:
            if p - prev <= k:
                prev = p
                n += 1
            else:
                out.add((doc_id, start, prev + k, prev + k - start, n))
                start = prev = p
                n = 1
        out.add((doc_id, start, prev + k, prev + k - start, n))
    return out


@st.composite
def _corpus(draw):
    n_docs = draw(st.integers(min_value=2, max_value=6))
    vocab = ["a", "b", "c", "d"]
    return [
        (
            i,
            " ".join(
                draw(
                    st.lists(
                        st.sampled_from(vocab), min_size=0, max_size=12
                    )
                )
            ),
        )
        for i in range(1, n_docs + 1)
    ]


@given(corpus=_corpus())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dup_ngram_spans_matches_python_reference(spark, corpus):
    """Random tiny corpora over a 4-token vocabulary (dense duplication
    by construction): the operator's spans must EQUAL an independently
    written pure-Python derivation — frequent-gram selection, overlap
    merging, and all column arithmetic, for any input."""
    from migrate_cassandra_to_mysql_spark.operators.dedup import (
        dup_ngram_spans,
    )

    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        (
            r["doc_id"],
            r["span_start"],
            r["span_end"],
            r["span_tokens"],
            r["n_grams"],
        )
        for r in dup_ngram_spans(docs, k=3, min_docs=2).collect()
    }
    assert got == _spans_reference(corpus, k=3, min_docs=2)


# --- incremental_lsh_dedup randomized reference (same discipline) ------


def _inc_dedup_reference(new_docs, old_docs, k=3, n_hashes=8, band_size=2):
    """Pure-Python re-derivation of operators/dedup.incremental_lsh_dedup:
    md5-slice MinHash lanes, banding, asymmetric candidate join, exact
    Jaccard in floor-ppm, best-match ranking."""
    import hashlib

    def shset(text):
        toks = text.split()
        if len(toks) < k:
            return set()
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    def bands(ss):
        lanes = [
            min(
                int(hashlib.md5(s.encode()).hexdigest()[4 * h : 4 * h + 4], 16)
                for s in ss
            )
            for h in range(n_hashes)
        ]
        return {
            (b, tuple(lanes[b * band_size : (b + 1) * band_size]))
            for b in range(n_hashes // band_size)
        }

    old = {d: shset(t) for d, t in old_docs}
    new = {d: shset(t) for d, t in new_docs}
    old_b = {d: bands(ss) for d, ss in old.items() if ss}
    new_b = {d: bands(ss) for d, ss in new.items() if ss}
    out = set()
    for nd, nb in new_b.items():
        scored = []
        for od, ob in old_b.items():
            if not (nb & ob):
                continue
            inter = len(new[nd] & old[od])
            un = len(new[nd]) + len(old[od]) - inter
            if 2 * inter >= un:
                scored.append((-((inter * 1000000) // un), od))
        if scored:
            neg_ppm, od = min(scored)
            out.add((nd, od, -neg_ppm))
    return out


@st.composite
def _two_corpora(draw):
    vocab = ["a", "b", "c", "d"]
    n_old = draw(st.integers(min_value=2, max_value=5))
    old = [
        (
            i,
            " ".join(
                draw(st.lists(st.sampled_from(vocab), min_size=0, max_size=10))
            ),
        )
        for i in range(1, n_old + 1)
    ]
    # incoming: some perturbed copies of indexed docs (guaranteed near
    # matches), some fresh random docs
    new = []
    nid = 101
    for d, t in old:
        if draw(st.booleans()):
            new.append((nid, (t + " " + draw(st.sampled_from(vocab))).strip()))
            nid += 1
    for _ in range(draw(st.integers(min_value=0, max_value=2))):
        new.append(
            (
                nid,
                " ".join(
                    draw(
                        st.lists(
                            st.sampled_from(vocab), min_size=0, max_size=10
                        )
                    )
                ),
            )
        )
        nid += 1
    return new, old


@given(corpora=_two_corpora())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_incremental_lsh_dedup_matches_python_reference(spark, corpora):
    """Random incoming/indexed corpora over a 4-token vocabulary (dense
    near-duplication by construction): the operator's best-match rows
    must EQUAL an independently written pure-Python derivation of the
    whole chain — MinHash lanes, banding, the asymmetric candidate join,
    exact floor-ppm Jaccard, the 0.5 threshold, and the ranking
    tie-break — for any input, including empty/short docs on either
    side."""
    from migrate_cassandra_to_mysql_spark.operators.dedup import (
        incremental_lsh_dedup,
    )

    new_docs, old_docs = corpora
    schema = "doc_id long, text string"
    got = {
        (r["doc_id"], r["dup_of"], r["jac_ppm"])
        for r in incremental_lsh_dedup(
            spark.createDataFrame(new_docs or [(None, None)], schema).where(
                "doc_id IS NOT NULL"
            ),
            spark.createDataFrame(old_docs, schema),
        ).collect()
    }
    assert got == _inc_dedup_reference(new_docs, old_docs)
