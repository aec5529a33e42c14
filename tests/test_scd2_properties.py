"""Property-based tests (hypothesis) for the SCD2 incremental fold — the
invariants the streaming store's exactly-once convergence rests on, for
ANY generation sequence (random key subsets, values, deletes and
re-inserts), not just the fixed cases in test_snapshot_diff:

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
