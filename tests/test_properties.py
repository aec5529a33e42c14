"""Property-based tests (hypothesis) for the pure kernels: ring math,
murmur3, SQL builders, retry policy. Spark-side operators get fixed-case
coverage elsewhere; these pin the invariants that must hold for ANY input."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from migrate_cassandra_to_mysql_spark.functions.cassandra_token import (
    cassandra_token_py,
    murmur3_128_cassandra,
)
from migrate_cassandra_to_mysql_spark.functions.hashing import (
    TOKEN_MAX,
    TOKEN_MIN,
    token_ranges,
)
from migrate_cassandra_to_mysql_spark.sinks.idempotent import MYSQL, SQLITE


@given(st.integers(min_value=1, max_value=4096))
def test_token_ranges_partition_ring_for_any_n(n):
    ranges = token_ranges(n)
    assert len(ranges) == n
    assert ranges[0]["range_start"] == TOKEN_MIN
    assert ranges[-1]["range_end"] == TOKEN_MAX
    for prev, cur in zip(ranges, ranges[1:]):
        assert prev["range_end"] == cur["range_start"]
    # Half-open (start, end] ranges tile with no overlap: total width == ring.
    assert sum(r["range_end"] - r["range_start"] for r in ranges) == (
        TOKEN_MAX - TOKEN_MIN
    )


@given(st.binary(min_size=0, max_size=64))
@settings(max_examples=200)
def test_murmur3_deterministic_and_in_range(data):
    a = murmur3_128_cassandra(data)
    assert a == murmur3_128_cassandra(data)
    assert -(2**63) <= a <= 2**63 - 1


@given(st.text(min_size=0, max_size=48))
@settings(max_examples=200)
def test_token_never_min_value(key):
    t = cassandra_token_py(key)
    assert -(2**63) < t <= 2**63 - 1


@given(st.binary(min_size=1, max_size=32), st.binary(min_size=1, max_size=32))
@settings(max_examples=100)
def test_murmur3_collision_resistance_smoke(a, b):
    if a != b:
        # Not a proof, but 64-bit collisions in 100 random small pairs would
        # indicate a broken mixing function.
        assert murmur3_128_cassandra(a) != murmur3_128_cassandra(b) or a == b


@given(
    st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll",)), min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=6,
        unique=True,
    )
)
def test_insert_ignore_sql_has_one_placeholder_per_column(cols):
    for dialect, ph in ((MYSQL, "%s"), (SQLITE, "?")):
        sql = dialect.insert_ignore("t", cols)
        assert sql.count(ph) == len(cols)
        for c in cols:
            assert c in sql


@given(
    st.lists(
        st.sampled_from(["a", "b", "c", "d", "e"]), min_size=2, max_size=5,
        unique=True,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_upsert_sql_never_updates_key_columns(cols, n_keys):
    keys = cols[: min(n_keys, len(cols) - 1)]
    for dialect in (MYSQL, SQLITE):
        sql = dialect.upsert("t", cols, keys)
        update_clause = sql.split("UPDATE", 1)[1]
        for k in keys:
            assert f"{k}=VALUES({k})" not in update_clause
            assert f"{k}=excluded.{k}" not in update_clause


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=300)
def test_multimodal_parsers_never_raise_on_arbitrary_bytes(data):
    """The container sniffers run inside mapInPandas stages at corpus
    scale — a poison byte-string must degrade (format='unknown' / empty
    output), never raise. Fuzz the decode, header-parse, resize, and
    frame-split kernels over arbitrary bytes, including prefixes that
    START like valid containers."""
    from migrate_cassandra_to_mysql_spark.operators import multimodal as mm

    for payload in (
        data,
        mm._PNG_SIG + data,
        b"\xff\xd8" + data,
        mm._PNG_SIG + b"\x00\x00\x00\x0d" + b"IHDR" + data,
    ):
        out = mm._decode_bytes(payload)
        assert out["n_bytes"] == len(payload)
        assert out["format"] in ("png", "jpeg", "unknown")
        fmt, w, h, body = mm._parse_header(payload)
        assert fmt in ("png", "jpeg", "unknown")
        assert (w is None) == (fmt == "unknown")
        if fmt == "unknown":
            assert body == payload


@given(
    st.integers(min_value=1, max_value=640),
    st.integers(min_value=1, max_value=480),
)
@settings(max_examples=100)
def test_multimodal_header_builders_roundtrip_any_dims(w, h):
    """Python-side header builders (the resize path) must produce bytes
    the sniffing rules parse back to exactly the input dimensions, for
    any dimensions in range — PNG with a valid CRC, JPEG via SOF0."""
    from migrate_cassandra_to_mysql_spark.operators import multimodal as mm

    for header, want_fmt in (
        (mm._png_header_bytes(w, h), "png"),
        (mm._jpeg_header_bytes(w, h), "jpeg"),
    ):
        fmt, pw, ph, body = mm._parse_header(header + b"BODY")
        assert (fmt, pw, ph) == (want_fmt, w, h)
        assert body == b"BODY"


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=300)
def test_wav_parser_never_raises_on_arbitrary_bytes(data):
    """The RIFF walker runs inside mapInPandas at corpus scale: poison
    bytes — including prefixes that START like valid RIFF containers,
    truncated fmt chunks, and data-before-fmt orderings — must degrade
    to format='unknown', never raise."""
    from migrate_cassandra_to_mysql_spark.operators import multimodal as mm

    for payload in (
        data,
        b"RIFF" + data,
        b"RIFF\x24\x00\x00\x00WAVE" + data,
        b"RIFF\x24\x00\x00\x00WAVEfmt " + data,
        b"RIFF\x24\x00\x00\x00WAVEdata" + data,
        None,
    ):
        out = mm._decode_wav_bytes(payload)
        assert out["format"] in ("wav", "unknown")
        if out["format"] == "unknown":
            assert out["sample_rate"] is None and out["n_samples"] is None
        else:
            assert out["sample_rate"] and out["channels"] and out["bits"]
