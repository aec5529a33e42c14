"""Key hashing / token-ring partitioning expressions.

The reference partitions work by splitting the Cassandra Murmur3 token ring
[-2^63, 2^63-1] into 256 contiguous half-open ranges
(`snapshot_use_pyspark.py:107-137`). In this engine the same roles are played
by column expressions:

- `md5_token_bucket` — an *oracle-portable* bucket (identical result in
  Spark SQL and DuckDB SQL), used by every query that must hash-match the
  DuckDB oracle. MD5 is deliberate: it is the one hash both engines share
  bit-for-bit.
- `xxhash_bucket` — the *production* bucket (JVM xxhash64, whole-stage
  codegen, no Python). At 100 TB this is what you'd range/bucket-partition
  on; md5-over-string costs an extra string materialization per row.
- `token_ranges` — the reference's pure-math ring splitter, kept as a
  planning utility for connector-style range scans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_MIN = -(2**63)
TOKEN_MAX = 2**63 - 1


def md5_token_bucket(key: Column, n_buckets: int = 256) -> Column:
    """Bucket id in [0, n_buckets) from the first 4 hex chars of md5(key).

    Portable contract (verified): Spark
    ``conv(substring(md5(cast(k as string)),1,4),16,10)`` equals DuckDB
    ``('0x' || substring(md5(cast(k as varchar)),1,4))::BIGINT``.
    """
    hex4 = F.substring(F.md5(key.cast("string")), 1, 4)
    return (F.conv(hex4, 16, 10).cast("long") % n_buckets).alias("token_bucket")


def oracle_bucket_sql(key_sql: str, n_buckets: int = 256) -> str:
    """The DuckDB-side expression matching `md5_token_bucket`."""
    return (
        f"(('0x' || substring(md5(CAST({key_sql} AS VARCHAR)),1,4))::BIGINT"
        f" % {n_buckets})"
    )


def xxhash_bucket(key: Column, n_buckets: int = 256) -> Column:
    """Production-path bucket: xxhash64 stays inside whole-stage codegen."""
    return F.pmod(F.xxhash64(key), F.lit(n_buckets))


def token_ranges(n_ranges: int = 256) -> list[dict[str, int]]:
    """Split the signed-64-bit ring into contiguous half-open (start, end]
    ranges with no gaps — same contract as the reference's splitter
    (`snapshot_use_pyspark.py:107-137`: 256 contiguous ranges covering
    [-2^63, 2^63-1], checkpoint seeded to range_start).
    """
    total = TOKEN_MAX - TOKEN_MIN
    step = total // n_ranges
    ranges = []
    start = TOKEN_MIN
    for i in range(n_ranges):
        end = TOKEN_MAX if i == n_ranges - 1 else start + step
        ranges.append({"range_start": start, "range_end": end, "checkpoint": start})
        start = end
    return ranges
