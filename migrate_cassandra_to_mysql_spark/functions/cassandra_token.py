"""Cassandra-exact token(): Murmur3Partitioner ring position.

The reference delegates token() to Cassandra server-side
(`snapshot_use_pyspark.py:217-220,275`; `find_missing_ids.py:63`). For
byte-for-byte ring parity without a Cassandra connection (resume points,
range audits against existing checkpoint tables), this module implements
the partitioner's hash: MurmurHash3 x64_128 — *Cassandra's Java variant*,
which sign-extends tail bytes (java `byte` is signed; standard C murmur3
treats them unsigned) — taking the first 64-bit half, with Long.MIN_VALUE
normalized to Long.MAX_VALUE.

Exposed as a Pandas UDF over string keys (single text partition key, like
the reference's `files.id`). This is NOT a hot-path function: use it for
control-plane parity only; engine-internal bucketing should use
`functions.hashing.xxhash_bucket` (JVM codegen). Python-side hashing of
every row at 100 TB would be the bottleneck — if hot-path ring parity is
ever required, port this to a JVM UDF or scala connector helper.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

_MASK64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK64
    k ^= k >> 33
    return k


def _signed_byte(b: int) -> int:
    return b - 256 if b > 127 else b


def murmur3_128_cassandra(key: bytes, seed: int = 0) -> int:
    """First 64 bits of Cassandra's MurmurHash.hash3_x64_128 (signed)."""
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = seed & _MASK64
    length = len(key)
    n_blocks = length // 16

    for i in range(n_blocks):
        off = i * 16
        k1 = int.from_bytes(key[off : off + 8], "little")
        k2 = int.from_bytes(key[off + 8 : off + 16], "little")
        k1 = (k1 * c1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & _MASK64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _MASK64
        h1 = (h1 * 5 + 0x52DCE729) & _MASK64
        k2 = (k2 * c2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & _MASK64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _MASK64
        h2 = (h2 * 5 + 0x38495AB5) & _MASK64

    # Tail: Cassandra's Java port sign-extends each byte (the deliberate
    # incompatibility with reference C murmur3).
    tail = key[n_blocks * 16 :]
    k1 = k2 = 0
    tl = len(tail)
    if tl >= 9:
        for i in range(min(tl, 16) - 1, 7, -1):
            k2 ^= (_signed_byte(tail[i]) << ((i - 8) * 8)) & _MASK64
        k2 = (k2 * c2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & _MASK64
        h2 ^= k2
    if tl >= 1:
        for i in range(min(tl, 8) - 1, -1, -1):
            k1 ^= (_signed_byte(tail[i]) << (i * 8)) & _MASK64
        k1 = (k1 * c1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & _MASK64
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _MASK64

    # First half, as signed 64-bit.
    if h1 >= 1 << 63:
        h1 -= 1 << 64
    return h1


def cassandra_token_py(key: str) -> int:
    """Ring token of a single text partition key."""
    t = murmur3_128_cassandra(key.encode("utf-8"))
    # Murmur3Partitioner.normalize: MIN_VALUE maps to MAX_VALUE.
    return (1 << 63) - 1 if t == -(1 << 63) else t


# LongType() instance (not a DDL string) so importing this module does not
# require an active SparkSession.
@pandas_udf(LongType())
def _token_udf(keys: pd.Series) -> pd.Series:
    # Null-propagating like built-in functions (Cassandra keys can't be
    # null, but a column function must not crash the task on one).
    return keys.map(lambda k: None if k is None else cassandra_token_py(k))


def cassandra_token(key: Column) -> Column:
    """token(key) column — Cassandra Murmur3 ring position of a text key."""
    return _token_udf(key.cast("string"))
