"""Z-order (Morton curve) data layout — multi-dimensional pruning for the
scan layer.

A 100 TB table sorted by ONE key gives tight parquet row-group min/max
stats for that key only; a range predicate on any other column scans
everything. Interleaving the bits of two keys into a Morton z-value and
sorting by it gives BOTH columns locality: every row group covers a small
rectangle of the (a, b) key space, so 2-D box predicates skip most row
groups on footer stats alone — the same layout trick Delta/Iceberg expose
as OPTIMIZE ZORDER BY, built here from first principles on the open
parquet format (bit-interleave expression + range sort + write).

The z-value is pure integer bit arithmetic (exact on both engines, no
float-determinism concerns), generated from one Python spec for Spark and
DuckDB so the catalog oracle checks the curve itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def zvalue_sql_spark(a: str, b: str, bits: int = DEFAULT_BITS) -> str:
    """Spark SQL expression for the Morton z-value of (a, b), low `bits`
    bits of each interleaved (a in even positions). Keys are masked to
    `bits` bits first, so the curve is well-defined for any BIGINT."""
    am = f"(CAST({a} AS BIGINT) & {(1 << bits) - 1})"
    bm = f"(CAST({b} AS BIGINT) & {(1 << bits) - 1})"
    terms = []
    for i in range(bits):
        ta = f"shiftleft((shiftright({am}, {i}) & 1), {2 * i})"
        tb = f"shiftleft((shiftright({bm}, {i}) & 1), {2 * i + 1})"
        terms.extend([ta, tb])
    return "(" + " + ".join(terms) + ")"


def zvalue_sql_duckdb(a: str, b: str, bits: int = DEFAULT_BITS) -> str:
    """DuckDB twin of zvalue_sql_spark — same mathematical value (exact
    integer arithmetic, so the expression shapes need not match)."""
    am = f"(CAST({a} AS BIGINT) & {(1 << bits) - 1})"
    bm = f"(CAST({b} AS BIGINT) & {(1 << bits) - 1})"
    terms = []
    for i in range(bits):
        terms.append(f"((({am} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({bm} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zvalue_py(a: int, b: int, bits: int = DEFAULT_BITS) -> int:
    """Pure-Python reference for tests."""
    a &= (1 << bits) - 1
    b &= (1 << bits) - 1
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def zvalue(col_a: str, col_b: str, bits: int = DEFAULT_BITS) -> Column:
    return F.expr(zvalue_sql_spark(col_a, col_b, bits))


def write_zordered(
    df: DataFrame,
    out_dir: str,
    col_a: str,
    col_b: str,
    bits: int = DEFAULT_BITS,
    n_files: int = 8,
) -> None:
    """Write `df` re-laid-out along the Morton curve of (col_a, col_b):
    min/max-normalize both keys onto the curve's `bits`-bit domain, then
    range-partition + sort by z-value, drop the helper column, write
    parquet.

    The normalization is the step naive z-ordering misses: interleaving
    RAW keys puts a column that occupies a small slice of its bit range
    (partkey spanning 0..200 of a 16-bit domain) entirely into the low
    curve bits, so the sort degenerates to 1-D order on the wider column
    and buys nothing. Scaling each key to the full curve domain (the
    same reason production OPTIMIZE ZORDER BY implementations rank or
    range-normalize first) makes both columns share the high bits. Cost:
    one broadcast 1-row min/max aggregate — no per-row window.

    repartitionByRange gives contiguous, BALANCED curve segments per
    output file (a plain repartition(n).sortWithinPartitions would hash
    rows to files and destroy the locality the curve buys); row groups
    inside each file then cover small key-space rectangles, which is
    what parquet min/max footer pruning needs. At 100 TB this runs as
    one range-exchange over the table — same cost class as any global
    sort — and pays for itself on every subsequent 2-D selective scan."""
    top = (1 << bits) - 1
    stats = df.agg(
        F.min(col_a).cast("long").alias("_a0"),
        F.max(col_a).cast("long").alias("_a1"),
        F.min(col_b).cast("long").alias("_b0"),
        F.max(col_b).cast("long").alias("_b1"),
    )
    norm_a = (
        f"CAST((CAST({col_a} AS BIGINT) - _a0) * {top}"
        f" DIV (CASE WHEN _a1 > _a0 THEN _a1 - _a0 ELSE 1 END) AS BIGINT)"
    )
    norm_b = (
        f"CAST((CAST({col_b} AS BIGINT) - _b0) * {top}"
        f" DIV (CASE WHEN _b1 > _b0 THEN _b1 - _b0 ELSE 1 END) AS BIGINT)"
    )
    (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "__z",
            F.expr(zvalue_sql_spark(norm_a, norm_b, bits)),
        )
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", "_a0", "_a1", "_b0", "_b1")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def compact_small_files(
    spark,
    src_dir: str,
    out_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> dict:
    """Bin-pack a small-files parquet directory into ~target-size files —
    the maintenance primitive every streaming/append workload needs (a
    100 TB table fed by micro-batches accretes thousands of KB-sized
    files; scan cost then scales with FILE COUNT, not data volume:
    footer reads, task scheduling, and open/close overhead per file).

    File count = ceil(total_bytes / target): computed from the source
    listing (driver-side metadata only, no data pass), then ONE coalesce
    write — coalesce, not repartition, so compaction does NOT shuffle:
    it only glues input splits together (narrow dependency). Pass
    sort_within_by to additionally restore a within-file sort order
    (adds a local sort, still no exchange). Returns {files_in,
    files_out, bytes} for the caller's audit log.

    Write-then-swap is left to the caller/catalog layer (same contract
    as inverted_index._refresh_derived) — this writes to out_dir.
    """
    import glob as _glob
    import os as _os

    parts = [
        p
        for p in _glob.glob(f"{src_dir}/*.parquet") + _glob.glob(f"{src_dir}/part-*")
        if _os.path.isfile(p)
    ]
    total = sum(_os.path.getsize(p) for p in set(parts))
    n_out = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(src_dir).coalesce(n_out)
    if sort_within_by:
        df = df.sortWithinPartitions(*sort_within_by)
    df.write.mode("overwrite").parquet(out_dir)
    files_out = len(
        [p for p in _glob.glob(f"{out_dir}/part-*") if _os.path.isfile(p)]
    )
    return {"files_in": len(set(parts)), "files_out": files_out, "bytes": total}
