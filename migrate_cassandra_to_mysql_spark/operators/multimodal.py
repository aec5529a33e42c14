"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with typed metadata
alongside. Spark-side plumbing (schema, Arrow batching via mapInPandas,
partition sizing) is real and tested; the actual media decode is stubbed
behind `decode_image_stub` because media libraries are not available in
this environment — swap `_decode_bytes` for a PIL/ffmpeg call in
production. The stub is deterministic so pipelines are replayable.

Scale notes: mapInPandas streams Arrow record batches, so a partition never
materializes fully in Python memory; keep binary partitions small via
`spark.sql.files.maxPartitionBytes` (decoded frames are 10-100x the
encoded payload). Feature extraction returns fixed-size arrays so the
output schema stays columnar-friendly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, format string, "
    "features array<float>, hist array<int>"
)


def _decode_bytes(payload: bytes) -> dict:
    """Deterministic fake decode. Production: PIL.Image.open(BytesIO(b))."""
    n = len(payload)
    # 8-bucket byte histogram: `hist` carries the raw integer counts
    # (exactly reproducible across engines — the catalog oracle recomputes
    # them); `features` is the float-normalized form downstream models use.
    hist = [sum(1 for b in payload if b % 8 == k) for k in range(8)]
    return {
        "n_bytes": n,
        "width": (n % 640) + 1,
        "height": (n % 480) + 1,
        "format": ("png", "jpeg", "webp")[n % 3],
        "features": [float(c) / max(n, 1) for c in hist],
        "hist": hist,
    }


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Create the opaque binary column (stand-in for real media bytes)."""
    return df.select(
        "doc_id", F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def decode_image_stub(df_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction over a binary column.

    mapInPandas (not a scalar UDF) so one Python call handles a whole
    Arrow batch, and the decode can emit a different number of rows than
    it receives (e.g. frame sampling for video).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(_decode_bytes)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": meta.map(lambda m: m["n_bytes"]),
                    "width": meta.map(lambda m: m["width"]),
                    "height": meta.map(lambda m: m["height"]),
                    "format": meta.map(lambda m: m["format"]),
                    "features": meta.map(lambda m: m["features"]),
                    "hist": meta.map(lambda m: m["hist"]),
                }
            )

    return df_with_payload.mapInPandas(decode, schema=DECODED_SCHEMA)
