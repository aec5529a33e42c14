"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with typed metadata
alongside. The container layer is REAL: payloads begin with a genuine
PNG (8-byte signature + IHDR chunk, CRC32-valid) or JPEG (SOI + SOF0
frame header) container header, and the decode step parses width /
height / format from those header bytes exactly the way an image
library's header sniffing does. Only the pixel-data decode (which needs
a codec) stays out of scope in this environment — swap `_decode_bytes`'s
body-handling for PIL/ffmpeg in production; the header parsing, schema,
Arrow batching, and partition sizing carry over unchanged.

Scale notes: mapInPandas streams Arrow record batches, so a partition never
materializes fully in Python memory; keep binary partitions small via
`spark.sql.files.maxPartitionBytes` (decoded frames are 10-100x the
encoded payload). Feature extraction returns fixed-size arrays so the
output schema stays columnar-friendly.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, format string, "
    "features array<float>, hist array<int>"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG header: signature(8) + IHDR length(4) + "IHDR"(4) + width(4) +
# height(4) + bit depth/color type/compression/filter/interlace(5) + CRC(4)
PNG_HEADER_LEN = 33
# JPEG header: SOI(2) + SOF0 marker(2) + length(2) + precision(1) +
# height(2) + width(2) + ncomponents(1) + 3 components x 3 bytes
JPEG_HEADER_LEN = 21


def _hex4(col: Column) -> Column:
    """8-hex-char (4-byte big-endian) encoding of an int column."""
    return F.lpad(F.hex(col), 8, "0")


def _hex2(col: Column) -> Column:
    """4-hex-char (2-byte big-endian) encoding of an int column."""
    return F.lpad(F.hex(col), 4, "0")


def container_header(width: Column, height: Column, is_png: Column) -> Column:
    """Binary PNG-or-JPEG container header, built entirely JVM-side.

    PNG: real signature + IHDR chunk for an 8-bit truecolor image, with
    the chunk CRC computed by Spark's built-in crc32 over the IHDR tag +
    payload — byte-identical to what libpng would write, so any header
    sniffer (PIL, `file`, exiftool) identifies these payloads.

    JPEG: SOI + a baseline SOF0 frame header (8-bit precision, 3
    components, 4:4:4) — the marker segment a decoder reads dimensions
    from. No entropy-coded data follows (the "pixels" are the document
    body), which is exactly the header-sniffing contract this operator
    decodes against.

    Everything is hex-string concat + unhex + crc32 — codegen'd column
    expressions, no UDF in the build path.
    """
    ihdr_content = F.concat(
        F.lit("49484452"),  # "IHDR"
        _hex4(width),
        _hex4(height),
        F.lit("0802000000"),  # bit depth 8, color type 2 (RGB), 0, 0, 0
    )
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A"),  # signature
        F.lit("0000000D"),  # IHDR payload length = 13
        ihdr_content,
        _hex4(F.crc32(F.unhex(ihdr_content))),
    )
    jpeg_hex = F.concat(
        F.lit("FFD8"),  # SOI
        F.lit("FFC0"),  # SOF0 (baseline DCT)
        F.lit("0011"),  # segment length 17 = 8 + 3 components x 3
        F.lit("08"),  # sample precision
        _hex2(height),  # height precedes width in SOF0
        _hex2(width),
        F.lit("03"),  # 3 components
        F.lit("011100021101031101"),  # Y/Cb/Cr, 1x1 sampling, q-tables
    )
    return F.unhex(F.when(is_png, png_hex).otherwise(jpeg_hex))


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Create the binary asset column: real container header + body bytes.

    Dimensions and format derive deterministically from doc_id (width =
    doc_id % 640 + 1, height = doc_id % 480 + 1, PNG for even ids, JPEG
    for odd) so the differential oracle can recompute every decoded field
    arithmetically while the engine path must actually parse the bytes.
    """
    width = (F.col("doc_id") % 640 + 1).cast("int")
    height = (F.col("doc_id") % 480 + 1).cast("int")
    is_png = F.col("doc_id") % 2 == 0
    return df.select(
        "doc_id",
        F.concat(
            container_header(width, height, is_png),
            F.encode(F.col(text_col), "UTF-8"),
        ).alias("payload"),
    )


def _decode_bytes(payload: bytes) -> dict:
    """Parse the container header, then feature-extract the body bytes.

    PNG: verify the 8-byte signature and the IHDR chunk tag, read
    width/height as the two big-endian u32s at offsets 16/20.
    JPEG: verify SOI, then walk FF-prefixed marker segments until a SOF0-3
    frame header and read height/width (height first, per spec).
    Anything else is reported as format='unknown' with NULL dimensions
    rather than raising — at corpus scale a poison byte-string must not
    kill the stage.
    """
    width = height = None
    fmt = "unknown"
    body = payload
    # len guard: a truncated payload carrying the PNG signature + IHDR tag
    # (16 <= len < 24) would make the unpack below raise struct.error —
    # poison bytes must degrade to format='unknown', never kill the stage.
    if (
        len(payload) >= 24
        and payload[:8] == _PNG_SIG
        and payload[12:16] == b"IHDR"
    ):
        width, height = struct.unpack(">II", payload[16:24])
        fmt = "png"
        body = payload[PNG_HEADER_LEN:]
    elif payload[:2] == b"\xff\xd8":
        pos = 2
        while pos + 9 <= len(payload) and payload[pos] == 0xFF:
            marker = payload[pos + 1]
            seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
            if 0xC0 <= marker <= 0xC3:
                height, width = struct.unpack(
                    ">HH", payload[pos + 5 : pos + 9]
                )
                fmt = "jpeg"
                body = payload[pos + 2 + seg_len :]
                break
            pos += 2 + seg_len
    n = len(body)
    # 8-bucket byte histogram of the BODY (the content the container
    # wraps): `hist` carries raw integer counts (exactly reproducible —
    # the catalog oracle recomputes them from the source text); `features`
    # is the float-normalized form downstream models use.
    hist = [0] * 8
    for b in body:
        hist[b % 8] += 1
    return {
        "n_bytes": len(payload),
        "width": width,
        "height": height,
        "format": fmt,
        "features": [float(c) / max(n, 1) for c in hist],
        "hist": hist,
    }


def decode_assets(df_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched header decode + feature extraction over binary column.

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
