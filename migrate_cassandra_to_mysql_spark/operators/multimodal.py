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


def _parse_header(payload: bytes) -> tuple[str, int | None, int | None, bytes]:
    """(format, width, height, body) via the same sniffing rules as
    _decode_bytes; 'unknown' + full payload as body for anything else."""
    if (
        len(payload) >= 24
        and payload[:8] == _PNG_SIG
        and payload[12:16] == b"IHDR"
    ):
        w, h = struct.unpack(">II", payload[16:24])
        return "png", w, h, payload[PNG_HEADER_LEN:]
    if payload[:2] == b"\xff\xd8":
        pos = 2
        while pos + 9 <= len(payload) and payload[pos] == 0xFF:
            marker = payload[pos + 1]
            seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
            if 0xC0 <= marker <= 0xC3:
                h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
                return "jpeg", w, h, payload[pos + 2 + seg_len :]
            pos += 2 + seg_len
    return "unknown", None, None, payload


def _png_header_bytes(width: int, height: int) -> bytes:
    import zlib

    ihdr = b"IHDR" + struct.pack(">II", width, height) + b"\x08\x02\x00\x00\x00"
    return (
        _PNG_SIG
        + struct.pack(">I", 13)
        + ihdr
        + struct.pack(">I", zlib.crc32(ihdr) & 0xFFFFFFFF)
    )


def _jpeg_header_bytes(width: int, height: int) -> bytes:
    return (
        b"\xff\xd8\xff\xc0\x00\x11\x08"
        + struct.pack(">HH", height, width)
        + b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    )


RESIZED_SCHEMA = (
    "doc_id bigint, format string, width int, height int, payload binary"
)


def _pil_resize_bytes(
    payload: bytes, fmt: str, target_width: int, target_height: int
) -> bytes | None:
    """Real pixel resample via PIL, when (a) PIL is importable and (b)
    the payload actually decodes as an image. Returns None on either
    miss so the caller can fall back to the deterministic byte-resample
    stub — a poison payload must degrade, never kill the stage."""
    try:
        from PIL import Image  # noqa: PLC0415 - worker-side soft dep
    except ImportError:
        return None
    import io

    try:
        with Image.open(io.BytesIO(payload)) as img:
            out = img.resize((target_width, target_height))
            buf = io.BytesIO()
            out.save(buf, format="PNG" if fmt == "png" else "JPEG")
            return buf.getvalue()
    except Exception:
        return None


def _resize_payload(
    payload: bytes,
    target_width: int,
    target_height: int,
    kernel: str = "stub",
) -> tuple[str, int | None, int | None, bytes]:
    """One payload through the resize kernel. kernel='stub' (default)
    pins the deterministic byte-resample (the reproducible path);
    'auto' tries the real PIL pixel path first and falls back to the
    stub; 'pil' requires the real path and passes the payload through
    untouched when it cannot decode."""
    fmt, w, h, body = _parse_header(payload)
    if fmt == "unknown" or not w or not h:
        return fmt, w, h, payload
    if kernel in ("auto", "pil"):
        real = _pil_resize_bytes(payload, fmt, target_width, target_height)
        if real is not None:
            return fmt, target_width, target_height, real
        if kernel == "pil":
            return fmt, w, h, payload
    ratio = (target_width * target_height) / (w * h)
    n_out = max(1, int(len(body) * ratio)) if body else 0
    resampled = (
        bytes(body[(i * len(body)) // n_out] for i in range(n_out))
        if body
        else b""
    )
    header = (
        _png_header_bytes(target_width, target_height)
        if fmt == "png"
        else _jpeg_header_bytes(target_width, target_height)
    )
    return fmt, target_width, target_height, header + resampled


def resize_assets(
    df_with_payload: DataFrame,
    target_width: int,
    target_height: int,
    kernel: str = "stub",
) -> DataFrame:
    """Arrow-batched resize over the binary asset column. kernel='stub'
    (the DEFAULT: output bytes must not depend on which libraries the
    worker environment happens to have — a genuinely decodable payload
    under an 'auto' default would resample differently per worker, so
    the real pixel path is explicit opt-in) pins the deterministic
    byte-resample. kernel='auto' uses a REAL pixel resample via PIL
    whenever PIL is importable on the workers AND the payload decodes
    as an image, re-encoding to the source container format; otherwise
    — PIL absent (this sandbox has none) or a synthetic/poison payload
    — it falls back to the deterministic stand-in: parse the container
    header,
    emit a new VALID header (CRC-correct PNG IHDR / SOF0) carrying the
    target dimensions, and resample the body to the area-scaled length
    by index striding. kernel='pil' demands the real path and passes
    undecodable payloads through untouched. The schema, Arrow batching,
    header rebuild, and partition sizing are identical across kernels.
    Unknown containers pass through untouched rather than raising — a
    poison payload must not kill the stage. Output payloads re-decode
    to the target dims via the same sniffing rules (pinned by test)."""
    if kernel not in ("auto", "pil", "stub"):
        raise ValueError(f"unknown resize kernel {kernel!r}")

    def _resize_one(
        payload: bytes,
    ) -> tuple[str, int | None, int | None, bytes]:
        return _resize_payload(payload, target_width, target_height, kernel)

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = pdf["payload"].map(_resize_one)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": parsed.map(lambda t: t[0]),
                    "width": parsed.map(lambda t: t[1]),
                    "height": parsed.map(lambda t: t[2]),
                    "payload": parsed.map(lambda t: t[3]),
                }
            )

    return df_with_payload.mapInPandas(do, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = (
    "doc_id bigint, frame_idx int, ts_ms bigint, n_frame_bytes int, "
    "frame binary"
)


def sample_frames(
    df_with_payload: DataFrame,
    frame_bytes: int = 256,
    stride: int = 4,
    fps: int = 30,
) -> DataFrame:
    """Arrow-batched frame sampling for video-as-binary: the body splits
    into fixed-size pseudo-frames and every stride-th frame becomes its
    OWN OUTPUT ROW — the 1->N fan-out shape real video sampling needs,
    which is why this is mapInPandas (row-count-changing) and not a
    scalar UDF. ts_ms derives from the frame index at `fps`. The frame
    split is the deterministic stand-in for a container demuxer (swap
    for ffmpeg in production); schema, fan-out, and batch handling are
    the real thing. Unknown containers contribute zero rows. At corpus
    scale the fan-out multiplies row counts, not bytes read — sampled
    frames reference sliced payload bytes, and downstream feature
    extraction stays columnar over the exploded rows."""

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "frame_idx": [],
                "ts_ms": [],
                "n_frame_bytes": [],
                "frame": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                fmt, _, _, body = _parse_header(payload)
                if fmt == "unknown":
                    continue
                n_frames = (len(body) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, stride):
                    chunk = body[fi * frame_bytes : (fi + 1) * frame_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(fi)
                    out["ts_ms"].append(fi * 1000 // fps)
                    out["n_frame_bytes"].append(len(chunk))
                    out["frame"].append(chunk)
            yield pd.DataFrame(out)

    return df_with_payload.mapInPandas(do, schema=FRAMES_SCHEMA)


# --- Audio (WAV / RIFF) ------------------------------------------------

AUDIO_SCHEMA = (
    "doc_id bigint, n_bytes bigint, format string, sample_rate int, "
    "channels int, bits int, n_samples bigint, duration_ms bigint, "
    "n_body_bytes bigint"
)


def _hex4le(col: Column) -> Column:
    """8-hex-char LITTLE-endian (RIFF byte order) encoding of an int
    column: big-endian hex with its byte pairs reversed."""
    be = F.lpad(F.hex(col), 8, "0")
    return F.concat(
        F.substring(be, 7, 2),
        F.substring(be, 5, 2),
        F.substring(be, 3, 2),
        F.substring(be, 1, 2),
    )


def _hex2le(col: Column) -> Column:
    """4-hex-char little-endian encoding of an int column."""
    be = F.lpad(F.hex(col), 4, "0")
    return F.concat(F.substring(be, 3, 2), F.substring(be, 1, 2))


def wav_header(
    sample_rate: Column, channels: Column, bits: Column, n_samples: Column
) -> Column:
    """Canonical 44-byte PCM WAV header (RIFF + fmt + data chunk
    declarations), built entirely JVM-side — hex concat + unhex column
    expressions, no UDF, exactly like container_header above. All
    multi-byte fields are little-endian per RIFF. The declared data
    size is n_samples * block_align; as with the JPEG path, the body
    that follows is the document's bytes, not entropy-coded samples —
    the HEADER-sniffing contract is what the decode parses against."""
    block_align = (channels * bits / F.lit(8)).cast("int")
    byte_rate = (sample_rate * block_align).cast("int")
    data_size = (n_samples * block_align).cast("int")
    fmt_chunk = F.concat(
        F.lit("666D7420"),  # "fmt "
        F.lit("10000000"),  # chunk size 16, LE
        F.lit("0100"),  # audio format 1 = PCM, LE
        _hex2le(channels),
        _hex4le(sample_rate),
        _hex4le(byte_rate),
        _hex2le(block_align),
        _hex2le(bits),
    )
    riff = F.concat(
        F.lit("52494646"),  # "RIFF"
        _hex4le(data_size + F.lit(36)),  # 4 ("WAVE") + 24 (fmt) + 8 (data hdr)
        F.lit("57415645"),  # "WAVE"
        fmt_chunk,
        F.lit("64617461"),  # "data"
        _hex4le(data_size),
    )
    return F.unhex(riff)


def attach_audio_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The audio twin of attach_binary_payload: a real canonical WAV
    header + the document bytes as the opaque body. Every acoustic
    parameter derives deterministically from doc_id (sample rate from
    {8000, 16000, 22050, 44100}, 1-2 channels, 8-or-16 bit, up to 48k
    declared samples) so a differential oracle can recompute each
    decoded field arithmetically while the engine path must actually
    parse the RIFF bytes."""
    sr = (
        F.when(F.col("doc_id") % 4 == 0, 8000)
        .when(F.col("doc_id") % 4 == 1, 16000)
        .when(F.col("doc_id") % 4 == 2, 22050)
        .otherwise(44100)
        .cast("int")
    )
    channels = (F.col("doc_id") % 2 + 1).cast("int")
    bits = F.when(F.col("doc_id") % 3 == 0, 8).otherwise(16).cast("int")
    n_samples = (F.col("doc_id") % 48000 + 1).cast("int")
    return df.select(
        "doc_id",
        F.concat(
            wav_header(sr, channels, bits, n_samples),
            F.encode(F.col(text_col), "UTF-8"),
        ).alias("payload"),
    )


def _decode_wav_bytes(payload: bytes) -> dict:
    """Parse a RIFF/WAVE header: verify the RIFF + WAVE tags, walk the
    chunk list for `fmt ` (channels/sample-rate/bits at their LE
    offsets) and `data` (declared size -> n_samples, duration). Poison
    bytes degrade to format='unknown' with NULL fields — at corpus
    scale a truncated or hostile payload must never kill the stage
    (fuzz-pinned, like the image parsers)."""
    none = {
        "n_bytes": len(payload) if payload is not None else 0,
        "format": "unknown",
        "sample_rate": None,
        "channels": None,
        "bits": None,
        "n_samples": None,
        "duration_ms": None,
        "n_body_bytes": None,
    }
    if (
        payload is None
        or len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WAVE"
    ):
        return none
    sr = ch = bits = None
    n_samples = duration = body_n = None
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if tag == b"fmt " and size >= 16 and pos + 8 + 16 <= len(payload):
            ch, sr = struct.unpack("<HI", payload[pos + 10 : pos + 16])
            (bits,) = struct.unpack("<H", payload[pos + 22 : pos + 24])
        elif tag == b"data":
            if sr is None or ch is None or not bits:
                return none  # data before a valid fmt chunk
            block = ch * bits // 8
            if block <= 0:
                return none
            n_samples = size // block
            duration = n_samples * 1000 // sr if sr else None
            body_n = len(payload) - (pos + 8)
            break
        pos += 8 + size + (size % 2)  # RIFF chunks are word-aligned
    if n_samples is None:
        return none
    return {
        "n_bytes": len(payload),
        "format": "wav",
        "sample_rate": sr,
        "channels": ch,
        "bits": bits,
        "n_samples": n_samples,
        "duration_ms": duration,
        "n_body_bytes": body_n,
    }


def decode_audio_assets(df_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched RIFF/WAVE header decode over a binary column —
    the audio member of the decode family (images: decode_assets;
    video-ish: sample_frames). Swap the body handling for a real codec
    (soundfile/ffmpeg) in production; header parse, schema, and batch
    shape carry over unchanged."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(_decode_wav_bytes)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    **{
                        k: meta.map(lambda m, k=k: m[k])
                        for k in (
                            "n_bytes",
                            "format",
                            "sample_rate",
                            "channels",
                            "bits",
                            "n_samples",
                            "duration_ms",
                            "n_body_bytes",
                        )
                    },
                }
            )

    return df_with_payload.mapInPandas(decode, schema=AUDIO_SCHEMA)
