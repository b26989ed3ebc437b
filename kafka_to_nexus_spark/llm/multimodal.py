"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery (schemas, batch iteration, partition-preserving
transforms) is real and tested; the pixel/sample codec step is STUBBED —
the container has no image/audio libraries — behind ``decode_stub``.
Swap ``decode_stub`` for a real decoder (PIL/ffmpeg) in production;
nothing else changes, because the UDF contract is bytes-in →
features-out per Arrow batch. Container-METADATA decoding is real:
:func:`parse_image_dims` extracts PNG/JPEG dimensions from raw bytes
with the stdlib alone (format-spec parsing, no codec needed).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_stub(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'decode + feature extract': byte histogram folded
    to ``dim`` buckets, normalized. Replace with a real codec in production.

    Raises NotImplementedError for kinds that would require a real codec
    pipeline beyond feature hashing (left to deployment environments).
    """
    if payload is None:
        return [0.0] * dim
    buckets = [0] * dim
    for b in payload:
        buckets[b % dim] += 1
    total = max(sum(buckets), 1)
    return [round(c / total, 6) for c in buckets]


# The swap point the module docstring promises: assign a real codec
# (PIL/ffmpeg), signature ``(payload: bytes, dim: int) -> list[float]``,
# and every extract_features call uses it. While the decoder IS the
# stub, extract_features takes a batch-vectorized fast path that is
# bit-identical to calling the stub per row (tested).
DECODER = decode_stub


def extract_features(df: DataFrame, dim: int = 8, decoder=None) -> DataFrame:
    """mapInPandas over Arrow batches: bytes → fixed-dim feature vector.

    Partition-preserving (no shuffle); each batch is processed vectorized
    in Python. At 100 TB this is the standard shape: binary scan stays
    columnar, only the codec runs in Python workers. ``decoder`` (or the
    module-level ``DECODER``) replaces the stub in production.
    """
    import numpy as np
    import pandas as pd

    decoder = decoder or DECODER
    fast_path = decoder is decode_stub

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [p if p is not None else b"" for p in pdf["payload"]]
            lengths = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                                  count=len(payloads))
            if not fast_path:
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "kind": pdf["kind"],
                        "n_bytes": lengths,
                        "feature": [decoder(p, dim) for p in payloads],
                    }
                )
                continue
            # ONE histogram pass for the whole Arrow batch: flatten all
            # payloads, bucket each byte, and bincount on (row, bucket)
            # pairs — no per-row numpy/bincount call overhead.
            n = len(payloads)
            if n and lengths.sum():
                flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
                row_ids = np.repeat(np.arange(n, dtype=np.int64), lengths)
                hist = np.bincount(
                    row_ids * dim + flat % dim, minlength=n * dim
                ).reshape(n, dim)
            else:
                hist = np.zeros((n, dim), dtype=np.int64)
            totals = np.maximum(lengths, 1)
            ratios = hist / totals[:, None]
            # per-element Python round: correctly-rounded half-to-even,
            # bit-identical to the previous per-row implementation (and to
            # the DuckDB oracle's round_even)
            feats = [
                [round(float(x), 6) for x in row] if ln else [0.0] * dim
                for row, ln in zip(ratios, lengths)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": lengths,
                    "feature": feats,
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL container-metadata decoding: PNG / JPEG dimensions from raw bytes.
# The pixel codec stays stubbed (no image libs in this container), but
# dimension extraction needs only the container format specs (PNG: the
# 8-byte signature + IHDR chunk; JPEG: the marker walk to a SOF segment)
# — pure stdlib, so this leg of "decode" is genuinely implemented, not
# faked. The reference has no multimodal surface; this is part of the
# LLM-pipeline extension (SURVEY §2.9 L17/L18).
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# SOF0–SOF15 minus DHT(C4)/JPG(C8)/DAC(CC), per ITU T.81 Table B.1
_JPEG_SOF = frozenset(
    {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
     0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
)

DIMS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def parse_image_dims(payload: bytes | None) -> tuple[str, int, int] | None:
    """(format, width, height) from a PNG or JPEG byte string, None if the
    payload is not a parseable image.

    PNG: signature + first chunk must be IHDR (spec-mandated); width and
    height are its first two big-endian u32s. JPEG: walk the marker
    sequence from SOI, skipping variable-length segments, until a start-
    of-frame marker; height/width are bytes 1–4 of its payload. Truncated
    or malformed input returns None rather than raising — at 100 TB some
    payloads WILL be garbage, and a poison byte string must not kill the
    executor task."""
    if not payload:
        return None
    if payload[:8] == _PNG_SIG:
        if len(payload) < 24 or payload[12:16] != b"IHDR":
            return None
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        return ("png", w, h) if w and h else None
    if payload[:2] == b"\xff\xd8":
        i, n = 2, len(payload)
        while i + 2 <= n:
            if payload[i] != 0xFF:
                return None
            # T.81 B.1.1.2: any number of 0xFF fill bytes may pad the
            # space before a marker — skip them, don't reject the file
            while i + 1 < n and payload[i + 1] == 0xFF:
                i += 1
            if i + 2 > n:
                return None
            marker = payload[i + 1]
            if marker in (0xDA, 0xD9):
                # SOS/EOI before any SOF: dimensions can't follow (a SOF
                # must precede the scan), and walking entropy-coded data
                # as markers risks misreading FF Cx pairs as a SOF
                return None
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:
                i += 2  # standalone markers carry no length
                continue
            if i + 4 > n:
                return None
            seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
            if seglen < 2:
                return None
            if marker in _JPEG_SOF:
                if i + 9 > n:
                    return None
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                return ("jpeg", w, h) if w and h else None
            i += 2 + seglen
        return None
    return None


def image_dims(df: DataFrame) -> DataFrame:
    """Arrow-batched header parse: binary payload → (fmt, width, height).

    Partition-preserving mapInPandas over just (media_id, payload) —
    column pruning keeps the scan narrow, and the per-row work is a few
    branch-y byte reads, so the Python stage is I/O-shaped. Unparseable
    payloads yield null fmt/width/height (nullable Int32 Arrow arrays)."""
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [parse_image_dims(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "fmt": [p[0] if p else None for p in parsed],
                    "width": pd.array(
                        [p[1] if p else None for p in parsed], dtype="Int32"
                    ),
                    "height": pd.array(
                        [p[2] if p else None for p in parsed], dtype="Int32"
                    ),
                }
            )

    return df.select("media_id", "payload").mapInPandas(batches, DIMS_SCHEMA)


WAV_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def parse_wav_meta(
    payload: bytes | None,
) -> tuple[int, int, int, int] | None:
    """(channels, sample_rate, bits, duration_ms) from a RIFF/WAVE byte
    string, None if unparseable — the audio twin of
    :func:`parse_image_dims` (stdlib-only container parsing; the sample
    codec itself stays stubbed).

    RIFF chunk walk with word alignment: the ``fmt `` chunk carries
    channels/rate/bits little-endian, ``data``'s size plus the byte rate
    gives the duration. Truncated/malformed input returns None."""
    if (
        not payload
        or len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WAVE"
    ):
        return None
    i, n = 12, len(payload)
    channels = rate = bits = None
    data_size = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        if cid == b"fmt ":
            if size < 16:
                # a fmt chunk too small to hold the PCM fields: reading
                # fixed offsets would consume the NEXT chunk's bytes as
                # channels/rate/bits — garbage metadata instead of null
                return None
            if i + 24 > n:
                return None
            channels = int.from_bytes(payload[i + 10 : i + 12], "little")
            rate = int.from_bytes(payload[i + 12 : i + 16], "little")
            bits = int.from_bytes(payload[i + 22 : i + 24], "little")
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if not channels or not rate or not bits or bits % 8 or data_size is None:
        return None
    bytes_per_sec = rate * channels * (bits // 8)
    return (channels, rate, bits, data_size * 1000 // bytes_per_sec)


def wav_meta(df: DataFrame) -> DataFrame:
    """Arrow-batched RIFF parse: binary payload → audio metadata columns.
    Same shape as :func:`image_dims` — pruned (id, payload) scan,
    partition-preserving, nulls on garbage."""
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [parse_wav_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "channels": pd.array(
                        [p[0] if p else None for p in parsed], dtype="Int32"
                    ),
                    "sample_rate": pd.array(
                        [p[1] if p else None for p in parsed], dtype="Int32"
                    ),
                    "bits": pd.array(
                        [p[2] if p else None for p in parsed], dtype="Int32"
                    ),
                    "duration_ms": pd.array(
                        [p[3] if p else None for p in parsed], dtype="Int64"
                    ),
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, WAV_META_SCHEMA
    )


MP4_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("timescale", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def parse_mp4_meta(payload: bytes | None) -> tuple[int, int] | None:
    """(timescale, duration_ms) from an ISO BMFF / MP4 byte string, None
    if unparseable — the video leg of the container-metadata trio.

    Box walk: top-level boxes are (u32 size, 4-byte type); ``moov`` is a
    pure container whose children include ``mvhd`` (movie header), where
    version 0 carries timescale/duration as u32s at offsets 12/16 of the
    box payload and version 1 as u32/u64 at 20/24. size==1 means a u64
    largesize follows; size==0 means to-end-of-file. Truncated or
    malformed input returns None."""
    if not payload or len(payload) < 8:
        return None

    def walk(lo: int, hi: int, depth: int = 0):
        i = lo
        while i + 8 <= hi:
            size = int.from_bytes(payload[i : i + 4], "big")
            btype = payload[i + 4 : i + 8]
            body = i + 8
            if size == 1:
                if i + 16 > hi:
                    return None
                size = int.from_bytes(payload[i + 8 : i + 16], "big")
                body = i + 16
            elif size == 0:
                size = hi - i
            if size < body - i or i + size > hi:
                return None
            if btype == b"moov" and depth == 0:
                return walk(body, i + size, 1)
            if btype == b"mvhd" and depth == 1:
                ver = payload[body] if body < hi else None
                if ver == 0 and body + 20 <= hi:
                    ts = int.from_bytes(payload[body + 12 : body + 16], "big")
                    dur = int.from_bytes(payload[body + 16 : body + 20], "big")
                elif ver == 1 and body + 32 <= hi:
                    ts = int.from_bytes(payload[body + 20 : body + 24], "big")
                    dur = int.from_bytes(payload[body + 24 : body + 32], "big")
                else:
                    return None
                return (ts, dur * 1000 // ts) if ts else None
            i += size
        return None

    # a real MP4 leads with ftyp, but the parser only requires SOME
    # known top-level box first, so header-only fixtures stay small
    if payload[4:8] not in (b"ftyp", b"moov", b"free", b"mdat", b"wide"):
        return None
    return walk(0, len(payload))


def mp4_meta(df: DataFrame) -> DataFrame:
    """Arrow-batched ISO-BMFF parse — same contract as :func:`image_dims`
    / :func:`wav_meta`: pruned (id, payload) scan, nulls on garbage."""
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [parse_mp4_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "timescale": pd.array(
                        [p[0] if p else None for p in parsed], dtype="Int32"
                    ),
                    "duration_ms": pd.array(
                        [p[1] if p else None for p in parsed], dtype="Int64"
                    ),
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, MP4_META_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media, frame_ts) — the
    explode happens JVM-side from duration metadata; the actual frame
    decode would run in the mapInPandas stage above."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def resize_spec(df: DataFrame, max_side: int = 224) -> DataFrame:
    """Image resize *spec*: target dims preserving aspect ratio, computed
    JVM-side from metadata; the pixel work belongs to the codec stage."""
    w, h = F.col("width"), F.col("height")
    scale = F.least(F.lit(max_side) / w, F.lit(max_side) / h, F.lit(1.0))
    return df.filter(F.col("kind") == "image").select(
        "media_id",
        w.alias("width"),
        h.alias("height"),
        F.round(w * scale).cast("int").alias("target_width"),
        F.round(h * scale).cast("int").alias("target_height"),
    )
