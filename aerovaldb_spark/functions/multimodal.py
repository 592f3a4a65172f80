"""Multimodal columns: image/audio/video as opaque binary + metadata.

Design (per the 100 TB pipeline brief): media rides in DataFrames as
an opaque ``payload BINARY`` column with typed metadata columns, and
every transform is an Arrow-batched Pandas UDF over ``mapInPandas`` —
the payload bytes never round-trip through row-at-a-time Python.

The DEFAULT codec is a deterministic stub (cross-engine oracled);
real decoding is opt-in per call: ``decode_images(decoder=
"builtin-png")`` runs the dependency-free pure-Python PNG codec
(:mod:`.png_codec`, stdlib zlib — real pixels, CRC-verified), and
``decoder="pillow"`` uses Pillow for arbitrary formats where it is
installed. Everything around the codec — schema, batch iteration,
partitioning, output shapes — is identical across backends.

The reference's only multimodal surface is the image-blob routes
(REPORT_IMAGE / MAP_OVERLAY, aerovaldb.py:1322-1398) with extension
sniffing from magic bytes (jsonfiledb.py:927-932) — reproduced here as
``sniff_image_extension``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .._round import round6

if TYPE_CHECKING:
    import pandas as pd

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
    ]
)

_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", ".png"),
    (b"\xff\xd8\xff", ".jpg"),
    (b"GIF87a", ".gif"),
    (b"GIF89a", ".gif"),
    (b"RIFF", ".webp"),  # RIFF....WEBP
    (b"<svg", ".svg"),
    (b"<?xml", ".svg"),
]


def sniff_image_extension(payload: bytes) -> str | None:
    """Magic-byte extension sniffing (reference jsonfiledb.py:927-932
    uses the `filetype` lib; this covers the same formats)."""
    if payload.startswith(b"RIFF") and payload[8:12] == b"WEBP":
        return ".webp"
    if len(payload) > 11 and payload[4:12] in (b"ftypavif", b"ftypavis"):
        return ".avif"
    for magic, ext in _MAGIC:
        if payload.startswith(magic):
            return ext
    return None


def _png_payload(width: int, height: int, body: bytes) -> bytes:
    """Structurally valid PNG prefix: signature + IHDR chunk carrying
    real dimensions (CRC zeroed — header parsers don't verify it)."""
    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + b"\x08\x06\x00\x00\x00"  # bit depth 8, RGBA
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + len(ihdr).to_bytes(4, "big")
        + b"IHDR"
        + ihdr
        + b"\x00\x00\x00\x00"  # CRC (unchecked)
        + body
    )


def _wav_payload(sample_rate: int, body: bytes) -> bytes:
    """Structurally valid WAV prefix: RIFF/WAVE + fmt chunk (PCM,
    mono, 16-bit) followed by a data chunk holding ``body``."""
    fmt = (
        (1).to_bytes(2, "little")  # PCM
        + (1).to_bytes(2, "little")  # mono
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * 2).to_bytes(4, "little")  # byte rate
        + (2).to_bytes(2, "little")  # block align
        + (16).to_bytes(2, "little")  # bits/sample
    )
    chunks = (
        b"WAVEfmt "
        + len(fmt).to_bytes(4, "little")
        + fmt
        + b"data"
        + len(body).to_bytes(4, "little")
        + body
    )
    return b"RIFF" + len(chunks).to_bytes(4, "little") + chunks


WAV_SAMPLE_RATE = 16000


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (seeded by media_id).

    Image and audio payloads carry STRUCTURALLY VALID headers (PNG
    IHDR with the declared dimensions; WAV fmt chunk with a real
    sample rate), so header-parsing operators exercise real binary
    decoding, not trust-the-metadata."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        body = hashlib.sha256(str(i).encode()).digest() * 4
        width = 64 + (i % 8) * 16 if kind != "audio" else None
        height = 48 + (i % 4) * 16 if kind != "audio" else None
        if kind == "image":
            payload = _png_payload(width, height, body)
        elif kind == "audio":
            payload = _wav_payload(WAV_SAMPLE_RATE, body)
        else:
            payload = b"RIFF" + body
        rows.append(
            (
                i,
                kind,
                payload,
                width,
                height,
                1000 * (1 + i % 30) if kind != "image" else None,
                {"image": "png", "audio": "wav", "video": "webm"}[kind],
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def parse_image_dims(payload: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) parsed from REAL header bytes — no
    codec library needed. Supports PNG (IHDR), GIF (logical screen
    descriptor), and baseline/progressive JPEG (SOF marker walk).
    Returns None when the payload is not a recognized image."""
    if payload.startswith(b"\x89PNG\r\n\x1a\n") and payload[12:16] == b"IHDR":
        return (
            "png",
            int.from_bytes(payload[16:20], "big"),
            int.from_bytes(payload[20:24], "big"),
        )
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        return (
            "gif",
            int.from_bytes(payload[6:8], "little"),
            int.from_bytes(payload[8:10], "little"),
        )
    if payload.startswith(b"\xff\xd8\xff"):
        # Walk JPEG segments to the first SOF0-SOF15 frame header.
        i = 2
        while i + 9 < len(payload) and payload[i] == 0xFF:
            marker, seg_len = payload[i + 1], int.from_bytes(
                payload[i + 2 : i + 4], "big"
            )
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return (
                    "jpeg",
                    int.from_bytes(payload[i + 7 : i + 9], "big"),
                    int.from_bytes(payload[i + 5 : i + 7], "big"),
                )
            i += 2 + seg_len
    return None


def parse_wav_sample_rate(payload: bytes) -> int | None:
    """Sample rate from a RIFF/WAVE fmt chunk (walks chunks; no codec
    library). None when the payload is not a WAV."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 16 <= len(payload):
            return int.from_bytes(payload[i + 12 : i + 16], "little")
        i += 8 + size + (size % 2)
    return None


def parse_wav_pcm(payload: bytes) -> tuple[int, bytes]:
    """(sample_rate, pcm16 mono data bytes) from a RIFF/WAVE payload.

    Chunk walk only — no codec library. Raises ``ValueError`` for
    anything that is not mono 16-bit PCM (compressed codecs, multi-
    channel, other bit depths): at scale an unsupported payload must
    be an explicit per-row error the pipeline can quarantine, not a
    silent wrong answer (the png_codec scope convention)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    rate, bits, channels, codec, data = None, None, None, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            codec = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data = body
        i += 8 + size + (size % 2)
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if (codec, channels, bits) != (1, 1, 16):
        raise ValueError(
            f"unsupported WAV (codec={codec} channels={channels} bits={bits}); "
            "only mono 16-bit PCM"
        )
    return rate, data


RESAMPLED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("err", T.StringType()),
    ]
)


def resample_audio(media: DataFrame, target_rate: int) -> DataFrame:
    """REAL audio resample — no dependencies: RIFF chunk walk →
    nearest-sample numpy index map → rebuilt mono-PCM16 WAV at
    ``target_rate``. The audio twin of :func:`resize_images`
    (uniform-sample-rate normalization before feature extraction):
    Arrow-batched ``mapInPandas``, partition-parallel, zero shuffles,
    per-row error quarantine for undecodable/unsupported payloads.
    """
    if target_rate <= 0:
        raise ValueError("target_rate must be positive")

    def resample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for batch in batches:
            out = []
            for row in batch.itertuples(index=False):
                try:
                    rate, data = parse_wav_pcm(bytes(row.payload))
                    samples = np.frombuffer(
                        data[: len(data) - (len(data) % 2)], dtype="<i2"
                    )
                    n_out = max(
                        1, (len(samples) * target_rate) // max(rate, 1)
                    )
                    idx = (np.arange(n_out) * rate) // target_rate
                    resampled = samples[np.minimum(idx, len(samples) - 1)]
                    payload = _wav_payload(
                        target_rate, resampled.astype("<i2").tobytes()
                    )
                    out.append(
                        (row.media_id, payload, target_rate,
                         int(len(resampled)), None)
                    )
                except (ValueError, IndexError, TypeError) as e:
                    # TypeError covers NULL payloads.
                    out.append(
                        (row.media_id, None, None, None,
                         f"error:{e}"[:120])
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in RESAMPLED_SCHEMA.fields]
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        resample, schema=RESAMPLED_SCHEMA
    )


HEADERS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("header_format", T.StringType()),
        T.StructField("header_width", T.IntegerType()),
        T.StructField("header_height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def parse_media_headers(media: DataFrame) -> DataFrame:
    """REAL binary decoding of container headers via mapInPandas: the
    width/height/sample-rate come from the payload bytes themselves,
    not from metadata columns — the verification step a 100 TB ingest
    runs to catch metadata/payload drift. Arrow-batched, map-only, no
    shuffle."""

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            out = []
            for row in batch.itertuples(index=False):
                payload = bytes(row.payload)
                dims = parse_image_dims(payload)
                rate = parse_wav_sample_rate(payload)
                out.append(
                    (
                        row.media_id,
                        row.kind,
                        dims[0] if dims else None,
                        dims[1] if dims else None,
                        dims[2] if dims else None,
                        rate,
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in HEADERS_SCHEMA.fields]
            )

    return media.mapInPandas(parse, schema=HEADERS_SCHEMA)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def _decode_stub(payload: bytes, width: int, height: int) -> tuple[float, str]:
    """Deterministic fake decode: 'luminance' derived from payload hash.

    Hashes the hex ENCODING of the payload (not the raw bytes) so the
    fake is reproducible by any engine with string hash functions —
    q52's DuckDB oracle recomputes it with sha256(lower(hex(payload))).
    Swap point for a real codec: return (mean luma, decoder name).
    """
    h = hashlib.sha256(payload.hex().encode()).digest()
    return int.from_bytes(h[:4], "big") / 2**32, "stub-sha256"


def decode_images(
    media: DataFrame, use_real: bool = False, decoder: str = "stub"
) -> DataFrame:
    """Decode image payloads → per-image stats via mapInPandas.

    Arrow-batched: each Python call receives a pandas batch, payload
    bytes stay in one buffer per batch. Partition-parallel — no
    driver involvement, no shuffle.

    ``decoder`` selects the codec backend:

    - ``"stub"`` (DEFAULT): the deterministic fake
      (:func:`_decode_stub`), which never imports a codec library —
      installing Pillow cannot change or crash the stub path (its
      output is the oracled q52 surface).
    - ``"builtin-png"``: REAL pixel decode via the pure-Python PNG
      codec (:mod:`.png_codec` — stdlib zlib, no dependencies; 8-bit
      grey/RGB/RGBA, CRC-verified). width/height/mean-luma come from
      the actual pixel data. A payload the codec rejects yields a row
      with null stats and ``decoder='error:<reason>'`` so a 100 TB run
      quarantines bad rows instead of failing the job.
    - ``"pillow"`` (or legacy ``use_real=True``): Pillow decoding, any
      format Pillow supports. The dependency is checked once,
      driver-side, at call time so a missing codec fails fast with a
      clear error instead of inside an executor task.
    """
    if use_real:
        decoder = "pillow"
    if decoder not in ("stub", "builtin-png", "pillow"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if decoder == "pillow":
        try:  # driver-side fail-fast; workers re-import per batch
            from PIL import Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - Pillow absent here
            raise ImportError(
                "decode_images(use_real=True) requires Pillow; install "
                "it or use the default deterministic stub (use_real=False)"
            ) from e

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if decoder == "pillow":  # pragma: no cover - exercised only with Pillow
            import io

            import numpy as np
            from PIL import Image
        elif decoder == "builtin-png":
            from .png_codec import png_mean_luma

        for batch in batches:
            out = []
            for row in batch.itertuples(index=False):
                payload = bytes(row.payload)
                if decoder == "pillow":  # pragma: no cover
                    img = Image.open(io.BytesIO(payload))
                    w, h = img.size
                    luma = float(
                        np.asarray(img.convert("L"), dtype="float64").mean()
                        / 255.0
                    )
                    dec = f"pillow-{(img.format or 'unknown').lower()}"
                elif decoder == "builtin-png":
                    try:
                        w, h, luma = png_mean_luma(payload)
                        dec = "builtin-png"
                    except ValueError as e:
                        out.append(
                            (row.media_id, None, None, None, None,
                             f"error:{e}"[:120])
                        )
                        continue
                else:
                    w = int(row.width or 0)
                    h = int(row.height or 0)
                    luma, dec = _decode_stub(payload, w, h)
                out.append((row.media_id, w, h, w * h, luma, dec))
            yield pd.DataFrame(
                out, columns=[f.name for f in DECODED_SCHEMA.fields]
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        decode, schema=DECODED_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("err", T.StringType()),
    ]
)


def resize_images(
    media: DataFrame, width: int, height: int
) -> DataFrame:
    """REAL image resize — no dependencies: decode via the pure-Python
    PNG codec (:mod:`.png_codec`), nearest-neighbor resample with a
    numpy index map, re-encode to PNG. Arrow-batched ``mapInPandas``,
    partition-parallel, zero shuffles; payload bytes never leave the
    executor. The normalization step a multimodal training pipeline
    runs before feature extraction (uniform input dims).

    Per-row error quarantine (decode_images' ``builtin-png``
    convention): a payload the codec rejects — non-PNG, bad CRC,
    unsupported bit depth — yields a row with NULL payload/dims and
    the reason in ``err``, so one bad blob in a 100 TB corpus becomes
    a filterable row, not a failed job.
    """
    if width <= 0 or height <= 0:
        raise ValueError("target dimensions must be positive")

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from .png_codec import decode_png, encode_png

        for batch in batches:
            out = []
            for row in batch.itertuples(index=False):
                try:
                    w, h, c, pixels = decode_png(bytes(row.payload))
                    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(
                        h, w, c
                    )
                    ys = (np.arange(height) * h) // height
                    xs = (np.arange(width) * w) // width
                    resized = arr[ys][:, xs]
                    payload = encode_png(
                        width, height, resized.tobytes(), channels=c
                    )
                    out.append(
                        (row.media_id, payload, width, height, c, None)
                    )
                except (ValueError, IndexError, TypeError) as e:
                    # TypeError: NULL payload; IndexError: CRC-valid
                    # but degenerate 0-width/0-height image.
                    out.append(
                        (row.media_id, None, None, None, None,
                         f"error:{e}"[:120])
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        resize, schema=RESIZED_SCHEMA
    )


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic hash-derived feature vectors (embedding stub) —
    the plumbing (Arrow batches, array<float> output column) is what a
    real model-inference UDF uses."""

    def featurize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for batch in batches:
            ids, feats = [], []
            for row in batch.itertuples(index=False):
                # hex encoding first (like _decode_stub): every engine
                # can recompute sha256 of a hex STRING, so the stub
                # features have an exact cross-engine oracle (q65)
                h = hashlib.sha256(bytes(row.payload).hex().encode()).digest()
                rng = np.frombuffer((h * ((4 * dim) // len(h) + 1))[: 4 * dim],
                                    dtype=">u4").astype("float32")
                feats.append((rng / 2**32).tolist())
                ids.append(row.media_id)
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return media.mapInPandas(featurize, schema=FEATURES_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ms", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled
    frame (stub slices the payload deterministically; a real codec
    would seek/decode). Output explodes rows — partition-local, no
    shuffle."""

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            out = []
            for row in batch.itertuples(index=False):
                dur = int(row.duration_ms or 0)
                payload = bytes(row.payload)
                for idx, ms in enumerate(range(0, max(dur, 1), every_ms)):
                    lo = (idx * 16) % max(len(payload) - 16, 1)
                    out.append((row.media_id, idx, ms, payload[lo : lo + 16]))
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAMES_SCHEMA.fields]
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        sample, schema=FRAMES_SCHEMA
    )


# --------------------------------------------------------------------------
# Graded query surface for the multimodal path.
#
# q51: binary-column manifest over `documents` — the payload column is
# the UTF-8 encoding of the text (deterministic on any engine), and
# every derived column (byte length, content hash, magic-prefix sniff)
# is computed JVM-side on the BINARY column. This is the oracle-checked
# half: it proves binary columns flow through scan→project→aggregate
# exactly like any other type (no Python in the plan).
#
# q52: the Pandas-UDF half — decode_images over a deterministic media
# table (rows-only check: the stubbed codec's output is engine-local).
def q51_binary_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        (F.octet_length(payload) - F.length("text")).alias("multibyte_extra"),
        F.md5(payload).alias("payload_md5"),
        F.when(F.col("text").startswith("<svg"), ".svg")
        .when(F.col("text").startswith("<?xml"), ".svg")
        .otherwise(None)
        .alias("sniffed_ext"),
    )


Q51_SQL = """
SELECT doc_id,
  octet_length(encode(text)) AS n_bytes,
  octet_length(encode(text)) - length(text) AS multibyte_extra,
  md5(text) AS payload_md5,
  CASE WHEN text LIKE '<svg%' THEN '.svg'
       WHEN text LIKE '<?xml%' THEN '.svg'
       ELSE NULL END AS sniffed_ext
FROM documents
"""


def q52_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stub-codec decode stats over the deterministic media table.

    The decode runs as an Arrow-batched Pandas UDF (the real multimodal
    hot path); because the stub derives its fake luma from the payload's
    hex encoding, a DuckDB oracle reconstructs the identical media table
    and decode output in pure SQL — so even the Python-UDF plumbing is
    value-checked against an independent engine.
    """
    decoded = decode_images(synthetic_media(spark, n=96))
    return decoded.select(
        "media_id", "width", "height", "n_pixels", round6("mean_luma").alias("mean_luma"), "decoder"
    )


# Reconstructs synthetic_media(n=96)'s image rows — PNG signature +
# IHDR chunk (len 13, big-endian dims, bit-depth/colour bytes, zeroed
# CRC) + sha256(str(i)) digest ×4 — and the stub decode in SQL.
# unhex() gives digest bytes; lower(hex(payload)) == Python
# payload.hex().
Q52_SQL = r"""
WITH m AS (
  SELECT i AS media_id,
    CAST(64 + (i % 8) * 16 AS INT) AS width,
    CAST(48 + (i % 4) * 16 AS INT) AS height,
    '\x89PNG\x0D\x0A\x1A\x0A'::BLOB ||
      '\x00\x00\x00\x0D'::BLOB || 'IHDR'::BLOB ||
      unhex(lpad(hex(64 + (i % 8) * 16), 8, '0')) ||
      unhex(lpad(hex(48 + (i % 4) * 16), 8, '0')) ||
      '\x08\x06\x00\x00\x00'::BLOB || '\x00\x00\x00\x00'::BLOB ||
      unhex(sha256(CAST(i AS VARCHAR))) || unhex(sha256(CAST(i AS VARCHAR))) ||
      unhex(sha256(CAST(i AS VARCHAR))) || unhex(sha256(CAST(i AS VARCHAR))) AS payload
  FROM generate_series(0, 95) t(i) WHERE i % 3 = 0
)
SELECT media_id, width, height, CAST(width AS BIGINT) * height AS n_pixels,
  ROUND(CAST('0x' || substring(sha256(lower(hex(payload))), 1, 8) AS BIGINT)
        / 4294967296.0, 6) AS mean_luma,
  'stub-sha256' AS decoder
FROM m
"""


def q65_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction (the model-inference UDF shape)
    over the deterministic image set, value-checked cross-engine.

    The stub derives each float32 feature from the payload's sha256 —
    so the DuckDB oracle reconstructs the identical payloads (q52's
    PNG expression), re-derives the u32 lanes from the same hash, and
    models numpy's float32 rounding with CAST(... AS FLOAT). The fold
    for f_sum is left-associative on both sides, making even the
    floating-point sum bit-reproducible.
    """
    feats = extract_features(
        synthetic_media(spark, n=96).filter(F.col("kind") == "image")
    )
    fold = F.aggregate(
        "features", F.lit(0.0), lambda a, x: a + x.cast("double")
    )
    return feats.select(
        "media_id",
        F.size("features").alias("n_features"),
        round6(F.col("features")[0].cast("double")).alias("f00"),
        round6(F.col("features")[7].cast("double")).alias("f07"),
        round6(F.col("features")[15].cast("double")).alias("f15"),
        round6(fold).alias("f_sum"),
    )


def _u4(j: int) -> str:
    # j-th big-endian u32 lane of sha256(payload) repeated to 64 bytes,
    # with numpy's u32→float32 rounding modeled by CAST(... AS FLOAT)
    return (
        "CAST(CAST(CAST('0x' || substring(repeat(sha256(lower(hex(payload))), 2), "
        f"{j * 8 + 1}, 8) AS BIGINT) AS FLOAT) AS DOUBLE) / 4294967296.0"
    )


Q65_SQL = (
    r"""
WITH m AS (
  SELECT i AS media_id,
    '\x89PNG\x0D\x0A\x1A\x0A'::BLOB ||
      '\x00\x00\x00\x0D'::BLOB || 'IHDR'::BLOB ||
      unhex(lpad(hex(64 + (i % 8) * 16), 8, '0')) ||
      unhex(lpad(hex(48 + (i % 4) * 16), 8, '0')) ||
      '\x08\x06\x00\x00\x00'::BLOB || '\x00\x00\x00\x00'::BLOB ||
      unhex(sha256(CAST(i AS VARCHAR))) || unhex(sha256(CAST(i AS VARCHAR))) ||
      unhex(sha256(CAST(i AS VARCHAR))) || unhex(sha256(CAST(i AS VARCHAR))) AS payload
  FROM generate_series(0, 95) t(i) WHERE i % 3 = 0
)
SELECT media_id, 16 AS n_features,
"""
    + f"  ROUND({_u4(0)}, 6) AS f00,\n"
    + f"  ROUND({_u4(7)}, 6) AS f07,\n"
    + f"  ROUND({_u4(15)}, 6) AS f15,\n"
    + "  ROUND("
    + " + ".join(_u4(j) for j in range(16))
    + ", 6) AS f_sum\nFROM m\n"
)


def q73_frame_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling mapInPandas path, value-checked cross-engine:
    the stub slices the payload deterministically, so the oracle
    reconstructs the video payloads and re-slices them in SQL. With
    q52 (decode) and q65 (featurize) this makes all three multimodal
    Pandas-UDF paths oracle-checked — frames are compared by md5 so
    no cross-engine BLOB typing is involved."""
    frames = sample_frames(synthetic_media(spark, n=96))
    return frames.select(
        "media_id",
        "frame_idx",
        "frame_ms",
        F.hex("frame_payload").alias("frame_hex"),
    )


# Video rows are i % 3 == 2: payload = 'RIFF' + sha256(str(i)) x 4
# (132 bytes), duration_ms = 1000 * (1 + i % 30); the stub samples one
# frame per 5000 ms, slicing 16 bytes at (idx*16) % 116. DuckDB can't
# substring a BLOB, so the slice happens on the (uppercase, both
# engines) hex encoding: byte offset x2, length 32.
Q73_SQL = r"""
WITH m AS (
  SELECT i AS media_id,
    upper(hex('RIFF'::BLOB)) || upper(repeat(sha256(CAST(i AS VARCHAR)), 4))
      AS payload_hex,
    1000 * (1 + i % 30) AS duration_ms
  FROM generate_series(0, 95) t(i) WHERE i % 3 = 2
)
SELECT media_id, CAST(idx AS INT) AS frame_idx,
  CAST(idx * 5000 AS INT) AS frame_ms,
  substring(payload_hex, ((idx * 16) % 116) * 2 + 1, 32) AS frame_hex
FROM m, LATERAL (
  SELECT unnest(generate_series(0, (duration_ms - 1) // 5000)) AS idx
)
"""


QUERIES = {
    "q51_binary_manifest": q51_binary_manifest,
    "q52_media_decode": q52_media_decode,
    "q65_media_features": q65_media_features,
    "q73_frame_manifest": q73_frame_manifest,
}

ORACLE = {
    "q51_binary_manifest": Q51_SQL,
    "q52_media_decode": Q52_SQL,
    "q65_media_features": Q65_SQL,
    "q73_frame_manifest": Q73_SQL,
}
