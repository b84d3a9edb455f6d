"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Two tiers of decode live here:

- REAL header decoders (:func:`parse_png_header`,
  :func:`parse_wav_header`, :func:`parse_jpeg_header`) — genuine
  byte-level PNG/RIFF/JFIF parsing in pure Python (signature
  validation, chunk/segment walking, field extraction at spec
  offsets). The JPEG parser is additionally pinned against FOREIGN
  fixtures (camera/editor-produced JPEGs from the Apache Spark
  distribution, tests/fixtures/jpeg/) cross-checked with Spark's own
  ``image`` data source (Java ImageIO), so its correctness does not
  rest on round-tripping with a builder-written synthesizer.
  No PIL/ffmpeg needed for metadata-grade decoding;
  :func:`png_image_codec` plugs the PNG parser into the
  ``image_features`` codec seam. Matching synthesizers
  (:func:`synthesize_png` — a fully valid zlib-stream RGB8 PNG with
  real CRCs — and :func:`synthesize_wav`) are written independently
  against the specs, so the oracle-backed ``multimodal_*`` registry
  queries cross-check builder and parser against each other and
  against arithmetic the DuckDB twin derives from first principles.
- STUB pixel/content kernels (``default_image_codec``'s feature half)
  for the parts that genuinely need an image/audio library absent in
  this container; the Arrow plumbing around them is real and tested,
  and swapping in PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

# Canonical schema for a multimodal asset table.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_hash", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def default_image_codec(content: bytes) -> tuple[int, int, list[float]]:
    """STUB codec — real impl: PIL.Image.open(io.BytesIO(content)) for
    dimensions + a batched CNN/CLIP embedding for the feature.
    Deterministic fake: dimensions derive from byte length, feature is
    an 8-bin byte histogram (np.frombuffer + bincount keeps even the
    stub vectorized). The contract this codec implements — and that
    tests/test_multimodal_codec.py pins end-to-end with an injected
    fake — is ``bytes -> (width, height, feature list)``; a real
    PIL/ffmpeg drop-in is one :func:`set_image_codec` call.
    """
    n = len(content or b"")
    feature = (
        np.bincount(np.frombuffer(content or b"", dtype=np.uint8) & 7, minlength=8)
        .astype(float)
        .tolist()
    )
    return (64 + n % 256, 64 + (n // 256) % 256, feature)


# Pluggable decode kernel: ``bytes -> (width, height, feature)``.
# None -> default_image_codec. Swapping in a real decoder is a config
# change, not a code change; the Arrow plumbing is identical.
_IMAGE_CODEC = None


def set_image_codec(codec) -> None:
    """Register the image decode kernel used by :func:`image_features`
    (pass None to restore the stub). The codec must be picklable — a
    module-level function or a functools.partial of one."""
    global _IMAGE_CODEC
    _IMAGE_CODEC = codec


def image_features(
    df: DataFrame, batch_hint: int = 1024, codec=None
) -> DataFrame:
    """Extract per-image features via ``mapInPandas`` (Arrow-batched).

    Binary payloads stay in Arrow buffers end-to-end; the output drops
    the payload so downstream stages shuffle only features, which is
    the pattern that keeps a 100 TB image corpus tractable (decode
    once, persist features, never shuffle raw bytes).

    ``codec`` (or a prior :func:`set_image_codec`) supplies the decode
    kernel; the plumbing guarantees it receives raw ``bytes`` per item
    (b"" for NULL payloads) and contributes (width, height, feature)
    while n_bytes/content_hash come from the harness itself.
    """

    from openoa_spark.session import ship_package

    ship_package(df.sparkSession)  # closure refs module-level stub/schema
    decode = codec or _IMAGE_CODEC or default_image_codec

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content) if content is not None else b""
                w, h, feature = decode(raw)
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "n_bytes": len(raw),
                        "content_hash": zlib.crc32(raw),
                        "feature": feature,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURE_SCHEMA.fields]
            )

    return df.select("media_id", "content").mapInPandas(_extract, IMAGE_FEATURE_SCHEMA)


# ------------------------------------------------------- real decoders
#
# Builder (synthesize_*) and parser (parse_*_header) are deliberately
# written against the specs independently — the builder assembles with
# struct.pack format strings, the parser walks chunks and reads fields
# at named offsets — so an offset/endianness bug in either side breaks
# the oracle-backed metadata queries instead of cancelling out.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def parse_png_header(content: bytes):
    """REAL PNG decode (metadata grade): validate the 8-byte
    signature, walk the chunk stream to IHDR, and read big-endian
    width/height plus bit depth and color type. Returns
    ``(width, height, bit_depth, color_type)`` or ``None`` for
    non-PNG / truncated payloads (the corrupt-media detection
    contract — never raises on arbitrary bytes)."""
    import struct

    if content is None or len(content) < 33 or content[:8] != _PNG_SIG:
        return None
    pos = 8
    while pos + 8 <= len(content):
        length = struct.unpack(">I", content[pos:pos + 4])[0]
        ctype = content[pos + 4:pos + 8]
        if ctype == b"IHDR":
            if length != 13 or pos + 8 + 13 > len(content):
                return None
            w, h = struct.unpack(">II", content[pos + 8:pos + 16])
            bit_depth = content[pos + 16]
            color_type = content[pos + 17]
            if w == 0 or h == 0:
                return None
            return (int(w), int(h), int(bit_depth), int(color_type))
        pos += 8 + length + 4  # len + type + data + crc
    return None


def parse_wav_header(content: bytes):
    """REAL WAV (RIFF) decode: validate the RIFF/WAVE magic, walk the
    word-aligned chunk list for ``fmt `` and ``data``, and return
    ``(channels, sample_rate, bits_per_sample, n_samples)`` or
    ``None`` for malformed payloads."""
    import struct

    if (
        content is None
        or len(content) < 12
        or content[:4] != b"RIFF"
        or content[8:12] != b"WAVE"
    ):
        return None
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos:pos + 4]
        clen = struct.unpack("<I", content[pos + 4:pos + 8])[0]
        if cid == b"fmt ":
            if clen < 16 or pos + 24 > len(content):
                return None
            _audio_fmt, ch, rate = struct.unpack(
                "<HHI", content[pos + 8:pos + 16]
            )
            bits = struct.unpack("<H", content[pos + 22:pos + 24])[0]
            fmt = (int(ch), int(rate), int(bits))
        elif cid == b"data":
            # a data chunk whose declared length overruns the payload
            # is a truncated file — reject it here so metadata never
            # reports a full n_samples that decode_wav_samples would
            # refuse (keeps the corrupt-media surface symmetric)
            if pos + 8 + clen > len(content):
                return None
            data_len = int(clen)
        pos += 8 + clen + (clen & 1)  # RIFF chunks are 2-byte aligned
    if fmt is None or data_len is None:
        return None
    ch, rate, bits = fmt
    if ch == 0 or bits == 0 or bits % 8:
        return None
    return (ch, rate, bits, data_len // (ch * (bits // 8)))


def parse_jpeg_header(content: bytes):
    """REAL JPEG decode (metadata grade): validate the SOI marker and
    walk the JFIF/EXIF segment list (length-prefixed, with 0xFF fill
    bytes and standalone markers handled) to the first frame header
    (SOF0–SOF15, excluding DHT/JPG/DAC which share the 0xC0 row), and
    return ``(width, height, precision, n_components)`` or ``None``
    for malformed payloads.

    Unlike PNG/WAV this format has FOREIGN fixtures the builder did
    not synthesize: tests/fixtures/jpeg/* (camera/editor-produced
    JPEGs shipped with the Apache Spark distribution and other
    public packages) are pinned against Spark's own ``image`` data
    source (Java ImageIO — an entirely independent decoder), so the
    parser's correctness does not rest on round-tripping with
    :func:`synthesize_jpeg`."""
    if (
        content is None
        or len(content) < 4
        or content[0] != 0xFF
        or content[1] != 0xD8  # SOI
    ):
        return None
    pos = 2
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            return None  # lost marker sync
        # skip fill bytes: any number of 0xFF may pad before a marker
        while pos < len(content) and content[pos] == 0xFF:
            pos += 1
        if pos >= len(content):
            return None
        marker = content[pos]
        pos += 1
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue  # standalone: TEM, SOI, RSTn — no length field
        if marker == 0xD9:  # EOI before any SOF
            return None
        if pos + 2 > len(content):
            return None
        seg_len = (content[pos] << 8) | content[pos + 1]
        if seg_len < 2 or pos + seg_len > len(content):
            return None  # truncated or corrupt segment
        is_sof = 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC)
        if is_sof:
            if seg_len < 8:
                return None
            precision = content[pos + 2]
            h = (content[pos + 3] << 8) | content[pos + 4]
            w = (content[pos + 5] << 8) | content[pos + 6]
            ncomp = content[pos + 7]
            if w == 0 or h == 0 or ncomp == 0:
                return None
            return (int(w), int(h), int(precision), int(ncomp))
        if marker == 0xDA:
            return None  # scan started without a frame header
        pos += seg_len
    return None


def decode_png_pixels(content: bytes):
    """FULL PNG pixel decode for the profile this engine synthesizes
    (RGB8, color type 2, filter None, zlib IDAT stream) — a real
    decode path: chunk walk, multi-IDAT zlib inflate, scanline
    unfiltering, exact shape validation. Returns an (h, w, 3) uint8
    array, or ``None`` for malformed/unsupported payloads (never
    raises on arbitrary bytes). Interlaced/paletted/other-filter PNGs
    are out of profile and return None — the honest contract for a
    codec whose scope is the engine's own media profile."""
    import struct
    import zlib

    hdr = parse_png_header(content)
    if hdr is None:
        return None
    w, h, bit_depth, color_type = hdr
    if bit_depth != 8 or color_type != 2:
        return None
    pos, idat = 8, b""
    while pos + 8 <= len(content):
        length = struct.unpack(">I", content[pos:pos + 4])[0]
        ctype = content[pos + 4:pos + 8]
        if ctype == b"IDAT":
            if pos + 8 + length > len(content):
                return None
            idat += content[pos + 8:pos + 8 + length]
        pos += 12 + length
    try:
        raw = zlib.decompress(idat)
    except zlib.error:
        return None
    stride = 1 + 3 * w
    if len(raw) != h * stride:
        return None
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    if not (arr[:, 0] == 0).all():  # only filter type None in profile
        return None
    return arr[:, 1:].reshape(h, w, 3)


def decode_wav_samples(content: bytes):
    """FULL WAV sample decode for the engine's media profile (PCM16):
    RIFF chunk walk to ``data``, little-endian int16 interpretation,
    (n_samples, channels) reshape with exact length validation.
    Returns an int16 array or ``None`` for malformed/out-of-profile
    payloads (non-PCM16, truncated data chunk)."""
    import struct

    hdr = parse_wav_header(content)
    if hdr is None:
        return None
    ch, _rate, bits, n = hdr
    if bits != 16:
        return None
    pos = 12
    while pos + 8 <= len(content):
        cid = content[pos:pos + 4]
        clen = struct.unpack("<I", content[pos + 4:pos + 8])[0]
        if cid == b"data":
            if pos + 8 + clen > len(content):
                return None
            raw = content[pos + 8:pos + 8 + clen]
            if len(raw) != n * ch * 2:
                return None
            return np.frombuffer(raw, dtype="<i2").reshape(n, ch)
        pos += 8 + clen + (clen & 1)
    return None


def _per_item_extractor(df: DataFrame, id_col: str, schema, row_fn):
    """Shared Arrow scaffold for every per-payload metadata extractor:
    alias ``id_col`` to the schema's ``media_id``, run ``row_fn(bytes)
    -> dict`` (no media_id key) per payload inside one ``mapInPandas``
    pass, drop the payload on output. One copy of the select/zip/yield
    plumbing so an id-handling bug cannot be re-made per extractor
    (round-6 review: four copies all read ``pdf[id_col]`` after the
    select had renamed it, breaking any non-default id_col)."""
    from openoa_spark.session import ship_package

    ship_package(df.sparkSession)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {
                    "media_id": mid,
                    **row_fn(bytes(c) if c is not None else b""),
                }
                for mid, c in zip(pdf["media_id"], pdf["content"])
            ]
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    return df.select(
        F.col(id_col).alias("media_id"), "content"
    ).mapInPandas(_run, schema)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mean_amp", T.DoubleType(), True),
        T.StructField("max_abs", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("n_frames", T.LongType(), True),
    ]
)


def audio_sample_stats(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Per-clip amplitude statistics from the FULL sample decode
    (:func:`decode_wav_samples`): mean amplitude, peak |sample|, RMS —
    the loudness/clipping screen an audio-corpus pipeline runs before
    feature extraction. int16 sums and sums of squares stay exact in
    float64 at any in-profile clip size, so the stats are
    oracle-checkable. One Arrow map pass; payloads never shuffle."""
    import math

    def _row(raw: bytes) -> dict:
        s = decode_wav_samples(raw)
        if s is None:
            return {"mean_amp": None, "max_abs": None, "rms": None,
                    "n_frames": None}
        flat = s.astype(np.int64).ravel()
        return {
            "mean_amp": float(flat.sum()) / len(flat),
            "max_abs": int(np.abs(flat).max()),
            "rms": math.sqrt(float((flat * flat).sum()) / len(flat)),
            "n_frames": s.shape[0],
        }

    return _per_item_extractor(df, id_col, AUDIO_STATS_SCHEMA, _row)


def png_pixel_stats_codec(content: bytes) -> tuple[int, int, list[float]]:
    """Feature codec backed by the FULL pixel decode: per-channel
    means over the decoded (h, w, 3) array. Same ``image_features``
    seam contract as the header codec; (0, 0, zeros) for payloads
    outside the decodable profile."""
    px = decode_png_pixels(content or b"")
    if px is None:
        return (0, 0, [0.0, 0.0, 0.0])
    h, w, _ = px.shape
    means = px.reshape(-1, 3).mean(axis=0)
    return (int(w), int(h), [float(m) for m in means])


def png_image_codec(content: bytes) -> tuple[int, int, list[float]]:
    """REAL decode path for the :func:`image_features` codec seam:
    dimensions from the PNG IHDR (parse_png_header) plus the 8-bin
    byte-histogram feature. Register with ``set_image_codec`` — same
    contract as the stub, genuine parsing."""
    raw = content or b""
    hdr = parse_png_header(raw)
    if hdr is None:
        return (0, 0, [0.0] * 8)
    w, h, _, _ = hdr
    feature = (
        np.bincount(np.frombuffer(raw, dtype=np.uint8) & 7, minlength=8)
        .astype(float)
        .tolist()
    )
    return (w, h, feature)


# ---------------------------------------------------- synthesizers


def synthesize_png(width: int, height: int, seed: int = 0) -> bytes:
    """A genuinely valid RGB8 PNG: signature, IHDR, one zlib-stream
    IDAT (level-0 stored block — size is exactly ``raw + 11`` bytes,
    so total file size is closed-form arithmetic an oracle can
    replay), IEND; every chunk carries its real CRC32. Pixels are a
    deterministic function of ``seed`` (linear byte ramp). Any PNG
    reader opens the result."""
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = 3 * width
    idx = np.arange(height * stride, dtype=np.int64)
    pix = ((seed * 31 + idx * 7) % 256).astype(np.uint8).reshape(
        height, stride
    )
    raw = b"".join(b"\x00" + r.tobytes() for r in pix)  # filter: None
    if len(raw) >= 60000:
        # one stored block only — keeps len(compressed) == len+11 exact
        raise ValueError("synthetic image too large for one stored block")
    idat = zlib.compress(raw, 0)
    if len(idat) != len(raw) + 11:
        # the closed-form size contract the oracles replay assumes
        # CPython's zlib emits ONE stored block below the cap — fail
        # loudly if a different zlib build splits earlier, rather than
        # shipping sizes the oracle arithmetic silently disagrees with
        raise AssertionError(
            f"zlib stored-block layout drifted: {len(idat)} != "
            f"{len(raw)} + 11"
        )
    return (
        _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def synthesize_wav(
    channels: int, sample_rate: int, n_samples: int, seed: int = 0
) -> bytes:
    """A genuinely valid PCM16 WAV: RIFF/WAVE header, canonical 16-byte
    ``fmt `` chunk, one ``data`` chunk of deterministic int16 samples
    derived from ``seed``. Total size = 44 + 2*channels*n_samples —
    closed-form for the oracle."""
    import struct

    idx = np.arange(channels * n_samples, dtype=np.int64)
    samples = (((seed * 7 + idx * 13) % 65536) - 32768).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels * 2, channels * 2, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synthesize_jpeg(
    width: int, height: int, n_components: int = 3, seed: int = 0
) -> bytes:
    """A structurally valid JPEG marker stream for METADATA-grade
    decoding: SOI, JFIF APP0, a seed-length COM segment, DQT, a real
    SOF0 frame header carrying the requested dimensions/components,
    SOS, deterministic 0xFF-free entropy filler, EOI. The scan data is
    filler (this synthesizer's scope is the header walk, and — unlike
    PNG/WAV — the parser is additionally pinned against FOREIGN
    camera/editor JPEGs, so synth/parse round-trip bugs cannot
    cancel). Total size is closed-form for the oracles:
    ``113 + 5*n_components + (seed % 17) + (60 + (width*height) % 191)``.
    """
    import struct

    if not (0 < width < 65536 and 0 < height < 65536):
        raise ValueError("JPEG dimensions must fit in uint16")
    if not 1 <= n_components <= 255:
        # c=0 would synthesize a payload the parser itself rejects
        # (SOF ncomp==0 -> None), c>255 a struct.error mid-pack —
        # fail loudly at synthesis time instead
        raise ValueError("JPEG n_components must be in [1, 255]")
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    com = bytes((seed * 11 + i * 3) % 255 for i in range(seed % 17))
    dqt = b"\x00" + bytes((i * 5 + 1) % 255 for i in range(64))
    sof = struct.pack(">BHHB", 8, height, width, n_components) + b"".join(
        struct.pack(">BBB", c + 1, 0x11, 0) for c in range(n_components)
    )
    sos = struct.pack(">B", n_components) + b"".join(
        struct.pack(">BB", c + 1, 0) for c in range(n_components)
    ) + b"\x00\x3f\x00"
    n_scan = 60 + (width * height) % 191
    scan = bytes((seed * 7 + i * 13) % 255 for i in range(n_scan))

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    return (
        b"\xff\xd8"                 # SOI
        + seg(0xE0, app0)           # APP0 (18 bytes)
        + seg(0xFE, com)            # COM  (4 + seed%17)
        + seg(0xDB, dqt)            # DQT  (69)
        + seg(0xC0, sof)            # SOF0 (10 + 3c)
        + seg(0xDA, sos)            # SOS  (8 + 2c)
        + scan                      # 60 + (w*h) % 191, no 0xFF bytes
        + b"\xff\xd9"               # EOI
    )


def synthesize_png_column(
    df: DataFrame, id_col: str = "media_id"
) -> DataFrame:
    """Map-only Arrow pass building a binary PNG column from a spec
    frame ``(id_col, _w, _h, _seed)`` -> ``(id_col, content)``. The
    scale shape of a decode stage in reverse: bytes are born in the
    executor and never shuffle (consume them in the same stage)."""
    from openoa_spark.session import ship_package

    ship_package(df.sparkSession)
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "content": [
                        synthesize_png(int(w), int(h), int(s))
                        for w, h, s in zip(pdf["_w"], pdf["_h"], pdf["_seed"])
                    ],
                }
            )

    return df.select(id_col, "_w", "_h", "_seed").mapInPandas(_synth, schema)


def synthesize_wav_column(
    df: DataFrame, id_col: str = "media_id"
) -> DataFrame:
    """As :func:`synthesize_png_column`, for WAV: spec frame
    ``(id_col, _ch, _rate, _n, _seed)`` -> ``(id_col, content)``."""
    from openoa_spark.session import ship_package

    ship_package(df.sparkSession)
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "content": [
                        synthesize_wav(int(c), int(r), int(n), int(s))
                        for c, r, n, s in zip(
                            pdf["_ch"], pdf["_rate"], pdf["_n"], pdf["_seed"]
                        )
                    ],
                }
            )

    return df.select(id_col, "_ch", "_rate", "_n", "_seed").mapInPandas(
        _synth, schema
    )


def synthesize_jpeg_column(
    df: DataFrame, id_col: str = "media_id"
) -> DataFrame:
    """As :func:`synthesize_png_column`, for JPEG: spec frame
    ``(id_col, _w, _h, _c, _seed)`` -> ``(id_col, content)``."""
    from openoa_spark.session import ship_package

    ship_package(df.sparkSession)
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "content": [
                        synthesize_jpeg(int(w), int(h), int(c), int(s))
                        for w, h, c, s in zip(
                            pdf["_w"], pdf["_h"], pdf["_c"], pdf["_seed"]
                        )
                    ],
                }
            )

    return df.select(id_col, "_w", "_h", "_c", "_seed").mapInPandas(
        _synth, schema
    )


IMAGE_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("bit_depth", T.IntegerType(), True),
        T.StructField("color_type", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("n_pixels", T.LongType(), True),
    ]
)


def image_pixel_stats(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Per-image channel means from the FULL pixel decode
    (:func:`decode_png_pixels` — zlib inflate + unfilter, not header
    metadata) in one Arrow ``mapInPandas`` pass. uint8 sums stay exact
    in float64 at any in-profile image size, so the means are
    bit-reproducible and oracle-checkable. NULL stats for payloads
    outside the decodable profile."""

    def _row(raw: bytes) -> dict:
        px = decode_png_pixels(raw)
        if px is None:
            return {"mean_r": None, "mean_g": None, "mean_b": None,
                    "n_pixels": None}
        h, w, _ = px.shape
        m = px.reshape(-1, 3).mean(axis=0)
        return {"mean_r": float(m[0]), "mean_g": float(m[1]),
                "mean_b": float(m[2]), "n_pixels": h * w}

    return _per_item_extractor(df, id_col, PIXEL_STATS_SCHEMA, _row)


AUDIO_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("bits", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def image_metadata(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Decode PNG header metadata for every row of a binary table via
    one Arrow ``mapInPandas`` pass (the payload is dropped on output —
    only scalars shuffle). Malformed payloads yield NULL fields, the
    corrupt-media detection surface."""

    def _row(raw: bytes) -> dict:
        hdr = parse_png_header(raw)
        w, h, bd, ct = hdr if hdr else (None, None, None, None)
        return {"width": w, "height": h, "bit_depth": bd,
                "color_type": ct, "n_bytes": len(raw)}

    return _per_item_extractor(df, id_col, IMAGE_METADATA_SCHEMA, _row)


JPEG_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("precision", T.IntegerType(), True),
        T.StructField("n_components", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def jpeg_metadata(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Decode JPEG frame-header metadata (SOF marker walk:
    width/height/precision/component count) per row — same Arrow shape
    as :func:`image_metadata`; malformed payloads yield NULL fields."""

    def _row(raw: bytes) -> dict:
        hdr = parse_jpeg_header(raw)
        w, h, prec, nc = hdr if hdr else (None, None, None, None)
        return {"width": w, "height": h, "precision": prec,
                "n_components": nc, "n_bytes": len(raw)}

    return _per_item_extractor(df, id_col, JPEG_METADATA_SCHEMA, _row)


def audio_metadata(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Decode WAV header metadata (channels, rate, bits, exact sample
    count, integer-floor duration_ms) per row — same Arrow shape as
    :func:`image_metadata`."""

    def _row(raw: bytes) -> dict:
        hdr = parse_wav_header(raw)
        if hdr:
            ch, rate, bits, n = hdr
            dur = (n * 1000) // rate if rate else None
        else:
            ch = rate = bits = n = dur = None
        return {"channels": ch, "sample_rate": rate, "bits": bits,
                "n_samples": n, "duration_ms": dur, "n_bytes": len(raw)}

    return _per_item_extractor(df, id_col, AUDIO_METADATA_SCHEMA, _row)


def frame_sample_plan(df: DataFrame, every_n_seconds: float = 1.0) -> DataFrame:
    """Video frame-sampling *plan*: expands per-video metadata into
    (media_id, frame_ts) rows with ``sequence``/``explode`` — pure
    Spark; the per-frame decode is the stubbed kernel above.
    Requires meta['duration_s'].
    """
    dur = F.coalesce(F.element_at("meta", "duration_s").cast("double"), F.lit(0.0))
    n = F.greatest(F.floor(dur / every_n_seconds).cast("int"), F.lit(0))
    return df.select(
        "media_id",
        F.explode(
            F.transform(F.sequence(F.lit(0), n), lambda i: i * every_n_seconds)
        ).alias("frame_ts"),
    )


def audio_chunk_plan(
    df: DataFrame, chunk_s: float = 30.0, overlap_s: float = 0.0
) -> DataFrame:
    """Audio chunking *plan*: expands per-clip metadata into
    (media_id, chunk_idx, start_s, end_s) rows — the manifest an
    ASR/audio-embedding stage consumes (e.g. 30 s windows with a small
    overlap so no utterance is cut at every boundary). Pure
    ``sequence``/``explode`` column math over meta['duration_s']; the
    per-chunk decode is the stubbed kernel pattern above. Chunks
    step by ``chunk_s - overlap_s``; the final chunk is truncated at
    the clip end.
    """
    if not 0 <= overlap_s < chunk_s:
        raise ValueError(f"need 0 <= overlap_s < chunk_s, got {overlap_s}")
    step = chunk_s - overlap_s
    dur = F.coalesce(
        F.element_at("meta", "duration_s").cast("double"), F.lit(0.0)
    )
    # chunk i covers [i*step, i*step + chunk_s); last i has i*step < dur
    n = F.greatest(F.ceil(dur / step).cast("int"), F.lit(1))
    return (
        df.select(
            "media_id",
            dur.alias("_dur"),
            F.explode(F.sequence(F.lit(0), n - 1)).alias("chunk_idx"),
        )
        .where(F.col("chunk_idx") * step < F.col("_dur"))
        .select(
            "media_id",
            "chunk_idx",
            (F.col("chunk_idx") * step).alias("start_s"),
            F.least(
                F.col("chunk_idx") * step + chunk_s, F.col("_dur")
            ).alias("end_s"),
        )
    )
