"""Multimodal columns — opaque binary payloads with typed metadata.

Driver-mandated EXT surface (BASELINE.json): treat image/audio/video as
``binary`` columns plus a typed metadata struct, with decode / feature
extraction / resize / frame-sampling as Arrow-batched pandas functions over
``mapInPandas``.

Decode status: WAV 16-bit PCM sample decode is REAL (pure-Python byte
parsing, :func:`decode_wav_pcm` / :func:`audio_sample_stats`), as is PNG
PIXEL decode/encode/resize (stdlib zlib codec with all five scanline
filters and CRC checks — :func:`decode_png_pixels` / :func:`encode_png` /
:func:`png_resize_nearest` / :func:`image_pixel_stats`), baseline JPEG
PIXEL decode/encode (pure-Python entropy codec ``jpeg_lite`` — canonical
Huffman from DHT, dequant, numpy IDCT, BT.601; progressive/subsampled
variants raise specific errors), GIF PIXEL decode/encode (pure-Python
variable-width LZW codec ``gif_lite`` — palettes, interlace, dictionary
reset), and all container-header sniffing (PNG/JPEG/GIF/WAV). Image
decode stub count: ZERO — :func:`decode_image` raises
NotImplementedError only for formats outside these three. The Spark-side
plumbing — schema, partition sizing, UDF signature, batch shape — is real
and tested throughout.

Scale notes: binary payloads dominate row size, so MEDIA_SCHEMA keeps
metadata in fixed columns (prunable without touching bytes);
``with_partitioning_for_media`` repartitions by byte budget, not row count,
so a 100 TB corpus of skewed assets still yields executor-sized tasks.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# media kinds the pipeline recognizes
KIND_IMAGE = "image"
KIND_AUDIO = "audio"
KIND_VIDEO = "video"

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),       # image|audio|video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),     # opaque bytes
        StructField("n_bytes", LongType(), True),
        StructField("width", IntegerType(), True),      # image/video
        StructField("height", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),  # audio/video
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("sha256", StringType(), True),
        StructField("feature_dim", IntegerType(), True),
        StructField("feature_norm", DoubleType(), True),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Pixel decode dispatch — returns (width, height, channels,
    raw_bytes). PNG is the pure stdlib-zlib codec
    (:func:`decode_png_pixels`); JPEG is the pure-Python baseline
    sequential codec (``jpeg_lite.decode_jpeg_baseline`` — general DHT
    canonical-Huffman decode, dequant + numpy IDCT, BT.601; progressive /
    subsampled variants raise a specific ValueError); GIF is the
    pure-Python LZW codec (``gif_lite.decode_gif_pixels`` — palettes,
    interlace, deferred-clear). Formats outside these three raise
    loudly rather than fake-decoding. Header-level metadata (dimensions,
    duration) does NOT need this — see :func:`sniff_media_metadata`."""
    decoded = decode_png_pixels(payload)
    if decoded is not None:
        return decoded
    from .gif_lite import decode_gif_pixels
    from .jpeg_lite import decode_jpeg_baseline

    decoded = decode_jpeg_baseline(payload)
    if decoded is not None:
        return decoded
    decoded = decode_gif_pixels(payload)
    if decoded is not None:
        return decoded
    raise NotImplementedError(
        "pixel decode implemented for PNG + baseline JPEG + GIF "
        "(pure Python); wire PIL/cv2 here for exotic variants in production"
    )


def _decode_pixels_tolerant(payload: bytes):
    """(width, height, channels, raw_bytes) or None — the per-row form the
    stats kernels use: at 100 TB some rows are always corrupt/unsupported
    and a stats pass must skip them (NULLs), not abort."""
    d = decode_png_pixels(payload)
    if d is not None:
        return d
    from .gif_lite import decode_gif_pixels
    from .jpeg_lite import decode_jpeg_baseline

    try:
        d = decode_jpeg_baseline(payload)
        if d is not None:
            return d
        return decode_gif_pixels(payload)
    except ValueError:
        return None


# --- real (no-library) container-header parsing -----------------------------
# These parse the actual PNG/JPEG/GIF/WAV binary layouts, so width/height/
# duration_s populate from genuine file bytes without touching the (also
# real) pixel/sample codecs — a metadata pass never pays decode cost.

_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}  # SOF0-15 minus DHT/JPG/DAC


def sniff_media_metadata(
    payload: bytes | None,
) -> tuple[str | None, int | None, int | None, float | None]:
    """(fmt, width, height, duration_s) from container magic + headers.

    Pure-Python byte parsing — no imaging/audio libraries:
    - PNG: IHDR width/height (big-endian u32 at offsets 16/20).
    - JPEG: marker walk to the first SOF frame header (skips COM/APPn/DQT...).
    - GIF: logical-screen descriptor (little-endian u16 at 6/8).
    - WAV: RIFF chunk walk; duration = data bytes / (rate * channels * bps/8).
    Unknown/truncated payloads return all-None rather than raising — at 100 TB
    some rows are always corrupt, and a metadata pass must not abort on them.
    """
    p = payload or b""
    try:
        if p[:8] == b"\x89PNG\r\n\x1a\n" and p[12:16] == b"IHDR":
            return (
                "png",
                int.from_bytes(p[16:20], "big"),
                int.from_bytes(p[20:24], "big"),
                None,
            )
        if p[:3] == b"GIF" and p[3:6] in (b"87a", b"89a"):
            return (
                "gif",
                int.from_bytes(p[6:8], "little"),
                int.from_bytes(p[8:10], "little"),
                None,
            )
        if p[:2] == b"\xff\xd8":  # JPEG SOI; walk marker segments
            i = 2
            while i + 4 <= len(p):
                if p[i] != 0xFF:
                    break
                marker = p[i + 1]
                if marker == 0xFF:  # fill byte
                    i += 1
                    continue
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2  # standalone marker, no length field
                    continue
                seg_len = int.from_bytes(p[i + 2:i + 4], "big")
                if marker in _JPEG_SOF_MARKERS and i + 9 <= len(p):
                    return (
                        "jpeg",
                        int.from_bytes(p[i + 7:i + 9], "big"),
                        int.from_bytes(p[i + 5:i + 7], "big"),
                        None,
                    )
                i += 2 + seg_len
        if p[:4] == b"RIFF" and p[8:12] == b"WAVE":  # WAV chunk walk
            i = 12
            byte_rate = None
            data_size = None
            while i + 8 <= len(p):
                cid = p[i:i + 4]
                size = int.from_bytes(p[i + 4:i + 8], "little")
                if cid == b"fmt ":
                    byte_rate = int.from_bytes(p[i + 16:i + 20], "little")
                elif cid == b"data":
                    data_size = size
                i += 8 + size + (size & 1)  # chunks are word-aligned
            if byte_rate and data_size is not None:
                return "wav", None, None, data_size / byte_rate
    except (IndexError, ValueError):  # pragma: no cover - defensive
        pass
    return None, None, None, None


def synth_png(width: int, height: int) -> bytes:
    """Minimal structurally-valid PNG header (signature + IHDR chunk) — a
    deterministic test/dev payload generator; the IHDR layout is the real
    format, so :func:`sniff_media_metadata` exercises genuine parsing."""
    ihdr = width.to_bytes(4, "big") + height.to_bytes(4, "big") + bytes(
        [8, 2, 0, 0, 0]
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + len(ihdr).to_bytes(4, "big")
        + b"IHDR"
        + ihdr
        + b"\x00\x00\x00\x00"  # CRC not validated by the sniffer
    )


def synth_jpeg(width: int, height: int) -> bytes:
    """Minimal JPEG: SOI + COM segment + SOF0 frame header. The leading COM
    forces the sniffer's marker walk to actually skip a segment."""
    com = b"\xff\xfe" + (2 + 4).to_bytes(2, "big") + b"test"
    sof = (
        b"\xff\xc0"
        + (8 + 3).to_bytes(2, "big")
        + bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0])  # nc=1; comp id 1, 4:4:4, quant table 0
    )
    return b"\xff\xd8" + com + sof


def synth_jpeg_gray_blocks(seed_id: int) -> bytes:
    """Deterministic REAL grayscale baseline JPEG: ``wb x hb`` 8x8 blocks,
    each block CONSTANT at ``(seed_id*37 + j*11) % 256``. Constant blocks
    make the lossy round-trip exactly SQL-expressible (all AC terms zero;
    only the quantized DC survives — see jpeg_lite's determinism
    contract), while still exercising the full entropy path: marker walk,
    DHT canonical Huffman, DC prediction across blocks, EOB runs,
    dequant, IDCT, level shift."""
    import numpy as np

    from .jpeg_lite import encode_jpeg_baseline

    wb = seed_id % 3 + 1
    hb = seed_id % 2 + 1
    w, h = wb * 8, hb * 8
    vals = np.fromiter(
        ((seed_id * 37 + j * 11) % 256 for j in range(wb * hb)),
        dtype=np.uint8, count=wb * hb,
    ).reshape(hb, wb)
    px = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).tobytes()
    return encode_jpeg_baseline(w, h, px, channels=1)


def synth_jpeg_rgb_tiles_420(seed_id: int) -> bytes:
    """Deterministic REAL 4:2:0-subsampled color JPEG: an ``mw x mh`` grid
    of 16x16 MCU tiles (one interleaved MCU each at 4:2:0), every tile a
    CONSTANT RGB color derived from ``seed_id`` and the tile index. Flat
    MCUs keep the lossy round-trip SQL-expressible even through chroma
    decimation (the box mean of a constant is the constant; only the
    quantized DC survives per component), while the payload still
    exercises the full subsampled path: interleaved-MCU entropy layout
    (4 Y + 1 Cb + 1 Cr blocks per MCU), per-component DC prediction,
    chroma upsampling, and BT.601 inversion."""
    import numpy as np

    from .jpeg_lite import encode_jpeg_baseline

    mw = seed_id % 2 + 1
    mh = seed_id % 3 + 1
    img = np.zeros((mh * 16, mw * 16, 3), dtype=np.uint8)
    for j in range(mw * mh):
        ty, tx = divmod(j, mw)
        img[ty * 16:(ty + 1) * 16, tx * 16:(tx + 1) * 16] = (
            (seed_id * 53 + j * 19) % 256,
            (seed_id * 97 + j * 23 + 31) % 256,
            (seed_id * 29 + j * 41 + 77) % 256,
        )
    return encode_jpeg_baseline(
        mw * 16, mh * 16, img.tobytes(), channels=3, sampling="4:2:0"
    )


def synth_gif_indexed(seed_id: int, width: int, height: int) -> bytes:
    """Deterministic REAL GIF87a: the PNG synth pattern as palette indices
    (``(seed_id*31 + k*7) % 251``) through an identity grayscale palette,
    LZW-compressed. Lossless, so the decoded RGB is exactly (v, v, v) per
    pixel — the oracle recomputes stats from the pattern formula."""
    from .gif_lite import encode_gif

    idx = bytes(
        (seed_id * 31 + k * 7) % 251 for k in range(width * height)
    )
    palette = bytes(v for i in range(256) for v in (i, i, i))
    return encode_gif(width, height, idx, palette)


def synth_wav(n_frames: int, sample_rate: int = 1000, channels: int = 1,
              bits: int = 16, data: bytes | None = None) -> bytes:
    """Minimal valid WAV (fmt + data chunk): duration_s =
    n_frames / sample_rate by construction. ``data`` supplies the raw
    sample bytes (length must be n_frames * block); default is silence."""
    block = channels * bits // 8
    byte_rate = sample_rate * block
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
        + block.to_bytes(2, "little") + bits.to_bytes(2, "little")
    )
    data_size = n_frames * block
    payload = bytes(data_size) if data is None else data
    assert len(payload) == data_size, "sample bytes must match frame count"
    data_chunk = b"data" + data_size.to_bytes(4, "little") + payload
    body = b"WAVE" + fmt + data_chunk
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def synth_pcm_samples(seed_id: int, n: int) -> list[int]:
    """Deterministic int16 sample pattern for test/dev WAV payloads:
    ``((seed_id * 31 + j * 7) % 2003) - 1001`` — SQL-reproducible (the
    oracle recomputes it with generate_series) and safely inside int16."""
    return [((seed_id * 31 + j * 7) % 2003) - 1001 for j in range(n)]


# --- real PNG pixel codec (stdlib zlib — no imaging library) ----------------
# PNG's pixel layer is DEFLATE + five byte-delta scanline filters, both
# expressible with the standard library. JPEG (Huffman+DCT) and GIF (LZW)
# needed full entropy codecs — jpeg_lite.py / gif_lite.py provide them in
# pure Python, so ALL THREE image formats now decode for real.


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): nearest of a/b/c to a+b-c,
    ties broken left, up, upper-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def synth_pixel_bytes(seed_id: int, n: int) -> bytes:
    """Deterministic raw pixel byte pattern ``(seed_id*31 + k*7) % 251`` —
    SQL-reproducible (the oracle recomputes it with generate_series), same
    convention as :func:`synth_pcm_samples` for audio."""
    return bytes((seed_id * 31 + k * 7) % 251 for k in range(n))


def encode_png(
    width: int,
    height: int,
    raw: bytes,
    channels: int = 3,
    filters: list[int] | None = None,
) -> bytes:
    """REAL PNG encoder: 8-bit greyscale (1 channel) or truecolor RGB
    (3 channels), non-interlaced, correct chunk CRCs, zlib-compressed IDAT.
    ``raw`` is row-major pixel bytes (len = width*height*channels).
    ``filters`` picks the per-row scanline filter type; the default cycles
    0..4 so a round-trip through :func:`decode_png_pixels` exercises every
    filter's inverse — a decoder bug in any filter breaks byte equality
    (and the oracle hash downstream)."""
    import zlib

    bpp = channels
    stride = width * bpp
    if len(raw) != stride * height:
        raise ValueError("raw length must be width*height*channels")
    color_type = {1: 0, 3: 2}[channels]
    if filters is None:
        filters = [r % 5 for r in range(height)]
    out = bytearray()
    prev = bytes(stride)
    for r in range(height):
        row = raw[r * stride:(r + 1) * stride]
        ft = filters[r]
        out.append(ft)
        for i in range(stride):
            x = row[i]
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                f = x
            elif ft == 1:
                f = (x - a) & 0xFF
            elif ft == 2:
                f = (x - b) & 0xFF
            elif ft == 3:
                f = (x - (a + b) // 2) & 0xFF
            elif ft == 4:
                f = (x - _paeth(a, b, c)) & 0xFF
            else:
                raise ValueError(f"bad filter type {ft}")
            out.append(f)
        prev = row

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            len(body).to_bytes(4, "big") + tag + body
            + zlib.crc32(tag + body).to_bytes(4, "big")
        )

    ihdr = (
        width.to_bytes(4, "big") + height.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


def synth_png_rgb(seed_id: int, width: int, height: int) -> bytes:
    """A real decodable RGB PNG whose pixels follow the SQL-reproducible
    :func:`synth_pixel_bytes` pattern (flat byte index k, row-major RGB) —
    the image twin of the deterministic WAV payloads."""
    return encode_png(width, height, synth_pixel_bytes(seed_id, width * height * 3))


def decode_png_pixels(
    payload: bytes | None,
) -> tuple[int, int, int, bytes] | None:
    """REAL PNG pixel decode — pure Python + stdlib zlib, no imaging
    library. Supports 8-bit greyscale (color type 0) and truecolor RGB
    (type 2), non-interlaced; reverses all five scanline filters (None/
    Sub/Up/Average/Paeth) and verifies every chunk CRC. Returns
    ``(width, height, channels, raw_bytes)`` with raw_bytes row-major, or
    None for anything unsupported/corrupt (the corrupt-row contract of
    sniff_media_metadata — NULL stats, not a task failure)."""
    import zlib

    p = payload or b""
    if p[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    i, ihdr, idat = 8, None, bytearray()
    try:
        while i + 12 <= len(p):
            size = int.from_bytes(p[i:i + 4], "big")
            tag = p[i + 4:i + 8]
            body = p[i + 8:i + 8 + size]
            crc = int.from_bytes(p[i + 8 + size:i + 12 + size], "big")
            if len(body) != size or zlib.crc32(tag + body) != crc:
                return None
            if tag == b"IHDR":
                ihdr = body
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                break
            i += 12 + size
        if ihdr is None or len(ihdr) < 13 or not idat:
            return None
        w = int.from_bytes(ihdr[0:4], "big")
        h = int.from_bytes(ihdr[4:8], "big")
        depth, color, comp, filt, inter = ihdr[8:13]
        if depth != 8 or comp != 0 or filt != 0 or inter != 0:
            return None
        channels = {0: 1, 2: 3}.get(color)
        if channels is None or w < 1 or h < 1:
            return None
        data = zlib.decompress(bytes(idat))
        stride = w * channels
        if len(data) != (stride + 1) * h:
            return None
        import numpy as np

        raw = bytearray()
        prev = bytes(stride)
        pos = 0
        for _r in range(h):
            ft = data[pos]
            pos += 1
            row = bytearray(data[pos:pos + stride])
            pos += stride
            if ft == 1:
                # Sub's recurrence u[j] = f[j] + u[j-ch] (mod 256) is a
                # per-channel-lane cumulative sum — vectorized exactly
                # (r21; the per-byte loop was the decode hot path)
                row = bytearray(
                    (
                        np.cumsum(
                            np.frombuffer(bytes(row), np.uint8)
                            .reshape(w, channels).astype(np.int64),
                            axis=0,
                        ) & 0xFF
                    ).astype(np.uint8).tobytes()
                )
            elif ft == 2:
                # Up adds the prior row pointwise; uint8 wraps mod 256
                row = bytearray(
                    (
                        np.frombuffer(bytes(row), np.uint8)
                        + np.frombuffer(prev, np.uint8)
                    ).tobytes()
                )
            elif ft == 3:
                for j in range(stride):
                    a = row[j - channels] if j >= channels else 0
                    row[j] = (row[j] + (a + prev[j]) // 2) & 0xFF
            elif ft == 4:
                for j in range(stride):
                    a = row[j - channels] if j >= channels else 0
                    c = prev[j - channels] if j >= channels else 0
                    row[j] = (row[j] + _paeth(a, prev[j], c)) & 0xFF
            elif ft != 0:
                return None
            raw += row
            prev = bytes(row)
        return w, h, channels, bytes(raw)
    except (zlib.error, IndexError, ValueError):
        return None


def png_resize_nearest(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor PNG resize: decode → index-map sample → encode.
    Source index per destination pixel is ``(dst * src_dim) // dst_dim``
    (the floor mapping — SQL-reproducible for the oracle). Non-PNG
    payloads fall through to the :func:`decode_image` dispatch (which
    raises for formats without a codec — PNG is the only RE-ENCODE
    target here, so only PNG payloads resize in place)."""
    decoded = decode_png_pixels(payload)
    if decoded is None:
        return decode_image(payload)  # raises for non-image payloads
    sw, sh, ch, raw = decoded
    s_stride = sw * ch
    out = bytearray()
    for y in range(height):
        sy = (y * sh) // height
        for x in range(width):
            sx = (x * sw) // width
            base = sy * s_stride + sx * ch
            out += raw[base:base + ch]
    return encode_png(width, height, bytes(out), channels=ch)


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("n_vals", LongType(), True),
        StructField("peak", LongType(), True),
        StructField("sum_vals", LongType(), True),
        StructField("sum_sq", LongType(), True),
    ]
)


DHASH_GRID = 8  # 8 comparison rows x 8 bits -> the classic 64-bit dHash


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash (dHash) over binary image payloads —
    the standard near-duplicate fingerprint for IMAGE corpora (the
    visual twin of SimHash for text): decode pixels with the engine's
    real codecs, reduce to an integer grayscale (channel sum — scale
    cancels in comparisons), box-partition into a (grid+1) x grid cell
    lattice via exact integer 2-D prefix sums, and set bit (y, x) iff
    cell (y, x) is brighter than its right neighbor. Means are compared
    CROSS-MULTIPLIED (sum_a * n_b > sum_b * n_a), so unequal cell sizes
    from non-divisible dimensions stay exact-integer — no float ever
    enters. Two images with the same 64-bit hash are near-dup
    candidates; banded/hamming pairing composes exactly like
    dedup.simhash. Returns (media_id, width, height, dhash_hi,
    dhash_lo) — the hash split into two non-negative 32-bit halves so
    neither engine ever touches the int64 sign bit. Images smaller than
    the lattice (or undecodable) emit NULLs."""

    def _dh(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        g = DHASH_GRID
        for batch in batches:
            rows = []
            for p in batch["payload"]:
                d = _decode_pixels_tolerant(p)
                if not d or d[0] < g + 1 or d[1] < g:
                    rows.append(None)
                    continue
                w, h, ch, raw = d
                a = (
                    np.frombuffer(raw, dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(h, w, ch)
                    .sum(axis=2)
                )
                pre = np.zeros((h + 1, w + 1), dtype=np.int64)
                pre[1:, 1:] = a.cumsum(axis=0).cumsum(axis=1)
                ys = [r * h // g for r in range(g + 1)]
                xs = [c * w // (g + 1) for c in range(g + 2)]

                def box(y0, y1, x0, x1):
                    return int(
                        pre[y1, x1] - pre[y0, x1] - pre[y1, x0] + pre[y0, x0]
                    )

                bits = 0
                for y in range(g):
                    for x in range(g):
                        s1 = box(ys[y], ys[y + 1], xs[x], xs[x + 1])
                        n1 = (ys[y + 1] - ys[y]) * (xs[x + 1] - xs[x])
                        s2 = box(ys[y], ys[y + 1], xs[x + 1], xs[x + 2])
                        n2 = (ys[y + 1] - ys[y]) * (xs[x + 2] - xs[x + 1])
                        if s1 * n2 > s2 * n1:
                            bits |= 1 << (y * g + x)
                rows.append((w, h, bits >> 32, bits & 0xFFFFFFFF))
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "width": pd.array(
                        [r[0] if r else None for r in rows], dtype="Int32"
                    ),
                    "height": pd.array(
                        [r[1] if r else None for r in rows], dtype="Int32"
                    ),
                    "dhash_hi": pd.array(
                        [r[2] if r else None for r in rows], dtype="Int64"
                    ),
                    "dhash_lo": pd.array(
                        [r[3] if r else None for r in rows], dtype="Int64"
                    ),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _dh,
        schema="media_id long, width int, height int, "
               "dhash_hi long, dhash_lo long",
    )


def image_pixel_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched per-image pixel statistics over binary PNG or baseline
    JPEG payloads (:func:`_decode_pixels_tolerant` dispatch) — the real
    (non-stub) image decode kernel, the image twin of
    :func:`audio_sample_stats`. All stats are exact integers
    (aggregation-order-proof); undecodable rows emit NULLs."""

    def _stats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        def _px_stats(d):
            # exact integer stats via numpy — the per-byte Python
            # generator sums were the kernel's hot loop (r21)
            a = np.frombuffer(d[3], np.uint8).astype(np.int64)
            return (
                d[0], d[1], d[2], a.size,
                int(a.max()) if a.size else 0,
                int(a.sum()), int((a * a).sum()),
            )

        for batch in batches:
            decoded = [_decode_pixels_tolerant(p) for p in batch["payload"]]
            stats = [_px_stats(d) if d else None for d in decoded]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "width": pd.array(
                        [s[0] if s else None for s in stats], dtype="Int32"
                    ),
                    "height": pd.array(
                        [s[1] if s else None for s in stats], dtype="Int32"
                    ),
                    "channels": pd.array(
                        [s[2] if s else None for s in stats], dtype="Int32"
                    ),
                    "n_vals": pd.array(
                        [s[3] if s else None for s in stats], dtype="Int64"
                    ),
                    "peak": pd.array(
                        [s[4] if s else None for s in stats], dtype="Int64"
                    ),
                    "sum_vals": pd.array(
                        [s[5] if s else None for s in stats], dtype="Int64"
                    ),
                    "sum_sq": pd.array(
                        [s[6] if s else None for s in stats], dtype="Int64"
                    ),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _stats, schema=IMAGE_STATS_SCHEMA
    )


def decode_wav_pcm(
    payload: bytes | None,
) -> tuple[int, int, int, int, int] | None:
    """REAL 16-bit PCM WAV sample decode — pure Python, no audio library
    (this closes half the multimodal decode stub: WAV PCM needs nothing
    beyond byte arithmetic, unlike image codecs).

    RIFF chunk walk to the ``fmt `` and ``data`` chunks, then the data
    bytes are interpreted as little-endian signed 16-bit samples. Returns
    ``(sample_rate, channels, n_samples, peak_abs, sum_sq)`` — all exact
    integers, so downstream stats (RMS, loudness) are engine-exact and
    aggregation-order-proof. Non-PCM (fmt tag != 1), non-16-bit, or
    corrupt payloads return None rather than raising (the corrupt-row
    contract of sniff_media_metadata).
    """
    p = payload or b""
    if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    i, fmt, data = 12, None, None
    try:
        while i + 8 <= len(p):
            cid = p[i:i + 4]
            size = int.from_bytes(p[i + 4:i + 8], "little")
            if cid == b"fmt ":
                fmt = p[i + 8:i + 8 + size]
            elif cid == b"data":
                data = p[i + 8:i + 8 + size]
            i += 8 + size + (size & 1)  # chunks are word-aligned
    except (IndexError, ValueError):  # pragma: no cover - defensive
        return None
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt != 1 or bits != 16 or channels < 1 or rate < 1:
        return None
    import numpy as np

    n = len(data) // 2
    # exact integer stats via numpy int64 — the per-sample Python
    # generators were the kernel's hot loop (r21)
    a = np.frombuffer(data[: n * 2], dtype="<i2").astype(np.int64)
    peak = int(np.abs(a).max()) if n else 0
    sum_sq = int((a * a).sum())
    return rate, channels, n, peak, sum_sq


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("peak", LongType(), True),
        StructField("sum_sq", LongType(), True),
    ]
)


def decode_wav_samples(payload: bytes | None):
    """REAL 16-bit PCM WAV decode returning the SAMPLES — the fingerprint
    kernels need per-window energies, so unlike :func:`decode_wav_pcm`
    (which stays allocation-free for the whole-file stats path) this
    materializes the samples — as an exact int64 numpy array (r21; the
    unpacked Python list made every consumer a per-sample interpreter
    loop). Returns (sample_rate, channels, samples_array) or None for
    non-PCM/corrupt payloads."""
    import struct

    import numpy as np

    p = payload or b""
    if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    i, fmt, data = 12, None, None
    while i + 8 <= len(p):
        cid, sz = p[i:i + 4], int.from_bytes(p[i + 4:i + 8], "little")
        body = p[i + 8:i + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)
    if fmt is None or data is None or len(fmt) < 16:
        return None
    try:
        tag, channels = struct.unpack_from("<HH", fmt, 0)
        rate = struct.unpack_from("<I", fmt, 4)[0]
        bits = struct.unpack_from("<H", fmt, 14)[0]
    except struct.error:
        return None
    # same validity gates as decode_wav_pcm (the corrupt-row contract):
    # PCM, 16-bit, sane channel/rate declarations, whole samples
    if tag != 1 or bits != 16 or channels < 1 or rate < 1 or len(data) % 2:
        return None
    return rate, channels, np.frombuffer(data, "<i2").astype(np.int64)


AUDIO_FP_WINDOWS = 32  # -> 31 rising-energy bits, well inside int64


def audio_energy_fingerprint(media: DataFrame) -> DataFrame:
    """Energy-delta audio fingerprint — the audio member of the engine's
    fingerprint family (text: winnowing; image: dHash): decode PCM with
    the real WAV codec, split the sample stream into
    ``AUDIO_FP_WINDOWS`` equal windows, compute each window's exact
    integer energy (Σ s²), and set bit w iff window w+1 is louder than
    window w (the simplified Haitsma-Kalker sign-of-delta scheme).
    Equal-count windows make energies directly comparable — no division,
    no floats — and 31 bits keep the hash a non-negative int64. Streams
    shorter than the window count (or undecodable) emit NULLs. Returns
    (media_id, n_samples, fp)."""

    def _fp(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        g = AUDIO_FP_WINDOWS
        for batch in batches:
            rows = []
            for p in batch["payload"]:
                d = decode_wav_samples(p)
                if d is None or len(d[2]) < g:
                    rows.append(None)
                    continue
                s = d[2]
                n = len(s)
                # exact window energies via one cumulative sum of squares
                # (r21 — the per-sample generator sums were the hot loop);
                # same equal-count bounds w*n//g
                cs = np.concatenate(([0], np.cumsum(s * s)))
                bounds = np.arange(g + 1) * n // g
                e = cs[bounds[1:]] - cs[bounds[:-1]]
                rising = e[1:] > e[:-1]
                fp = int(
                    (rising.astype(np.int64)
                     << np.arange(g - 1, dtype=np.int64)).sum()
                )
                rows.append((n, fp))
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "n_samples": pd.array(
                        [r[0] if r else None for r in rows], dtype="Int64"
                    ),
                    "fp": pd.array(
                        [r[1] if r else None for r in rows], dtype="Int64"
                    ),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _fp, schema="media_id long, n_samples long, fp long"
    )


def audio_zero_crossings(media: DataFrame) -> DataFrame:
    """Zero-crossing analysis over REAL decoded PCM — the classic
    voiced/unvoiced + noisiness signal every audio feature extractor
    (openSMILE, librosa zero_crossing_rate) starts with, here computed
    byte-up with the engine's own WAV codec so the whole path is
    engine-exact integers.

    A crossing at position j (1 <= j < n) is a strict negative-sign flip:
    ``(s[j-1] < 0) != (s[j] < 0)`` — no sign(0) ambiguity, so the rate is
    a pure integer and the oracle replays it bit-exactly. Returns
    (media_id, n_samples, n_crossings, first_crossing [-1 if none],
    crossing_ppm [per-million of the n-1 adjacent pairs; 0 when n < 2]).
    Undecodable payloads emit NULL stats (the corrupt-row contract).
    Cost shape: one Arrow-batched pass, no shuffle."""

    def _zc(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for batch in batches:
            rows = []
            for p in batch["payload"]:
                d = decode_wav_samples(p)
                if d is None:
                    rows.append(None)
                    continue
                s = d[2]
                n = len(s)
                # vectorized strict negative-sign flips (r21): same
                # (s[j-1] < 0) != (s[j] < 0) predicate, computed at once
                neg = s < 0
                flips = neg[1:] != neg[:-1]
                nc = int(flips.sum())
                first = int(np.argmax(flips)) + 1 if nc else -1
                ppm = nc * 1_000_000 // (n - 1) if n >= 2 else 0
                rows.append((n, nc, first, ppm))
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "n_samples": pd.array(
                        [r[0] if r else None for r in rows], dtype="Int64"
                    ),
                    "n_crossings": pd.array(
                        [r[1] if r else None for r in rows], dtype="Int64"
                    ),
                    "first_crossing": pd.array(
                        [r[2] if r else None for r in rows], dtype="Int64"
                    ),
                    "crossing_ppm": pd.array(
                        [r[3] if r else None for r in rows], dtype="Int64"
                    ),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _zc,
        schema="media_id long, n_samples long, n_crossings long, "
               "first_crossing long, crossing_ppm long",
    )


def _riff_chunk(cid: bytes, body: bytes) -> bytes:
    """RIFF chunk with the spec's even-byte padding."""
    return (
        cid + len(body).to_bytes(4, "little") + body
        + (b"\x00" if len(body) & 1 else b"")
    )


def _riff_list(kind: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", kind + body)


def synth_avi_mjpeg(
    frames: list, width: int, height: int, fps: int = 10
) -> bytes:
    """Minimal REAL MJPEG AVI container: RIFF('AVI ') holding an hdrl
    LIST (avih main header + strl/strh/strf video stream headers, MJPG
    fourcc) and a movi LIST with one ``00dc`` chunk per JPEG frame —
    the classic motion-JPEG layout every AVI demuxer understands. Frame
    chunks carry whole baseline JPEGs (odd sizes padded per the RIFF
    even-byte rule)."""
    import struct

    avih = struct.pack(
        "<14I", 1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, len(frames), 0,
        0xFFFFFFFF, 0,
    ) + struct.pack("<4H", 0, 0, width, height)
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(
            b"strl",
            _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf),
        ),
    )
    movi = _riff_list(
        b"movi", b"".join(_riff_chunk(b"00dc", f) for f in frames)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_avi_mjpeg_frames(payload: bytes | None):
    """REAL AVI demux — pure Python RIFF walk (the WAV walker's sibling):
    find the ``movi`` LIST, return every ``..dc`` compressed-frame chunk's
    bytes in stream order. None for non-AVI/corrupt payloads (the
    corrupt-row contract). The frames themselves decode through
    jpeg_lite — container and codec are both engine-real."""
    p = payload or b""
    if p[:4] != b"RIFF" or p[8:12] != b"AVI ":
        return None
    frames: list = []

    def scan_movi(inner: bytes) -> None:
        j = 0
        while j + 8 <= len(inner):
            fcid = inner[j:j + 4]
            fsz = int.from_bytes(inner[j + 4:j + 8], "little")
            if fcid == b"LIST" and inner[j + 8:j + 12] == b"rec ":
                # interleaved AVIs group frames inside 'rec ' sub-LISTs
                scan_movi(inner[j + 12:j + 8 + fsz])
            elif fcid[2:4] == b"dc":
                frames.append(bytes(inner[j + 8:j + 8 + fsz]))
            j += 8 + fsz + (fsz & 1)

    def walk(buf: bytes) -> None:
        i = 0
        while i + 8 <= len(buf):
            cid = buf[i:i + 4]
            sz = int.from_bytes(buf[i + 4:i + 8], "little")
            body = buf[i + 8:i + 8 + sz]
            if cid == b"LIST":
                kind, inner = body[:4], body[4:]
                if kind == b"movi":
                    scan_movi(inner)
                else:
                    walk(inner)
            i += 8 + sz + (sz & 1)

    walk(p[12:])
    # a structurally valid zero-frame AVI is an EMPTY video, not
    # corruption: [] (no rows) vs None (undecodable container)
    return frames


def video_frame_pixel_stats(media: DataFrame) -> DataFrame:
    """Per-FRAME pixel statistics over MJPEG AVI payloads: demux the
    container (:func:`decode_avi_mjpeg_frames`), decode every frame
    through the real JPEG path, and emit one row per frame — the actual
    video-decode pass a multimodal pipeline runs, not a metadata stub.
    Output rows = Σ frames (mapInPandas legitimately expands row
    counts); all stats exact integers. Undecodable containers emit
    nothing; an undecodable FRAME inside a good container emits a NULL
    row at its index (frame-level corruption stays visible)."""

    def _stats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for batch in batches:
            mids, idxs, ws, hs, nv, sv = [], [], [], [], [], []
            for mid, p in zip(batch["media_id"], batch["payload"]):
                frames = decode_avi_mjpeg_frames(p)
                if frames is None:
                    continue
                for fi, fb in enumerate(frames):
                    d = _decode_pixels_tolerant(fb)
                    mids.append(mid)
                    idxs.append(fi)
                    if d is None:
                        ws.append(None); hs.append(None)
                        nv.append(None); sv.append(None)
                    else:
                        w, h, ch, raw = d
                        ws.append(w); hs.append(h)
                        nv.append(len(raw))
                        sv.append(
                            int(np.frombuffer(raw, np.uint8)
                                .sum(dtype=np.int64))
                        )
            yield pd.DataFrame(
                {
                    "media_id": pd.array(mids, dtype="Int64"),
                    "frame_idx": pd.array(idxs, dtype="Int32"),
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "n_vals": pd.array(nv, dtype="Int64"),
                    "sum_vals": pd.array(sv, dtype="Int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _stats,
        schema="media_id long, frame_idx int, width int, height int, "
               "n_vals long, sum_vals long",
    )


VIDEO_CUT_MEAN_DELTA = 32  # gray levels of per-pixel mean shift = a cut


def video_scene_cuts(
    frame_stats: DataFrame, cut_mean_delta: int = VIDEO_CUT_MEAN_DELTA
) -> DataFrame:
    """Shot-boundary (scene-cut) detection over decoded per-frame stats —
    the classic mean-intensity-difference detector (the first stage of
    every keyframe sampler): frame f starts a new shot when its mean
    gray level moves more than ``cut_mean_delta`` from frame f-1.

    Frames within one container share dimensions, so the test is the
    INTEGER cross-product ``|sum_f - sum_{f-1}| > n_vals * delta`` — no
    mean is ever materialized, no float exists. Plan shape: a window
    partitioned BY VIDEO (frames per video are bounded, so every
    partition is tiny regardless of corpus size) feeding one per-video
    aggregate. Returns (media_id, n_frames, n_cuts, first_cut [-1 if
    none], max_delta [max |Δsum|, 0 for single-frame videos])."""
    from pyspark.sql import Window

    w = Window.partitionBy("media_id").orderBy("frame_idx")
    prev = F.lag("sum_vals").over(w)
    delta = F.abs(F.col("sum_vals") - prev)
    is_cut = F.when(prev.isNull(), F.lit(None)).otherwise(
        (delta > F.col("n_vals") * cut_mean_delta).cast("long")
    )
    d = frame_stats.select(
        "media_id", "frame_idx", "n_vals", "sum_vals",
        delta.alias("delta"), is_cut.alias("is_cut"),
    )
    return d.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.sum(F.coalesce(F.col("is_cut"), F.lit(0)))
        .cast("bigint").alias("n_cuts"),
        F.coalesce(
            F.min(F.when(F.col("is_cut") == 1, F.col("frame_idx"))),
            F.lit(-1),
        ).cast("bigint").alias("first_cut"),
        F.coalesce(F.max("delta"), F.lit(0)).cast("bigint")
        .alias("max_delta"),
    )


def audio_sample_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched per-file PCM statistics over binary WAV payloads via
    :func:`decode_wav_pcm` — the real (non-stub) audio decode kernel.
    Rows that are not decodable 16-bit PCM emit NULL stats."""

    def _stats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            decoded = [decode_wav_pcm(p) for p in batch["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "sample_rate": pd.array(
                        [d[0] if d else None for d in decoded], dtype="Int32"
                    ),
                    "channels": pd.array(
                        [d[1] if d else None for d in decoded], dtype="Int32"
                    ),
                    "n_samples": pd.array(
                        [d[2] if d else None for d in decoded], dtype="Int64"
                    ),
                    "peak": pd.array(
                        [d[3] if d else None for d in decoded], dtype="Int64"
                    ),
                    "sum_sq": pd.array(
                        [d[4] if d else None for d in decoded], dtype="Int64"
                    ),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _stats, schema=AUDIO_STATS_SCHEMA
    )


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched header sniff: fills fmt/width/height/duration_s from the
    payload bytes (real parsing, :func:`sniff_media_metadata`). Returns
    (media_id, kind, fmt, width, height, duration_s)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("fmt", StringType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("duration_s", DoubleType(), True),
        ]
    )

    def _sniff(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            sniffed = [sniff_media_metadata(p) for p in batch["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "kind": batch["kind"],
                    "fmt": [s[0] for s in sniffed],
                    "width": pd.array([s[1] for s in sniffed], dtype="Int32"),
                    "height": pd.array([s[2] for s in sniffed], dtype="Int32"),
                    "duration_s": pd.array(
                        [s[3] for s in sniffed], dtype="float64"
                    ),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        _sniff, schema=out_schema
    )


def fake_feature_vector(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic FAKE feature extractor (clearly marked): hashes the
    payload into ``dim`` floats in [0, 1). Stands in for a real encoder so
    the distributed plumbing (batching, schema, partitioning) is testable.

    Construction is SQL-reproducible for the oracle gate: suffix is the ASCII
    digit of i (dim <= 10), and only 56 hash bits are used so the integer
    stays inside signed int64 in any engine.
    """
    assert dim <= 10, "fake extractor supports dim <= 10 (single-digit suffix)"
    out = []
    h = payload or b""
    for i in range(dim):
        d = hashlib.sha256(h + str(i).encode()).digest()
        out.append(int.from_bytes(d[:7], "big") / 2**56)
    return out


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` (not a row UDF): payload bytes cross the Python boundary
    once per Arrow batch. The fake encoder marks where a real model (or a
    GPU-backed batch scorer) slots in with the same signature.
    """

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math

        import pandas as pd

        for batch in batches:
            payloads = batch["payload"]
            feats = [fake_feature_vector(p if p is not None else b"", dim)
                     for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "kind": batch["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "sha256": [
                        hashlib.sha256(p if p is not None else b"").hexdigest()
                        for p in payloads
                    ],
                    "feature_dim": [dim] * len(batch),
                    "feature_norm": [
                        math.sqrt(sum(x * x for x in f)) for f in feats
                    ],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        _extract, schema=FEATURE_SCHEMA
    )


FEATURE_VECTOR_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField(
            "features", ArrayType(DoubleType(), False), False
        ),
    ]
)


def extract_feature_vectors(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction returning the FULL embedding
    vector — pair-alignment scoring (LAION-style image-text curation)
    needs the vector, not just its norm (:func:`extract_features`).
    Same contract: ``mapInPandas`` so payload bytes cross the Python
    boundary once per Arrow batch, and the fake encoder marks where a
    real image tower (CLIP et al.) slots in with the same signature."""

    def _extract(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "features": [
                        fake_feature_vector(
                            p if p is not None else b"", dim
                        )
                        for p in batch["payload"]
                    ],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _extract, schema=FEATURE_VECTOR_SCHEMA
    )


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    kernel=None,
) -> DataFrame:
    """Arrow-batched image resize over binary payloads.

    ``kernel(payload, width, height) -> bytes`` is the decode+resize+encode
    step — by default :func:`png_resize_nearest`, a REAL nearest-neighbor
    resize for PNG payloads (pure stdlib codec); JPEG/GIF payloads decode
    via decode_image but are not RE-encoded here (PNG is the only encode
    target of this kernel — see queries' multimodal_transcode for the
    JPEG->PNG chain); unknown formats raise loudly. The
    distributed plumbing (batch transfer, schema, metadata update) accepts
    any callable kernel and runs it per Arrow batch on executors.
    """
    if kernel is None:
        kernel = png_resize_nearest

    out_schema = MEDIA_SCHEMA

    def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            payloads = [
                kernel(p, width, height) if p is not None else None
                for p in batch["payload"]
            ]
            batch = batch.assign(
                payload=payloads,
                n_bytes=[len(p) if p is not None else 0 for p in payloads],
                width=width,
                height=height,
            )
            yield batch

    return media.mapInPandas(_resize, schema=out_schema)


def with_partitioning_for_media(
    media: DataFrame, target_partition_bytes: int = 128 * 1024 * 1024
) -> DataFrame:
    """Repartition a media table by *byte budget* instead of row count.

    Binary columns skew hard (a video row can be 10^6x an icon row); row-count
    partitioning gives lopsided tasks. Estimate bytes via n_bytes and spread
    rows so each partition carries ~target bytes.
    """
    total = media.agg(F.sum("n_bytes").alias("b")).collect()[0].b or 0
    n_parts = max(1, int(total / target_partition_bytes) + 1)
    return media.repartitionByRange(n_parts, F.col("n_bytes"), F.col("media_id"))


def sample_frames(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Frame-sampling plan for video rows: explodes per-frame timestamps from
    duration metadata (no decode — the real frame grab is the stubbed kernel).
    Returns (media_id, frame_ts) — the work-list a decode stage would map."""
    return (
        media.filter(F.col("kind") == KIND_VIDEO)
        .filter(F.col("duration_s").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor(F.col("duration_s") / every_s).cast("int"),
                )
            ).alias("frame_idx"),
        )
        .select(
            "media_id",
            (F.col("frame_idx") * every_s).alias("frame_ts"),
        )
    )


def image_entropy(media: DataFrame) -> DataFrame:
    """Shannon entropy of each image's decoded pixel histogram — the
    information-density signal multimodal curation filters use (flat or
    synthetic images score low, natural texture high), computed from the
    REAL PNG decode in integer micro-nats.

    The kernel emits the per-image (value, count) histogram (<= 256 rows
    per image — bounded regardless of image size); every downstream step
    is a Catalyst expression mirrored by the oracle: each bin's
    c·ln(c)·1e6 quantizes once (snap-within-2e-6, then floor — the
    lm_bigram discipline), the per-image reduction is an integer sum,
    and H = ln(n) - (Σ c·ln c)/n becomes z_n - Σy // n with z_n
    quantized the same way. Undecodable payloads emit no histogram and
    drop out. Returns (media_id, n_vals, n_distinct_vals,
    entropy_micro_nats)."""

    def _hist(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from collections import Counter

        import pandas as pd

        for batch in batches:
            mids, vals, cnts = [], [], []
            for mid, p in zip(batch["media_id"], batch["payload"]):
                d = decode_png_pixels(p)
                if d is None:
                    continue
                for v, c in Counter(d[3]).items():
                    mids.append(mid)
                    vals.append(int(v))
                    cnts.append(int(c))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(mids, dtype="Int64"),
                    "v": pd.array(vals, dtype="Int32"),
                    "c": pd.array(cnts, dtype="Int64"),
                }
            )

    hist = media.select("media_id", "payload").mapInPandas(
        _hist, schema="media_id long, v int, c long"
    )
    yb = F.log(F.col("c").cast("double")) * F.col("c") * 1e6
    yb = F.when(F.abs(yb - F.round(yb, 0)) < 2e-6, F.round(yb, 0)).otherwise(yb)
    per = hist.select(
        "media_id", "c", F.floor(yb).cast("long").alias("y")
    ).groupBy("media_id").agg(
        F.sum("c").cast("long").alias("n_vals"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_vals"),
        F.sum("y").cast("long").alias("sy"),
    )
    zn = F.log(F.col("n_vals").cast("double")) * 1e6
    zn = F.when(F.abs(zn - F.round(zn, 0)) < 2e-6, F.round(zn, 0)).otherwise(zn)
    return per.select(
        "media_id", "n_vals", "n_distinct_vals",
        (F.floor(zn).cast("long") - F.expr("sy div n_vals"))
        .cast("long").alias("entropy_micro_nats"),
    )
