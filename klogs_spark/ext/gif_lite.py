"""Pure-Python GIF codec (LZW) — closing the engine's final decode stub.

Same no-library discipline as the PNG (``multimodal.py``), JPEG
(``jpeg_lite.py``) and msgpack (``msgpack_lite.py``) codecs: implemented
from the public GIF87a/GIF89a specification.

* :func:`decode_gif_pixels` — first-frame decode: header + logical screen
  descriptor, global/local color tables, extension blocks skipped (GCE
  transparency noted but not composited — single-frame contract),
  interlace pass reordering, and the variable-width LZW decompressor
  (CLEAR/EOI codes, dictionary growth to 12 bits). Returns
  ``(width, height, 3, rgb_bytes)`` via the palette, or None when the
  payload is not a GIF; malformed streams raise ValueError loudly.
* :func:`encode_gif` — single-frame GIF87a encoder for test/dev payloads:
  indexed pixels + a caller-supplied palette, real variable-width LZW
  compression with dictionary reset at 4096 entries.

GIF is lossless, so encode→decode is the identity on palette-mapped
pixels — fuzz-pinned in tests and hash-checked externally by the
``multimodal_gif_stats`` registry query (the oracle recomputes the stats
from the synth pattern formula, so a bug in LZW bit packing, dictionary
growth, sub-block framing, or palette mapping breaks the hash).
"""

from __future__ import annotations


def _lzw_compress(indices: bytes, min_code_size: int) -> bytes:
    """GIF variable-width LZW: emits CLEAR first, resets at 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # GIF packs LSB-first
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    # Width timing EMULATES THE DECODER exactly: the decoder assigns one
    # table slot per code read (after the first following a clear) and
    # widens when its table size reaches 1<<width — which lags the
    # encoder's own define schedule by one code and, crucially, keeps
    # ticking on the final flush code that defines nothing encoder-side.
    # Tracking (emitted-codes, decoder-size) instead of the encoder's
    # next_code keeps every code — including the tail flush and EOI — at
    # the width the decoder will actually read it with.
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    dec_size = clear + 2
    emitted_data = 0
    emit(clear, width)

    def emit_data(code: int) -> None:
        nonlocal width, dec_size, emitted_data
        emit(code, width)
        emitted_data += 1
        if emitted_data >= 2:  # decoder defines a slot after this read
            dec_size += 1
            if dec_size >= (1 << width) and width < 12:
                width += 1

    buf = b""
    for b in indices:
        cand = buf + bytes([b])
        if cand in table:
            buf = cand
            continue
        emit_data(table[buf])
        table[cand] = next_code
        next_code += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
            dec_size = clear + 2
            emitted_data = 0
        buf = bytes([b])
    if buf:
        emit_data(table[buf])
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("gif: LZW stream truncated (no EOI)")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: first code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:  # deferred-clear convention: encoders
                table.append(prev + entry[:1])  # stop defining at 4096
        elif code == len(table) and code < 4096:  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: LZW code out of range")
        if prev is not None and len(table) >= (1 << width) and width < 12:
            width += 1
        out += entry
        prev = entry


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_pixels(
    payload: bytes,
) -> tuple[int, int, int, bytes] | None:
    """(width, height, 3, rgb_bytes) for the FIRST image in a GIF87a/89a
    stream; None when not a GIF; ValueError on malformed data."""
    p = payload or b""
    if p[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        return _decode_gif(p)
    except IndexError as exc:  # any out-of-bounds read = truncation
        raise ValueError("gif: truncated stream") from exc


def _decode_gif(p: bytes) -> tuple[int, int, int, bytes]:
    if len(p) < 13:
        raise ValueError("gif: truncated header")
    flags = p[10]
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = p[i:i + 3 * n]
        i += 3 * n
    while i < len(p):
        b = p[i]
        if b == 0x3B:  # trailer before any image
            raise ValueError("gif: no image descriptor")
        if b == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(p) and p[i] != 0:
                i += 1 + p[i]
            i += 1
            continue
        if b != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{b:02X}")
        # image descriptor
        w = int.from_bytes(p[i + 5:i + 7], "little")
        h = int.from_bytes(p[i + 7:i + 9], "little")
        iflags = p[i + 9]
        i += 10
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = p[i:i + 3 * n]
            i += 3 * n
        if ct is None:
            raise ValueError("gif: no color table for image")
        min_code = p[i]
        i += 1
        lzw = bytearray()
        while i < len(p) and p[i] != 0:
            ln = p[i]
            lzw += p[i + 1:i + 1 + ln]
            i += 1 + ln
        idx = _lzw_decompress(bytes(lzw), min_code)
        if len(idx) < w * h:
            raise ValueError(
                f"gif: decoded {len(idx)} indices for {w * h} pixels"
            )
        idx = idx[:w * h]
        if iflags & 0x40:  # interlaced: reorder rows
            rows = [idx[r * w:(r + 1) * w] for r in range(h)]
            ordered: list[bytes | None] = [None] * h
            src = 0
            for start, step in _INTERLACE_PASSES:
                for r in range(start, h, step):
                    ordered[r] = rows[src]
                    src += 1
            idx = b"".join(ordered)  # type: ignore[arg-type]
        ncolors = len(ct) // 3
        out = bytearray(w * h * 3)
        for k, ix in enumerate(idx):
            if ix >= ncolors:
                raise ValueError("gif: palette index out of range")
            out[3 * k:3 * k + 3] = ct[3 * ix:3 * ix + 3]
        return w, h, 3, bytes(out)
    raise ValueError("gif: truncated stream")


def encode_gif(
    width: int,
    height: int,
    indices: bytes,
    palette: bytes,
) -> bytes:
    """Single-frame GIF87a from palette ``indices`` (row-major) and an RGB
    ``palette`` (3 bytes per entry, length a power of two in 2..256)."""
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError("gif: dimensions must fit u16 (1..65535)")
    n = len(palette) // 3
    if n & (n - 1) or not 2 <= n <= 256 or len(palette) != 3 * n:
        raise ValueError("gif: palette must be 2..256 power-of-two entries")
    if len(indices) != width * height:
        raise ValueError("gif: index buffer size mismatch")
    if indices and max(indices) >= n:
        raise ValueError("gif: index out of palette range")
    depth = max(1, (n - 1).bit_length())
    min_code = max(2, depth)  # LZW minimum code size must be >= 2
    out = bytearray(b"GIF87a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0])
    out += palette
    out += b"\x2c" + bytes(4)  # image at (0,0)
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0])  # no local table, not interlaced
    out += bytes([min_code])
    lzw = _lzw_compress(indices, min_code)
    for j in range(0, len(lzw), 255):
        chunk = lzw[j:j + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
