"""Pure-Python baseline JPEG codec — the last multimodal decode stub, closed.

No imaging library exists in this container, so (as with the PNG codec in
``multimodal.py`` and the msgpack codec in ``msgpack_lite.py``) the format
is implemented from its public specification (ITU-T T.81 / ISO 10918-1):

* :func:`decode_jpeg_baseline` — a GENERAL baseline sequential decoder:
  marker walk (APPn/COM skipped, DRI honored), 8-bit DQT tables, SOF0
  frame header, canonical Huffman tables rebuilt from DHT ``bits``/
  ``huffval`` exactly as Annex C specifies, entropy decode with byte
  un-stuffing and RSTn predictor resets, dequantization + inverse zigzag,
  float IDCT (numpy orthonormal DCT-II matrices), level shift, and BT.601
  YCbCr→RGB for 3-component scans. Chroma subsampling (4:2:0 / 4:2:2 /
  any divisor Hi×Vi factors) decodes through the interleaved-MCU layout
  (T.81 A.2.3) with pixel-replication upsampling. Only progressive/
  hierarchical frames, 12-bit precision, 16-bit quant tables,
  non-divisor sampling factors, and multi-scan (non-interleaved
  component) files are rejected — each with a loud, specific error.
* :func:`encode_jpeg_baseline` — a baseline encoder for test/dev payloads:
  grayscale or RGB at 4:4:4 / 4:2:2 / 4:2:0 (box-mean chroma
  decimation), caller-supplied or flat quant tables, and
  SELF-CHOSEN canonical Huffman tables (all 12 DC categories at 4 bits,
  all 256 AC run/size symbols at 9 bits — Kraft-valid, written to DHT).
  The decoder never assumes these tables; it reads whatever DHT carries,
  so it also decodes Annex-K-coded files from other encoders.

Determinism contract (what lets DuckDB oracle-check a lossy codec): all
rounding is explicit round-half-away-from-zero, so for an image whose
8×8 blocks are CONSTANT the full pipeline collapses to the closed form

    v' = clamp(round(128 + q_dc * round(8*(v-128) / q_dc) / 8))

(AC coefficients exactly zero; DC survives quantization as the only term)
— SQL-expressible, which queries/ext.py's multimodal_jpeg_stats exploits.
Non-constant blocks are pinned by the exact spectral round-trip test in
tests/test_ext.py (pixel blocks built from IDCT of quantized-multiple
spectra round-trip bit-exactly through encode→decode).
"""

from __future__ import annotations

import functools

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
# natural position i  ->  its index in zigzag order (ZIGZAG's inverse)
INV_ZIGZAG = [0] * 64
for _zz_pos, _nat in enumerate(ZIGZAG):
    INV_ZIGZAG[_nat] = _zz_pos
del _zz_pos, _nat

_DCT_A = None  # cached orthonormal DCT-II matrix (pure math, build once)
_ZZ_NP = None  # ZIGZAG as a numpy index array (for vectorized (un)zigzag)
_INV_ZZ_NP = None  # its inverse permutation (nat j <- zigzag _INV_ZZ_NP[j])


def _dct_matrix():
    global _DCT_A, _ZZ_NP, _INV_ZZ_NP
    if _DCT_A is not None:
        return _DCT_A
    import math

    import numpy as np

    a = np.zeros((8, 8))
    for u in range(8):
        c = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * c * math.cos((2 * x + 1) * u * math.pi / 16.0)
    _ZZ_NP = np.array(ZIGZAG)
    _INV_ZZ_NP = np.argsort(_ZZ_NP)
    _DCT_A = a
    return a


def _round_half_away(x):
    """Vectorized round-half-away-from-zero (numpy rounds half-to-even,
    Python 3 round() too — both would diverge from the SQL closed form).
    Values within 1e-6 of a HALF-integer are snapped to it first: the DCT
    matmul carries ~1e-13 float noise, and mathematically-exact .5
    quantization boundaries (every flat block hits one) must round
    deterministically, not by noise sign."""
    import numpy as np

    doubled = np.asarray(x, dtype=np.float64) * 2.0
    rounded = np.rint(doubled)
    snapped = np.where(
        np.abs(doubled - rounded) < 2e-6, rounded, doubled
    ) / 2.0
    return np.sign(snapped) * np.floor(np.abs(snapped) + 0.5)


# --- canonical Huffman (Annex C) -------------------------------------------
def _canonical_codes(bits: list[int], huffval: list[int]) -> dict:
    """symbol -> (code, length) from the DHT ``bits`` (count of codes per
    length 1..16) and ``huffval`` (symbols in code order). Cached per
    table definition — the table is codec metadata shared by every frame,
    so rebuilding it per encode call is pure per-call overhead. Returns a
    fresh copy so no caller can mutate the shared cache entry."""
    return dict(_canonical_codes_build(tuple(bits), tuple(huffval)))


@functools.lru_cache(maxsize=64)
def _canonical_codes_build(bits: tuple, huffval: tuple) -> dict:
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None  # RSTn/EOI hit during fill

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("jpeg: entropy stream truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                # a real marker inside the scan (RSTn or EOI): record it and
                # feed zero bits (spec: segment ends at the marker)
                self.marker = nxt
                b = 0
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        # keep only the unconsumed low bits: an unmasked accumulator grows
        # one byte per fill and turns big-int on megabyte streams
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_to_marker(self) -> None:
        """Consume the recorded RST marker and realign to byte boundary."""
        self.acc = 0
        self.nbits = 0
        self.marker = None
        self.pos += 1  # past the marker code byte (0xFF consumed in _fill)


@functools.lru_cache(maxsize=64)
def _huff_decoder_cached(bits: tuple, huffval: tuple) -> "_HuffDecoder":
    """Decoder-table cache: DHT definitions are codec metadata repeated
    verbatim in every frame of a stream, so the (mincode/maxcode/valptr
    + 16-bit LUT) tables need building once, not once per frame. The
    returned instance is SHARED across callers and must be treated as
    immutable (copying the 64K-entry LUT per frame would defeat the
    cache); decode paths only ever read it."""
    return _HuffDecoder(list(bits), list(huffval))


class _HuffDecoder:
    """Canonical Huffman decode table: (first_code, last_code, offset) per
    length — the Annex F DECODE procedure — plus a 16-bit-window lookup
    table for the fast path (every JPEG code is <= 16 bits, so one peek
    resolves any symbol; libjpeg uses the same shape at 8 bits)."""

    def __init__(self, bits: list[int], huffval: list[int]):
        self.huffval = huffval
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        # lut[window16] = (code_length << 8) | symbol; -1 = no code of
        # <= 16 bits matches the window (invalid stream)
        lut = [-1] * 65536
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.valptr[length] = k
                self.mincode[length] = code
                for j in range(n):
                    entry = (length << 8) | huffval[k + j]
                    lo = (code + j) << (16 - length)
                    hi = (code + j + 1) << (16 - length)
                    lut[lo:hi] = [entry] * (hi - lo)
                code += n
                k += n
                self.maxcode[length] = code - 1
            code <<= 1
        self.lut = lut

    def decode(self, br: _BitReader) -> int:
        code = br.bits(1)
        length = 1
        while code > self.maxcode[length]:
            length += 1
            if length > 16:
                raise ValueError("jpeg: invalid Huffman code in scan")
            code = (code << 1) | br.bits(1)
        return self.huffval[self.valptr[length] + code - self.mincode[length]]


def _receive_extend(br: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = br.bits(s)
    if v < (1 << (s - 1)):  # negative branch (Annex F EXTEND)
        v -= (1 << s) - 1
    return v


def _decode_block(br: _BitReader, dc: _HuffDecoder, ac: _HuffDecoder,
                  pred_val: int):
    """One data unit's zigzag coefficients + updated DC predictor — the
    Annex F block decode with every bit read inlined on LOCAL accumulator
    state (per-symbol method calls dominated dense-block decode; profiled
    r22). Any boundary condition during refill (marker byte, trailing
    0xFF, stream end) syncs the reader BEFORE consuming the troublesome
    byte and finishes the block through the exact slow path, so error
    and segment-boundary behaviour are bit-identical to the method
    calls."""
    zz = [0] * 64
    k = 1  # next AC slot; stage tracks where a slow fallback resumes
    stage = "dc_code"
    s = 0
    if br.marker is None:
        data = br.data
        n = len(data)
        acc, nbits, pos = br.acc, br.nbits, br.pos
        dc_lut, ac_lut = dc.lut, ac.lut
        lut = dc_lut
        need = 16
        while True:
            while nbits < need:  # shared refill for code-peek and extend
                if pos < n:
                    b = data[pos]
                    if b != 0xFF:
                        acc = (acc << 8) | b
                        pos += 1
                        nbits += 8
                        continue
                    if pos + 1 < n and data[pos + 1] == 0x00:
                        acc = (acc << 8) | 0xFF
                        pos += 2
                        nbits += 8
                        continue
                # marker / trailing FF / stream end: sync (pos still at
                # the unconsumed byte) and fall through to the slow path
                br.acc = acc & ((1 << nbits) - 1)
                br.nbits = nbits
                br.pos = pos
                break
            else:
                if stage == "dc_code":
                    e = dc_lut[(acc >> (nbits - 16)) & 0xFFFF]
                    if e < 0:
                        raise ValueError("jpeg: invalid Huffman code in scan")
                    nbits -= e >> 8
                    s = e & 0xFF
                    stage = "dc_extend"
                    need = s
                elif stage == "dc_extend":
                    if s:
                        v = (acc >> (nbits - s)) & ((1 << s) - 1)
                        nbits -= s
                        if v < (1 << (s - 1)):
                            v -= (1 << s) - 1
                        pred_val += v
                    zz[0] = pred_val
                    acc &= (1 << nbits) - 1
                    stage = "ac_code"
                    need = 16
                elif stage == "ac_code":
                    e = ac_lut[(acc >> (nbits - 16)) & 0xFFFF]
                    if e < 0:
                        raise ValueError("jpeg: invalid Huffman code in scan")
                    nbits -= e >> 8
                    rs = e & 0xFF
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            if k < 64:
                                continue
                        # EOB (or ZRL ran past 63 — matches the slow loop's
                        # while k < 64 exit)
                        br.acc = acc & ((1 << nbits) - 1)
                        br.nbits = nbits
                        br.pos = pos
                        return zz, pred_val
                    k += r
                    if k > 63:
                        raise ValueError("jpeg: AC run past block end")
                    stage = "ac_extend"
                    need = s
                else:  # ac_extend
                    v = (acc >> (nbits - s)) & ((1 << s) - 1)
                    nbits -= s
                    if v < (1 << (s - 1)):
                        v -= (1 << s) - 1
                    zz[k] = v
                    acc &= (1 << nbits) - 1
                    k += 1
                    if k >= 64:
                        br.acc = acc & ((1 << nbits) - 1)
                        br.nbits = nbits
                        br.pos = pos
                        return zz, pred_val
                    stage = "ac_code"
                    need = 16
                continue
            break  # refill failed — slow path resumes at `stage`
    # --- slow path (exact method-call semantics), resuming at `stage`
    if stage == "dc_code":
        s = dc.decode(br)
        stage = "dc_extend"
    if stage == "dc_extend":
        pred_val += _receive_extend(br, s)
        zz[0] = pred_val
        stage = "ac_code"
    if stage == "ac_extend":
        zz[k] = _receive_extend(br, s)
        k += 1
        stage = "ac_code"
    while k < 64:
        rs = ac.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("jpeg: AC run past block end")
        zz[k] = _receive_extend(br, s)
        k += 1
    return zz, pred_val


def _magnitude(v: int) -> tuple[int, int]:
    """(category, raw bits) for a DC diff / AC value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


# encoder's self-chosen canonical tables (decoder NEVER assumes these)
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = [x for x in range(256) if x != 255] + [255]

FLAT_Q16 = [16] * 64  # flat quant table => q_dc = 16, SQL-closed-form DC


_SAMPLING_FACTORS = {
    # component (Hi, Vi) triples for 3-channel encodes (ITU-T T.81 A.1.1);
    # luma leads, chroma shares one (1, 1) grid
    "4:4:4": [(1, 1), (1, 1), (1, 1)],
    "4:2:2": [(2, 1), (1, 1), (1, 1)],
    "4:2:0": [(2, 2), (1, 1), (1, 1)],
}


def _box_downsample(plane, fy: int, fx: int, np):
    """Mean over ``fy x fx`` boxes — the conventional chroma decimation.
    Sums of <= 4 uint8-range values divided by a power of two are exact in
    float64, so the determinism contract survives: a flat region stays
    flat with the identical value, no rounding step needed."""
    h, w = plane.shape
    return plane.reshape(h // fy, fy, w // fx, fx).mean(axis=(1, 3))


def encode_jpeg_baseline(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 1,
    quant: list[int] | None = None,
    sampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Baseline sequential JFIF bytes for ``pixels`` (row-major; grayscale
    ``channels=1`` or interleaved RGB ``channels=3``). ``sampling`` picks
    the chroma decimation for RGB encodes: ``4:4:4`` (one block per
    component per MCU), ``4:2:2`` (chroma halved horizontally), or
    ``4:2:0`` (chroma halved both ways) — the latter two emit the
    interleaved-MCU scan layout real camera/web JPEGs use (Y blocks in
    raster order within each MCU, then one Cb and one Cr block).
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    N MCUs (byte-aligned 1-padding, DC predictors reset, marker index
    cycling D0..D7 — T.81 E.1.2/F.1.2.3), the error-resilience layout
    camera JPEGs ship. Edge blocks pad by edge replication (the
    conventional choice)."""
    import numpy as np

    if channels not in (1, 3):
        raise ValueError("jpeg encoder: channels must be 1 or 3")
    if sampling not in _SAMPLING_FACTORS:
        raise ValueError(
            f"jpeg encoder: sampling must be one of "
            f"{sorted(_SAMPLING_FACTORS)}, got {sampling!r}"
        )
    factors = (
        _SAMPLING_FACTORS[sampling] if channels == 3 else [(1, 1)]
    )
    q = list(quant) if quant is not None else FLAT_Q16
    # FLAT_Q16 is a known-valid module constant; only caller tables need
    # the range check (the 64-element scan showed up in per-call profiles)
    if quant is not None and (
        len(q) != 64 or not all(1 <= x <= 255 for x in q)
    ):
        raise ValueError("jpeg encoder: quant must be 64 bytes in 1..255")
    arr = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    if arr.size != width * height * channels:
        raise ValueError("jpeg encoder: pixel buffer size mismatch")
    arr = arr.reshape(height, width, channels)
    if channels == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [arr[..., 0]]

    a = _dct_matrix()
    qmat = np.array([q[k] for k in INV_ZIGZAG]).reshape(8, 8)
    bw = _BitWriter()
    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)

    hmax = max(h for h, _ in factors)
    vmax = max(v for _, v in factors)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    pred = [0] * channels
    # Per component: FDCT + quantize + zigzag of EVERY block in one batched
    # numpy pass (r22, guide §4.2 — vectorize the kernel across blocks, the
    # per-block matmul/round calls dominated the encode at small frame
    # sizes). comp_zz[ci] is the (n_blocks, 64) quantized-coefficient table
    # in block raster order; the MCU loop below only does bit emission.
    comp_zz = []
    comp_last_nz = []
    comp_nbx = []
    for ci, pl in enumerate(planes):
        hi, vi = factors[ci]
        # pad the FULL-RES plane to the MCU grid by edge replication, then
        # decimate — padding first keeps edge boxes full
        ph, pw = mcuy * vmax * 8, mcux * hmax * 8
        pp = np.empty((ph, pw))
        pp[:height, :width] = pl
        pp[height:, :width] = pl[height - 1:height, :]
        pp[:, width:] = pp[:, width - 1:width]
        if (hmax // hi, vmax // vi) != (1, 1):
            pp = _box_downsample(pp, vmax // vi, hmax // hi, np)
        bh, bwd = pp.shape[0] // 8, pp.shape[1] // 8
        blocks = (
            pp.reshape(bh, 8, bwd, 8).transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        # same per-block float ops, batched: a @ (B-128) @ a.T, /qmat, round
        s = np.matmul(np.matmul(a, blocks - 128.0), a.T)
        sq = _round_half_away(s / qmat).astype(np.int64)
        zz = sq.reshape(-1, 64)[:, _ZZ_NP]
        nz = zz[:, 1:] != 0
        last_nz = np.where(
            nz.any(axis=1), 63 - np.argmax(nz[:, ::-1], axis=1), 0
        )
        comp_zz.append(zz.tolist())
        comp_last_nz.append(last_nz.tolist())
        comp_nbx.append(bwd)

    zrl_code, zrl_ln = ac_codes[0xF0]
    eob_code, eob_ln = ac_codes[0x00]

    def emit(ci, by, bx):
        # the bit accumulator runs in LOCALS and syncs back to the writer
        # once per block: the per-symbol bw.write() calls were the single
        # largest encoder cost on dense blocks (profiled r22)
        bi = by * comp_nbx[ci] + bx
        zz = comp_zz[ci][bi]
        acc, nbits, out = bw.acc, bw.nbits, bw.out
        diff = zz[0] - pred[ci]
        pred[ci] = zz[0]
        cat, bits_ = _magnitude(diff)
        code, ln = dc_codes[cat]
        # fuse the code and its value bits into one accumulate
        acc = (acc << (ln + cat)) | (
            ((code & ((1 << ln) - 1)) << cat) | (bits_ & ((1 << cat) - 1))
        )
        nbits += ln + cat
        while nbits >= 8:
            nbits -= 8
            b = (acc >> nbits) & 0xFF
            out.append(b)
            if b == 0xFF:  # byte stuffing
                out.append(0x00)
        run = 0
        last_nz = comp_last_nz[ci][bi]
        for i in range(1, last_nz + 1):
            v = zz[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                acc = (acc << zrl_ln) | zrl_code  # ZRL
                nbits += zrl_ln
                run -= 16
            cat, bits_ = _magnitude(v)
            code, ln = ac_codes[(run << 4) | cat]
            acc = (acc << (ln + cat)) | (
                ((code & ((1 << ln) - 1)) << cat)
                | (bits_ & ((1 << cat) - 1))
            )
            nbits += ln + cat
            while nbits >= 8:
                nbits -= 8
                b = (acc >> nbits) & 0xFF
                out.append(b)
                if b == 0xFF:
                    out.append(0x00)
            run = 0
        if last_nz < 63:
            acc = (acc << eob_ln) | eob_code  # EOB
            nbits += eob_ln
            while nbits >= 8:
                nbits -= 8
                b = (acc >> nbits) & 0xFF
                out.append(b)
                if b == 0xFF:
                    out.append(0x00)
        bw.acc = acc & ((1 << nbits) - 1)
        bw.nbits = nbits

    # interleaved-MCU order (T.81 A.2.3): per MCU, each component
    # contributes its Hi x Vi data units in raster order
    mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # byte-align with 1-padding, emit RSTn, reset predictors
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred[:] = [0] * channels
            mcu += 1
            for ci in range(channels):
                hi, vi = factors[ci]
                for v in range(vi):
                    for h in range(hi):
                        emit(ci, my * vi + v, mx * hi + h)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(q))  # DQT table 0, 8-bit
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([channels])
    for ci in range(channels):
        hi, vi = factors[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0])  # quant table 0
    out += seg(0xC0, sof)

    def dht(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))

    out += dht(0x00, _ENC_DC_BITS, _ENC_DC_VALS)
    out += dht(0x10, _ENC_AC_BITS, _ENC_AC_VALS)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([channels])
    for ci in range(channels):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg_baseline(
    payload: bytes,
) -> tuple[int, int, int, bytes] | None:
    """(width, height, channels, pixel_bytes) for a baseline sequential
    JPEG; None when the payload is not a JPEG at all (no SOI). Raises
    ``ValueError`` with a specific reason for unsupported variants —
    loud, never a fake decode."""
    import numpy as np

    p = payload or b""
    if p[:2] != b"\xff\xd8":
        return None
    qtables: dict[int, list[int]] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    width = height = None
    comps: list[tuple[int, int, int]] = []  # (comp_id, sampling, tq)
    restart_interval = 0
    i = 2
    while i < len(p):
        if p[i] != 0xFF:
            raise ValueError(f"jpeg: expected marker at offset {i}")
        m = p[i + 1]
        i += 2
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            continue  # parameterless
        if m == 0xD9:  # EOI before SOS
            raise ValueError("jpeg: no scan data before EOI")
        ln = int.from_bytes(p[i:i + 2], "big")
        body = p[i + 2:i + ln]
        if m == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                qtables[tq] = list(body[j + 1:j + 65])
                j += 65
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                   0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "jpeg: only baseline sequential (SOF0) is supported, got "
                f"SOF marker 0x{m:02X} (progressive/hierarchical)"
            )
        elif m == 0xC0:  # SOF0
            if body[0] != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if nc not in (1, 3):
                raise ValueError("jpeg: only 1 or 3 components supported")
            comps = [
                (body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c])
                for c in range(nc)
            ]
            hmax = max(s >> 4 for _, s, _ in comps)
            vmax = max(s & 0x0F for _, s, _ in comps)
            for _, samp, _ in comps:
                hi, vi = samp >> 4, samp & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(
                        f"jpeg: sampling factor {hi}x{vi} out of range"
                    )
                if hmax % hi or vmax % vi:
                    raise ValueError(
                        f"jpeg: non-divisor sampling factor {hi}x{vi} "
                        f"(max {hmax}x{vmax}) unsupported"
                    )
        elif m == 0xC4:  # DHT (possibly several tables)
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1:j + 17])
                n = sum(bits)
                vals = list(body[j + 17:j + 17 + n])
                dec = _huff_decoder_cached(tuple(bits), tuple(vals))
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                j += 17 + n
        elif m == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[:2], "big")
        elif m == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            if ns != len(comps):
                raise ValueError(
                    "jpeg: multi-scan (non-interleaved component) files "
                    f"unsupported: scan has {ns} of {len(comps)} components"
                )
            scomp = []
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                idx = next(
                    k for k, (ci, _, _) in enumerate(comps) if ci == cid
                )
                scomp.append((idx, tabs >> 4, tabs & 0x0F))
            return _decode_scan(
                p, i + ln, width, height, comps, scomp, qtables,
                huff_dc, huff_ac, restart_interval, np,
            )
        # APPn / COM / anything else: skip
        i += ln
    raise ValueError("jpeg: no SOS marker found")


def _decode_scan(
    p, pos, width, height, comps, scomp, qtables, huff_dc, huff_ac,
    restart_interval, np,
):
    a = _dct_matrix()
    nc = len(comps)
    # sampling geometry (T.81 A.1.1): an interleaved scan's MCU covers
    # 8*Hmax x 8*Vmax source pixels; component i contributes Hi x Vi data
    # units per MCU. A single-component scan is NON-interleaved: its MCU
    # is one data unit over the component's own (full-resolution-scaled)
    # block grid, regardless of the SOF factors.
    hmax = max(s >> 4 for _, s, _ in comps)
    vmax = max(s & 0x0F for _, s, _ in comps)
    if len(scomp) == 1:
        only = scomp[0][0]
        hi, vi = comps[only][1] >> 4, comps[only][1] & 0x0F
        cw = (width * hi + hmax - 1) // hmax
        ch = (height * vi + vmax - 1) // vmax
        mcux, mcuy = (cw + 7) // 8, (ch + 7) // 8
        factors = {only: (1, 1)}
    else:
        mcux = (width + 8 * hmax - 1) // (8 * hmax)
        mcuy = (height + 8 * vmax - 1) // (8 * vmax)
        factors = {
            idx: (comps[idx][1] >> 4, comps[idx][1] & 0x0F)
            for idx, _, _ in scomp
        }
    planes = {
        idx: np.empty((mcuy * vi * 8, mcux * hi * 8))
        for idx, (hi, vi) in factors.items()
    }
    qmats = []
    for _, _, tq in comps:
        q = qtables.get(tq)
        if q is None:
            raise ValueError(f"jpeg: quant table {tq} missing")
        qmats.append(
            np.array([q[k] for k in INV_ZIGZAG]).reshape(8, 8)
        )
    br = _BitReader(p, pos)
    pred = [0] * nc
    mcu = 0
    # Entropy pass first: decode every block's zigzag coefficients into
    # per-component lists (sequential by nature — each symbol's position
    # depends on the previous), then dequant + inverse zigzag + IDCT run
    # ONCE per component as batched numpy ops (r22, guide §4.2 — the
    # per-block np.zeros/fancy-index/matmul calls dominated the decode at
    # small frame sizes).
    comp_zz: dict[int, list] = {idx: [] for idx in planes}
    comp_pos: dict[int, list] = {idx: [] for idx in planes}
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # predictor reset at RSTn; reader realigns past the marker
                while br.marker is None:
                    br.bits(1)  # drain padding until the marker is seen
                if not (0xD0 <= br.marker <= 0xD7):
                    raise ValueError("jpeg: expected RST marker")
                br.align_to_marker()
                pred = [0] * nc
            mcu += 1
            for idx, td, ta in scomp:
                dc_dec, ac_dec = huff_dc.get(td), huff_ac.get(ta)
                if dc_dec is None or ac_dec is None:
                    raise ValueError("jpeg: Huffman table missing for scan")
                hi, vi = factors[idx]
                for v in range(vi):
                    for h in range(hi):
                        zz, pred[idx] = _decode_block(
                            br, dc_dec, ac_dec, pred[idx]
                        )
                        comp_zz[idx].append(zz)
                        comp_pos[idx].append(
                            ((my * vi + v) * 8, (mx * hi + h) * 8)
                        )
    inv_zz = _INV_ZZ_NP  # nat position j <- zigzag index inv_zz[j]
    for idx, zz_rows in comp_zz.items():
        # same per-block float ops, batched: (nat * qmat), a.T @ . @ a
        nat = np.array(zz_rows, dtype=np.float64)[:, inv_zz].reshape(-1, 8, 8)
        blocks = np.matmul(np.matmul(a.T, nat * qmats[idx]), a)
        plane = planes[idx]
        for bi, (y0, x0) in enumerate(comp_pos[idx]):
            plane[y0:y0 + 8, x0:x0 + 8] = blocks[bi]
    # per-component rounding at the component's native resolution, then
    # pixel-replication upsampling to full frame (values unchanged by the
    # replication, so the determinism contract is unaffected)
    out = []
    for idx in sorted(planes):
        hi, vi = factors[idx] if len(scomp) > 1 else (1, 1)
        if len(scomp) == 1:
            fh = fv = 1
            cw, chh = width, height  # single-comp output is full frame
        else:
            fh, fv = hmax // hi, vmax // vi
            cw = (width * hi + hmax - 1) // hmax
            chh = (height * vi + vmax - 1) // vmax
        pl = np.clip(
            _round_half_away(planes[idx][:chh, :cw] + 128.0), 0, 255
        )
        if (fh, fv) != (1, 1):
            pl = np.repeat(np.repeat(pl, fv, axis=0), fh, axis=1)
        out.append(pl[:height, :width])
    if nc == 3:
        y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
        # note: out[] is already rounded Y'CbCr; BT.601 inverse, then the
        # same explicit rounding — matches the encoder's forward path
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.stack(
            [np.clip(_round_half_away(x), 0, 255) for x in (r, g, b)],
            axis=-1,
        )
        return width, height, 3, rgb.astype(np.uint8).tobytes()
    return width, height, 1, out[0].astype(np.uint8).tobytes()
