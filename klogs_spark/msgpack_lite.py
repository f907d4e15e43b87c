"""Minimal pure-Python msgpack decoder for Fluent Bit chunk ingest (S1).

The reference's actual wire input is a Fluent Bit msgpack chunk: back-to-back
``[timestamp, record]`` events, where the timestamp is either an FLBTime ext
value (type 0, 8 bytes: big-endian seconds + nanoseconds), a plain uint
epoch, or — since Fluent Bit v2.1 — ``[[FLBTime, metadata], record]``
(/root/reference/main.go:85-103, 238-244). No msgpack library ships in this
environment, so this module implements the public msgpack spec
(github.com/msgpack/msgpack/blob/master/spec.md) for DECODING only — small,
dependency-free, and sufficient for every type Fluent Bit emits.

Ext handling: type 0 ("event time") decodes to float epoch seconds
(sec + nsec/1e9), which ``decode.extract_timestamp`` already accepts; any
other ext type decodes to its raw payload bytes and stringifies downstream
like every other undispatchable value.
"""

from __future__ import annotations

import struct
from typing import Any, Iterator

_F32 = struct.Struct(">f")
_F64 = struct.Struct(">d")
_FLBTIME = struct.Struct(">II")  # seconds, nanoseconds (flb_time ext payload)

EVENT_TIME_EXT = 0


class MsgpackError(ValueError):
    """Malformed or truncated msgpack data."""


def _decode_ext(ext_type: int, payload: bytes) -> Any:
    if ext_type == EVENT_TIME_EXT and len(payload) == 8:
        sec, nsec = _FLBTIME.unpack(payload)
        return sec + nsec / 1e9
    return payload


def _signed8(x: int) -> int:
    return x - 0x100 if x >= 0x80 else x


# Containers deeper than this are treated as malformed input (a DoS guard:
# the iterative decoder itself has no recursion limit, but a 50k-deep
# nesting bomb is never a legitimate Fluent Bit event and upstream
# quarantine paths expect it to fail loudly, not decode).
_MAX_DEPTH = 512

_PENDING = object()  # map slot: key not read yet


_STR_CACHE: dict[bytes, str] = {}
_STR_CACHE_MAX = 1 << 16  # ~64k distinct short strings; a few MB ceiling


def _unpack_iter(buf: bytes, pos: int) -> tuple[Any, int]:
    """Decode one object at ``pos``; return (value, next_pos).

    ITERATIVE core (r12) with REGISTER-based container state (r13): the
    innermost open container lives in three locals (``cur``/``rem``/
    ``key``) and the stack holds only suspended outer frames, so the
    per-item delivery path never indexes ``stack[-1]`` or mutates a
    boxed frame list — on Fluent Bit traffic (~20 tiny objects per
    event, nesting depth 2-3) pushes are rare and scalar delivery is
    the hot edge. Branches are ordered by measured frequency: events
    are almost entirely fixstr / fixmap / fixint, so those resolve in
    1-3 comparisons; FLBTime (fixext8 type 0, one per event) has a
    dedicated branch. Bounds checks are explicit compares (cheap) so
    every malformation raises MsgpackError, never struct.error/
    IndexError.

    fixstr payloads (<=31 bytes: map keys and short enum-ish values,
    which repeat across every event of a chunk) are interned through a
    bounded module-level cache — a dict hit replaces a utf-8 decode +
    str allocation, and the shared str objects also make downstream
    dict-key hashing cheaper. The cache stops ADMITTING past 64k
    entries (lookups continue), so high-cardinality traffic degrades
    to plain decoding instead of unbounded growth.
    """
    end = len(buf)
    f32_at = _F32.unpack_from
    f64_at = _F64.unpack_from
    flb_at = _FLBTIME.unpack_from
    int_from = int.from_bytes
    cache = _STR_CACHE
    cache_get = cache.get
    pending = _PENDING
    # container registers: cur=None means no container is open; key is
    # None for arrays, _PENDING (awaiting key) or the key str for maps
    stack: list = []
    cur = None
    rem = 0
    key = None
    while True:
        if pos >= end:
            raise MsgpackError("truncated: no object at end of buffer")
        b = buf[pos]
        pos += 1
        # --- one header: sets v, or opens a container and continues ---
        if 0xA0 <= b <= 0xBF:          # fixstr (the hot case: map keys)
            np = pos + (b & 0x1F)
            if np > end:
                raise MsgpackError("truncated payload")
            sl = buf[pos:np]
            v = cache_get(sl)
            if v is None:
                v = str(sl, "utf-8", "replace")
                if len(cache) < _STR_CACHE_MAX:
                    cache[sl] = v
            pos = np
        elif b <= 0x7F:                # positive fixint
            v = b
        elif 0x80 <= b <= 0x8F:        # fixmap
            n = b & 0x0F
            if n:
                if len(stack) >= _MAX_DEPTH:
                    raise MsgpackError("nesting too deep")
                stack.append((cur, rem, key))
                cur = {}
                rem = n
                key = pending
                continue
            v = {}
        elif 0x90 <= b <= 0x9F:        # fixarray
            n = b & 0x0F
            if n:
                if len(stack) >= _MAX_DEPTH:
                    raise MsgpackError("nesting too deep")
                stack.append((cur, rem, key))
                cur = []
                rem = n
                key = None
                continue
            v = []
        elif b >= 0xE0:                # negative fixint
            v = b - 0x100
        elif b == 0xD7:                # fixext 8 — FLBTime fast path
            np = pos + 9
            if np > end:
                raise MsgpackError("truncated payload")
            if buf[pos] == EVENT_TIME_EXT:
                sec, nsec = flb_at(buf, pos + 1)
                v = sec + nsec / 1e9
            else:
                v = _decode_ext(_signed8(buf[pos]), buf[pos + 1:np])
            pos = np
        elif b == 0xCB:                # float 64
            if pos + 8 > end:
                raise MsgpackError("truncated payload")
            v = f64_at(buf, pos)[0]
            pos += 8
        elif 0xCC <= b <= 0xCF:        # uint 8/16/32/64
            n = 1 << (b - 0xCC)
            np = pos + n
            if np > end:
                raise MsgpackError("truncated payload")
            v = int_from(buf[pos:np], "big")
            pos = np
        elif 0xD4 <= b <= 0xD8:        # fixext 1/2/4/16 (8 handled above)
            ln = 1 << (b - 0xD4)
            np = pos + 1 + ln
            if np > end:
                raise MsgpackError("truncated payload")
            v = _decode_ext(_signed8(buf[pos]), buf[pos + 1:np])
            pos = np
        elif b == 0xC0:
            v = None
        elif b == 0xC2:
            v = False
        elif b == 0xC3:
            v = True
        elif b == 0xCA:                # float 32
            if pos + 4 > end:
                raise MsgpackError("truncated payload")
            v = f32_at(buf, pos)[0]
            pos += 4
        elif 0xD0 <= b <= 0xD3:        # int 8/16/32/64
            n = 1 << (b - 0xD0)
            np = pos + n
            if np > end:
                raise MsgpackError("truncated payload")
            v = int_from(buf[pos:np], "big", signed=True)
            pos = np
        elif 0xD9 <= b <= 0xDB:        # str 8/16/32
            n = 1 << (b - 0xD9)
            np = pos + n
            if np > end:
                raise MsgpackError("truncated payload")
            ln = int_from(buf[pos:np], "big")
            pos = np + ln
            if pos > end:
                raise MsgpackError("truncated payload")
            v = str(buf[np:pos], "utf-8", "replace")
        elif 0xC4 <= b <= 0xC6:        # bin 8/16/32
            n = 1 << (b - 0xC4)
            np = pos + n
            if np > end:
                raise MsgpackError("truncated payload")
            ln = int_from(buf[pos:np], "big")
            pos = np + ln
            if pos > end:
                raise MsgpackError("truncated payload")
            v = bytes(buf[np:pos])
        elif b == 0xDC or b == 0xDD:   # array 16/32
            n = 2 if b == 0xDC else 4
            np = pos + n
            if np > end:
                raise MsgpackError("truncated payload")
            ln = int_from(buf[pos:np], "big")
            pos = np
            if ln:
                if len(stack) >= _MAX_DEPTH:
                    raise MsgpackError("nesting too deep")
                stack.append((cur, rem, key))
                cur = []
                rem = ln
                key = None
                continue
            v = []
        elif b == 0xDE or b == 0xDF:   # map 16/32
            n = 2 if b == 0xDE else 4
            np = pos + n
            if np > end:
                raise MsgpackError("truncated payload")
            ln = int_from(buf[pos:np], "big")
            pos = np
            if ln:
                if len(stack) >= _MAX_DEPTH:
                    raise MsgpackError("nesting too deep")
                stack.append((cur, rem, key))
                cur = {}
                rem = ln
                key = pending
                continue
            v = {}
        elif 0xC7 <= b <= 0xC9:        # ext 8/16/32
            n = 1 << (b - 0xC7)
            np = pos + n
            if np > end:
                raise MsgpackError("truncated payload")
            ln = int_from(buf[pos:np], "big")
            pos = np + 1 + ln
            if pos > end:
                raise MsgpackError("truncated payload")
            v = _decode_ext(_signed8(buf[np]), buf[np + 1:pos])
        else:
            raise MsgpackError(f"unknown msgpack type byte 0x{b:02x}")
        # --- deliver v into the open container(s); return when the
        #     outermost object completes ---
        while True:
            if cur is None:
                return v, pos
            if key is pending:         # map: v is the next key
                key = v if type(v) is str else str(v)
                break                  # its value comes next
            if key is None:            # array element
                cur.append(v)
                rem -= 1
                if rem:
                    break
            else:                      # map: v is the value for key
                cur[key] = v
                rem -= 1
                if rem:
                    key = pending
                    break
            v = cur                    # container complete — bubble up
            cur, rem, key = stack.pop()


def unpack_one(buf: bytes) -> Any:
    """Decode exactly one msgpack object (trailing bytes are an error)."""
    v, pos = _unpack_iter(buf, 0)
    if pos != len(buf):
        raise MsgpackError(f"{len(buf) - pos} trailing bytes after object")
    return v


def unpack_stream(buf: bytes) -> Iterator[Any]:
    """Decode back-to-back msgpack objects — the Fluent Bit chunk layout
    (one ``[timestamp, record]`` event after another, main.go:240-247)."""
    pos = 0
    end = len(buf)
    while pos < end:
        v, pos = _unpack_iter(buf, pos)
        yield v


# --- encoder ----------------------------------------------------------------
# The decoder's complement, used to SYNTHESIZE Fluent Bit-shaped chunks
# (fixture generation, the externally checked ingest_msgpack_pipeline query,
# loopback tests). Same public spec; covers every type the decoder handles.
def pack(obj: Any) -> bytes:
    """Encode one object to msgpack bytes (full-range formats).

    Appender style: one shared bytearray instead of per-node bytes
    concatenation — the encoder synthesizes whole Fluent Bit chunks in the
    benched ingest query, so allocation count matters.
    """
    out = bytearray()
    _pack_into(obj, out)
    return bytes(out)


def _pack_into(obj: Any, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
        return
    if obj is True:
        out.append(0xC3)
        return
    if obj is False:
        out.append(0xC2)
        return
    t = type(obj)
    if t is int or isinstance(obj, int):
        if 0 <= obj <= 0x7F:
            out.append(obj)
            return
        if -32 <= obj < 0:
            out.append(obj & 0xFF)
            return
        if obj >= 0:
            for fmt, n in ((0xCC, 1), (0xCD, 2), (0xCE, 4), (0xCF, 8)):
                if obj < 1 << (8 * n):
                    out.append(fmt)
                    out += obj.to_bytes(n, "big")
                    return
            raise MsgpackError("uint too large")
        for fmt, n in ((0xD0, 1), (0xD1, 2), (0xD2, 4), (0xD3, 8)):
            if -(1 << (8 * n - 1)) <= obj:
                out.append(fmt)
                out += obj.to_bytes(n, "big", signed=True)
                return
        raise MsgpackError("int too small")
    if t is float:
        out.append(0xCB)
        out += _F64.pack(obj)
        return
    if t is str:
        raw = obj.encode("utf-8")
        ln = len(raw)
        if ln <= 31:
            out.append(0xA0 | ln)
            out += raw
            return
        for fmt, n in ((0xD9, 1), (0xDA, 2), (0xDB, 4)):
            if ln < 1 << (8 * n):
                out.append(fmt)
                out += ln.to_bytes(n, "big")
                out += raw
                return
        raise MsgpackError("str too large")
    if isinstance(obj, (bytes, bytearray)):
        raw = bytes(obj)
        for fmt, n in ((0xC4, 1), (0xC5, 2), (0xC6, 4)):
            if len(raw) < 1 << (8 * n):
                out.append(fmt)
                out += len(raw).to_bytes(n, "big")
                out += raw
                return
        raise MsgpackError("bin too large")
    if isinstance(obj, (list, tuple)):
        ln = len(obj)
        if ln <= 15:
            out.append(0x90 | ln)
        elif ln < 1 << 16:
            out.append(0xDC)
            out += ln.to_bytes(2, "big")
        else:
            out.append(0xDD)
            out += ln.to_bytes(4, "big")
        for x in obj:
            _pack_into(x, out)
        return
    if isinstance(obj, dict):
        ln = len(obj)
        if ln <= 15:
            out.append(0x80 | ln)
        elif ln < 1 << 16:
            out.append(0xDE)
            out += ln.to_bytes(2, "big")
        else:
            out.append(0xDF)
            out += ln.to_bytes(4, "big")
        for k, v in obj.items():
            _pack_into(k, out)
            _pack_into(v, out)
        return
    raise MsgpackError(f"cannot encode {type(obj).__name__}")


def pack_flbtime(sec: int, nsec: int = 0) -> bytes:
    """FLBTime as fixext8 type 0 — Fluent Bit's event-time wire form."""
    return b"\xd7" + bytes([EVENT_TIME_EXT]) + _FLBTIME.pack(sec, nsec)


def pack_event(sec: int, record: dict, nsec: int = 0) -> bytes:
    """One chunk event: the 2-array [FLBTime, record] (main.go:238-247)."""
    return b"\x92" + pack_flbtime(sec, nsec) + pack(record)
