"""msgpack chunk ingest (S1 true-to-reference shape, SURVEY §2.1).

No msgpack library ships in this environment, so these tests synthesize
chunks with the module's own pure-Python ENCODER (msgpack_lite.pack — also
used by the externally checked ingest_msgpack_pipeline query) and drive them
through the decoder and the full ingest path — FLBTime ext timestamps and
the Fluent Bit >=2.1 nested [[ts, metadata], record] shape included
(reference main.go:85-103, 238-247)."""

from __future__ import annotations

import struct
from datetime import datetime

import pytest

from klogs_spark.config import EngineConfig
from klogs_spark.decode import decode_msgpack_events
from klogs_spark.msgpack_lite import (
    MsgpackError,
    pack,
    pack_flbtime as flbtime,
    unpack_one,
    unpack_stream,
)


def test_unpack_scalar_types_roundtrip():
    for obj in [None, True, False, 0, 5, 127, -1, -32, 1 << 40, -(1 << 40),
                3.25, "", "hi", "x" * 40, b"\x01\x02"]:
        assert unpack_one(pack(obj)) == obj


def test_unpack_nested_and_big_collections():
    obj = {"a": [1, "two", None, {"b": False}], "c": {"d": [3.5]}}
    assert unpack_one(pack(obj)) == obj
    # array16/map16 paths (>15 elements, hand-built headers)
    arr = b"\xdc" + (20).to_bytes(2, "big") + b"".join(pack(i) for i in range(20))
    assert unpack_one(arr) == list(range(20))
    mp = b"\xde" + (17).to_bytes(2, "big") + b"".join(
        pack(f"k{i}") + pack(i) for i in range(17)
    )
    assert unpack_one(mp) == {f"k{i}": i for i in range(17)}


def test_unpack_flbtime_ext_to_epoch_float():
    assert unpack_one(flbtime(1700000000, 500_000_000)) == pytest.approx(
        1700000000.5
    )
    # unknown ext types pass through as raw bytes
    assert unpack_one(b"\xd4\x07\xaa") == b"\xaa"


def test_unpack_stream_back_to_back_events():
    chunk = pack([1, {"log": "a"}]) + pack([2, {"log": "b"}])
    assert list(unpack_stream(chunk)) == [[1, {"log": "a"}], [2, {"log": "b"}]]


def test_unpack_truncated_raises():
    with pytest.raises(MsgpackError):
        unpack_one(pack({"a": 1})[:-1])
    with pytest.raises(MsgpackError):
        unpack_one(pack("hi") + b"\x00")  # trailing bytes


def flbtime_event(sec: int, record: dict) -> bytes:
    return bytes([0x92]) + flbtime(sec) + pack(record)  # [FLBTime, record]


def test_decode_msgpack_events_all_timestamp_shapes():
    """FLBTime ext, uint epoch, and the v2.1 [[ts, metadata], record] nesting
    all land on the same event time (main.go:85-103)."""
    rec = {"log": "l", "kubernetes": {"namespace_name": "ns"}, "n": 2}
    # v2.1 form: [[FLBTime, metadata], record], built from raw parts
    nested = (
        bytes([0x92])
        + (bytes([0x92]) + flbtime(1700000000) + pack({"meta": 1}))
        + pack(rec)
    )
    chunk = flbtime_event(1700000000, rec) + pack([1700000000, rec]) + nested
    rows = list(decode_msgpack_events([chunk], EngineConfig()))
    assert len(rows) == 3
    expected = datetime.utcfromtimestamp(1700000000)
    assert all(r["timestamp"] == expected for r in rows)
    assert all(r["namespace"] == "ns" for r in rows)
    assert all(r["fields_number"]["n"] == 2.0 for r in rows)
    assert all(r["log"] == "l" for r in rows)


def test_decode_msgpack_events_deep_nesting_does_not_kill_batch():
    """A pathologically nested chunk (decoder recursion overflow) is dropped
    like any malformed chunk instead of killing the whole Arrow batch."""
    deep = b"\x91" * 50_000 + b"\xc0"  # [[[...null...]]] nested 50k deep
    good = pack([3, {"log": "ok"}])
    bad: list[bytes] = []
    rows = list(decode_msgpack_events([deep, good], EngineConfig(),
                                      bad_chunks=bad))
    assert [r["log"] for r in rows] == ["ok"]
    assert bad == [deep]


def test_decode_msgpack_events_bad_chunk_quarantined():
    bad = b"\xc1\xff\xff"  # 0xc1 is the one never-used msgpack byte
    good = pack([3, {"log": "ok"}])
    bad_chunks: list[bytes] = []
    rows = list(decode_msgpack_events([bad, good], EngineConfig(),
                                      bad_chunks=bad_chunks))
    assert [r["log"] for r in rows] == ["ok"]
    assert bad_chunks == [bad]


def test_decode_msgpack_events_non_event_objects_skipped():
    chunk = pack("stray") + pack([1, {"log": "kept"}]) + pack([1, 2, 3])
    rows = list(decode_msgpack_events([chunk], EngineConfig()))
    assert [r["log"] for r in rows] == ["kept"]


def test_msgpack_ingest_end_to_end(spark, tmp_path):
    """binaryFile stream of .msgpack chunk files -> decode -> logs table."""
    from klogs_spark.stream import read_msgpack_chunk_stream, run_ingest_once
    from klogs_spark.table import read_logs

    d = tmp_path / "chunks"
    d.mkdir()
    for c in range(2):
        events = b"".join(
            pack([
                1755043200 + c * 10 + i,
                {
                    "cluster": "kind",
                    "kubernetes": {"namespace_name": f"ns-{i % 2}",
                                   "pod_name": f"p{c}-{i}"},
                    "log": f"line {c}-{i}",
                    "content": {"level": "info", "duration": 1.5 * i},
                },
            ])
            for i in range(10)
        )
        (d / f"chunk-{c}.msgpack").write_bytes(events)
    out = str(tmp_path / "logs")
    stream = read_msgpack_chunk_stream(spark, str(d))
    run_ingest_once(stream, out, EngineConfig(),
                    checkpoint_dir=str(tmp_path / "ckpt"),
                    input_format="msgpack")
    logs = read_logs(spark, out)
    assert logs.count() == 20
    row = logs.filter("pod_name = 'p1-3'").collect()[0]
    assert row.namespace == "ns-1"
    assert row.fields_number["content_duration"] == pytest.approx(4.5)
    assert row.log == "line 1-3"


def test_msgpack_dead_letter_rejected():
    from klogs_spark.stream import _make_batch_processor

    with pytest.raises(ValueError, match="json-only"):
        _make_batch_processor(EngineConfig(), lambda df, i: None,
                              dead_letter_dir="/tmp/x",
                              input_format="msgpack")


def test_pack_full_range_roundtrip():
    """The module encoder covers the size-prefixed formats the fixtures
    don't reach: str8/16, bin, array16, map16, full-range ints."""
    objs = [
        None, True, False, 0, 127, -32, 255, 70_000, 2**40, -70_000, -(2**40),
        3.5, "x" * 40, "y" * 300, b"\x00\x01" * 200,
        list(range(40)), {f"k{i}": i for i in range(20)},
        {"deep": [{"a": [1, "two", None, False]}]},
    ]
    for o in objs:
        assert unpack_one(pack(o)) == o


def test_pack_unpack_property_roundtrip():
    """Property: any msgpack-representable object round-trips exactly."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    scalars = st.one_of(
        st.none(), st.booleans(),
        st.integers(min_value=-(2**63), max_value=2**64 - 1),
        st.floats(allow_nan=False),  # NaN != NaN breaks equality, not codec
        st.text(max_size=80), st.binary(max_size=80),
    )
    objs = st.recursive(
        scalars,
        lambda kids: st.one_of(
            st.lists(kids, max_size=8),
            st.dictionaries(st.text(max_size=10), kids, max_size=8),
        ),
        max_leaves=25,
    )

    @given(objs)
    @settings(max_examples=150, derandomize=True,
              suppress_health_check=list(HealthCheck))
    def check(o):
        assert unpack_one(pack(o)) == o

    check()


def test_unpack_formats_the_encoder_never_emits():
    """Wire formats a foreign msgpack producer can send but our own pack()
    never emits: ext 8/16/32 (FLBTime and unknown types), float32, and
    the 16/32-bit length variants of str/bin/array/map. The iterative
    decoder must take every branch."""
    import struct

    from klogs_spark.msgpack_lite import unpack_one

    # ext 8 carrying event-time (type 0, 8-byte payload) -> float epoch
    flb = struct.pack(">II", 1700000000, 500000000)
    assert unpack_one(b"\xc7\x08\x00" + flb) == 1700000000.5
    # ext 16 / ext 32, unknown type -> raw payload bytes
    assert unpack_one(b"\xc8\x00\x03\x2aabc") == b"abc"
    assert unpack_one(b"\xc9\x00\x00\x00\x02\x7fhi") == b"hi"
    # fixext 1/2/4/16 (non-FLBTime sizes) -> raw payload
    assert unpack_one(b"\xd4\x05x") == b"x"
    assert unpack_one(b"\xd5\x05xy") == b"xy"
    assert unpack_one(b"\xd6\x05wxyz") == b"wxyz"
    assert unpack_one(b"\xd8\x05" + b"p" * 16) == b"p" * 16
    # float 32 decodes via IEEE single
    assert unpack_one(b"\xca" + struct.pack(">f", 1.5)) == 1.5
    # str 16 / str 32 (pack() would choose the shortest form)
    s = "a" * 300
    assert unpack_one(b"\xda" + (300).to_bytes(2, "big") + s.encode()) == s
    assert unpack_one(b"\xdb" + (300).to_bytes(4, "big") + s.encode()) == s
    # bin 16 / bin 32
    b = bytes(range(256)) * 2
    assert unpack_one(b"\xc5" + (512).to_bytes(2, "big") + b) == b
    assert unpack_one(b"\xc6" + (512).to_bytes(4, "big") + b) == b
    # array 16 / array 32 with 20 elements (fixarray caps at 15)
    body = b"\x01" * 20
    assert unpack_one(b"\xdc" + (20).to_bytes(2, "big") + body) == [1] * 20
    assert unpack_one(b"\xdd" + (20).to_bytes(4, "big") + body) == [1] * 20
    # map 16 / map 32 with 17 pairs; non-string keys stringify
    pairs = b"".join(bytes([k]) + bytes([k]) for k in range(17))
    expect = {str(k): k for k in range(17)}
    assert unpack_one(b"\xde" + (17).to_bytes(2, "big") + pairs) == expect
    assert unpack_one(b"\xdf" + (17).to_bytes(4, "big") + pairs) == expect
    # empty 16-bit containers hit the zero-length branches
    assert unpack_one(b"\xdc\x00\x00") == []
    assert unpack_one(b"\xde\x00\x00") == {}


def test_unpack_truncation_in_every_length_family():
    """Every multi-byte format raises MsgpackError (never IndexError or
    struct.error) when its payload is cut short."""
    import pytest

    from klogs_spark.msgpack_lite import MsgpackError, unpack_one

    cases = [
        b"\xa5ab",                      # fixstr short
        b"\xca\x3f\x80",                # float32 short
        b"\xcb\x00" * 2,                # float64 short
        b"\xcd\x01",                    # uint16 short
        b"\xd2\x00\x00",                # int32 short
        b"\xd9\x05ab",                  # str8 short
        b"\xc4\x05ab",                  # bin8 short
        b"\xdc\x00",                    # array16 header short
        b"\xde\x00\x01\xa1k",           # map16 missing value
        b"\xd7\x00\x00\x00\x00",        # fixext8 short
        b"\xc7\x05\x00ab",              # ext8 short
        b"\x92\x01",                    # array missing element
    ]
    for payload in cases:
        with pytest.raises(MsgpackError):
            unpack_one(payload)


def test_fixstr_intern_cache_is_bounded_and_correct():
    """The decoder's fixstr intern cache must stop ADMITTING at its cap
    (high-cardinality traffic degrades to plain decoding, never unbounded
    memory) while lookups keep returning correct values — including after
    the cap is hit and for strings that differ only beyond the cache."""
    from klogs_spark.msgpack_lite import (
        _STR_CACHE,
        _STR_CACHE_MAX,
        pack,
        unpack_one,
    )

    n = _STR_CACHE_MAX + 5_000
    # distinct short strings, each <= 31 bytes so all take the fixstr path
    vals = [f"k{i:020d}" for i in range(n)]
    for v in vals[:: max(n // 2_000, 1)]:  # spot-decode a spread of them
        assert unpack_one(pack(v)) == v
    # bulk-decode everything once to push the cache to (and past) its cap
    blob = pack(vals[: 1 << 10])
    assert unpack_one(blob) == vals[: 1 << 10]
    for v in vals:
        unpack_one(pack(v))
    assert len(_STR_CACHE) <= _STR_CACHE_MAX
    # post-cap decodes are still correct, cached or not
    assert unpack_one(pack(vals[-1])) == vals[-1]
    assert unpack_one(pack("zz-never-seen")) == "zz-never-seen"
