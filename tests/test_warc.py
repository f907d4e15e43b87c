"""warc_lite unit coverage: record framing, multi-member gzip layout,
HTTP envelope split, determinism, and loud-corruption contracts."""

import gzip

import pytest

from klogs_spark.warc_lite import (
    WarcFormatError,
    build_record,
    build_warc_gz,
    http_response,
    iter_warc_records,
    split_http_payload,
)


def _rec(i: int, body: bytes = b"hello world") -> bytes:
    return build_record(
        "response",
        f"{i:012d}-0000-4000-8000-000000000000",
        "2026-01-05T00:00:00Z",
        http_response(body, content_type="text/plain"),
        target_uri=f"http://src{i}.example.com/doc/{i}",
    )


def test_single_record_roundtrip():
    blob = build_warc_gz([_rec(7, b"payload bytes \x00\xff ok")])
    recs = list(iter_warc_records(blob))
    assert len(recs) == 1
    h = recs[0]["headers"]
    assert h["WARC-Type"] == "response"
    assert h["WARC-Target-URI"] == "http://src7.example.com/doc/7"
    assert h["WARC-Date"] == "2026-01-05T00:00:00Z"
    http, body = split_http_payload(recs[0]["content"])
    assert http["_status"] == "HTTP/1.1 200 OK"
    assert http["Content-Type"] == "text/plain"
    assert body == b"payload bytes \x00\xff ok"
    assert int(http["Content-Length"]) == len(body)


def test_multi_record_order_and_fidelity():
    bodies = [f"doc {i} text".encode() for i in range(25)]
    blob = build_warc_gz([_rec(i, b) for i, b in enumerate(bodies)])
    out = [split_http_payload(r["content"])[1]
           for r in iter_warc_records(blob)]
    assert out == bodies


def test_one_gzip_member_per_record():
    """The Common Crawl layout contract: each record is its own gzip
    member, independently decompressible from its byte offset — what
    makes a single archive splittable across a cluster."""
    blob = build_warc_gz([_rec(i) for i in range(3)])
    assert blob[:2] == b"\x1f\x8b"
    # walk members one at a time with zlib's gzip wrapper; each member
    # must terminate (eof) and hand back the remaining bytes untouched
    import zlib
    members = 0
    rest = blob
    while rest:
        dec = zlib.decompressobj(wbits=31)
        dec.decompress(rest)
        assert dec.eof, "member did not terminate"
        members += 1
        rest = dec.unused_data
    assert members == 3
    # the middle member alone round-trips a full record
    dec = zlib.decompressobj(wbits=31)
    first = zlib.decompressobj(wbits=31)
    first.decompress(blob)
    mid = first.unused_data
    rec_bytes = dec.decompress(mid)
    rec = next(iter_warc_records(rec_bytes))
    assert rec["headers"]["WARC-Target-URI"].endswith("/doc/1")


def test_deterministic_bytes():
    a = build_warc_gz([_rec(i) for i in range(5)])
    b = build_warc_gz([_rec(i) for i in range(5)])
    assert a == b


def test_uncompressed_input_accepted():
    rec = _rec(1)
    assert next(iter_warc_records(rec))["headers"]["WARC-Type"] == "response"


@pytest.mark.parametrize("mutate", [
    lambda b: b.replace(b"WARC/1.0", b"NOPE/1.0", 1),
    lambda b: b.replace(b"Content-Length: ", b"Content-Oops: ", 1),
    lambda b: b[:-4],  # chop the record separator
    lambda b: b.replace(b"\r\n\r\n", b"", 1),  # no header terminator
])
def test_corruption_is_loud(mutate):
    rec = mutate(_rec(3))
    with pytest.raises(WarcFormatError):
        list(iter_warc_records(rec))


def test_truncated_payload_is_loud():
    rec = _rec(4, b"0123456789")
    with pytest.raises(WarcFormatError):
        list(iter_warc_records(rec[:-8]))


def test_negative_content_length_is_loud():
    # crafted record whose WARC-level length is negative: body_end would
    # land back on the header terminator and "pass" the separator check,
    # then the parser would resume inside the payload — must raise instead
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"Content-Length: -4\r\n\r\n" + b"\r\n\r\n")
    with pytest.raises(WarcFormatError, match="negative"):
        list(iter_warc_records(bad))


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(bodies=st.lists(st.binary(min_size=0, max_size=300), min_size=1,
                       max_size=8))
def test_property_roundtrip_arbitrary_bodies(bodies):
    """Any byte content — including CRLFCRLF sequences, gzip magic, and
    WARC-shaped text inside payloads — must round-trip the archive
    exactly (framing is length-based, never delimiter-based)."""
    blob = build_warc_gz([_rec(i, b) for i, b in enumerate(bodies)])
    out = [split_http_payload(r["content"])[1]
           for r in iter_warc_records(blob)]
    assert out == bodies


@settings(max_examples=40, deadline=None)
@given(bodies=st.lists(st.binary(min_size=0, max_size=200), min_size=1,
                       max_size=4),
       cut=st.integers(min_value=1, max_value=50))
def test_property_truncation_never_silent(bodies, cut):
    """Chopping any tail off an archive must either raise loudly
    (WarcFormatError / gzip EOFError) or yield a strict PREFIX of the
    records — never corrupt or phantom rows."""
    full = [_rec(i, b) for i, b in enumerate(bodies)]
    blob = build_warc_gz(full)
    truncated = blob[:max(0, len(blob) - cut)]
    try:
        out = list(iter_warc_records(truncated))
    except (WarcFormatError, EOFError, gzip.BadGzipFile):
        return
    expect = [split_http_payload(iter_warc_records(r).__next__()["content"])[1]
              for r in full]
    got = [split_http_payload(r["content"])[1] for r in out]
    assert got == expect[:len(got)]


def test_revisit_record_roundtrip_and_digest():
    from klogs_spark.warc_lite import build_revisit, payload_digest

    body = b"original page content"
    dig = payload_digest(body)
    assert dig.startswith("sha1:") and len(dig) == 5 + 32  # base32 sha1
    rec = build_revisit(
        "r1", "2026-05-02T00:00:00Z", "http://h/doc/21/recrawl",
        dig, "http://h/doc/1",
    )
    out = list(iter_warc_records(rec))
    assert len(out) == 1
    h = out[0]["headers"]
    assert h["WARC-Type"] == "revisit"
    assert h["WARC-Payload-Digest"] == dig
    assert h["WARC-Refers-To-Target-URI"] == "http://h/doc/1"
    assert out[0]["content"] == b""
    assert int(h["Content-Length"]) == 0


def test_cdx_spans_random_access_and_surt():
    from klogs_spark.warc_lite import (
        build_warc_gz_indexed, read_record_at, surt,
    )

    recs = [_rec(i, f"body {i}".encode()) for i in range(5)]
    archive, spans = build_warc_gz_indexed(recs)
    assert len(spans) == 5
    # spans tile the archive exactly
    assert spans[0][0] == 0
    for (o1, l1), (o2, _) in zip(spans, spans[1:]):
        assert o1 + l1 == o2
    assert spans[-1][0] + spans[-1][1] == len(archive)
    # any record decodes independently from its span — including out of
    # order, which a sequential reader cannot do
    rec3 = read_record_at(archive, *spans[3])
    assert rec3["headers"]["WARC-Target-URI"].endswith("/doc/3")
    rec0 = read_record_at(archive, *spans[0])
    assert rec0["headers"]["WARC-Target-URI"].endswith("/doc/0")
    # a wrong span is loud
    with pytest.raises(WarcFormatError):
        read_record_at(archive, spans[0][0], spans[0][1] + spans[1][1])
    # SURT canonical keys
    assert surt("http://www.Ex.COM/a?b=1") == "com,ex)/a?b=1"
    assert surt("https://a.b.example.org:8080/x") == "org,example,b,a)/x"
    assert surt("http://ex.com") == "com,ex)/"


def test_surt_bare_query_and_fragment():
    from klogs_spark.warc_lite import surt

    assert surt("http://ex.com?b=1") == "com,ex)/?b=1"
    assert surt("http://ex.com/a#frag") == "com,ex)/a"
    assert surt("http://u:p@EX.com:80/a") == "com,ex)/a"
