"""Pure-Python WARC 1.0 reader/writer (Common Crawl wire shape).

WARC (ISO 28500; the IIPC warc-specifications text is public) is the
container format of Common Crawl and of every web-archive-derived
pretraining corpus — the entry point of a real 100 TB text pipeline. The
on-disk shape this module implements is exactly what ``.warc.gz`` files
hold:

- one **gzip member per record** (the mandatory Common Crawl layout: it
  makes records independently seekable, so a cluster can split a single
  archive by member offset),
- each record = a header block (``WARC/1.0`` version line + RFC-822-style
  named fields, CRLF line endings, terminated by an empty line), followed
  by exactly ``Content-Length`` payload bytes, followed by two CRLFs,
- ``response`` records carry an HTTP/1.1 response as payload (status
  line + headers + blank line + body), per the
  ``application/http; msgtype=response`` convention.

Scale shape: both directions are byte-local — an archive is decoded
record-at-a-time from its own bytes with no cross-record state, so a
DataFrame of archive blobs decodes embarrassingly parallel inside one
Arrow batch (see ``queries/ingest.q_ingest_warc_roundtrip``), and writers
emit one self-contained member per record with a deterministic gzip
header (mtime=0) so re-encoding is reproducible.

Everything here is stdlib-only (gzip/zlib); no external warcio.
"""

from __future__ import annotations

import gzip
import io

CRLF = b"\r\n"
_VERSION = b"WARC/1.0"


def build_record(
    record_type: str,
    record_id: str,
    date_iso: str,
    content: bytes,
    *,
    target_uri: str | None = None,
    content_type: str = "application/http; msgtype=response",
    extra_headers: dict[str, str] | None = None,
) -> bytes:
    """Serialize ONE uncompressed WARC record (header block + payload +
    the two-CRLF record separator). ``date_iso`` must be the caller's
    deterministic ISO-8601 UTC stamp — this module never reads a clock."""
    headers = [
        (b"WARC-Type", record_type.encode()),
        (b"WARC-Record-ID", f"<urn:uuid:{record_id}>".encode()),
        (b"WARC-Date", date_iso.encode()),
    ]
    if target_uri is not None:
        headers.append((b"WARC-Target-URI", target_uri.encode()))
    headers.append((b"Content-Type", content_type.encode()))
    for k, v in (extra_headers or {}).items():
        headers.append((k.encode(), v.encode()))
    headers.append((b"Content-Length", str(len(content)).encode()))
    head = CRLF.join(
        [_VERSION] + [k + b": " + v for k, v in headers]
    ) + CRLF + CRLF
    return head + content + CRLF + CRLF


def http_response(body: bytes, *, content_type: str = "text/html",
                  status: str = "200 OK") -> bytes:
    """The HTTP/1.1 payload of a ``response`` record."""
    head = (
        f"HTTP/1.1 {status}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode()
    return head + body


def build_warc_gz(records: list[bytes]) -> bytes:
    """Concatenate records into a ``.warc.gz`` archive: one gzip member
    per record, mtime pinned to 0 so identical input bytes produce
    identical archive bytes (reproducible re-encode)."""
    return build_warc_gz_indexed(records)[0]


def build_warc_gz_indexed(records: list[bytes]):
    """Like :func:`build_warc_gz` but also returns the CDX offsets:
    ``(archive_bytes, [(offset, length), ...])`` — each record's gzip
    member location within the archive. This is what a Common Crawl
    CDX(J) index row records, and it is the property that makes a
    100 TB archive SPLITTABLE: any record decodes independently from
    ``archive[offset:offset+length]`` with no scan from the start (see
    :func:`read_record_at`)."""
    out = io.BytesIO()
    spans: list = []
    for rec in records:
        member = gzip.compress(rec, mtime=0)
        spans.append((out.tell(), len(member)))
        out.write(member)
    return out.getvalue(), spans


def read_record_at(archive: bytes, offset: int, length: int) -> dict:
    """Random-access decode of ONE record from its CDX (offset, length)
    span — the archive is never scanned from the start."""
    recs = list(iter_warc_records(archive[offset:offset + length]))
    if len(recs) != 1:
        raise WarcFormatError(
            f"span ({offset}, {length}) held {len(recs)} records, not 1"
        )
    return recs[0]


def cdx_fetch_rows(archive: bytes, spans: list):
    """Random-access fetch of every indexed record: for each CDX
    (offset, length) span, decode via :func:`read_record_at` (never a
    sequential scan) and yield ``{"urlkey", "uri", "body", "digest"}``
    — the shared span->row walk of the CDX carriers (hand-rolled copies
    of this loop drifted within one round; keep it single-sourced)."""
    for off, ln in spans:
        rec = read_record_at(archive, off, ln)
        uri = rec["headers"]["WARC-Target-URI"]
        _http, body = split_http_payload(rec["content"])
        yield {
            "urlkey": surt(uri),
            "uri": uri,
            "body": body,
            "digest": payload_digest(body),
        }


def surt(url: str) -> str:
    """SURT (Sort-friendly URI Reordering Transform) — the canonical
    URL key of CDX indexes: host labels reversed and comma-joined,
    lowercase, scheme and a leading ``www.`` dropped, then ``)`` + the
    path+query. ``http://www.Ex.COM/a?b=1`` -> ``com,ex)/a?b=1``."""
    rest = url.split("://", 1)[1] if "://" in url else url
    rest = rest.split("#", 1)[0]  # fragments never reach a CDX key
    sep = len(rest)
    for ch in "/?":
        i = rest.find(ch)
        if i != -1:
            sep = min(sep, i)
    host, tail = rest[:sep].lower(), rest[sep:]
    host = host.split("@")[-1].split(":")[0]  # drop userinfo + port
    if host.startswith("www."):
        host = host[4:]
    if not tail.startswith("/"):
        # canonical keys always carry the '/' path, including before a
        # bare query ('com,ex)/?b=1', never 'com,ex)?b=1' — 0x3F sorts
        # above 0x2F and would corrupt CDX merge order)
        tail = "/" + tail
    return ",".join(reversed(host.split("."))) + ")" + tail


class WarcFormatError(ValueError):
    """Raised on a structurally invalid record — corrupt archives must be
    loud, never silently truncated (the demuxer valid-empty vs corrupt
    lesson from the AVI path)."""


def _parse_record(buf: bytes, pos: int) -> tuple[dict, int]:
    """Parse one record starting at ``pos``; returns (record, next_pos).
    record = {"headers": {name: value}, "content": bytes}."""
    end_head = buf.find(CRLF + CRLF, pos)
    if end_head < 0:
        raise WarcFormatError("record header block not terminated")
    lines = buf[pos:end_head].split(CRLF)
    if not lines or not lines[0].startswith(b"WARC/"):
        raise WarcFormatError(f"bad version line {lines[:1]!r}")
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        k, sep, v = ln.partition(b": ")
        if not sep:
            raise WarcFormatError(f"bad header line {ln!r}")
        key = k.decode()
        if key in headers:
            # a duplicated name here means a corrupted/merged header
            # block (this writer never emits duplicates); last-wins
            # parsing would silently mask e.g. a swallowed block
            # terminator that merged the HTTP envelope into the WARC
            # headers — be loud instead
            raise WarcFormatError(f"duplicate header {key!r}")
        headers[key] = v.decode()
    try:
        clen = int(headers["Content-Length"])
    except (KeyError, ValueError) as e:
        raise WarcFormatError(f"bad Content-Length: {e}") from e
    if clen < 0:
        # a negative length would mis-frame the record (body_end lands
        # inside the header block and the parser resumes mid-payload,
        # yielding phantom records from embedded WARC-shaped bytes)
        raise WarcFormatError(f"negative Content-Length {clen}")
    body_start = end_head + 4
    body_end = body_start + clen
    if buf[body_end:body_end + 4] != CRLF + CRLF:
        raise WarcFormatError("record separator missing after payload")
    return (
        {"headers": headers, "content": buf[body_start:body_end]},
        body_end + 4,
    )


def iter_warc_records(blob: bytes):
    """Yield ``{"headers": .., "content": ..}`` for every record in a
    ``.warc.gz`` archive (multi-member gzip; uncompressed input is also
    accepted, for tests over raw record bytes)."""
    if blob[:2] == b"\x1f\x8b":
        buf = gzip.decompress(blob)  # GzipFile walks all members
    else:
        buf = blob
    pos = 0
    while pos < len(buf):
        rec, pos = _parse_record(buf, pos)
        yield rec


def payload_digest(body: bytes) -> str:
    """The ``WARC-Payload-Digest`` value for a payload body — Common
    Crawl uses sha1 in RFC 4648 base32 (``sha1:XXXX...``)."""
    import base64
    import hashlib

    return "sha1:" + base64.b32encode(
        hashlib.sha1(body).digest()
    ).decode()


def build_revisit(record_id: str, date_iso: str, target_uri: str,
                  digest: str, refers_to_uri: str) -> bytes:
    """A ``revisit`` record (RFC/IIPC identical-payload-digest profile):
    how a recrawl stores a page whose content it already archived — no
    body, just the payload digest and the original's URI. Readers
    resolve the content by digest against the corresponding response
    records (see queries/ingest.q_ingest_warc_revisit for the
    distributed resolution join)."""
    return build_record(
        "revisit",
        record_id,
        date_iso,
        b"",
        target_uri=target_uri,
        content_type="application/http; msgtype=response",
        extra_headers={
            "WARC-Payload-Digest": digest,
            "WARC-Refers-To-Target-URI": refers_to_uri,
            "WARC-Profile": (
                "http://netpreserve.org/warc/1.0/revisit/"
                "identical-payload-digest"
            ),
        },
    )


def decode_response_rows(blob: bytes):
    """Yield ``{"uri", "warc_headers", "http_headers", "body",
    "content_length"}`` for every ``response`` record in an archive —
    the ONE decode walk shared by the batch round-trip carrier, the
    streaming foreachBatch sink, and the WARC->WET pipeline (three
    hand-rolled copies of this loop had already drifted once)."""
    for rec in iter_warc_records(blob):
        if rec["headers"]["WARC-Type"] != "response":
            continue
        http, body = split_http_payload(rec["content"])
        yield {
            "uri": rec["headers"]["WARC-Target-URI"],
            "warc_headers": rec["headers"],
            "http_headers": http,
            "body": body,
            "content_length": int(rec["headers"]["Content-Length"]),
        }


def split_http_payload(payload: bytes) -> tuple[dict, bytes]:
    """Split a ``response`` record's HTTP payload into (headers, body)."""
    sep = payload.find(CRLF + CRLF)
    if sep < 0:
        raise WarcFormatError("HTTP payload has no header terminator")
    lines = payload[:sep].split(CRLF)
    if not lines or not lines[0].startswith(b"HTTP/"):
        raise WarcFormatError(f"bad HTTP status line {lines[:1]!r}")
    headers = {"_status": lines[0].decode()}
    for ln in lines[1:]:
        k, sep_, v = ln.partition(b": ")
        if sep_:
            headers[k.decode()] = v.decode()
    return headers, payload[sep + 4:]
