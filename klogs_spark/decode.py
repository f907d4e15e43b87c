"""Decode stage — flatten, type dispatch, timestamp extraction, row assembly.

This is the one place Python executes in the engine (SURVEY §2.11): the
reference's per-record hot path (main.go:237-377) works on dynamically-shaped
records, which cannot be a static Column expression. Everything downstream of
this module is Catalyst-native.

Semantics ported (with file:line citations into /root/reference):

- ``flatten``            — pkg/flatten/flatten.go:11-66
- ``dispatch_value``     — main.go:262-310 (Go type-switch)
- ``extract_timestamp``  — main.go:85-103
- ``record_to_row``      — main.go:312-351 (envelope routing, forced numbers,
                           key normalization) + main.go:256-260 (row assembly)

Vectorization: ``decode_dataframe`` applies the per-record pipeline over Arrow
batches via ``mapInPandas`` so the Python boundary is batch-at-a-time, not
row-at-a-time (the reference loops row-at-a-time in Go, main.go:240-355 — on
Spark the Arrow batch transfer is the scale-path equivalent).
"""

from __future__ import annotations

import json
import math
from datetime import datetime, timedelta, timezone
from typing import Any, Iterable, Iterator

# naive-UTC epoch anchor for the hot timestamp conversion (extract_timestamp)
_EPOCH = datetime(1970, 1, 1)

try:  # orjson (Rust) parses ~5x faster; decode is the 100 TB cost center
    import orjson as _fastjson
except ImportError:  # pragma: no cover - env without orjson
    _fastjson = None


def _loads(line: str) -> Any:
    """json.loads with an orjson fast path.

    orjson rejects a few inputs stdlib json accepts (>64-bit integers,
    NaN/Infinity literals, deep nesting beyond its fixed limit) — on ANY
    orjson failure, fall back to stdlib so accepted-input semantics are
    byte-identical with or without the fast path; only genuinely bad lines
    pay the double parse.
    """
    if _fastjson is not None:
        try:
            return _fastjson.loads(line)
        except ValueError:
            pass
    return json.loads(line)

from pyspark.sql import DataFrame

from .config import EngineConfig
from .schema import (
    APP_KEY_FALLBACK,
    APP_KEY_PRIMARY,
    ENVELOPE_KEYS,
    LOG_SCHEMA,
)


class FlattenError(ValueError):
    """Raised for non-map/slice top-level input (flatten.go:47-51)."""


# Exact leaf types json.loads can produce — the flatten fast path tests with
# `type(v) in` (no subclass dispatch); subclass instances fall through to the
# isinstance-based stack walk and still land correctly.
_SCALARS = frozenset({str, int, float, bool, type(None), bytes})


def flatten(value: Any) -> dict[str, Any]:
    """Flatten nested maps/slices to a flat dict with ``_``-joined keys.

    Same semantics as pkg/flatten/flatten.go:11-66: top-level keys get no
    prefix (flatten.go:59-63), array elements use the index as a key segment
    (flatten.go:42-46), scalar top-level input is an error (flatten.go:47-51).

    Implementation is ITERATIVE (hot path: runs once per ingested record;
    the recursive form was ~35% of the decode profile). Scalar children —
    the overwhelmingly common case — are assigned directly; only container
    children touch the explicit stack. Leaf order can differ from a strict
    DFS when a node mixes scalar and container children, which is observable
    ONLY when two distinct paths join to the same flattened key; the
    reference gives no guarantee there either (Go map iteration order is
    randomized, flatten.go:36-46), so any overwrite winner is conformant.
    """
    if not isinstance(value, (dict, list, tuple)):
        raise FlattenError(f"cannot flatten input of type {type(value).__name__}")
    out: dict[str, Any] = {}
    stack: list[tuple[str, Any]] = []
    push = stack.append
    if isinstance(value, dict):
        for k, v in value.items():
            if type(v) in _SCALARS:
                out[str(k)] = v
            else:
                push((str(k), v))
    else:
        for i, v in enumerate(value):
            if type(v) in _SCALARS:
                out[str(i)] = v
            else:
                push((str(i), v))
    if not stack:
        return out
    stack.reverse()
    while stack:
        prefix, node = stack.pop()
        if isinstance(node, dict):
            for ck, child in node.items():
                key = f"{prefix}_{ck}"
                if type(child) in _SCALARS:
                    out[key] = child
                else:
                    push((key, child))
        elif isinstance(node, (list, tuple)):
            for i, child in enumerate(node):
                key = f"{prefix}_{i}"
                if type(child) in _SCALARS:
                    out[key] = child
                else:
                    push((key, child))
        else:
            out[prefix] = node
    return out


def dispatch_value(value: Any) -> tuple[str, float, bool, bool]:
    """Classify a flattened leaf -> (string_value, number_value, is_number, is_nil).

    Port of the Go type-switch main.go:268-310:
    nil -> dropped (main.go:269-270); string/bytes -> string; every numeric
    width -> float64; anything else -> ``%v`` stringification (main.go:308-309).
    Python note: bool is an int subclass but Go's switch treats bool as
    "other" -> fmt.Sprintf("%v") i.e. "true"/"false" — replicated here.
    """
    if value is None:
        return "", 0.0, False, True
    if isinstance(value, bool):
        return ("true" if value else "false"), 0.0, False, False
    if isinstance(value, str):
        return value, 0.0, False, False
    if isinstance(value, (bytes, bytearray)):
        return value.decode("utf-8", errors="replace"), 0.0, False, False
    if isinstance(value, int):
        # JSON permits integer literals beyond float64 range (Go's decoder
        # would map them to ±Inf); float() raising would kill a whole Arrow
        # batch, so stringify like any other undispatchable value.
        try:
            return "", float(value), True, False
        except OverflowError:
            return str(value), 0.0, False, False
    if isinstance(value, float):
        if math.isnan(value) or math.isinf(value):
            # JSON can't carry these anyway; Go would pass them through as
            # float64 — normalize to stringified form to keep maps hashable.
            return str(value), 0.0, False, False
        return "", value, True, False
    return str(value), 0.0, False, False


def extract_timestamp(ts: Any, now: datetime | None = None) -> datetime:
    """Event-time extraction with fallback-to-now, main.go:85-103.

    Accepts epoch seconds as int/float (uint64 branch main.go:89-91 and
    FLBTime branch :87-88 collapse to this in the JSON-lines model), an ISO
    string, or a [seconds, ...] pair (FB >=2.1 nested form main.go:92-97).
    Unparseable -> now() with no drop (main.go:99-102).

    Epoch conversion is ``_EPOCH + timedelta(seconds=ts)`` — bit-identical
    to ``fromtimestamp(ts, tz=utc).replace(tzinfo=None)`` (both round the
    fractional part to microseconds half-even) but ~2x faster, and this
    runs once per ingested event. Out-of-range values overflow timedelta
    exactly where fromtimestamp would raise, landing in the same
    fallback-to-now handler.
    """
    if now is None:
        now = datetime.now(timezone.utc).replace(tzinfo=None)
    try:
        if isinstance(ts, bool) or ts is None:
            return now
        if isinstance(ts, (int, float)):
            return _EPOCH + timedelta(seconds=ts)
        if isinstance(ts, (list, tuple)) and ts:
            return extract_timestamp(ts[0], now)
        if isinstance(ts, str):
            try:
                return _EPOCH + timedelta(seconds=float(ts))
            except ValueError:
                parsed = datetime.fromisoformat(ts.replace("Z", "+00:00"))
                if parsed.tzinfo is None:
                    return parsed  # naive ISO strings are UTC by convention
                return parsed.astimezone(timezone.utc).replace(tzinfo=None)
    except (ValueError, OverflowError, OSError):
        pass
    return now


def record_to_row(
    ts: Any,
    record: dict[str, Any],
    config: EngineConfig | None = None,
    now: datetime | None = None,
) -> dict[str, Any]:
    """Flattened-record -> logs row. Port of main.go:246-354.

    Envelope routing by exact key match (main.go:313-328); `app` aliasing with
    deterministic k8s-app precedence (main.go:318-321, SURVEY §7); nil values
    never stored (main.go:269-270, 312); Force_Number_Fields membership is
    checked on the RAW key while storage uses the underscore-formatted key —
    the reference's quirk at main.go:339 vs :331-334, replicated exactly.
    """
    config = config or _DEFAULT_CONFIG
    force = config._force_set if hasattr(config, "_force_set") else set(
        config.force_number_fields
    )
    flat = flatten(record)
    row: dict[str, Any] = {
        "timestamp": extract_timestamp(ts, now),
        "cluster": None,
        "namespace": None,
        "app": None,
        "pod_name": None,
        "container_name": None,
        "host": None,
        "fields_string": {},
        "fields_number": {},
        "log": None,
    }
    app_from_fallback: str | None = None
    for k, v in flat.items():
        # Inline fast paths for the exact types json.loads emits (one call
        # per leaf adds up: dispatch_value was ~15% of the decode profile).
        # MUST mirror dispatch_value, which remains the canonical, tested
        # form (P2 parity with the Go type-switch) and handles odd types.
        tv = type(v)
        if tv is str:
            string_value, number_value, is_number = v, 0.0, False
        elif tv is float:
            if math.isnan(v) or math.isinf(v):
                string_value, number_value, is_number = str(v), 0.0, False
            else:
                string_value, number_value, is_number = "", v, True
        elif tv is bool:
            string_value = "true" if v else "false"
            number_value, is_number = 0.0, False
        elif tv is int:
            try:
                string_value, number_value, is_number = "", float(v), True
            except OverflowError:  # beyond float64 — mirror dispatch_value
                string_value, number_value, is_number = str(v), 0.0, False
        else:
            string_value, number_value, is_number, is_nil = dispatch_value(v)
            if is_nil:  # main.go:312 — nil fields are never stored
                continue
        col = ENVELOPE_KEYS.get(k)
        if col is not None:
            row[col] = string_value if not is_number else _num_to_str(number_value)
            continue
        if k == APP_KEY_PRIMARY:
            row["app"] = string_value if not is_number else _num_to_str(number_value)
            continue
        if k == APP_KEY_FALLBACK:
            app_from_fallback = (
                string_value if not is_number else _num_to_str(number_value)
            )
            continue
        # key normalization: Force_Underscores rewrites '.' -> '_'
        # (main.go:331-334); note membership check below uses raw k.
        key = k.replace(".", "_") if config.force_underscores else k
        if is_number:
            row["fields_number"][key] = number_value
        elif k in force:  # raw-key quirk, main.go:339
            try:
                row["fields_number"][key] = float(string_value)
            except ValueError:  # fallback path main.go:342-345
                row["fields_string"][key] = string_value
        else:
            row["fields_string"][key] = string_value
    if row["app"] is None and app_from_fallback is not None:
        row["app"] = app_from_fallback
    return row


def _num_to_str(x: float) -> str:
    # An envelope key that arrived numeric is stringified (the reference
    # routes envelope keys through the same switch, main.go:313-328).
    return str(int(x)) if x == int(x) else str(x)


_DEFAULT_CONFIG = EngineConfig()


def decode_json_lines(
    lines: Iterable[str],
    config: EngineConfig | None = None,
    now: datetime | None = None,
    rejects: list[str] | None = None,
) -> Iterator[dict[str, Any]]:
    """Decode raw JSON-lines events into logs rows.

    Each line is ``{"ts": ..., "record": {...}}`` (FIXTURES.md F-RAW) or a bare
    record object. Flatten failure on one record skips that record only — a
    deliberate deviation from the reference, which aborts the whole chunk
    (main.go:251-254); documented in SURVEY §7 step 1. Undecodable lines are
    appended to ``rejects`` when provided (the dead-letter channel).
    """
    if now is None:
        # one clock read per decode call, not per event — the reference's
        # fallback granularity is the flush anyway (main.go:99-102), and
        # extract_timestamp re-reading the clock per record was measurable
        now = datetime.now(timezone.utc).replace(tzinfo=None)
    for line in lines:
        line = line.strip()
        if not line:
            continue
        try:
            obj = _loads(line)
        except (json.JSONDecodeError, RecursionError):
            # RecursionError: pathologically deep nesting overflows the
            # stdlib parser stack; treat like any other undecodable line
            # (dead-letter, not batch death) — the Go reference would hit
            # msgpack depth limits the same way (main.go:251-254
            # warn-and-drop)
            if rejects is not None:
                rejects.append(line)
            continue
        if isinstance(obj, dict) and "record" in obj:
            ts, record = obj.get("ts"), obj["record"]
        else:
            ts, record = None, obj
        if not isinstance(record, dict):
            if rejects is not None:
                rejects.append(line)
            continue
        try:
            yield record_to_row(ts, record, config, now)
        except FlattenError:
            if rejects is not None:
                rejects.append(line)
            continue


def decode_msgpack_events(
    chunks: Iterable[bytes],
    config: EngineConfig | None = None,
    now: datetime | None = None,
    bad_chunks: list[bytes] | None = None,
) -> Iterator[dict[str, Any]]:
    """Decode Fluent Bit msgpack chunks into logs rows.

    Each chunk is back-to-back ``[timestamp, record]`` events
    (main.go:240-247); the timestamp may be an FLBTime ext (decoded to float
    epoch by msgpack_lite), a plain uint, or the v2.1 nested
    ``[[ts, metadata], record]`` form — all already handled by
    ``extract_timestamp`` (main.go:85-103). A malformed chunk stops at the
    failure point and keeps the events decoded so far (the reference
    warn-and-drops the remainder the same way, main.go:251-254); fully
    undecodable chunks land in ``bad_chunks`` when provided.
    """
    from .msgpack_lite import MsgpackError, unpack_stream

    if now is None:
        # one clock read per decode call, not per event (see
        # decode_json_lines — same flush-granularity rationale)
        now = datetime.now(timezone.utc).replace(tzinfo=None)
    for chunk in chunks:
        yielded = False
        try:
            for event in unpack_stream(chunk):
                if (
                    not isinstance(event, (list, tuple))
                    or len(event) != 2
                    or not isinstance(event[1], dict)
                ):
                    continue  # not a [ts, record] event — skip, keep reading
                ts, record = event
                try:
                    yield record_to_row(ts, record, config, now)
                    yielded = True
                except FlattenError:
                    continue
        except (MsgpackError, RecursionError):
            # RecursionError: pathologically deep nesting overflows the
            # decoder stack — treat like any malformed chunk (the JSON path
            # guards decode_json_lines the same way)
            if not yielded and bad_chunks is not None:
                bad_chunks.append(chunk)
            continue


def decode_msgpack_dataframe(
    raw: DataFrame,
    config: EngineConfig | None = None,
    content_column: str = "content",
) -> DataFrame:
    """Vectorized msgpack decode: DataFrame[content: binary] -> LOG_SCHEMA.

    The binary twin of :func:`decode_dataframe` — one Arrow batch of chunk
    blobs in, decoded rows out; pairs with ``stream.read_msgpack_chunk_stream``
    (binaryFile source) for the reference's true ingest shape (S1).
    """
    cfg = config or _DEFAULT_CONFIG
    cfg._force_set = set(cfg.force_number_fields)

    if not raw.isStreaming:
        parallelism = raw.sparkSession.sparkContext.defaultParallelism
        if raw.rdd.getNumPartitions() < parallelism:
            raw = raw.repartition(parallelism)

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            rows = list(decode_msgpack_events(batch[content_column].tolist(), cfg))
            if not rows:
                continue
            yield pd.DataFrame(
                {name: [r[name] for r in rows] for name in LOG_SCHEMA.fieldNames()}
            )

    return raw.mapInPandas(_decode, schema=LOG_SCHEMA)


def decode_dataframe(
    raw: DataFrame,
    config: EngineConfig | None = None,
    value_column: str = "value",
    ensure_width: bool = True,
) -> DataFrame:
    """Vectorized decode: DataFrame[value: string] -> DataFrame[LOG_SCHEMA].

    The Spark-native equivalent of the plugin flush loop (main.go:240-355):
    ``mapInPandas`` moves whole Arrow batches across the Python boundary, the
    per-record work happens in plain Python dicts, and the result lands back
    as Arrow. Works identically for batch and Structured Streaming inputs.

    ``ensure_width=False`` skips the partition-width probe for callers that
    already repartitioned upstream: ``raw.rdd.getNumPartitions()`` forces a
    full physical plan of the input (measured ~0.3 s of driver time per
    invocation), pure waste when the width is known.
    """
    cfg = config or _DEFAULT_CONFIG
    # pre-resolve the force-number membership set once (hot loop: per record)
    cfg._force_set = set(cfg.force_number_fields)

    if not raw.isStreaming and ensure_width:
        # batch inputs often arrive as a handful of large files; the decode
        # is CPU-bound Python, so spread it across the cluster width first
        # (streaming inputs are partitioned by the source rate instead)
        parallelism = raw.sparkSession.sparkContext.defaultParallelism
        if raw.rdd.getNumPartitions() < parallelism:
            raw = raw.repartition(parallelism)

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            rows = list(decode_json_lines(batch[value_column].tolist(), cfg))
            if not rows:
                continue
            yield pd.DataFrame(
                {name: [r[name] for r in rows] for name in LOG_SCHEMA.fieldNames()}
            )

    return raw.mapInPandas(_decode, schema=LOG_SCHEMA)
