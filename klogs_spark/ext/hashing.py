"""Deterministic cross-engine hashing primitives.

Every sketch operator (MinHash, SimHash, fingerprints, LSH) needs a hash that
computes to the SAME integer in Spark and in the DuckDB oracle. Built-in
``hash()`` differs between engines, so we use an md5-prefix integer:

    Spark : conv(substr(md5(s), 1, N), 16, 10)::long
    DuckDB: CAST('0x' || substr(md5(s), 1, N) AS BIGINT)

md5 is identical everywhere; N=8 hex chars gives a 32-bit universe that keeps
(a*h + b) inside int64 for the universal-hash family below.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne-ish prime just above 2^32 — the universal-hash modulus.
# With h < 2^32 and a,b < 2^31, a*h+b < 2^63 (no int64 overflow, see module doc).
HASH_PRIME = 4294967311

MD5_CHARS = 8  # 8 hex chars -> 32-bit hash values


def lit_double_array(values) -> Column:
    """Literal ``array<double>`` built via a constant-folded from_json
    parse — ONE py4j call instead of one per element (a 64-dim query
    vector costs ~40 ms of driver time per plan in the per-element form;
    measured r21, and every invocation pays it). Bit-exact: Jackson's
    ``Double.parseDouble`` of Python's shortest repr round-trips every
    finite double (unlike SQL fractional literals, which go through
    BigDecimal and can drift 1 ulp). Non-finite values fall back to the
    per-element literal path (JSON has no NaN/Infinity)."""
    import json
    import math

    vals = [float(v) for v in values]
    if any(not math.isfinite(v) for v in vals):
        return F.array(*[F.lit(v) for v in vals])
    return F.from_json(F.lit(json.dumps(vals)), "array<double>")


def lit_double_matrix(rows) -> Column:
    """Literal ``array<array<double>>`` — the 2-D twin of
    :func:`lit_double_array` (hyperplane tables, PQ query sub-vectors)."""
    import json
    import math

    mat = [[float(v) for v in row] for row in rows]
    if any(not math.isfinite(v) for row in mat for v in row):
        return F.array(*[lit_double_array(row) for row in mat])
    return F.from_json(F.lit(json.dumps(mat)), "array<array<double>>")


def md5_long(col: Column, chars: int = MD5_CHARS) -> Column:
    """Spark side: first ``chars`` hex digits of md5 as a bigint."""
    return F.conv(F.substring(F.md5(col), 1, chars), 16, 10).cast("long")


def md5_long_sql(expr: str, chars: int = MD5_CHARS) -> str:
    """DuckDB side of :func:`md5_long` — same value, by construction."""
    return f"CAST('0x' || substr(md5({expr}), 1, {chars}) AS BIGINT)"


def perm_params(k: int, seed: int = 42) -> tuple[list[int], list[int]]:
    """k universal-hash (a, b) pairs from a fixed LCG — plain literals, so the
    identical constants can be embedded in both the Spark plan and oracle SQL.
    """
    state = seed
    draws: list[int] = []
    for _ in range(2 * k):
        state = (1103515245 * state + 12345) % (2**31)
        draws.append(state)
    a = [d | 1 for d in draws[:k]]  # odd -> nonzero multiplier
    b = draws[k:]
    return a, b


def hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for sign-LSH over embeddings.

    Components are derived from the same LCG, scaled to [-1, 1); embedded as
    float literals in both engines so bucket ids agree exactly.
    """
    state = seed
    planes: list[list[float]] = []
    for _ in range(n_planes):
        row: list[float] = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (2**31)
            row.append(round(state / 2**30 - 1.0, 6))
        planes.append(row)
    return planes
