"""Pure-Python XXH64 — the independent twin of Spark's ``xxhash64``.

Spark's ``F.xxhash64(col)`` applies the public XXH64 algorithm
(https://github.com/Cyan4973/xxHash, spec in doc/xxhash_spec.md) with
seed 42 to the UTF-8 bytes of string inputs
(``org.apache.spark.sql.catalyst.expressions.XxHash64``).  DuckDB has
no xxhash64, so the fixture oracles for the hash-sketch operators
(MinHash/LSH, SimHash, hyperplane ANN) are computed with THIS
implementation — written from the public spec, verified bit-for-bit
against Spark in tests/test_kernel.py — and materialized to parquet
that the driver's DuckDB gate reads.

No Spark imports here: ai_pdf_ocr_spark/kernel must stay importable
without Spark (CLAUDE.md invariant).
"""

from __future__ import annotations

_M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & _M
    return (_rotl(acc, 31) * P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * P1 + P4) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of ``data`` -> unsigned 64-bit int."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed & _M
        v4 = (seed - P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & _M
        h = (_rotl(h, 23) * P2 + P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & _M
        h = (_rotl(h, 11) * P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h


def to_i64(u: int) -> int:
    """unsigned 64-bit -> Java/Spark signed long (two's complement)."""
    return u - (1 << 64) if u >= (1 << 63) else u


def xxhash64_str(s: str, seed: int = SPARK_SEED) -> int:
    """Spark ``F.xxhash64(string_col)`` twin: signed-long result."""
    return to_i64(xxh64(s.encode("utf-8"), seed))
