"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` (seed 42), so a
driver-side point lookup can compute its bucket id without launching a
1-row Spark job per probe.

Spark hashes a string column as XXH64 over its UTF-8 bytes and an
integral column as XXH64 over the value widened to a long's 8
little-endian bytes (sql/catalyst XXH64.hashLong — algebraically the
same as the byte-stream path on those 8 bytes). The XXH64 algorithm
itself is public domain (Yann Collet); constants and structure follow
the published spec. tests/test_xxh64.py property-pins this
implementation against Spark's own xxhash64 across lengths 0..100+
(covering the <32-byte tail-only path AND the 4-lane stripe path) and
integral edge values — if the two ever diverged, bucket routing would
silently read the wrong bucket, so the pin test is the load-bearing
artifact here.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * _P2) & _M, 31) * _P1) & _M


def _merge(acc: int, val: int) -> int:
    return ((acc ^ _round(0, val)) * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


# Spark hashes tinyint/smallint/int via XXH64.hashInt (4 LE bytes) and
# bigint via hashLong (8 LE bytes) — pinned in tests/test_xxh64.py
_INT_WIDTH = {"tinyint": 4, "smallint": 4, "int": 4, "integer": 4,
              "bigint": 8, "long": 8}


def spark_xxhash64(value, spark_type: str = "string", seed: int = SPARK_SEED) -> int | None:
    """Spark-compatible xxhash64 of a scalar of SQL type ``spark_type``,
    as the SIGNED long Spark returns. Supports the types tables key on:
    string (UTF-8 bytes) and integral types (4- or 8-byte little-endian
    per Spark's hashInt/hashLong split). Returns None for unsupported
    types — callers fall back to computing the hash with a 1-row Spark
    job."""
    t = spark_type.lower()
    if t == "string" and isinstance(value, str):
        return _to_signed(xxh64(value.encode("utf-8"), seed))
    w = _INT_WIDTH.get(t)
    if w is not None and isinstance(value, int) and not isinstance(value, bool):
        mask = (1 << (8 * w)) - 1
        return _to_signed(xxh64((value & mask).to_bytes(w, "little"), seed))
    return None


def spark_bucket(value, n_buckets: int, spark_type: str = "string") -> int | None:
    """pmod(xxhash64(value), n_buckets) exactly as the engine's bucket
    expression computes it (lake/table.py bucket_expr)."""
    h = spark_xxhash64(value, spark_type)
    if h is None:
        return None
    return h % n_buckets  # Python % is already non-negative => pmod
