#!/usr/bin/env python3
"""Dev-only: pure-python XXH64 matching Spark's `xxhash64` (seed 42), used
to validate the generated DuckDB oracle SQL for the seeded-MinHash queries.
Checks itself against /tmp/xxvals.tsv (dumped by graft.XxProbe) when run.
"""
import sys

M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M


def rnd(acc, x):
    return (rotl((acc + x * P2) & M, 31) * P1) & M


def fmix(h):
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int = 42) -> int:
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while off + 32 <= n:
            v1 = rnd(v1, int.from_bytes(data[off:off + 8], "little"))
            v2 = rnd(v2, int.from_bytes(data[off + 8:off + 16], "little"))
            v3 = rnd(v3, int.from_bytes(data[off + 16:off + 24], "little"))
            v4 = rnd(v4, int.from_bytes(data[off + 24:off + 32], "little"))
            off += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h ^= rnd(0, v)
            h = (h * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while off + 8 <= n:
        h ^= rnd(0, int.from_bytes(data[off:off + 8], "little"))
        h = (rotl(h, 27) * P1 + P4) & M
        off += 8
    if off + 4 <= n:
        h ^= (int.from_bytes(data[off:off + 4], "little") * P1) & M
        h = (rotl(h, 23) * P2 + P3) & M
        off += 4
    while off < n:
        h ^= (data[off] * P5) & M
        h = (rotl(h, 11) * P1) & M
        off += 1
    return fmix(h)


def xxh64_long(value: int, seed: int = 42) -> int:
    """Spark's XXH64.hashLong: fixed 8-byte path (NO +8 length add — Spark
    hashes longs as hash = seed + P5 + 8 then the 8-byte round)."""
    h = (seed + P5 + 8) & M
    h ^= rnd(0, value & M)
    h = (rotl(h, 27) * P1 + P4) & M
    return fmix(h)


def to_signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64_str(s: str, seed: int = 42) -> int:
    return to_signed(xxh64_bytes(s.encode("utf-8"), seed))


def spark_xxhash64_longs(vals, seed: int = 42) -> int:
    h = seed
    for v in vals:
        h = xxh64_long(v & M, h & M)
    return to_signed(h)


if __name__ == "__main__":
    bad = 0
    for line in open("/tmp/xxvals.tsv"):
        parts = line.rstrip("\n").split("\t")
        _, s, h, hmulti, hchain = parts
        got = spark_xxhash64_str(s)
        if got != int(h):
            bad += 1
            print(f"MISMATCH str {s!r}: spark={h} ref={got}")
        gm = spark_xxhash64_longs([7, 11, 13])
        if gm != int(hmulti):
            bad += 1
            print(f"MISMATCH multi: spark={hmulti} ref={gm}")
        # hchain = xxhash64(s, 3L): string then long, chained
        hc = xxh64_bytes(s.encode("utf-8"), 42)
        hc = to_signed(xxh64_long(3, hc))
        if hc != int(hchain):
            bad += 1
            print(f"MISMATCH chain {s!r}: spark={hchain} ref={hc}")
    print("OK all match" if bad == 0 else f"{bad} mismatches")
