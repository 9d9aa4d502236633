#!/usr/bin/env python3
"""Independent SimHash cross-checker — ZERO shared code with the engine.

Recomputes, in pure python, the engine's xxhash-based SimHash pair
mining (the standing oracle exemption t_simhash): whitespace tokens →
XXH64(seed 42) per token → 64-bit sign-vote fingerprint → pigeonhole
blocks (maxHamming+1 blocks of 64/(maxHamming+1) bits; two docs within
Hamming radius r MUST agree on at least one block) → candidate join →
exact Hamming filter. The XXH64 below is written from the public xxHash
specification, not from any library or from the engine's Scala — a
second implementation in a second language standing in where DuckDB has
no xxhash64.

Usage:
  python3 scripts/simhash_check.py <documents.parquet> <max_hamming>
      <engine_output_parquet_dir> [--max-doc-id=N]

Prints {docs, engine_pairs, python_pairs, mismatches}; exits nonzero on
any differing (id_a, id_b, hamming) triple.
"""
import glob
import json
import os
import re
import sys

import pyarrow.parquet as pq

MASK = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & MASK


def _round(acc, lane):
    acc = (acc + lane * P2) & MASK
    return (_rotl(acc, 31) * P1) & MASK


def _merge(acc, val):
    acc ^= _round(0, val)
    return (acc * P1 + P4) & MASK


def xxh64(data: bytes, seed: int) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK
        v2 = (seed + P2) & MASK
        v3 = seed & MASK
        v4 = (seed - P1) & MASK
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) +
             _rotl(v4, 18)) & MASK
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + P5) & MASK
    h = (h + n) & MASK
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & MASK
        h = (_rotl(h, 23) * P2 + P3) & MASK
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK
        h = (_rotl(h, 11) * P1) & MASK
        i += 1
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


# the engine's `tokens()`: trim SPACES (Spark trim = 0x20 only), split
# on [ \t\n\f\r]+, keep non-empty
_WS = re.compile(r"[ \t\n\f\r]+")


def tokens(text):
    if not text:
        return []
    return [t for t in _WS.split(text.strip(" ")) if t]


def simhash(toks):
    votes = [0] * 64
    for t in toks:
        h = xxh64(t.encode("utf-8"), 42)
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(64):
        if votes[b] > 0:
            out |= 1 << b
    return out


def mine_pairs(fps, max_hamming):
    n_blocks = max_hamming + 1
    width = 64 // n_blocks
    buckets = {}
    for doc_id, sh in fps:
        for b in range(n_blocks):
            lo = b * width
            w = 64 - lo if b == n_blocks - 1 else width
            mask = MASK if w >= 64 else (1 << w) - 1
            key = (b, (sh >> lo) & mask)
            buckets.setdefault(key, []).append((doc_id, sh))
    pairs = {}
    for members in buckets.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                (ia, sa), (ib, sb) = members[i], members[j]
                d = bin(sa ^ sb).count("1")
                if d <= max_hamming:
                    pairs[(ia, ib)] = d
    return sorted((a, b, d) for (a, b), d in pairs.items())


def _read_parquet_dir(path, columns):
    files = sorted(glob.glob(os.path.join(path, "*.parquet"))) \
        if os.path.isdir(path) else [path]
    rows = []
    for f in files:
        t = pq.read_table(f, columns=columns)
        rows.extend(zip(*[t.column(c).to_pylist() for c in columns]))
    return rows


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    docs_path, mh_s, engine_path = args[:3]
    max_hamming = int(mh_s)
    max_doc = None
    for a in sys.argv[1:]:
        if a.startswith("--max-doc-id="):
            max_doc = int(a.split("=", 1)[1])

    docs = _read_parquet_dir(docs_path, ["doc_id", "text"])
    if max_doc is not None:
        docs = [(i, t) for (i, t) in docs if i < max_doc]
    fps = [(doc_id, simhash(tokens(text))) for doc_id, text in docs]
    expected = mine_pairs(fps, max_hamming)

    got = sorted(_read_parquet_dir(
        engine_path, ["id_a", "id_b", "hamming"]))

    mismatches = []
    for i in range(max(len(got), len(expected))):
        g = got[i] if i < len(got) else None
        e = tuple(expected[i]) if i < len(expected) else None
        gt = tuple(g) if g is not None else None
        if gt != e:
            mismatches.append({"engine": gt, "python": e})
            if len(mismatches) >= 5:
                break

    print(json.dumps({
        "docs": len(docs), "max_hamming": max_hamming,
        "engine_pairs": len(got), "python_pairs": len(expected),
        "mismatches": mismatches}, default=str))
    sys.exit(1 if mismatches else 0)


if __name__ == "__main__":
    main()
