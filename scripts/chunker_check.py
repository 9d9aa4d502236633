#!/usr/bin/env python3
"""Independent text-chunker cross-checker — ZERO shared code with the
engine.

Reimplements, in pure python, the two non-SQL-expressible `text_chunker`
strategies (`recursive_character` and `markdown`) from the PUBLIC
algorithm the reference delegates to (the langchain textsplitter merge
semantics; the reference's internal/impl/text/text_chunker_processor.go
is a thin wrapper over langchaingo's textsplitter), and replays them
over the raw documents parquet. The engine's dumped gate output
(t_chunk_recursive / t_chunk_markdown) must match value-for-value:
same (doc_id, chunk_idx, chunk) triples, same order.

Where the public algorithm leaves a choice open, this script pins the
same documented choices the engine makes (lengths in codepoints — the
reference's default `length_measure: runes`; trim = strip of codepoints
<= U+0020, the JVM definition) — those are config/platform constants,
not shared code.

Usage:
  python3 scripts/chunker_check.py <documents.parquet> <strategy>
      <chunk_size> <overlap> <engine_output_parquet_dir>
      [--max-doc-id N]

Prints a JSON summary {docs, engine_chunks, python_chunks, mismatches}
and exits nonzero when any triple differs.
"""
import glob
import json
import os
import sys

import pyarrow.parquet as pq


# ------------------- the public merge/split algorithm -------------------

def _trim(s):
    # JVM String.trim: strip leading/trailing codepoints <= U+0020
    start, end = 0, len(s)
    while start < end and ord(s[start]) <= 0x20:
        start += 1
    while end > start and ord(s[end - 1]) <= 0x20:
        end -= 1
    return s[start:end]


def _merge_splits(splits, sep, chunk_size, overlap):
    """LangChain merge: pack splits up to chunk_size, emit the joined
    (trimmed) chunk, then pop from the front until within the overlap
    budget so the tail carries into the next chunk."""
    docs = []
    current = []
    total = 0
    sep_len = len(sep)
    for d in splits:
        d_len = len(d)
        if (total + d_len + (sep_len if current else 0) > chunk_size
                and current):
            doc = _trim(sep.join(current))
            if doc:
                docs.append(doc)
            while current and (
                    total > overlap
                    or (total + d_len + (sep_len if current else 0)
                        > chunk_size and total > 0)):
                total -= len(current[0]) + (sep_len if len(current) > 1
                                            else 0)
                current.pop(0)
        current.append(d)
        total += d_len + (sep_len if len(current) > 1 else 0)
    last = _trim(sep.join(current))
    if last:
        docs.append(last)
    return docs


def _split_utf16_chars(text):
    """The '' separator splits into UTF-16 code units (the JVM string
    model the engine runs on); codepoints <= 0xFFFF are unaffected."""
    out = []
    for ch in text:
        cp = ord(ch)
        if cp > 0xFFFF:
            cp -= 0x10000
            out.append(chr(0xD800 + (cp >> 10)))
            out.append(chr(0xDC00 + (cp & 0x3FF)))
        else:
            out.append(ch)
    return out


def recursive_character(text, seps, chunk_size, overlap):
    if not text:
        return []

    def split(text, seps):
        sep, rest = "", []
        for i, s in enumerate(seps):
            if s == "" or s in text:
                sep, rest = s, list(seps[i + 1:])
                break
        parts = _split_utf16_chars(text) if sep == "" \
            else text.split(sep)
        out = []
        good = []
        for p in parts:
            if not p:
                continue
            if len(p) < chunk_size:
                good.append(p)
            else:
                if good:
                    out.extend(_merge_splits(good, sep, chunk_size,
                                             overlap))
                    good = []
                if not rest:
                    out.append(p)
                else:
                    out.extend(split(p, rest))
        if good:
            out.extend(_merge_splits(good, sep, chunk_size, overlap))
        return out

    return split(text, list(seps))


def markdown(text, chunk_size, overlap):
    """Heading-delimited sections ('#'-prefixed lines start a new one),
    each emitted whole when it fits, else recursively merged."""
    if not text:
        return []
    sections = []
    current = []
    for line in text.split("\n"):
        if line.startswith("#") and current:
            sections.append("\n".join(current))
            current = []
        current.append(line)
    if current:
        sections.append("\n".join(current))
    out = []
    for sec in sections:
        if len(sec) <= chunk_size:
            t = _trim(sec)
            if t:
                out.append(t)
        else:
            out.extend(recursive_character(
                sec, ["\n\n", "\n", " ", ""], chunk_size, overlap))
    return out


# ------------------------------ compare ------------------------------

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
    docs_path, strategy, size_s, overlap_s, engine_path = args[:5]
    size, overlap = int(size_s), int(overlap_s)
    max_doc = None
    for a in sys.argv[1:]:
        if a.startswith("--max-doc-id="):
            max_doc = int(a.split("=", 1)[1])

    docs = _read_parquet_dir(docs_path, ["doc_id", "text"])
    if max_doc is not None:
        docs = [(i, t) for (i, t) in docs if i < max_doc]

    expected = []
    for doc_id, text in sorted(docs):
        if strategy == "recursive_character":
            chunks = recursive_character(
                text or "", ["\n\n", "\n", " ", ""], size, overlap)
        elif strategy == "markdown":
            chunks = markdown(text or "", size, overlap)
        else:
            raise SystemExit(f"unknown strategy {strategy}")
        for idx, c in enumerate(chunks):
            expected.append((doc_id, idx, c))

    got = sorted(_read_parquet_dir(
        engine_path, ["doc_id", "chunk_idx", "chunk"]))
    expected.sort()

    mismatches = []
    for i in range(max(len(got), len(expected))):
        g = got[i] if i < len(got) else None
        e = expected[i] if i < len(expected) else None
        if g != e:
            mismatches.append({"engine": g, "python": e})
            if len(mismatches) >= 5:
                break

    print(json.dumps({
        "strategy": strategy, "docs": len(docs),
        "engine_chunks": len(got), "python_chunks": len(expected),
        "mismatches": mismatches}, default=str))
    sys.exit(1 if mismatches else 0)


if __name__ == "__main__":
    main()
