#!/usr/bin/env python3
"""Independent Iceberg v2 reader — ZERO shared code with the engine.

Walks version-hint.text -> v{N}.metadata.json -> manifest-list Avro ->
manifest Avro -> the listed parquet data files (pyarrow), applying
merge-on-read equality deletes by the sequence rule. The Avro OCF
decoder below is written from the Avro 1.11 spec, not from any library,
so this script cross-validates the engine's hand-written Iceberg sink
with a second implementation in a second language.

Usage: python3 scripts/iceberg_check.py <table_location> [--snapshot N]
Prints a JSON summary {rows, files, delete_files, snapshot_id}.
"""
import io
import json
import os
import struct
import sys
import zlib

import pyarrow.parquet as pq


# ---------------------------- avro OCF ----------------------------

def _varint(buf):
    shift = 0
    result = 0
    while True:
        b = buf.read(1)[0]
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (result >> 1) ^ -(result & 1)  # zigzag


def _read_bytes(buf):
    n = _varint(buf)
    return buf.read(n)


def _read_value(buf, schema):
    if isinstance(schema, list):  # union: branch index then value
        idx = _varint(buf)
        return _read_value(buf, schema[idx])
    if isinstance(schema, str):
        t = schema
    else:
        t = schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1)[0] != 0
    if t in ("int", "long"):
        return _varint(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "record":
        return {f["name"]: _read_value(buf, f["type"])
                for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _varint(buf)
            if n == 0:
                break
            if n < 0:  # block with byte size
                _varint(buf)
                n = -n
            for _ in range(n):
                out.append(_read_value(buf, schema["items"]))
        return out
    if t == "map":
        out = {}
        while True:
            n = _varint(buf)
            if n == 0:
                break
            if n < 0:
                _varint(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _read_value(buf, schema["values"])
        return out
    raise ValueError(f"avro type unsupported here: {t}")


def read_avro(path):
    """-> (metadata dict, records list) of one Avro Object Container File."""
    with open(path, "rb") as f:
        data = f.read()
    buf = io.BytesIO(data)
    assert buf.read(4) == b"Obj\x01", f"{path}: not an avro OCF"
    meta = {}
    while True:
        n = _varint(buf)
        if n == 0:
            break
        if n < 0:
            _varint(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    sync = buf.read(16)
    codec = meta.get("avro.codec", b"null").decode()
    schema = json.loads(meta["avro.schema"])
    records = []
    while buf.tell() < len(data):
        count = _varint(buf)
        size = _varint(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"codec {codec} unsupported")
        bbuf = io.BytesIO(block)
        for _ in range(count):
            records.append(_read_value(bbuf, schema))
        assert buf.read(16) == sync, f"{path}: bad sync marker"
    return meta, records


# ---------------------------- iceberg ----------------------------

def load_metadata(location):
    hint = os.path.join(location, "metadata", "version-hint.text")
    with open(hint) as f:
        v = int(f.read().strip())
    while os.path.exists(os.path.join(location, "metadata",
                                      f"v{v + 1}.metadata.json")):
        v += 1
    with open(os.path.join(location, "metadata",
                           f"v{v}.metadata.json")) as f:
        return v, json.load(f)


def plan(location, snapshot_id=None):
    _, meta = load_metadata(location)
    assert meta["format-version"] == 2
    snaps = meta["snapshots"]
    if snapshot_id is None:
        snapshot_id = meta["current-snapshot-id"]
    snap = next(s for s in snaps if s["snapshot-id"] == snapshot_id)
    _, manifests = read_avro(snap["manifest-list"])
    data_files, delete_files = [], []
    for m in manifests:
        _, entries = read_avro(m["manifest_path"])
        for e in entries:
            if e["status"] == 2:  # DELETED
                continue
            df = e["data_file"]
            rec = {
                "path": df["file_path"],
                "seq": e["sequence_number"],
                "records": df["record_count"],
                "equality_ids": df.get("equality_ids") or [],
            }
            if df["content"] == 0:
                data_files.append(rec)
            else:
                delete_files.append(rec)
    schema_id = snap.get("schema-id", meta["current-schema-id"])
    schema = next(s for s in meta["schemas"] if s["schema-id"] == schema_id)
    return meta, snap, schema, data_files, delete_files


def read_table(location, snapshot_id=None):
    """-> pandas DataFrame of the snapshot, deletes applied."""
    meta, snap, schema, data_files, delete_files = plan(location, snapshot_id)
    id_to_name = {f["id"]: f["name"] for f in schema["fields"]}
    frames = []
    for df in data_files:
        pdf = pq.read_table(df["path"]).to_pandas()
        pdf["__seq"] = df["seq"]
        pdf["__fname"] = os.path.basename(df["path"])
        pdf["__pos"] = range(len(pdf))
        frames.append(pdf)
    if not frames:
        import pandas as pd
        return pd.DataFrame(columns=[f["name"] for f in schema["fields"]])
    import pandas as pd
    full = pd.concat(frames, ignore_index=True, sort=False)
    for dfile in delete_files:
        if dfile["equality_ids"]:
            keys = [id_to_name[i] for i in dfile["equality_ids"]]
            dels = pq.read_table(dfile["path"]).to_pandas()
            dels = dels[keys].drop_duplicates()
            dels["__delseq"] = dfile["seq"]
            dmax = dels.groupby(keys, as_index=False)["__delseq"].max()
            full = full.merge(dmax, on=keys, how="left")
            # equality deletes remove rows from STRICTLY EARLIER seqs
            full = full[(full["__delseq"].isna()) |
                        (full["__delseq"] <= full["__seq"])]
            full = full.drop(columns=["__delseq"])
        else:
            # POSITION deletes (content 1): (file_path, pos) rows,
            # applying to data files with seq <= the delete's
            dels = pq.read_table(dfile["path"]).to_pandas()
            dels["__fname"] = dels["file_path"].map(os.path.basename)
            dels = dels.rename(columns={"pos": "__pos"})
            dels = dels[["__fname", "__pos"]].drop_duplicates()
            dels["__posseq"] = dfile["seq"]
            full = full.merge(dels, on=["__fname", "__pos"], how="left")
            full = full[(full["__posseq"].isna()) |
                        (full["__posseq"] < full["__seq"])]
            full = full.drop(columns=["__posseq"])
    return full.drop(columns=["__seq", "__fname", "__pos"])


if __name__ == "__main__":
    loc = sys.argv[1]
    snap_id = None
    if "--snapshot" in sys.argv:
        snap_id = int(sys.argv[sys.argv.index("--snapshot") + 1])
    meta, snap, schema, data_files, delete_files = plan(loc, snap_id)
    table = read_table(loc, snap_id)
    print(json.dumps({
        "rows": len(table),
        "files": len(data_files),
        "delete_files": len(delete_files),
        "snapshot_id": snap["snapshot-id"],
        "sequence_number": snap["sequence-number"],
        "columns": list(table.columns),
    }))
