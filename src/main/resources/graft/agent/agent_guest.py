#!/usr/bin/env python3
"""Reference Python agent guest for the graft agent runtime.

This is the cross-language proof of the agent ABI: the runtime spawns
guests the way the reference does (internal/agent/agent_processor.go:92
pins `uv run agents/<name>.py`), and the guest side of the contract is

  1. print the hashicorp-style handshake line `1|1|tcp|<addr>|grpc` as
     the FIRST stdout output (agent_processor.go:104),
  2. serve `redpanda.runtime.v1alpha1.AgentRuntime/InvokeAgent` as gRPC
     over cleartext HTTP/2 (h2c, prior knowledge),
  3. reach the paired MCP server at
     $REDPANDA_CONNECT_AGENT_RUNTIME_MCP_SERVER over HTTP+SSE for tool
     calls.

Standard library only — the HTTP/2 framing, HPACK header coding, and
the protobuf message serde are written out below from the public RFCs
(7540, 7541) and the reference's proto contract
(proto/redpanda/runtime/v1alpha1/{message,agent}.proto).

Modes (argv[1], mirroring the JVM stand-in guest AgentGuestMain):
  upper        payload -> upper-case, metadata agent=upper
  tool:<name>  call MCP tool <name> with {"value": payload}; the tool's
               text content becomes the new payload
  chain:<a>,<b>,...  multi-tool turn: call each MCP tool in order,
               each output feeding the next tool's {"value": ...}

Error channel: an APPLICATION failure (a tool returning isError) is
reported IN-BAND as the proto's Message.Error{1:message} with
grpc-status 0 — the engine maps it to the row's error column, matching
proto/redpanda/runtime/v1alpha1/message.proto. Only transport/protocol
failures use a non-zero grpc-status trailer.
"""
import json
import os
import socket
import struct
import sys
import threading
import urllib.parse
import urllib.request

# ───────────────────────── protobuf serde ─────────────────────────
# redpanda.runtime.v1alpha1: Message{1:payload,2:Value,3:Struct
# metadata,4:Error{1:message}}; Value{1:null,2:string,3:int,4:double,
# 5:bool,6:timestamp,7:bytes,8:struct,9:list{repeated 1:Value}};
# InvokeAgentRequest/Response{1:Message}.


def _varint(v):
    out = bytearray()
    while v & ~0x7F:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def _tag(field, wire):
    return _varint((field << 3) | wire)


def _len_field(field, data):
    return _tag(field, 2) + _varint(len(data)) + data


def _read_varint(buf, pos):
    v = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def _read_len(buf, pos):
    n, pos = _read_varint(buf, pos)
    return buf[pos:pos + n], pos + n


def _skip(buf, pos, wire):
    if wire == 0:
        _, pos = _read_varint(buf, pos)
    elif wire == 1:
        pos += 8
    elif wire == 2:
        n, pos = _read_varint(buf, pos)
        pos += n
    elif wire == 5:
        pos += 4
    else:
        raise ValueError("wire type %d" % wire)
    return pos


def encode_value(v):
    if v is None:
        return _tag(1, 0) + _varint(0)
    if isinstance(v, bool):
        return _tag(5, 0) + _varint(1 if v else 0)
    if isinstance(v, str):
        # a oneof member is present even at its default: "" must still
        # emit its field, or it decodes as null on the other side
        return _len_field(2, v.encode())
    if isinstance(v, int):
        return _tag(3, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)
    if isinstance(v, float):
        return _tag(4, 1) + struct.pack("<d", v)
    if isinstance(v, dict):
        return _len_field(8, encode_struct(v))
    if isinstance(v, list):
        inner = b"".join(_len_field(1, encode_value(e)) for e in v)
        return _len_field(9, inner)
    raise ValueError("unencodable value: %r" % (v,))


def encode_struct(d):
    out = b""
    for k in d:
        entry = _len_field(1, k.encode()) + _len_field(2, encode_value(d[k]))
        out += _len_field(1, entry)
    return out


def decode_value(buf):
    node = None
    pos = 0
    while pos < len(buf):
        t, pos = _read_varint(buf, pos)
        field, wire = t >> 3, t & 7
        if field == 1:
            _, pos = _read_varint(buf, pos)
            node = None
        elif field == 2:
            b, pos = _read_len(buf, pos)
            node = b.decode()
        elif field == 3:
            v, pos = _read_varint(buf, pos)
            node = v - (1 << 64) if v >= (1 << 63) else v
        elif field == 4:
            node = struct.unpack("<d", buf[pos:pos + 8])[0]
            pos += 8
        elif field == 5:
            v, pos = _read_varint(buf, pos)
            node = v != 0
        elif field == 7:
            b, pos = _read_len(buf, pos)
            node = b
        elif field == 8:
            b, pos = _read_len(buf, pos)
            node = decode_struct(b)
        elif field == 9:
            b, pos = _read_len(buf, pos)
            node = []
            p = 0
            while p < len(b):
                lt, p = _read_varint(b, p)
                if (lt >> 3) == 1 and (lt & 7) == 2:
                    e, p = _read_len(b, p)
                    node.append(decode_value(e))
                else:
                    p = _skip(b, p, lt & 7)
        else:
            pos = _skip(buf, pos, wire)
    return node


def decode_struct(buf):
    out = {}
    pos = 0
    while pos < len(buf):
        t, pos = _read_varint(buf, pos)
        if (t >> 3) == 1 and (t & 7) == 2:
            entry, pos = _read_len(buf, pos)
            key, val, p = "", None, 0
            while p < len(entry):
                et, p = _read_varint(entry, p)
                if (et >> 3) == 1:
                    b, p = _read_len(entry, p)
                    key = b.decode()
                elif (et >> 3) == 2:
                    b, p = _read_len(entry, p)
                    val = decode_value(b)
                else:
                    p = _skip(entry, p, et & 7)
            out[key] = val
        else:
            pos = _skip(buf, pos, t & 7)
    return out


def encode_message(payload, metadata, error=None, structured=None):
    out = b""
    if structured is not None:
        out += _len_field(2, encode_value(structured))
    elif payload is not None:
        out += _len_field(1, payload)
    if metadata:
        out += _len_field(3, encode_struct(
            {k: str(metadata[k]) for k in sorted(metadata)}))
    if error:
        out += _len_field(4, _len_field(1, error.encode()))
    return out


def decode_message(buf):
    payload, structured, metadata, error = b"", None, {}, None
    pos = 0
    while pos < len(buf):
        t, pos = _read_varint(buf, pos)
        field, wire = t >> 3, t & 7
        if field == 1:
            payload, pos = _read_len(buf, pos)
        elif field == 2:
            b, pos = _read_len(buf, pos)
            structured = decode_value(b)
        elif field == 3:
            b, pos = _read_len(buf, pos)
            # metadata is a string map: a kind-less Value decodes as ""
            metadata = {k: ("" if v is None else str(v))
                        for k, v in decode_struct(b).items()}
        elif field == 4:
            b, pos = _read_len(buf, pos)
            p = 0
            while p < len(b):
                et, p = _read_varint(b, p)
                if (et >> 3) == 1 and (et & 7) == 2:
                    e, p = _read_len(b, p)
                    error = e.decode() or None
                else:
                    p = _skip(b, p, et & 7)
        else:
            pos = _skip(buf, pos, wire)
    return payload, structured, metadata, error


def decode_invoke_request(buf):
    pos = 0
    msg = (b"", None, {}, None)
    while pos < len(buf):
        t, pos = _read_varint(buf, pos)
        if (t >> 3) == 1 and (t & 7) == 2:
            b, pos = _read_len(buf, pos)
            msg = decode_message(b)
        else:
            pos = _skip(buf, pos, t & 7)
    return msg


def encode_invoke_response(payload, metadata, error=None):
    return _len_field(1, encode_message(payload, metadata, error))


# ───────────────────────── HPACK (RFC 7541) ─────────────────────────

STATIC_TABLE = [
    (":authority", ""), (":method", "GET"), (":method", "POST"),
    (":path", "/"), (":path", "/index.html"), (":scheme", "http"),
    (":scheme", "https"), (":status", "200"), (":status", "204"),
    (":status", "206"), (":status", "304"), (":status", "400"),
    (":status", "404"), (":status", "500"), ("accept-charset", ""),
    ("accept-encoding", "gzip, deflate"), ("accept-language", ""),
    ("accept-ranges", ""), ("accept", ""),
    ("access-control-allow-origin", ""), ("age", ""), ("allow", ""),
    ("authorization", ""), ("cache-control", ""),
    ("content-disposition", ""), ("content-encoding", ""),
    ("content-language", ""), ("content-length", ""),
    ("content-location", ""), ("content-range", ""), ("content-type", ""),
    ("cookie", ""), ("date", ""), ("etag", ""), ("expect", ""),
    ("expires", ""), ("from", ""), ("host", ""), ("if-match", ""),
    ("if-modified-since", ""), ("if-none-match", ""), ("if-range", ""),
    ("if-unmodified-since", ""), ("last-modified", ""), ("link", ""),
    ("location", ""), ("max-forwards", ""), ("proxy-authenticate", ""),
    ("proxy-authorization", ""), ("range", ""), ("referer", ""),
    ("refresh", ""), ("retry-after", ""), ("server", ""),
    ("set-cookie", ""), ("strict-transport-security", ""),
    ("transfer-encoding", ""), ("user-agent", ""), ("vary", ""),
    ("via", ""), ("www-authenticate", ""),
]


def hpack_encode(headers):
    """Literal never-indexed with new names (0x10) — legal for every
    header, stateless, matches the runtime's own encoder choice."""
    out = bytearray()

    def emit_str(s):
        d = s.encode()
        if len(d) < 127:
            out.append(len(d))  # H=0
        else:
            out.append(127)
            v = len(d) - 127
            while v >= 128:
                out.append((v % 128) + 128)
                v //= 128
            out.append(v)
        out.extend(d)

    for k, v in headers:
        out.append(0x10)
        emit_str(k)
        emit_str(v)
    return bytes(out)


class HpackDecoder:
    """Static + dynamic table, all literal forms; Huffman rejected
    loudly (the runtime's encoder emits octet strings)."""

    def __init__(self):
        self.dynamic = []

    def decode(self, block):
        out = []
        pos = 0

        def read_int(prefix_bits, pos):
            maxv = (1 << prefix_bits) - 1
            v = block[pos] & maxv
            pos += 1
            if v == maxv:
                shift = 0
                while True:
                    b = block[pos]
                    pos += 1
                    v += (b & 0x7F) << shift
                    shift += 7
                    if not b & 0x80:
                        break
            return v, pos

        def read_str(pos):
            huff = bool(block[pos] & 0x80)
            n, pos = read_int(7, pos)
            if huff:
                raise ValueError("hpack: huffman strings unsupported here")
            s = block[pos:pos + n].decode()
            return s, pos + n

        def entry(idx):
            if idx < 1:
                raise ValueError("hpack: index 0")
            if idx <= len(STATIC_TABLE):
                return STATIC_TABLE[idx - 1]
            return self.dynamic[idx - len(STATIC_TABLE) - 1]

        while pos < len(block):
            b = block[pos]
            if b & 0x80:  # indexed
                idx, pos = read_int(7, pos)
                out.append(entry(idx))
            elif (b & 0xC0) == 0x40:  # literal, incremental indexing
                idx, pos = read_int(6, pos)
                name, pos = (read_str(pos) if idx == 0
                             else (entry(idx)[0], pos))
                value, pos = read_str(pos)
                self.dynamic.insert(0, (name, value))
                del self.dynamic[256:]
                out.append((name, value))
            elif (b & 0xE0) == 0x20:  # dynamic table size update
                _, pos = read_int(5, pos)
            else:  # 0x00 / 0x10: literal without / never indexing
                idx, pos = read_int(4, pos)
                name, pos = (read_str(pos) if idx == 0
                             else (entry(idx)[0], pos))
                value, pos = read_str(pos)
                out.append((name, value))
        return out


# ───────────────────────── HTTP/2 framing ─────────────────────────

PREFACE = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"
F_DATA, F_HEADERS, F_RST = 0x0, 0x1, 0x3
F_SETTINGS, F_PING, F_GOAWAY, F_WINDOW = 0x4, 0x6, 0x7, 0x8
FLAG_END_STREAM, FLAG_END_HEADERS, FLAG_ACK = 0x1, 0x4, 0x1


def read_exact(sock, n):
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise EOFError("connection closed")
        buf += chunk
    return buf


def read_frame(sock):
    head = read_exact(sock, 9)
    length = (head[0] << 16) | (head[1] << 8) | head[2]
    payload = read_exact(sock, length) if length else b""
    stream = ((head[5] & 0x7F) << 24) | (head[6] << 16) | \
        (head[7] << 8) | head[8]
    return head[3], head[4], stream, payload


def write_frame(sock, tpe, flags, stream, payload=b""):
    n = len(payload)
    sock.sendall(bytes([
        (n >> 16) & 0xFF, (n >> 8) & 0xFF, n & 0xFF, tpe, flags,
        (stream >> 24) & 0x7F, (stream >> 16) & 0xFF,
        (stream >> 8) & 0xFF, stream & 0xFF]) + payload)


def grpc_frame(body):
    return b"\x00" + struct.pack(">I", len(body)) + body


def parse_grpc_frame(data):
    if len(data) < 5:
        raise ValueError("short gRPC frame")
    n = struct.unpack(">I", data[1:5])[0]
    return data[5:5 + n]


# ───────────────────────── MCP SSE client ─────────────────────────


class McpClient:
    """Minimal MCP client over HTTP+SSE: GET the stream, learn the
    session's message endpoint from the `endpoint` event, POST JSON-RPC
    there, match responses by id on the stream. One instance per
    serving thread — an SSE session is a single ordered stream."""

    def __init__(self, sse_url):
        u = urllib.parse.urlparse(sse_url)
        self.base = "%s://%s" % (u.scheme, u.netloc)
        self.stream = urllib.request.urlopen(sse_url)
        self.next_id = 0
        ev, data = self._next_event()
        if ev != "endpoint":
            raise RuntimeError("expected endpoint event, got %s" % ev)
        self.endpoint = self.base + data
        self._request("initialize", {
            "protocolVersion": "2024-11-05", "capabilities": {},
            "clientInfo": {"name": "graft-py-guest", "version": "1.0.0"}})
        self._post(json.dumps({
            "jsonrpc": "2.0", "method": "notifications/initialized"}))

    def _next_event(self):
        event, data = "message", []
        while True:
            line = self.stream.readline()
            if not line:
                raise EOFError("SSE stream closed")
            line = line.decode().rstrip("\r\n")
            if not line:
                if data:
                    return event, "\n".join(data)
                event = "message"
                continue
            if line.startswith("event:"):
                event = line[6:].strip()
            elif line.startswith("data:"):
                data.append(line[5:].strip())

    def _post(self, body):
        req = urllib.request.Request(
            self.endpoint, data=body.encode(),
            headers={"Content-Type": "application/json"})
        urllib.request.urlopen(req).read()

    def _request(self, method, params):
        self.next_id += 1
        rid = self.next_id
        self._post(json.dumps({"jsonrpc": "2.0", "id": rid,
                               "method": method, "params": params}))
        while True:
            ev, data = self._next_event()
            if ev != "message":
                continue
            node = json.loads(data)
            if node.get("id") == rid:
                if "error" in node:
                    raise RuntimeError("%s: %s" % (
                        method, node["error"].get("message")))
                return node["result"]

    def call_tool(self, name, args):
        res = self._request("tools/call",
                            {"name": name, "arguments": args})
        text = res["content"][0]["text"] if res.get("content") else ""
        if res.get("isError"):
            raise RuntimeError("tool %s failed: %s" % (name, text))
        return text


# ───────────────────────── guest server ─────────────────────────

_tls = threading.local()


class AgentError(Exception):
    """Application-level failure: reported in-band as the proto's
    Message.Error{1:message} (grpc-status stays 0), which the engine
    routes to the row's error column."""


def _mcp():
    if not hasattr(_tls, "mcp"):
        sse_url = os.environ.get(
            "REDPANDA_CONNECT_AGENT_RUNTIME_MCP_SERVER")
        if not sse_url:
            raise RuntimeError(
                "REDPANDA_CONNECT_AGENT_RUNTIME_MCP_SERVER not set")
        _tls.mcp = McpClient(sse_url)
    return _tls.mcp


def make_transform(mode):
    if mode == "upper":
        def transform(payload, metadata):
            meta = dict(metadata)
            meta["agent"] = "upper"
            return payload.decode().upper().encode(), meta
        return transform
    if mode.startswith("tool:"):
        tool = mode[5:]

        def transform(payload, metadata):
            try:
                result = _mcp().call_tool(tool, {"value": payload.decode()})
            except RuntimeError as e:
                raise AgentError(str(e))
            meta = dict(metadata)
            meta["agent"] = "tool"
            meta["tool"] = tool
            return result.encode(), meta
        return transform
    if mode.startswith("chain:"):
        tools = [t for t in mode[6:].split(",") if t]

        def transform(payload, metadata):
            value = payload.decode()
            for tool in tools:
                try:
                    value = _mcp().call_tool(tool, {"value": value})
                except RuntimeError as e:
                    raise AgentError(str(e))
            meta = dict(metadata)
            meta["agent"] = "chain"
            meta["tools"] = ",".join(tools)
            return value.encode(), meta
        return transform
    raise ValueError("unknown guest mode: %s" % mode)


INVOKE_PATH = "/redpanda.runtime.v1alpha1.AgentRuntime/InvokeAgent"


def serve_connection(sock, transform):
    try:
        # response frames must not sit in Nagle behind the next read
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        if read_exact(sock, len(PREFACE)) != PREFACE:
            return
        write_frame(sock, F_SETTINGS, 0, 0)
        # RFC 7540 lets a client pipeline its first request immediately
        # after its own SETTINGS, ACKing ours a round-trip later — any
        # non-SETTINGS frame that arrives during the handshake must be
        # BUFFERED, not dropped, or a pipelining client deadlocks
        pending = []
        saw_settings = saw_ack = False
        while not (saw_settings and saw_ack):
            frame = read_frame(sock)
            tpe, flags, stream, payload = frame
            if tpe == F_SETTINGS and flags & FLAG_ACK:
                saw_ack = True
            elif tpe == F_SETTINGS:
                write_frame(sock, F_SETTINGS, FLAG_ACK, 0)
                saw_settings = True
            else:
                pending.append(frame)

        def next_frame():
            if pending:
                return pending.pop(0)
            return read_frame(sock)

        decoder = HpackDecoder()
        while True:
            headers, data, sid, done = [], b"", -1, False
            while not done:
                tpe, flags, stream, payload = next_frame()
                if tpe == F_SETTINGS and not flags & FLAG_ACK:
                    write_frame(sock, F_SETTINGS, FLAG_ACK, 0)
                elif tpe == F_PING and not flags & FLAG_ACK:
                    write_frame(sock, F_PING, FLAG_ACK, 0, payload)
                elif tpe == F_HEADERS:
                    if sid < 0:
                        sid = stream
                    headers.extend(decoder.decode(payload))
                    if flags & FLAG_END_STREAM:
                        done = True
                elif tpe == F_DATA and stream == sid:
                    data += payload
                    if flags & FLAG_END_STREAM:
                        done = True
                elif tpe == F_GOAWAY:
                    return
            path = dict(headers).get(":path", "")
            if path != INVOKE_PATH:
                write_frame(sock, F_HEADERS,
                            FLAG_END_HEADERS | FLAG_END_STREAM, sid,
                            hpack_encode([
                                (":status", "200"),
                                ("content-type", "application/grpc"),
                                ("grpc-status", "12"),
                                ("grpc-message",
                                 "unknown method %s" % path)]))
                continue
            try:
                payload, _structured, metadata, _err = \
                    decode_invoke_request(parse_grpc_frame(data))
                out_payload, out_meta = transform(payload, metadata)
                resp = encode_invoke_response(out_payload, out_meta)
                status, msg = "0", ""
            except AgentError as e:
                # application failure -> proto Message.Error, rpc OK
                resp = encode_invoke_response(b"", {},
                                              error=str(e) or "agent error")
                status, msg = "0", ""
            except Exception as e:  # transport/protocol -> grpc-status 13
                resp = encode_invoke_response(b"", {})
                status, msg = "13", str(e) or "internal"
            write_frame(sock, F_HEADERS, FLAG_END_HEADERS, sid,
                        hpack_encode([(":status", "200"),
                                      ("content-type",
                                       "application/grpc")]))
            write_frame(sock, F_DATA, 0, sid, grpc_frame(resp))
            trailers = [("grpc-status", status)]
            if msg:
                trailers.append(("grpc-message", msg))
            write_frame(sock, F_HEADERS,
                        FLAG_END_HEADERS | FLAG_END_STREAM, sid,
                        hpack_encode(trailers))
    except (EOFError, OSError):
        pass
    finally:
        try:
            sock.close()
        except OSError:
            pass


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "upper"
    transform = make_transform(mode)
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(16)
    port = server.getsockname()[1]
    # the handshake line MUST be the first stdout output
    print("1|1|tcp|127.0.0.1:%d|grpc" % port, flush=True)
    while True:
        conn, _ = server.accept()
        t = threading.Thread(target=serve_connection,
                             args=(conn, transform), daemon=True)
        t.start()


if __name__ == "__main__":
    main()
