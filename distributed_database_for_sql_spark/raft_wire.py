"""Wire-level parity with the reference's declared gRPC service.

The reference declares (but never registers — SURVEY.md §0) a gRPC
service over proto3 messages (/root/reference/src/proto/raft.proto:7-11:
``RequestVote(VoteRequest) -> VoteResponse`` and
``AppendEntries(LogRequest) -> LogResponse``, LogEntry carrying the
command string).  grpcio is not installable in this image, so full
gRPC-over-HTTP/2 is out of reach — but the protobuf WIRE FORMAT is a
tiny, fully public encoding (varint tags; wire type 0 = varint,
2 = length-delimited), so this module implements:

1. A pure-Python proto3 codec for exactly the five raft.proto message
   types — byte-compatible with what protoc-generated code emits
   (tests golden-pin the encodings), so a real gRPC client's message
   payloads decode here unchanged.
2. ``RaftWireServer``: those messages served over a minimal framed TCP
   transport (1-byte method id + 4-byte big-endian length + protobuf
   payload).  ``AppendEntries`` feeds each entry's ``command`` into the
   engine's durable CommandLog — the same user-visible contract the
   reference's RPC carries (commands in, ack = log length out);
   ``RequestVote`` always grants (a single Spark driver is the sole
   replica, SURVEY.md §1.3 — consensus is delegated to the storage
   layer, not re-implemented).

If grpcio ever lands on the image, the codec is the generated-code
replacement and the transport swaps for ``grpc.server`` verbatim — the
message layer (the part the reference actually defines) is already
wire-true.
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading

# -- proto3 varint + message codec ------------------------------------------


def _enc_varint(n: int) -> bytes:
    if n < 0:
        n += 1 << 64  # proto int32/int64 negatives: two's-complement 64-bit
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _dec_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        if shift > 63:
            raise ValueError("malformed varint: exceeds 64 bits")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            if result >= 1 << 63:
                result -= 1 << 64
            return result, pos
        shift += 7


# field_no -> (name, kind); kind: "varint" | "bool" | "string" | ("rep_msg", schema)
LOG_ENTRY = {1: ("term", "varint"), 2: ("command", "string")}
VOTE_REQUEST = {1: ("nodeId", "varint"), 2: ("term", "varint"),
                3: ("logLength", "varint"), 4: ("logTerm", "varint")}
VOTE_RESPONSE = {1: ("nodeID", "varint"), 2: ("term", "varint"),
                 3: ("voteGranted", "bool")}
LOG_REQUEST = {1: ("leaderID", "varint"), 2: ("term", "varint"),
               3: ("logLength", "varint"), 4: ("logTerm", "varint"),
               5: ("leaderCommit", "varint"),
               6: ("entries", ("rep_msg", LOG_ENTRY))}
LOG_RESPONSE = {1: ("followerID", "varint"), 2: ("term", "varint"),
                3: ("ack", "varint"), 4: ("success", "bool")}


def encode(schema: dict, msg: dict) -> bytes:
    """dict → proto3 bytes (proto3 semantics: default values omitted)."""
    out = bytearray()
    for field_no in sorted(schema):
        name, kind = schema[field_no]
        v = msg.get(name)
        if kind in ("varint", "bool"):
            iv = int(v or 0)
            if iv == 0:
                continue
            out += _enc_varint(field_no << 3 | 0) + _enc_varint(iv)
        elif kind == "string":
            if not v:
                continue
            b = v.encode("utf-8")
            out += _enc_varint(field_no << 3 | 2) + _enc_varint(len(b)) + b
        else:  # ("rep_msg", sub)
            _, sub = kind
            for item in v or ():
                b = encode(sub, item)
                out += _enc_varint(field_no << 3 | 2) + _enc_varint(len(b)) + b
    return bytes(out)


def decode(schema: dict, buf: bytes) -> dict:
    """proto3 bytes → dict, unset fields at proto3 defaults."""
    msg: dict = {}
    for name, kind in schema.values():
        if kind == "bool":
            msg[name] = False
        elif kind == "varint":
            msg[name] = 0
        elif kind == "string":
            msg[name] = ""
        else:
            msg[name] = []
    pos = 0
    while pos < len(buf):
        tag, pos = _dec_varint(buf, pos)
        field_no, wire_type = tag >> 3, tag & 7
        if wire_type == 0:
            v, pos = _dec_varint(buf, pos)
            if field_no in schema:
                name, kind = schema[field_no]
                msg[name] = bool(v) if kind == "bool" else v
        elif wire_type == 2:
            ln, pos = _dec_varint(buf, pos)
            if ln < 0 or pos + ln > len(buf):
                raise ValueError(
                    f"truncated length-delimited field: need {ln} bytes, "
                    f"{len(buf) - pos} remain")
            chunk, pos = buf[pos:pos + ln], pos + ln
            if field_no in schema:
                name, kind = schema[field_no]
                if kind == "string":
                    try:
                        msg[name] = chunk.decode("utf-8")
                    except UnicodeDecodeError as e:
                        raise ValueError(f"malformed utf-8 string: {e}") from e
                else:
                    msg[name].append(decode(kind[1], chunk))
        else:
            raise ValueError(f"unsupported wire type {wire_type}")
    return msg


# -- framed transport --------------------------------------------------------

METHOD_REQUEST_VOTE = 1
METHOD_APPEND_ENTRIES = 2


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed mid-frame")
        buf += chunk
    return buf


def call(host: str, port: int, method: int, payload: bytes) -> bytes:
    """Client side: one framed request → one framed response."""
    with socket.create_connection((host, port)) as s:
        s.sendall(struct.pack(">BI", method, len(payload)) + payload)
        hdr = _read_exact(s, 5)
        _, ln = struct.unpack(">BI", hdr)
        return _read_exact(s, ln)


class RaftWireServer:
    """raft.proto message service for one engine replica.

    AppendEntries: entries' command strings are appended to the durable
    CommandLog in order; ack = total log length after the append (the
    reference's follower ack is its log length too,
    /root/reference/src/raft/replication.go).  RequestVote: granted
    unconditionally — one Spark driver is the only replica.
    """

    def __init__(self, log, node_id: int = 0,
                 host: str = "127.0.0.1", port: int = 0):
        self.log = log
        self.node_id = node_id
        self.term = 0
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                try:
                    hdr = _read_exact(self.request, 5)
                except ConnectionError:
                    return
                try:
                    method, ln = struct.unpack(">BI", hdr)
                    payload = _read_exact(self.request, ln)
                    if method == METHOD_REQUEST_VOTE:
                        req = decode(VOTE_REQUEST, payload)
                        outer.term = max(outer.term, req["term"])
                        resp = encode(VOTE_RESPONSE, {
                            "nodeID": outer.node_id, "term": outer.term,
                            "voteGranted": True})
                    elif method == METHOD_APPEND_ENTRIES:
                        req = decode(LOG_REQUEST, payload)
                        outer.term = max(outer.term, req["term"])
                        cmds = [e["command"] for e in req["entries"]]
                        if cmds:
                            outer.log.append(*cmds)
                        resp = encode(LOG_RESPONSE, {
                            "followerID": outer.node_id, "term": outer.term,
                            "ack": outer.log.length(), "success": True})
                    else:
                        resp = encode(LOG_RESPONSE, {
                            "followerID": outer.node_id, "term": outer.term,
                            "ack": 0, "success": False})
                except (ValueError, ConnectionError):
                    # malformed/truncated frame: reply with a failure
                    # LogResponse instead of dropping the connection (the
                    # client would otherwise see a bare ConnectionError)
                    resp = encode(LOG_RESPONSE, {
                        "followerID": outer.node_id, "term": outer.term,
                        "ack": 0, "success": False})
                try:
                    self.request.sendall(
                        struct.pack(">BI", 0, len(resp)) + resp)
                except OSError:
                    pass  # peer gone; nothing to reply to

        self._srv = socketserver.ThreadingTCPServer((host, port), Handler)
        self._srv.daemon_threads = True
        self.host, self.port = self._srv.server_address[:2]

    def serve_background(self) -> threading.Thread:
        t = threading.Thread(target=self._srv.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()
