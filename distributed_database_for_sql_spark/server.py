"""Thin remote command-submission surface over the engine.

The reference declares (but never registers — SURVEY.md §0) a network
service a client would call to move commands into the replicated log
(/root/reference/src/proto/raft.proto:7-11: RequestVote/AppendEntries
gRPC).  The user-visible contract of that surface is "submit a command
string, have it durably sequenced and applied".  This module provides the
Spark-native analogue as a minimal HTTP shim — stdlib only, JSON in/out —
so a user of the reference has a remote entry point here too:

    POST /sql     {"command": "SELECT ..."}          -> {"columns", "rows"}
    POST /append  {"commands": ["INSERT ...", ...]}  -> {"appended": n}
    POST /replay  {}                                 -> {"applied": n}
    GET  /health                                     -> {"ok": true}

`/sql` executes immediately (the read path — no consensus needed; any
replica can serve it).  `/append` only sequences commands into the
durable CommandLog (the write path — what AppendEntries carried); a
`/replay` drains the log through the checkpointed exactly-once apply.
This mirrors the reference's split between log replication and the apply
channel (src/raft/replication.go:88-103).

Scale note: the shim is a control-plane door, not a data plane — results
are capped at `max_rows` (drivers should write big results to a sink and
return a path), and the server holds no state beyond the Engine it wraps.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .engine import CommandLog, Engine

MAX_ROWS_DEFAULT = 10_000


def _json_safe(v):
    """Row values → JSON-encodable (dates/decimals/bytes → strings/hex)."""
    import datetime
    import decimal

    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return [_json_safe(x) for x in v]
    if isinstance(v, dict):
        return {k: _json_safe(x) for k, x in v.items()}
    return v


class EngineServer:
    """HTTP wrapper around one Engine (+ optional CommandLog).

    Single-process by design: the SparkSession is the replica, the HTTP
    server is its door.  Start with `serve_background()` for tests /
    notebooks; `serve_forever()` for a real process.
    """

    def __init__(self, engine: Engine, log: CommandLog | None = None,
                 host: str = "127.0.0.1", port: int = 0,
                 max_rows: int = MAX_ROWS_DEFAULT):
        self.engine = engine
        self.log = log
        self.max_rows = max_rows
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                pass

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/health":
                    self._reply(200, {"ok": True})
                else:
                    self._reply(404, {"error": "unknown path"})

            def do_POST(self):
                n = int(self.headers.get("Content-Length", "0"))
                try:
                    req = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError as e:
                    return self._reply(400, {"error": f"bad json: {e}"})
                try:
                    if self.path == "/sql":
                        df = outer.engine.sql(req["command"])
                        rows = df.limit(outer.max_rows).collect()
                        return self._reply(200, {
                            "columns": df.columns,
                            "rows": [[_json_safe(v) for v in r] for r in rows],
                            "truncated": len(rows) == outer.max_rows,
                        })
                    if self.path == "/append":
                        if outer.log is None:
                            return self._reply(400, {"error": "no command log"})
                        outer.log.append(*req["commands"])
                        return self._reply(200,
                                           {"appended": len(req["commands"])})
                    if self.path == "/replay":
                        if outer.log is None:
                            return self._reply(400, {"error": "no command log"})
                        applied = outer.log.replay()
                        return self._reply(200, {"applied": len(applied)})
                    return self._reply(404, {"error": "unknown path"})
                except KeyError as e:
                    return self._reply(400, {"error": f"missing field {e}"})
                except Exception as e:  # noqa: BLE001 — surface engine errors
                    return self._reply(500, {"error": str(e)})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address[:2]

    def serve_background(self) -> threading.Thread:
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return t

    def serve_forever(self) -> None:
        self._httpd.serve_forever()

    def shutdown(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
