"""Round-trip test for the remote command-submission shim (server.py):
submit over HTTP → sequence into the CommandLog → replay → query result
visible through /sql.  Covers the one reference surface (declared gRPC
service, raft.proto:7-11) that had no repo analogue in round 1."""

from __future__ import annotations

import json
import urllib.request


def _post(url: str, payload: dict) -> dict:
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read())


def test_http_sql_append_replay_roundtrip(spark, sf_dir, tmp_path):
    from distributed_database_for_sql_spark.engine import CommandLog, Engine
    from distributed_database_for_sql_spark.server import EngineServer

    eng = Engine(spark, sf_dir)
    log = CommandLog(eng, str(tmp_path / "log"), str(tmp_path / "ckpt"))
    srv = EngineServer(eng, log)
    srv.serve_background()
    base = f"http://{srv.host}:{srv.port}"
    try:
        with urllib.request.urlopen(base + "/health", timeout=10) as r:
            assert json.loads(r.read()) == {"ok": True}

        # Read path: immediate execution, JSON rows back.
        out = _post(base + "/sql", {
            "command": "SELECT r_regionkey, r_name FROM region ORDER BY 1"})
        assert out["columns"] == ["r_regionkey", "r_name"]
        assert len(out["rows"]) == 5 and not out["truncated"]

        # Write path: append sequences only; replay applies exactly once.
        cmd = ("CREATE OR REPLACE TEMP VIEW srv_v AS "
               "SELECT COUNT(*) AS n FROM nation")
        assert _post(base + "/append", {"commands": [cmd]}) == {"appended": 1}
        assert _post(base + "/replay", {}) == {"applied": 1}
        assert _post(base + "/replay", {}) == {"applied": 0}  # exactly once
        n = _post(base + "/sql", {"command": "SELECT n FROM srv_v"})
        assert n["rows"] == [[25]]

        # Errors surface as JSON, not connection drops.
        bad = urllib.request.Request(
            base + "/sql", data=json.dumps({"command": "SELECT bogus_col "
                                            "FROM region"}).encode())
        try:
            urllib.request.urlopen(bad, timeout=60)
            raise AssertionError("expected HTTP 500")
        except urllib.error.HTTPError as e:
            assert e.code == 500
    finally:
        srv.shutdown()
