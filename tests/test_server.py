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


# -- raft.proto wire parity (raft_wire.py) ----------------------------------

def test_proto3_codec_golden_bytes():
    """The encodings must be byte-identical to protoc-generated output —
    golden values hand-derived from the public proto3 wire spec
    (tag = field_no<<3|wire_type; varints LSB-first, 0x80 continuation).
    A real gRPC client's payloads would decode here unchanged."""
    from distributed_database_for_sql_spark.raft_wire import (
        LOG_REQUEST, VOTE_REQUEST, decode, encode)

    # VoteRequest{nodeId:1, term:2, logLength:3, logTerm:4}
    assert encode(VOTE_REQUEST, {"nodeId": 1, "term": 2, "logLength": 3,
                                 "logTerm": 4}) == bytes.fromhex(
        "0801100218032004")
    # varint multi-byte boundary: term=300 -> 0xAC 0x02
    assert encode(VOTE_REQUEST, {"term": 300}) == bytes.fromhex("10ac02")
    # LogRequest{leaderID:7, term:1, entries:[{term:1, command:"SELECT 1"}]}
    msg = {"leaderID": 7, "term": 1,
           "entries": [{"term": 1, "command": "SELECT 1"}]}
    enc = encode(LOG_REQUEST, msg)
    assert enc == bytes.fromhex("08071001320c0801120853454c45435420 31".replace(" ", ""))
    back = decode(LOG_REQUEST, enc)
    assert back["leaderID"] == 7 and back["entries"][0]["command"] == "SELECT 1"
    # proto3 defaults: unset fields decode to 0/""/[]
    empty = decode(LOG_REQUEST, b"")
    assert empty["leaderCommit"] == 0 and empty["entries"] == []


def test_raft_wire_append_entries_feeds_command_log(spark, sf_dir, tmp_path):
    """AppendEntries over the framed transport sequences commands into the
    durable CommandLog (ack = log length), replay applies them, and
    RequestVote grants — the reference's declared service contract
    (raft.proto:7-11) end-to-end at the message level."""
    from distributed_database_for_sql_spark.engine import CommandLog, Engine
    from distributed_database_for_sql_spark.raft_wire import (
        LOG_REQUEST, LOG_RESPONSE, METHOD_APPEND_ENTRIES,
        METHOD_REQUEST_VOTE, VOTE_REQUEST, VOTE_RESPONSE, RaftWireServer,
        call, decode, encode)

    engine = Engine(spark, sf_dir)
    log = CommandLog(engine, str(tmp_path / "log"), str(tmp_path / "ckpt"))
    srv = RaftWireServer(log, node_id=3)
    srv.serve_background()
    try:
        vote = decode(VOTE_RESPONSE, call(
            srv.host, srv.port, METHOD_REQUEST_VOTE,
            encode(VOTE_REQUEST, {"nodeId": 1, "term": 5, "logLength": 0,
                                  "logTerm": 0})))
        assert vote["voteGranted"] is True and vote["term"] == 5

        cmds = ["CREATE OR REPLACE TEMP VIEW wire_v AS "
                "SELECT COUNT(*) AS n FROM region"]
        resp = decode(LOG_RESPONSE, call(
            srv.host, srv.port, METHOD_APPEND_ENTRIES,
            encode(LOG_REQUEST, {
                "leaderID": 1, "term": 5, "leaderCommit": 0,
                "entries": [{"term": 5, "command": c} for c in cmds]})))
        assert resp["success"] is True and resp["ack"] == 1
        assert resp["followerID"] == 3

        applied = log.replay()
        assert [c for (_, _, c) in applied] == cmds
        assert spark.sql("SELECT n FROM wire_v").collect()[0].n == 5
    finally:
        srv.shutdown()
