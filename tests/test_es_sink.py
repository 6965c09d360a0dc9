"""ES HTTP bulk sink against an in-process fake _bulk endpoint: batch
caps, id semantics, and overload retry (reference BulkProcessImpl.java
batching :186-190, id :124)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from bigdatasearchpro_spark.sinks.es_http import es_bulk_sink
from bigdatasearchpro_spark.sources.files import load_table


class _FakeES(BaseHTTPRequestHandler):
    store = None  # set per-instance below

    def do_POST(self):  # noqa: N802
        body = self.rfile.read(int(self.headers["Content-Length"]))
        with self.server.lock:
            self.server.requests.append(body)
            if self.server.reject_first and len(self.server.requests) == 1:
                self.send_response(429)
                self.end_headers()
                return
            lines = body.decode().strip().split("\n")
            for i in range(0, len(lines), 2):
                action = json.loads(lines[i])["index"]
                doc = json.loads(lines[i + 1])
                _id = action.get("_id", f"__auto_{len(self.server.docs)}")
                self.server.docs[_id] = doc  # index op: last write wins
        if getattr(self.server, "per_action_error", False):
            out = json.dumps(
                {
                    "errors": True,
                    "items": [
                        {"index": {"_id": "k1", "status": 400,
                                   "error": {"type": "mapper_parsing_exception"}}}
                    ],
                }
            ).encode()
        else:
            out = json.dumps({"errors": False, "items": []}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def fake_es():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeES)
    srv.lock = threading.Lock()
    srv.requests = []
    srv.docs = {}
    srv.reject_first = False
    srv.per_action_error = False
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _url(srv):
    return f"http://127.0.0.1:{srv.server_address[1]}"


def test_all_rows_delivered_with_ids(spark, sf_dir, fake_es):
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("string").alias("s_guid"), "n_name"
    )
    es_bulk_sink(n, _url(fake_es), "MyIndex", id_col="s_guid")
    assert len(fake_es.docs) == n.count()  # count reconciliation
    assert fake_es.docs["7"]["n_name"] is not None


def test_batch_action_cap_splits_requests(spark, sf_dir, fake_es):
    n = load_table(spark, sf_dir, "nation").coalesce(1)
    es_bulk_sink(n, _url(fake_es), "idx", batch_actions=10)
    # 25 nations in one partition with cap 10 -> 3 requests
    assert len(fake_es.requests) == 3


def test_retry_on_429_delivers_everything(spark, sf_dir, fake_es):
    fake_es.reject_first = True
    n = load_table(spark, sf_dir, "nation").coalesce(1)
    es_bulk_sink(
        n.select(F.col("n_nationkey").cast("string").alias("s_guid"), "n_name"),
        _url(fake_es),
        "idx",
        id_col="s_guid",
        retry_wait=0.05,
    )
    assert len(fake_es.docs) == 25  # rejected batch was retried, nothing lost


def test_last_write_wins_on_duplicate_ids(spark, fake_es):
    df = spark.createDataFrame(
        [("k1", "old"), ("k1", "new"), ("k2", "only")], "s_guid string, v string"
    ).coalesce(1)
    es_bulk_sink(df, _url(fake_es), "idx", id_col="s_guid")
    assert fake_es.docs["k1"]["v"] == "new"
    assert len(fake_es.docs) == 2


class _FakeESAdmin(BaseHTTPRequestHandler):
    def _reply(self, obj, code=200):
        out = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def do_PUT(self):  # noqa: N802 - create index
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        with self.server.lock:
            self.server.indices[self.path.lstrip("/")] = json.loads(body or b"{}")
        self._reply({"acknowledged": True})

    def do_DELETE(self):  # noqa: N802
        with self.server.lock:
            self.server.indices.pop(self.path.lstrip("/"), None)
        self._reply({"acknowledged": True})

    def do_GET(self):  # noqa: N802 - _cat/indices
        with self.server.lock:
            rows = [{"index": n} for n in self.server.indices] + [
                {"index": ".kibana_1"}  # system index: must be filtered
            ]
        self._reply(rows)

    def log_message(self, *a):
        pass


@pytest.fixture()
def fake_es_admin():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeESAdmin)
    srv.lock = threading.Lock()
    srv.indices = {}
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def test_es_http_ddl_lifecycle(fake_es_admin):
    from bigdatasearchpro_spark.sinks.es_http import (
        es_create_index,
        es_delete_index,
        es_list_indices,
    )

    url = f"http://127.0.0.1:{fake_es_admin.server_address[1]}"
    name = es_create_index(url, "MyNewIndex")
    assert name == "mynewindex"
    st = fake_es_admin.indices["mynewindex"]["settings"]
    # the reference's load-optimized settings travel through
    assert (st["number_of_shards"], st["number_of_replicas"]) == (5, 0)
    assert st["refresh_interval"] == "-1"
    assert es_list_indices(url) == ["mynewindex"]  # .kibana filtered out
    es_delete_index(url, "MyNewIndex")
    assert es_list_indices(url) == []


def test_bulk_raises_on_per_action_errors(spark, fake_es):
    """An HTTP-200 _bulk response carrying per-action errors must fail
    the task, not silently drop documents."""
    fake_es.per_action_error = True
    df = spark.createDataFrame([("k1", "v")], "s_guid string, v string").coalesce(1)
    with pytest.raises(Exception, match="failed actions"):
        es_bulk_sink(df, _url(fake_es), "idx", id_col="s_guid")


# ------------------------------------------------------- mixed _bulk


def test_apply_bulk_actions_semantics(spark):
    """ES _bulk action matrix: index upserts, create fails on exists,
    update merges partially and fails on missing, delete noops on
    missing — applied in seq order within the batch."""
    from bigdatasearchpro_spark.sinks.bulk import apply_bulk_actions

    base = spark.createDataFrame(
        [("a", "en", "s1"), ("b", "fr", "s2"), ("c", "de", "s3")],
        "_id string, lang string, source string",
    )
    actions = spark.createDataFrame(
        [
            (1, "index", "a", "xx", "bulk"),     # replace a
            (2, "create", "b", "yy", None),      # conflict: b exists
            (3, "update", "c", "zz", None),      # partial: keeps s3
            (4, "delete", "b", None, None),      # remove b
            (5, "update", "nope", "xx", None),   # missing -> error
            (6, "create", "d", "it", "s4"),      # new doc
            (7, "delete", "gone", None, None),   # missing -> not_found
            # in-batch sequencing on one id: create then update then
            # delete -> absent, three statuses
            (8, "create", "e", "pt", "s5"),
            (9, "update", "e", "es", None),
            (10, "delete", "e", None, None),
        ],
        "seq long, op string, _id string, lang string, source string",
    )
    state, items = apply_bulk_actions(base, actions)
    got = {r["_id"]: (r["lang"], r["source"]) for r in state.collect()}
    assert got == {
        "a": ("xx", "bulk"),   # replaced whole doc
        "c": ("zz", "s3"),     # partial update kept source
        "d": ("it", "s4"),     # created
    }
    res = {r["seq"]: r["result"] for r in items.collect()}
    assert res == {
        1: "updated", 2: "version_conflict", 3: "updated", 4: "deleted",
        5: "document_missing", 6: "created", 7: "not_found",
        8: "created", 9: "updated", 10: "deleted",
    }
    # the whole replay is expression-tree work: no Python UDF in plan
    plan = state._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_apply_bulk_actions_if_seq_no_guard(spark):
    """Optimistic concurrency: a guarded action whose if_seq_no doesn't
    match the doc's current _seq_no is rejected with version_conflict;
    applied actions bump _seq_no."""
    from bigdatasearchpro_spark.sinks.bulk import apply_bulk_actions

    base = spark.createDataFrame(
        [("a", "en", 3), ("b", "fr", 7)],
        "_id string, lang string, _seq_no long",
    )
    actions = spark.createDataFrame(
        [
            (1, "update", "a", "xx", 3),    # matches -> applies, seq 4
            (2, "update", "a", "yy", 3),    # stale (now 4) -> conflict
            (3, "update", "a", "zz", 4),    # fresh -> applies, seq 5
            (4, "delete", "b", None, 99),   # wrong seq -> conflict
        ],
        "seq long, op string, _id string, lang string, if_seq_no long",
    )
    state, items = apply_bulk_actions(base, actions)
    got = {r["_id"]: (r["lang"], r["_seq_no"]) for r in state.collect()}
    assert got == {"a": ("zz", 5), "b": ("fr", 7)}
    res = {r["seq"]: r["result"] for r in items.collect()}
    assert res == {1: "updated", 2: "version_conflict", 3: "updated",
                   4: "version_conflict"}


def test_apply_bulk_actions_validation_and_broadcast(spark):
    import pytest as pt

    from bigdatasearchpro_spark.sinks.bulk import apply_bulk_actions

    base = spark.createDataFrame([("a", "x")], "_id string, v string")
    with pt.raises(ValueError, match="not in index schema"):
        apply_bulk_actions(
            base,
            spark.createDataFrame([(1, "index", "a", "y")],
                                  "seq long, op string, _id string, zz string"),
        )
    with pt.raises(ValueError, match="op must be one of"):
        apply_bulk_actions(
            base,
            spark.createDataFrame([(1, "upsert", "a", "y")],
                                  "seq long, op string, _id string, v string"),
        )
    # a NULL op must be rejected too — three-valued logic would slip it
    # past `~ops_ok` and the fold would report the no-op as 'deleted'
    with pt.raises(ValueError, match="op must be one of"):
        apply_bulk_actions(
            base,
            spark.createDataFrame([(1, None, "a", "y")],
                                  "seq long, op string, _id string, v string"),
        )
    # the untouched-rows path must be a broadcast anti-join (the base
    # table never shuffles at 100 TB)
    state, _ = apply_bulk_actions(
        base,
        spark.createDataFrame([(1, "index", "b", "y")],
                              "seq long, op string, _id string, v string"),
    )
    plan = state._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_api_bulk_mixed_end_to_end(spark, docs):
    import uuid

    from bigdatasearchpro_spark import api

    idx = f"bulkmix_{uuid.uuid4().hex[:8]}"
    api.bulk_data_to_index(spark, docs.limit(10), idx, id_col="doc_id")
    try:
        actions = spark.createDataFrame(
            [(1, "delete", "0"), (2, "create", "999991")],
            "seq long, op string, doc_id string",
        )
        items = api.bulk_mixed(spark, idx, actions, id_col="doc_id")
        res = {r["seq"]: r["result"] for r in items.collect()}
        assert res == {1: "deleted", 2: "created"}
        ids = {r["doc_id"] for r in
               spark.table(idx.lower()).select("doc_id").collect()}
        assert "0" not in ids and "999991" in ids and len(ids) == 10
    finally:
        api.delete_index(spark, idx)


def test_apply_bulk_actions_doc_as_upsert(spark):
    """ES doc_as_upsert: an update on a missing doc creates it from
    the partial doc; without the flag it stays document_missing."""
    from bigdatasearchpro_spark.sinks.bulk import apply_bulk_actions

    base = spark.createDataFrame([("a", "en", "s1")],
                                 "_id string, lang string, source string")
    actions = spark.createDataFrame(
        [
            (1, "update", "new1", "xx", None, True),   # upsert-create
            (2, "update", "new2", "yy", None, False),  # plain -> missing
            (3, "update", "a", "zz", None, True),      # exists -> merge
            (4, "update", "new1", None, "s9", True),   # second on upserted
        ],
        "seq long, op string, _id string, lang string, source string, "
        "doc_as_upsert boolean",
    )
    state, items = apply_bulk_actions(base, actions)
    got = {r["_id"]: (r["lang"], r["source"]) for r in state.collect()}
    assert got == {"a": ("zz", "s1"), "new1": ("xx", "s9")}
    res = {r["seq"]: r["result"] for r in items.collect()}
    assert res == {1: "created", 2: "document_missing", 3: "updated",
                   4: "updated"}


def test_apply_bulk_actions_matches_python_replay(spark):
    """Differential test: the JVM expression fold equals a
    straightforward Python replay of the same action log across a
    seeded randomized batch (ops x existing/missing x upsert x
    if_seq_no, multiple actions per id, shuffled seq)."""
    import random

    from bigdatasearchpro_spark.sinks.bulk import apply_bulk_actions

    rng = random.Random(20260815)
    ids = [f"d{i}" for i in range(30)]
    base_rows = [(i, f"lang{rng.randrange(3)}", rng.randrange(5))
                 for i in ids[:18]]
    acts = []
    for seq in range(120):
        i = rng.choice(ids)
        op = rng.choice(["index", "create", "update", "delete"])
        val = None if rng.random() < 0.3 else f"v{rng.randrange(9)}"
        guard = rng.randrange(4) if rng.random() < 0.25 else None
        upsert = rng.random() < 0.3
        acts.append((seq, op, i, val, guard, upsert))

    # python replay (the simple obviously-correct semantics); _seq_no
    # is MONOTONIC per id even across delete+recreate — the ES shard
    # counter never resets, and neither does the fold's
    state = {i: {"lang": l} for i, l, s in base_rows}
    seqs = {i: s for i, l, s in base_rows}
    expect_items = {}
    for seq, op, i, val, guard, upsert in sorted(acts):
        doc = state.get(i)
        seqno = seqs.get(i, 0)
        if op != "create" and guard is not None and guard != seqno:
            expect_items[seq] = "version_conflict"
            continue
        if op == "index":
            state[i] = {"lang": val}
            seqs[i] = seqno + 1
            expect_items[seq] = "updated" if doc else "created"
        elif op == "create":
            if doc:
                expect_items[seq] = "version_conflict"
            else:
                state[i] = {"lang": val}
                seqs[i] = seqno + 1
                expect_items[seq] = "created"
        elif op == "update":
            if doc:
                if val is not None:
                    doc["lang"] = val
                seqs[i] = seqno + 1
                expect_items[seq] = "updated"
            elif upsert:
                state[i] = {"lang": val}
                seqs[i] = seqno + 1
                expect_items[seq] = "created"
            else:
                expect_items[seq] = "document_missing"
        else:
            if doc:
                del state[i]
                seqs[i] = seqno + 1
                expect_items[seq] = "deleted"
            else:
                expect_items[seq] = "not_found"

    base = spark.createDataFrame(
        base_rows, "_id string, lang string, _seq_no long")
    actions = spark.createDataFrame(
        acts, "seq long, op string, _id string, lang string, "
              "if_seq_no long, doc_as_upsert boolean")
    got_state, got_items = apply_bulk_actions(base, actions)
    got = {r["_id"]: (r["lang"], r["_seq_no"])
           for r in got_state.collect()}
    assert got == {i: (d["lang"], seqs[i]) for i, d in state.items()}
    res = {r["seq"]: r["result"] for r in got_items.collect()}
    assert res == expect_items


def test_bulk_mixed_routed_differential(spark, docs):
    """End-to-end differential on a ROUTED index: a seeded 80-action
    mixed batch through api.bulk_mixed must leave the table equal to a
    Python replay of the action log, AND keep the routing contract
    row-for-row afterwards — __shard == pmod(xxhash64(lang), n) even
    for docs whose routing key the batch REWROTE (a shard move) or
    that the batch created from nothing."""
    import random
    import uuid

    from pyspark.sql import functions as F

    from bigdatasearchpro_spark import api

    rng = random.Random(20260815)
    idx = f"routed_diff_{uuid.uuid4().hex[:8]}"
    api.bulk_data_to_index(
        spark, docs.select("doc_id", "lang", "source").limit(40),
        idx, id_col="doc_id", routing_col="lang", n_shards=4)
    base = {r["doc_id"]: {"lang": r["lang"], "source": r["source"]}
            for r in spark.table(idx.lower())
            .select("doc_id", "lang", "source").collect()}
    ids = sorted(base) + [f"90000{i}" for i in range(8)]  # 8 missing
    langs = ["en", "de", "fr", "zz", None]
    acts = []
    state = {k: dict(v) for k, v in base.items()}
    for seq in range(80):
        i = rng.choice(ids)
        op = rng.choice(["index", "create", "update", "delete"])
        lang = rng.choice(langs)
        src = rng.choice(["a", "b", None])
        acts.append((seq, op, i, lang, src))
        doc = state.get(i)
        if op == "index":
            state[i] = {"lang": lang, "source": src}
        elif op == "create":
            if doc is None:
                state[i] = {"lang": lang, "source": src}
        elif op == "update":
            if doc is not None:
                if lang is not None:
                    doc["lang"] = lang
                if src is not None:
                    doc["source"] = src
        elif doc is not None:  # delete
            del state[i]
    actions = spark.createDataFrame(
        acts,
        "seq long, op string, doc_id string, lang string, source string")
    try:
        api.bulk_mixed(spark, idx, actions, id_col="doc_id")
        t = spark.table(idx.lower())
        got = {r["doc_id"]: {"lang": r["lang"], "source": r["source"]}
               for r in t.select("doc_id", "lang", "source").collect()}
        assert got == state
        shards = t.withColumn(
            "__expect", F.pmod(F.xxhash64(F.col("lang")), F.lit(4)))
        assert shards.filter(
            ~F.col("__shard").eqNullSafe(F.col("__expect"))).count() == 0
    finally:
        api.delete_index(spark, idx)
