"""Structured Streaming ring (SURVEY.md §2.9): streamed results must
equal the batch results of the same DataFrame programs, and the
foreachBatch bulk sink must reproduce the reference's micro-batch load
(count reconciliation, BulkProcessImpl.java:120-141)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from bigdatasearchpro_spark.sources.files import load_table
from bigdatasearchpro_spark.streaming import (
    events_stream,
    foreach_batch_bulk_sink,
    run_to_completion,
    session_agg,
    sliding_agg,
    stream_dedup,
    tumbling_agg,
)


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    # File-source streams read a directory; stage the single fixture
    # file into one (several copies of the path structure not needed).
    d = tmp_path_factory.mktemp("events_stream_src")
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-000.parquet")
    return str(d)


@pytest.fixture(scope="module")
def batch_events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _normalize(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_stream_equals_batch(spark, events_dir, batch_events, tmp_path):
    stream = tumbling_agg(events_stream(spark, events_dir))
    got = run_to_completion(
        stream, checkpoint_dir=str(tmp_path / "ck1"), output_mode="complete"
    )
    expect = tumbling_agg(batch_events)  # same program, batch mode
    assert _normalize(got) == _normalize(expect)


def test_sliding_stream_equals_batch(spark, events_dir, batch_events, tmp_path):
    stream = sliding_agg(events_stream(spark, events_dir))
    got = run_to_completion(
        stream, checkpoint_dir=str(tmp_path / "ck2"), output_mode="complete"
    )
    expect = sliding_agg(batch_events)
    assert _normalize(got) == _normalize(expect)


def test_session_stream_equals_batch(spark, events_dir, batch_events, tmp_path):
    stream = session_agg(events_stream(spark, events_dir))
    got = run_to_completion(
        stream, checkpoint_dir=str(tmp_path / "ck3"), output_mode="complete"
    )
    expect = session_agg(batch_events)
    assert _normalize(got) == _normalize(expect)


def test_stream_dedup_drops_repeats(spark, events_dir, tmp_path):
    stream = stream_dedup(
        events_stream(spark, events_dir), ["user_id", "event_type", "props"]
    ).select("user_id", "event_type", "props")
    got = run_to_completion(
        stream, checkpoint_dir=str(tmp_path / "ck4"), output_mode="append"
    )
    assert got.count() == got.dropDuplicates().count()


def test_foreach_batch_bulk_sink_reconciles_counts(spark, events_dir, batch_events, tmp_path):
    out = str(tmp_path / "sinkout")
    q = foreach_batch_bulk_sink(
        events_stream(spark, events_dir),
        out,
        checkpoint_dir=str(tmp_path / "ck5"),
    )
    q.awaitTermination(120)
    loaded = spark.read.parquet(out)
    # the reference's validation: loaded count == source count
    assert loaded.count() == batch_events.count()


def test_stateful_sessionize_matches_batch_closed_sessions(
    spark, batch_events, tmp_path
):
    """applyInPandasWithState sessionizer vs batch session_window —
    exact equality. Events replay as 4 time-ordered files (one per
    trigger) so sessions span batch boundaries; two far-future sentinel
    slices then push the watermark past every real session and give the
    event-time timers a batch to fire in, flushing all remaining state."""
    from bigdatasearchpro_spark.streaming.pipelines import stage_time_sliced_replay
    from bigdatasearchpro_spark.streaming.stateful import sessionize_with_state

    gap_min = 30
    sentinel_uid = -1
    src = tmp_path / "split_src"
    stage_time_sliced_replay(
        batch_events,
        str(src),
        n_slices=4,
        sentinel_gap_minutes=gap_min,
        sentinel_uid=sentinel_uid,
    )

    stream = spark.readStream.schema(batch_events.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src)).withColumn("ts", F.col("ts").cast("timestamp"))
    got = run_to_completion(
        sessionize_with_state(stream, gap_minutes=gap_min),
        checkpoint_dir=str(tmp_path / "ck6"),
        output_mode="append",
    ).filter(F.col("user_id") != sentinel_uid)

    expect = session_agg(
        batch_events.withColumn("ts", F.col("ts").cast("timestamp")),
        gap=f"{gap_min} minutes",
    )
    got_k = {
        (r.user_id, r.session_start): (r.n_events, round(r.sum_value, 2))
        for r in got.collect()
    }
    exp_k = {
        (r.user_id, r.session_start): (r.n_events, round(r.sum_value, 2))
        for r in expect.collect()
    }
    assert got_k == exp_k


def test_stream_stream_interval_join_equals_batch(spark, events_dir, batch_events, tmp_path):
    """Watermarked stream-stream interval join (purchases x views within
    the trailing hour) must equal the same join run in batch."""
    from bigdatasearchpro_spark.streaming.pipelines import stream_interval_join

    def split(df):
        cast = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return (
            cast.filter(F.col("event_type") == "purchase"),
            cast.filter(F.col("event_type") == "view"),
        )

    sp, sv = split(events_stream(spark, events_dir))
    got = run_to_completion(
        stream_interval_join(sp, sv),
        checkpoint_dir=str(tmp_path / "ck7"),
        output_mode="append",
    )
    bp, bv = split(batch_events)
    expect = stream_interval_join(bp, bv)
    assert _normalize(got) == _normalize(expect)
    assert got.count() > 0


def test_windowed_distinct_stream_equals_batch(spark, events_dir, batch_events, tmp_path):
    """approx_count_distinct (HLL++) is deterministic: the streaming
    windowed sketch aggregate must equal the batch run exactly."""
    from bigdatasearchpro_spark.streaming.pipelines import windowed_distinct_users

    stream = windowed_distinct_users(events_stream(spark, events_dir))
    got = run_to_completion(
        stream, checkpoint_dir=str(tmp_path / "ck8"), output_mode="complete"
    )
    expect = windowed_distinct_users(
        batch_events.withColumn("ts", F.col("ts").cast("timestamp"))
    )
    assert _normalize(got) == _normalize(expect)
    assert got.count() > 0
    # sketch accuracy sanity vs exact batch distinct
    exact = {
        (r["win_start"], r["event_type"]): r["n"]
        for r in batch_events.groupBy(
            F.window(F.col("ts").cast("timestamp"), "1 hour").alias("w"), "event_type"
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("win_start"), "event_type", "n")
        .collect()
    }
    for r in got.collect():
        e = exact[(r["win_start"], r["event_type"])]
        assert abs(r["n_users_approx"] - e) / max(e, 1) < 0.10


def test_streaming_cdc_apply_converges_to_batch(spark, tmp_path):
    """Three change micro-batches streamed through streaming_apply_changes
    must leave the snapshot in the same state as applying them in batch
    order (upserts honored, deletes honored, exactly-once per batch)."""
    import time as _time

    from bigdatasearchpro_spark.operators.transform import apply_changes
    from bigdatasearchpro_spark.streaming.pipelines import (
        read_snapshot,
        streaming_apply_changes,
    )

    batches = [
        [(1, "I", "a1"), (2, "I", "b1"), (3, "I", "c1")],
        [(2, "U", "b2"), (4, "I", "d1")],
        [(1, "D", None), (4, "U", "d2"), (5, "I", "e1")],
    ]
    schema = "k long, op string, v string"
    src = tmp_path / "cdc_src"
    src.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / f"stage_{i}"))
        import shutil as _sh
        import os as _os

        part = next(
            p for p in _os.listdir(tmp_path / f"stage_{i}") if p.endswith(".parquet")
        )
        _sh.copy(tmp_path / f"stage_{i}" / part, src / f"batch_{i}.parquet")
        _time.sleep(0.1)  # distinct mod-times -> deterministic order

    snap = str(tmp_path / "snapshot")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src))
    q = streaming_apply_changes(
        stream, snap, "k", checkpoint_dir=str(tmp_path / "ck_cdc")
    )
    assert q.awaitTermination(120)

    got = {r.k: r.v for r in read_snapshot(spark, snap).collect()}

    base = spark.createDataFrame([], "k long, v string")
    for rows in batches:
        base = apply_changes(base, spark.createDataFrame(rows, schema), "k")
    expect = {r.k: r.v for r in base.collect()}
    assert got == expect == {2: "b2", 3: "c1", 4: "d2", 5: "e1"}


def test_cdc_snapshot_publish_is_crash_safe(spark, tmp_path):
    """The manifest-pointer publish must survive a crash at every step:
    a version dir written WITHOUT a pointer flip (crash between write
    and publish) leaves the old state visible, and replaying the same
    batch id from that state converges to the correct result instead of
    rebuilding the snapshot from only the current batch."""
    import os

    from bigdatasearchpro_spark.streaming.pipelines import (
        apply_cdc_batch,
        read_snapshot,
    )

    schema = "k long, op string, v string"
    snap = str(tmp_path / "snapshot")
    b0 = spark.createDataFrame([(1, "I", "a1"), (2, "I", "b1")], schema)
    apply_cdc_batch(b0, 0, snap, "k")
    assert {r.k: r.v for r in read_snapshot(spark, snap).collect()} == {
        1: "a1",
        2: "b1",
    }

    # Simulate a crash mid-batch-1: version dir written, pointer NOT
    # flipped. Readers must still see batch-0 state.
    b1 = spark.createDataFrame([(2, "U", "b2"), (3, "I", "c1")], schema)
    base = read_snapshot(spark, snap)
    from bigdatasearchpro_spark.operators.transform import apply_changes

    apply_changes(base, b1, "k").select("k", "v").write.mode("overwrite").parquet(
        os.path.join(snap, "v_1")
    )
    assert {r.k: r.v for r in read_snapshot(spark, snap).collect()} == {
        1: "a1",
        2: "b1",
    }, "unpublished version leaked into reads"

    # Checkpoint replay of batch 1 against the still-published old
    # version: overwrites the orphan dir and publishes correctly.
    apply_cdc_batch(b1, 1, snap, "k")
    assert {r.k: r.v for r in read_snapshot(spark, snap).collect()} == {
        1: "a1",
        2: "b2",
        3: "c1",
    }

    # Old version is retained for in-flight readers; two-versions GC.
    apply_cdc_batch(
        spark.createDataFrame([(1, "D", None)], schema), 2, snap, "k"
    )
    versions = sorted(d for d in os.listdir(snap) if d.startswith("v_"))
    assert versions == ["v_1", "v_2"]
    assert {r.k: r.v for r in read_snapshot(spark, snap).collect()} == {
        2: "b2",
        3: "c1",
    }


def test_cdc_publish_kill_during_manifest_flip(spark, tmp_path):
    """r4-verdict task 7a: a kill DURING the manifest publish — after
    the tmp pointer file is written but before os.replace — must leave
    the previous version readable, must not let the stray .tmp leak
    into reads, and the checkpoint replay of the same batch must
    converge. A half-written version dir (the other mid-batch kill
    point) must likewise be invisible and safely overwritten."""
    import os

    from bigdatasearchpro_spark.streaming.pipelines import (
        _SNAPSHOT_MANIFEST,
        apply_cdc_batch,
        read_snapshot,
    )

    schema = "k long, op string, v string"
    snap = str(tmp_path / "snapshot")
    apply_cdc_batch(
        spark.createDataFrame([(1, "I", "a1"), (2, "I", "b1")], schema),
        0, snap, "k",
    )

    # kill point A: version dir only PARTIALLY written (one corrupt
    # file, no _SUCCESS) — simulates dying inside the merged.write job
    vdir = os.path.join(snap, "v_1")
    os.makedirs(vdir, exist_ok=True)
    with open(os.path.join(vdir, "part-00000.parquet"), "wb") as f:
        f.write(b"\x00garbage, not parquet")
    # kill point B: tmp pointer written, os.replace never ran
    with open(os.path.join(snap, _SNAPSHOT_MANIFEST + ".tmp"), "w") as f:
        f.write("v_1\n")

    # reads still resolve the published v_0 — neither the garbage dir
    # nor the stray tmp is visible
    assert {r.k: r.v for r in read_snapshot(spark, snap).collect()} == {
        1: "a1", 2: "b1",
    }

    # checkpoint replay of batch 1: overwrite clobbers the garbage,
    # os.replace clobbers the stray tmp, state converges
    b1 = spark.createDataFrame([(2, "U", "b2"), (3, "I", "c1")], schema)
    apply_cdc_batch(b1, 1, snap, "k")
    assert {r.k: r.v for r in read_snapshot(spark, snap).collect()} == {
        1: "a1", 2: "b2", 3: "c1",
    }
    assert not os.path.exists(os.path.join(snap, _SNAPSHOT_MANIFEST + ".tmp"))


def test_cdc_duplicate_delivery_converges(spark, tmp_path):
    """r4-verdict task 7b: at-least-once inputs deliver the same change
    rows more than once. Both duplicate shapes must converge to the
    value-identical snapshot: (1) the same batch id replayed AFTER its
    pointer already flipped (crash between flip and checkpoint commit —
    the replay merges onto the already-merged base), and (2) the same
    change rows redelivered under a NEW batch id."""
    from bigdatasearchpro_spark.streaming.pipelines import (
        apply_cdc_batch,
        read_snapshot,
    )

    def snap_state(d):
        return sorted(
            (r.k, r.v) for r in read_snapshot(spark, d).collect()
        )

    schema = "k long, op string, v string"
    snap = str(tmp_path / "snapshot")
    apply_cdc_batch(
        spark.createDataFrame([(1, "I", "a1"), (2, "I", "b1")], schema),
        0, snap, "k",
    )
    b1 = spark.createDataFrame(
        [(2, "U", "b2"), (3, "I", "c1"), (1, "D", None)], schema
    )
    apply_cdc_batch(b1, 1, snap, "k")
    want = snap_state(snap)

    # shape 1: same batch id re-applied onto the already-flipped state
    # (upserts overwrite with identical values; the delete of an
    # already-absent key is a no-op) — value-identical snapshot
    apply_cdc_batch(b1, 1, snap, "k")
    assert snap_state(snap) == want

    # shape 2: same rows, new batch id (source-side redelivery)
    apply_cdc_batch(b1, 2, snap, "k")
    assert snap_state(snap) == want


def test_stream_static_join_equals_batch(spark, events_dir, batch_events, sf_dir, tmp_path):
    """Stream-static enrichment: the streamed (join + windowed agg)
    result equals the same program in batch mode; the join itself is
    stateless (only the agg checkpoints state)."""
    from bigdatasearchpro_spark.streaming import (
        events_stream,
        run_to_completion,
        stream_static_enriched_agg,
    )

    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    stream = stream_static_enriched_agg(events_stream(spark, events_dir), dim)
    got = run_to_completion(
        stream, checkpoint_dir=str(tmp_path / "ck_ss"), output_mode="complete"
    )
    expect = stream_static_enriched_agg(batch_events, dim)
    assert _normalize(got) == _normalize(expect)
    assert len(got.collect()) > 0


def test_streaming_percolate_equals_batch(spark, events_dir, batch_events, tmp_path):
    """Streaming percolation (saved-search alerting) must emit exactly
    the matches the batch percolate_many computes over the same docs."""
    from pyspark.sql import functions as F

    from bigdatasearchpro_spark.operators import search
    from bigdatasearchpro_spark.streaming import events_stream, run_to_completion
    from bigdatasearchpro_spark.streaming.pipelines import streaming_percolate

    stored = spark.createDataFrame(
        [
            (1, "click"),
            (2, "view"),
            (3, "purchase signup"),
            (4, "error"),
            (5, "click click"),  # duplicate analyzed token, mode=all:
            # must fire on every 'click' event (need = DISTINCT terms)
        ],
        "query_id long, query string",
    )
    registered = search.register_percolator_queries(stored).cache()
    stream = events_stream(spark, events_dir)
    alerts = streaming_percolate(stream, registered)
    got = run_to_completion(
        alerts,
        checkpoint_dir=str(tmp_path / "ck_perc"),
        output_mode="complete",
    )
    want = search.percolate_many(
        registered, batch_events, id_col="event_id", text_col="event_type"
    )
    g = {(r["event_id"], r["query_id"]) for r in got.collect()}
    w = {(r["event_id"], r["query_id"]) for r in want.collect()}
    assert g == w and len(w) > 0
    # the two-term stored query (mode=all) never fires: an event_type
    # is a single token
    assert not any(q == 3 for _, q in w)
    # the duplicate-term query fires exactly where the single-term
    # 'click' query does (round-5 advice regression)
    assert {e for e, q in w if q == 5} == {e for e, q in w if q == 1} != set()


def test_streaming_eql_2step_equals_batch(spark, events_dir, batch_events, tmp_path):
    """Streaming EQL [view][purchase] within 60m (interval join ->
    head-matching min aggregate, two stateful operators) must equal
    the same program in batch AND the batch eql_sequence operator."""
    from bigdatasearchpro_spark.operators.eql import eql_sequence
    from bigdatasearchpro_spark.streaming.pipelines import (
        streaming_eql_2step,
    )

    def split(df):
        cast = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return (
            cast.filter(F.col("event_type") == "view"),
            cast.filter(F.col("event_type") == "purchase"),
        )

    s1, s2 = split(events_stream(spark, events_dir))
    got = run_to_completion(
        streaming_eql_2step(s1, s2),
        checkpoint_dir=str(tmp_path / "ck16"),
        output_mode="append",
    )
    b1, b2 = split(batch_events)
    expect = streaming_eql_2step(b1, b2)
    assert _normalize(got) == _normalize(expect)
    assert got.count() > 0
    # and the streaming program == the batch EQL operator's 2-step form
    ev = batch_events.withColumn("ts", F.col("ts").cast("timestamp"))
    eql = eql_sequence(
        ev, [{"event_type": "view"}, {"event_type": "purchase"}],
        by="user_id", within_seconds=3600,
    )
    assert _normalize(got.select("user_id", "ts_1", "id_1", "ts_2", "id_2")) \
        == _normalize(eql.select("user_id", "ts_1", "id_1", "ts_2", "id_2"))


def test_streaming_percolate_dsl_equals_batch(spark, events_dir, batch_events, tmp_path):
    """Streaming full-DSL percolation (range / must_not / exists /
    prefix residuals + per-doc top-k cap) must emit exactly the batch
    mixed-topk kernel's result over the same docs — the kernel is
    per-row, so append-mode streaming has nothing to reconcile."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from bigdatasearchpro_spark.operators import search
    from bigdatasearchpro_spark.streaming import events_stream, run_to_completion
    from bigdatasearchpro_spark.streaming.pipelines import (
        streaming_percolate_dsl,
    )

    reg_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("mode", T.StringType()),
        T.StructField("range_field", T.StringType()),
        T.StructField("range_op", T.StringType()),
        T.StructField("range_value", T.DoubleType()),
        T.StructField("phrase", T.StringType()),
        T.StructField("neg_terms", T.ArrayType(T.StringType())),
        T.StructField("exists_field", T.StringType()),
        T.StructField("tok_prefix", T.StringType()),
    ])
    n4 = (None, None, None, None)
    registered = spark.createDataFrame(
        [
            (1, ["error"], "all", "value", "gte", 100.0, None,
             None, None, None),
            (2, ["error"], "any", *n4, None, None, None),
            (3, ["click"], "all", *n4, None, "missing", None),  # never
            (4, ["view"], "all", *n4, None, "value", None),
            (5, ["signup"], "all", *n4, ["0"], None, None),
            (6, ["purchase"], "all", *n4, None, None, "1"),
        ],
        reg_schema,
    )
    with_txt = lambda df: df.withColumn(
        "txt", F.concat_ws(" ", "event_type", "props")
    )
    alerts = streaming_percolate_dsl(
        with_txt(events_stream(spark, events_dir)), registered,
        k=1, id_col="event_id", text_col="txt", numeric_fields=("value",),
    )
    got = run_to_completion(
        alerts,
        checkpoint_dir=str(tmp_path / "ck_perc_dsl"),
        output_mode="append",
    )
    want = search.percolate_mixed_topk(
        registered, with_txt(batch_events), k=1,
        id_col="event_id", text_col="txt", numeric_fields=("value",),
    )
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w and len(w) > 0
    qs = {q for _, q, _ in w}
    # the unmapped-exists rule never fires; the mapped one does; the
    # k=1 cap keeps only q1 on high-value error docs (q2 loses the tie)
    assert 3 not in qs and 4 in qs
    high_err = {e for e, q, _ in w if q == 1}
    assert high_err and all(q != 2 for e, q, _ in w if e in high_err)
