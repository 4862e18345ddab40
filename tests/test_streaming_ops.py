"""Watermarked windows + stateful sessionization tests."""

from pyspark.sql import functions as F

from libswish3_spark.streaming.sessions import sessionize_batch, sessionize_stream
from libswish3_spark.streaming.windows import windowed_event_counts

SF = "/root/testdata/sf0.001"


def test_windowed_counts_batch_equals_plain_agg(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    win = windowed_event_counts(ev)
    total = win.agg(F.sum("cnt")).collect()[0][0]
    assert total == ev.count()


def test_windowed_counts_streaming_with_watermark(spark, tmp_path):
    src = str(tmp_path / "ev")
    spark.read.parquet(f"{SF}/events.parquet").write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    win = windowed_event_counts(stream, watermark="10 minutes")
    q = (
        win.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; everything except
    # the final open window must be out
    got = spark.sql("select sum(cnt) from win_counts").collect()[0][0]
    total = spark.read.parquet(src).count()
    assert got is not None and 0 < got <= total
    assert q.lastProgress is not None


def test_sessionize_batch_properties(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    sessions = sessionize_batch(ev, gap_seconds=1800)
    agg = sessions.agg(
        F.sum("n_events").alias("n"), F.count("*").alias("sessions")
    ).collect()[0]
    assert agg["n"] == ev.count()  # every event lands in exactly one session
    assert agg["sessions"] >= ev.select("user_id").distinct().count()
    # session bounds ordered, no zero-event sessions
    bad = sessions.where(
        (F.col("session_end") < F.col("session_start")) | (F.col("n_events") <= 0)
    ).count()
    assert bad == 0


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """The stateful operator and its batch twin agree on closed sessions."""
    src = str(tmp_path / "ev2")
    ev = spark.read.parquet(f"{SF}/events.parquet").where(F.col("user_id") < 12)
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sess")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("select * from sess").collect()
    }
    expected = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_batch(ev, 1800).collect()
    }
    # streaming emits sessions CLOSED by a later event within the run;
    # each user's final (still-open) session stays in state until timeout
    assert got  # some sessions closed
    assert got.issubset(expected)
    still_open = expected - got
    open_users = {u for (u, *_rest) in still_open}
    assert len(still_open) >= ev.select("user_id").distinct().count() or open_users


def test_upsert_stream_action_semantics_across_restart(spark, tmp_path):
    """Streaming Action reconcile (S3): latest version wins, delete
    tombstones, and state survives a checkpointed restart — a delete in
    run 2 must beat the add that run 1 absorbed into state."""
    from libswish3_spark.pipeline import DOCS_FULL_SCHEMA
    from libswish3_spark.streaming.upsert import upsert_stream

    src = str(tmp_path / "frames")
    ckpt = str(tmp_path / "ckpt")

    def row(doc_id, text, mtime, action):
        return {
            "doc_id": doc_id,
            "spans": [{"kind": "text", "text": text, "media_ref": "", "offset": 0}],
            "mtime": mtime,
            "action": action,
        }

    out = str(tmp_path / "emissions")

    def run(rows, run_id):
        spark.createDataFrame(rows, schema=DOCS_FULL_SCHEMA).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(DOCS_FULL_SCHEMA).parquet(src)

        # foreachBatch parquet sink: checkpoint-recoverable (memory sink
        # is not), and the realistic MERGE-feed shape
        def sink(df, bid):
            df.withColumn("_run", F.lit(run_id)).write.mode("append").parquet(out)

        q = (
            upsert_stream(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r["doc_id"]: r
            for r in spark.read.parquet(out).where(F.col("_run") == run_id).collect()
        }

    got1 = run(
        [row("a", "a v1", 100, "add"), row("b", "b v1", 100, "add"),
         row("c", "c v1", 100, "add")],
        1,
    )
    assert got1["a"]["alive"] and got1["c"]["alive"]
    assert got1["a"]["text"] == "a v1"

    got2 = run(
        [row("a", "a v2", 200, "update"), row("c", "", 300, "delete"),
         row("a", "a stale", 50, "update")],  # stale mtime must lose
        2,
    )
    assert set(got2) == {"a", "c"}  # b untouched in run 2 → not re-emitted
    assert got2["a"]["alive"] and got2["a"]["text"] == "a v2"
    assert got2["a"]["mtime"] == 200
    assert got2["c"]["alive"] is False  # tombstone despite run-1 state


def test_dedup_stream_first_seen_survives_restart(spark, tmp_path):
    """Streaming exact dedup: a duplicate arriving AFTER a checkpointed
    restart must still be dropped (the seen-set lives in the
    checkpoint, not in memory); new content still flows."""
    from libswish3_spark.pipeline import DOCS_FULL_SCHEMA
    from libswish3_spark.streaming.dedup import dedup_stream

    src = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "kept")

    def row(doc_id, text, seq):
        return {
            "doc_id": doc_id,
            "spans": [{"kind": "text", "text": text, "media_ref": "", "offset": 0}],
            "seq": seq,
        }

    def run(rows, run_id):
        spark.createDataFrame(rows, schema=DOCS_FULL_SCHEMA).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(DOCS_FULL_SCHEMA).parquet(src)

        def sink(df, bid):
            df.where(F.col("doc_id").isNotNull()).withColumn(
                "_run", F.lit(run_id)
            ).write.mode("append").parquet(out)

        q = (
            dedup_stream(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r["doc_id"]
            for r in spark.read.parquet(out).where(F.col("_run") == run_id).collect()
        }

    # run 1: a, b distinct; c duplicates a within the batch (higher seq)
    got1 = run(
        [row("a", "alpha text", 0), row("b", "beta text", 1), row("c", "alpha text", 2)],
        1,
    )
    assert got1 == {"a", "b"}  # c dropped, first arrival kept

    # run 2 (restart): d duplicates a ACROSS the restart; e is new
    got2 = run([row("d", "alpha text", 3), row("e", "gamma text", 4)], 2)
    assert got2 == {"e"}


def test_streaming_near_dup_against_stored_index(spark, tmp_path):
    """Ingest-time near-dup detection: an arriving copy of an
    already-indexed document must surface as a candidate pair via the
    stream-static join against the stored bucket index; novel content
    must not. Stateless — no watermark, no state store."""
    from libswish3_spark.operators.signatures import build_minhash_bucket_index
    from libswish3_spark.pipeline import DOCS_SCHEMA
    from libswish3_spark.streaming.neardup import near_dup_stream

    corpus_text = "the quick brown fox jumps over the lazy dog again and again"
    static = spark.createDataFrame(
        [("old1", corpus_text), ("old2", "completely unrelated corpus words here")],
        ["doc_id", "text"],
    )
    idx_path = str(tmp_path / "bucket_idx")
    build_minhash_bucket_index(static, "doc_id", "text").write.parquet(idx_path)

    src = str(tmp_path / "arrivals")
    out = str(tmp_path / "pairs")

    def row(doc_id, text):
        return {
            "doc_id": doc_id,
            "spans": [{"kind": "text", "text": text, "media_ref": "", "offset": 0}],
        }

    spark.createDataFrame(
        [row("new_dup", corpus_text), row("new_novel", "entirely fresh never seen tokens")],
        schema=DOCS_SCHEMA,
    ).write.parquet(src)

    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(src)
    pairs = near_dup_stream(stream, spark.read.parquet(idx_path))

    def sink(df, bid):
        df.dropDuplicates(["doc_id", "matched_id"]).write.mode("append").parquet(out)

    q = (
        pairs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["doc_id"], r["matched_id"]) for r in spark.read.parquet(out).collect()}
    assert ("new_dup", "old1") in got  # identical text → same buckets, guaranteed
    assert not [p for p in got if p[0] == "new_novel"]


def test_keep_first_equal_seq_tiebreak_matches_batch_twin():
    """Within-batch keeper under equal/missing seq = min (seq, doc_id),
    exactly the batch twin's min_by(struct(seq, doc_id)) ordering —
    NOT pandas iteration order, which varies with partitioning/retries."""
    import pandas as pd

    from libswish3_spark.streaming.dedup import _keep_first

    class FakeState:
        exists = False

        def update(self, v):
            self.value = v

    # doc 'z' arrives first in iteration order but ties on seq with 'a';
    # the (seq, doc_id) ordering must pick 'a'
    pdf = pd.DataFrame(
        {"doc_id": ["z", "a", "m"], "text": ["tz", "ta", "tm"], "seq": [5, 5, 9]}
    )
    state = FakeState()
    out = pd.concat(list(_keep_first(("fp1",), iter([pdf]), state)))
    assert list(out["doc_id"]) == ["a"]
    assert state.value == ("a",)

    # all-null seq coerces to 0 for every row → doc_id decides
    pdf2 = pd.DataFrame(
        {"doc_id": ["q", "b"], "text": ["tq", "tb"], "seq": [None, None]}
    )
    state2 = FakeState()
    out2 = pd.concat(list(_keep_first(("fp2",), iter([pdf2]), state2)))
    assert list(out2["doc_id"]) == ["b"]


def test_streaming_near_dup_extracted_mode_matches_swishdefault_index(
    spark, tmp_path
):
    """When the stored index is built from the PARSED swishdefault
    buffer (the submit_extract --minhash-index wiring), arrivals must be
    bucketed over the same extraction projection: extracted=True finds a
    markup near-duplicate that raw-span bucketing misses (raw shingles
    would include the divergent tag soup)."""
    from libswish3_spark.operators.signatures import build_minhash_bucket_index
    from libswish3_spark.pipeline import DOCS_SCHEMA
    from libswish3_spark.streaming.neardup import (
        near_dup_stream,
        swishdefault_text,
    )

    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(DOCS_SCHEMA.fields + [StructField("parser", StringType())])
    body = "the quick brown fox jumps over the lazy dog again and again"

    def doc(doc_id, html):
        return {
            "doc_id": doc_id,
            "spans": [{"kind": "text", "text": html, "media_ref": "", "offset": 0}],
            "parser": "HTML",
        }

    corpus = spark.createDataFrame(
        [
            doc("old1", f"<html><body><p>{body}</p></body></html>"),
            doc("old2", "<html><body>totally unrelated corpus words</body></html>"),
        ],
        schema=schema,
    )
    # index over the extracted text — exactly submit_extract's projection
    idx_path = str(tmp_path / "swishdefault_idx")
    build_minhash_bucket_index(swishdefault_text(corpus)).write.parquet(idx_path)

    # same BODY text, different markup (attrs, nesting, extra tags):
    # parsed text identical → extracted-mode buckets identical
    arrivals = spark.createDataFrame(
        [doc("new_dup", f'<html><body><div class="c"><b>{body}</b></div></body></html>')],
        schema=schema,
    )
    src = str(tmp_path / "arrivals")
    arrivals.write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)

    out = str(tmp_path / "pairs")
    pairs = near_dup_stream(stream, spark.read.parquet(idx_path), extracted=True)
    q = (
        pairs.writeStream.foreachBatch(
            lambda df, bid: df.dropDuplicates(["doc_id", "matched_id"])
            .write.mode("append")
            .parquet(out)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["doc_id"], r["matched_id"]) for r in spark.read.parquet(out).collect()}
    assert ("new_dup", "old1") in got
    assert ("new_dup", "old2") not in got

    # and the RAW default buckets a DIFFERENT text (tag soup included):
    # its bucket set diverges from the extracted-mode set — the drift
    # that silently erodes recall when the index is parsed-text built
    from libswish3_spark.streaming.neardup import stream_band_buckets

    raw_buckets = {
        r["bucket"] for r in stream_band_buckets(arrivals).collect()
    }
    ext_buckets = {
        r["bucket"]
        for r in stream_band_buckets(arrivals, extracted=True).collect()
    }
    assert raw_buckets != ext_buckets


def test_batch_keep_first_null_seq_coalesces_like_streaming_twin(spark):
    """A fingerprint with both a NULL-seq row and a seq=0 row must pick
    the SAME keeper in batch and streaming: both coalesce NULL→0 and
    fall to doc_id. (Spark struct ordering sorts NULL before 0 — the
    uncoalesced form diverged from the pandas twin.)"""
    from libswish3_spark.streaming.dedup import keep_first

    def row(doc_id, seq):
        return {
            "doc_id": doc_id,
            "spans": [
                {"kind": "text", "text": "same text", "media_ref": "", "offset": 0}
            ],
            "seq": seq,
        }

    # 'z' has NULL seq, 'a' has 0: NULL coalesces to 0, doc_id breaks
    # the tie → 'a' (what the streaming _keep_first key picks)
    docs = spark.createDataFrame(
        [row("z", None), row("a", 0)],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, seq long",
    )
    got = keep_first(docs).collect()
    assert len(got) == 1 and got[0]["doc_id"] == "a"


def test_near_dup_stream_restart_no_duplicate_no_lost_pairs(spark, tmp_path):
    """Checkpoint-kill-restart for ingest-time near-dup: run 1's pairs
    must not re-emit after restart (the checkpoint owns progress) and
    run 2's arrivals must still match — no duplicates, no losses. The
    operator is stateless (stream-static join), so the only state is
    source progress; this pins that the checkpoint actually carries it."""
    from libswish3_spark.operators.signatures import build_minhash_bucket_index
    from libswish3_spark.pipeline import DOCS_SCHEMA
    from libswish3_spark.streaming.neardup import near_dup_stream

    corpus_text = "the quick brown fox jumps over the lazy dog again and again"
    other_text = "pack my box with five dozen liquor jugs every single day"
    static = spark.createDataFrame(
        [("old1", corpus_text), ("old2", other_text)], ["doc_id", "text"]
    )
    idx_path = str(tmp_path / "idx")
    build_minhash_bucket_index(static, "doc_id", "text").write.parquet(idx_path)

    src = str(tmp_path / "arrivals")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "pairs")

    def row(doc_id, text):
        return {
            "doc_id": doc_id,
            "spans": [{"kind": "text", "text": text, "media_ref": "", "offset": 0}],
        }

    def run(rows, run_id):
        spark.createDataFrame(rows, schema=DOCS_SCHEMA).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(DOCS_SCHEMA).parquet(src)
        pairs = near_dup_stream(stream, spark.read.parquet(idx_path))

        def sink(df, bid):
            df.dropDuplicates(["doc_id", "matched_id"]).withColumn(
                "_run", F.lit(run_id)
            ).write.mode("append").parquet(out)

        q = (
            pairs.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return [
            (r["doc_id"], r["matched_id"])
            for r in spark.read.parquet(out).where(F.col("_run") == run_id).collect()
        ]

    got1 = run([row("n1", corpus_text)], 1)
    assert ("n1", "old1") in got1

    # restart: n1 must NOT re-emit; n2 (dup of old2) must emit
    got2 = run([row("n2", other_text)], 2)
    assert [p for p in got2 if p[0] == "n2" and p[1] == "old2"]
    assert not [p for p in got2 if p[0] == "n1"]  # no duplicate emission


def test_sessionize_stream_state_survives_restart(spark, tmp_path):
    """Checkpoint-kill-restart for stateful sessionization: a session
    left OPEN in run 1 must close correctly in run 2 when a later event
    crosses the gap — the open-session state (start/end/count) lives in
    the checkpoint, not the process. No duplicate or lost sessions."""
    import datetime as dt

    from libswish3_spark.streaming.sessions import sessionize_stream

    src = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sessions")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    schema = "user_id long, ts timestamp"

    def run(rows, run_id):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)

        def sink(df, bid):
            df.withColumn("_run", F.lit(run_id)).write.mode("append").parquet(out)

        q = (
            sessionize_stream(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return [
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.read.parquet(out).where(F.col("_run") == run_id).collect()
        ]

    # run 1: user 7 has two events 10 min apart — one open session,
    # nothing closed yet
    got1 = run(
        [(7, t0), (7, t0 + dt.timedelta(minutes=10))],
        1,
    )
    assert got1 == []

    # run 2 (restart): an event 2 h later closes the run-1 session with
    # BOTH run-1 events — state carried across the restart; emitted once
    got2 = run([(7, t0 + dt.timedelta(hours=2))], 2)
    assert got2 == [(7, t0, t0 + dt.timedelta(minutes=10), 2)]


def test_sessionize_expiry_uses_session_timezone():
    """The event-time timeout must convert the NAIVE session end (Arrow
    hands the state fn timestamps localized to spark.sql.session.
    timeZone) to UTC epoch ms using THAT zone — a bare
    datetime.timestamp() reads the machine-local zone and shifts every
    expiry by the zone delta on hosts where the two differ."""
    import datetime as dt

    import pandas as pd

    from libswish3_spark.streaming.sessions import (
        GAP_SECONDS,
        _make_sessionize,
        _tzinfo_for,
    )

    class FakeState:
        hasTimedOut = False
        exists = False

        def __init__(self):
            self.timeout_ms = None
            self.stored = None

        @property
        def get(self):
            return self.stored

        def update(self, v):
            self.stored = v

        def getCurrentWatermarkMs(self):
            return 0

        def setTimeoutTimestamp(self, ms):
            self.timeout_ms = ms

    end = dt.datetime(2020, 1, 1, 12, 0, 0)  # naive, session-tz-local
    for tz_name in ("+05:00", "UTC", "-03:30"):
        state = FakeState()
        fn = _make_sessionize(tz_name)
        list(fn((7,), [pd.DataFrame({"ts": [end]})], state))
        expected = (
            int(end.replace(tzinfo=_tzinfo_for(tz_name)).timestamp() * 1000)
            + GAP_SECONDS * 1000
        )
        assert state.timeout_ms == expected, tz_name
    # the three zones disagree pairwise by their offsets — the old
    # machine-local conversion could not have produced all three
    assert _tzinfo_for("+05:00").utcoffset(None) == dt.timedelta(hours=5)
    assert _tzinfo_for("-03:30").utcoffset(None) == -dt.timedelta(
        hours=3, minutes=30
    )
    assert _tzinfo_for(None) is None


def test_keep_first_media_only_docs_not_collapsed(spark):
    """The exact-dedup fingerprint covers the FULL span sequence, not
    spans[0].text: two DIFFERENT image-only docs (first span media,
    text NULL) must both survive, while byte-identical media docs still
    dedup. The old spans[0].text fingerprint gave every media-first doc
    a NULL fp — all of them collapsed into one group and only the first
    ever survived."""
    from libswish3_spark.streaming.dedup import keep_first

    rows = [
        ("img1", [("media", None, "img://a", 0)], 1),
        ("img2", [("media", None, "img://b", 0)], 2),   # different image
        ("img1dup", [("media", None, "img://a", 0)], 3),  # exact dup of img1
        ("mixed", [("media", None, "img://a", 0), ("text", "caption", "", 1)], 4),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, seq long",
    )
    out = {r["doc_id"]: r for r in keep_first(df).collect()}
    assert set(out) == {"img1", "img2", "mixed"}  # img1dup deduped, img2 kept


def test_upsert_equal_mtime_resolves_by_seq_not_iteration_order():
    """Equal-mtime rows must resolve by the frame seq (the batch twin's
    max_by(struct(mtime, seq, ...)) ordering), not by pandas iteration
    order — a delete iterated BEFORE its same-mtime add must still win
    when its seq is higher."""
    import pandas as pd

    from libswish3_spark.streaming.upsert import _upsert

    class FakeState:
        exists = False
        hasTimedOut = False

        def __init__(self):
            self.stored = None

        @property
        def get(self):
            return self.stored

        def update(self, v):
            self.stored = v

    # adversarial iteration order: the delete (seq=2) comes FIRST
    pdf = pd.DataFrame(
        {
            "mtime": [100, 100],
            "seq": [2, 1],
            "action": ["delete", "add"],
            "text": [None, "body"],
        }
    )
    state = FakeState()
    (out,) = list(_upsert(("d1",), [pdf], state))
    assert out["action"].iloc[0] == "delete" and not out["alive"].iloc[0]
    # and the reverse seq assignment flips the winner
    pdf2 = pdf.assign(seq=[1, 2])
    state2 = FakeState()
    (out2,) = list(_upsert(("d1",), [pdf2], state2))
    assert out2["action"].iloc[0] == "add" and out2["alive"].iloc[0]


def test_upsert_null_seq_sorts_after_real_seq_like_batch_twin():
    """A null-seq row at equal mtime must BEAT a seq-carrying row, in
    both engines: the batch twin (pipeline.reconcile_actions) coalesces
    null seq to Long.MAX in its max_by key; the streaming kernel must
    use the identical sentinel or the same replay resolves differently
    across the two paths (this was a live divergence — streaming
    coalesced null seq to 0, sorting it BEFORE every genuine seq)."""
    import pandas as pd

    from libswish3_spark.streaming.upsert import _upsert

    class FakeState:
        exists = False
        hasTimedOut = False

        def __init__(self):
            self.stored = None

        @property
        def get(self):
            return self.stored

        def update(self, v):
            self.stored = v

    # delete carries NO seq (e.g. a non-framed feed), add carries seq=7:
    # null-seq sorts last → the delete is the latest action
    pdf = pd.DataFrame(
        {
            "mtime": [100, 100],
            "seq": [None, 7],
            "action": ["delete", "add"],
            "text": [None, "body"],
        }
    )
    state = FakeState()
    (out,) = list(_upsert(("d1",), [pdf], state))
    assert out["action"].iloc[0] == "delete" and not out["alive"].iloc[0]


def test_sessionize_sorts_across_pandas_chunks():
    """Arrow splits a big group into multiple pandas chunks in no
    particular order: events must be sorted ACROSS chunks before the
    gap scan, or a later chunk's earlier events merge into an
    already-advanced session (boundaries the batch twin never makes)."""
    import datetime as dt

    import pandas as pd

    from libswish3_spark.streaming.sessions import _make_sessionize

    class FakeState:
        exists = False
        hasTimedOut = False

        def __init__(self):
            self.stored = None

        @property
        def get(self):
            return self.stored

        def update(self, v):
            self.stored = v

        def getCurrentWatermarkMs(self):
            return 0

        def setTimeoutTimestamp(self, ms):
            pass

    late = pd.DataFrame({"ts": [dt.datetime(2020, 1, 1, 11, 0, 0)]})
    early = pd.DataFrame({"ts": [dt.datetime(2020, 1, 1, 9, 0, 0)]})
    state = FakeState()
    fn = _make_sessionize("UTC")
    outs = list(fn((1,), [late, early], state))  # late chunk first
    # 9:00 and 11:00 are > 30min apart: the 9:00 session must CLOSE
    assert len(outs) == 1 and len(outs[0]) == 1
    assert outs[0]["session_start"].iloc[0] == dt.datetime(2020, 1, 1, 9, 0, 0)
    assert outs[0]["session_end"].iloc[0] == dt.datetime(2020, 1, 1, 9, 0, 0)
    # open session state is the 11:00 singleton
    assert state.stored[0] == dt.datetime(2020, 1, 1, 11, 0, 0)


def test_windowed_counts_without_value_column(spark):
    """The window helper layers over ANY timestamped table: a source
    without the optional 'value' column aggregates counts only (the
    hard-coded sum used to raise UNRESOLVED_COLUMN)."""
    import datetime as dt

    from libswish3_spark.streaming.windows import windowed_event_counts

    df = spark.createDataFrame(
        [(1, dt.datetime(2020, 1, 1, 0, 5), "click"),
         (2, dt.datetime(2020, 1, 1, 0, 20), "click")],
        "user_id long, ts timestamp, event_type string",
    )
    out = windowed_event_counts(df).collect()
    assert len(out) == 1 and out[0]["cnt"] == 2
    assert "sum_value_c" not in out[0].__fields__
