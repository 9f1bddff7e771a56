"""Streaming curation lane (r10 VERDICT ask #7): stream == batch for
the PII → quality → fingerprint-dedup prefix, foreachBatch append
into the persisted curated store, rerun/delta behavior, and the
row-wise quality score's exact equality with the groupBy form.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from commodity_price_forecasting_spark.operators.textops import (
    quality_score,
    quality_score_rowwise,
)
from commodity_price_forecasting_spark.sources.readers import load_table
from commodity_price_forecasting_spark.streaming.curation_stream import (
    curate_docs,
    read_documents_stream,
    run_curation_stream,
    with_arrival_ts,
)
from commodity_price_forecasting_spark.streaming.events_stream import (
    run_stream_to_memory,
)

SF_DIR = "/root/testdata/sf0.001"


def test_rowwise_quality_equals_groupby_quality(spark):
    """The zero-shuffle projection must be value-identical to the
    explode+groupBy score on every doc (same expression tree over the
    same counts — the 6-dp round included)."""
    docs = load_table(spark, SF_DIR, "documents")
    got = {
        r["doc_id"]: (r["n_tokens"], r["quality"])
        for r in quality_score_rowwise(docs).collect()
    }
    want = {
        r["doc_id"]: (r["n_tokens"], r["quality"])
        for r in quality_score(docs).collect()
    }
    # groupBy form emits no row for zero-token docs; rowwise emits a
    # NULL-quality row (documented divergence — both fail any gate)
    assert {k: v for k, v in got.items() if v[1] is not None} == want
    assert len(want) > 0


def test_rowwise_quality_zero_token_doc_is_null(spark):
    df = spark.createDataFrame([(1, "   "), (2, "")], "doc_id long, text string")
    rows = {r["doc_id"]: r["quality"] for r in quality_score_rowwise(df).collect()}
    assert rows == {1: None, 2: None}


def test_curate_stream_equals_batch_content(spark):
    """availableNow replay of curate_docs == the batch plan at CONTENT
    level: fingerprint set and per-fp (text, quality, n_tokens,
    split). The representative doc_id is NOT compared here: within one
    micro-batch dropDuplicatesWithinWatermark keeps an arbitrary
    partition's row — which is exactly why the split is
    content-addressed and why the CORPUS path (next test) re-dedups to
    the min-id holder before writing."""
    run_stream_to_memory(
        curate_docs(read_documents_stream(spark, SF_DIR)),
        "mem_curate",
        output_mode="append",
    )
    got = {
        r["fp"]: (r["text"], r["quality"], r["n_tokens"], r["split"])
        for r in spark.table("mem_curate").collect()
    }
    batch = curate_docs(with_arrival_ts(load_table(spark, SF_DIR, "documents")))
    want = {
        r["fp"]: (r["text"], r["quality"], r["n_tokens"], r["split"])
        for r in batch.collect()
    }
    assert len(want) > 0
    assert got == want
    assert spark.table("mem_curate").count() == len(want)  # one row per fp


def test_curation_stream_appends_store_and_corpus(spark, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("cur_store"))
    corpus = str(tmp_path_factory.mktemp("cur_corpus"))
    ckpt = str(tmp_path_factory.mktemp("cur_ckpt"))
    run_curation_stream(spark, SF_DIR, store, corpus, ckpt)

    written = spark.read.parquet(os.path.join(corpus, "corpus"))
    batch = curate_docs(with_arrival_ts(load_table(spark, SF_DIR, "documents")))
    want = sorted(
        (r["doc_id"], r["fp"], r["text"], r["quality"], r["n_tokens"], r["split"])
        for r in batch.collect()
    )
    got = sorted(
        (r["doc_id"], r["fp"], r["text"], r["quality"], r["n_tokens"], r["split"])
        for r in written.collect()
    )
    assert got == want and len(got) > 0
    # the store holds exactly the kept fingerprints
    fps = spark.read.parquet(os.path.join(store, "fingerprints"))
    assert sorted(r["fp"] for r in fps.collect()) == sorted(w[1] for w in want)
    # split directories are hive partitions
    assert {r["split"] for r in written.collect()} <= {
        "split_train",
        "split_val",
        "split_test",
    }


def test_curation_stream_rerun_appends_nothing(spark, tmp_path_factory):
    """Re-ingesting the SAME corpus (fresh checkpoint, same store)
    must append zero rows: every fingerprint anti-joins away — the
    store is what makes the stream idempotent under replay."""
    store = str(tmp_path_factory.mktemp("rr_store"))
    corpus = str(tmp_path_factory.mktemp("rr_corpus"))
    run_curation_stream(
        spark, SF_DIR, store, corpus, str(tmp_path_factory.mktemp("rr_ck1"))
    )
    n1 = spark.read.parquet(os.path.join(corpus, "corpus")).count()
    run_curation_stream(
        spark, SF_DIR, store, corpus, str(tmp_path_factory.mktemp("rr_ck2"))
    )
    n2 = spark.read.parquet(os.path.join(corpus, "corpus")).count()
    assert n1 == n2 > 0


def test_curation_stream_delta_appends_only_new_uniques(spark, tmp_path_factory):
    """A second ingest directory holding NEW docs (higher ids): docs
    duplicating stored content are dropped; fresh content appends."""
    store = str(tmp_path_factory.mktemp("d_store"))
    corpus = str(tmp_path_factory.mktemp("d_corpus"))
    run_curation_stream(
        spark, SF_DIR, store, corpus, str(tmp_path_factory.mktemp("d_ck1"))
    )
    base = spark.read.parquet(os.path.join(corpus, "corpus"))
    n_base = base.count()
    one_kept = base.select("text").first()["text"]

    delta_dir = str(tmp_path_factory.mktemp("d_fixture"))
    fresh_text = (
        "the quick brown fox jumps over a lazy dog and the crow watches in "
        "awe of every single moving shadow near the old mill by the river "
        "bank while morning light settles softly over distant quiet hills"
    )
    # single parquet FILE named documents.parquet (a Spark write makes
    # a directory of part files, which the stream's pathGlobFilter
    # would skip — the fixture layout is one file per table)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([10_000_001, 10_000_002], pa.int64()),
                "text": [one_kept, fresh_text],  # dup of stored / new
                "lang": ["en", "en"],
                "source": ["delta", "delta"],
                "n_chars": pa.array(
                    [len(one_kept), len(fresh_text)], pa.int64()
                ),
            }
        ),
        os.path.join(delta_dir, "documents.parquet"),
    )

    run_curation_stream(
        spark, delta_dir, store, corpus, str(tmp_path_factory.mktemp("d_ck2"))
    )
    after = spark.read.parquet(os.path.join(corpus, "corpus"))
    new_rows = [r for r in after.collect() if r["doc_id"] > 10_000_000]
    assert after.count() == n_base + 1
    assert [r["doc_id"] for r in new_rows] == [10_000_002]
    assert new_rows[0]["text"] == fresh_text


def _write_delta_fixture(spark, tmp_dir, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
                "source": ["delta"] * len(rows),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        os.path.join(tmp_dir, "documents.parquet"),
    )


def test_stream_near_dup_tier_matches_batch_and_gates_corpus(
    spark, tmp_path_factory
):
    """r11 VERDICT ask #3: with ``near_dup_store`` set, each
    micro-batch's exact-tier survivors get REAL dedup_delta MinHash
    verdicts — a near-dup of a stored doc is dropped from the corpus,
    a fresh doc is kept, the per-batch ledger equals what the batch
    dedup_delta decides on the same input against a snapshot of the
    store, and a replay ingest appends nothing."""
    import shutil

    from commodity_price_forecasting_spark.operators.dedup_store import (
        dedup_delta,
        dedup_store_build,
    )

    store = str(tmp_path_factory.mktemp("nd_store"))
    corpus = str(tmp_path_factory.mktemp("nd_corpus"))
    run_curation_stream(
        spark, SF_DIR, store, corpus, str(tmp_path_factory.mktemp("nd_ck1"))
    )
    curated = spark.read.parquet(os.path.join(corpus, "corpus"))
    n_base = curated.count()
    base_text = curated.orderBy("doc_id").first()["text"]

    # band store over the curated base (redacted texts — what the
    # stream's near tier will compare against); wide bands + low
    # threshold so the planted near-dup pair collides deterministically
    near_store = str(tmp_path_factory.mktemp("nd_bands"))
    dedup_store_build(
        curated.select("doc_id", "text"), near_store,
        rows_per_band=1, threshold=0.3,
    )
    near_ref = str(tmp_path_factory.mktemp("nd_bands_ref"))
    shutil.rmtree(near_ref)
    shutil.copytree(near_store, near_ref)  # batch-comparison snapshot

    fresh_text = (
        "entirely new content about mills rivers crows and the slow march "
        "of morning light across quiet distant hills where nothing repeats "
        "any earlier document in this corpus at all in any shingle window"
    )
    delta_dir = str(tmp_path_factory.mktemp("nd_fixture"))
    _write_delta_fixture(
        spark,
        delta_dir,
        [
            (10_000_001, base_text + " tiny trailing addition"),  # near-dup
            (10_000_002, fresh_text),  # genuinely new
        ],
    )
    run_curation_stream(
        spark, delta_dir, store, corpus,
        str(tmp_path_factory.mktemp("nd_ck2")),
        near_dup_store=near_store,
    )

    # corpus gained ONLY the fresh doc
    after = spark.read.parquet(os.path.join(corpus, "corpus"))
    assert after.count() == n_base + 1
    assert [r["doc_id"] for r in after.collect() if r["doc_id"] > 10_000_000] == [
        10_000_002
    ]

    # ledger == batch dedup_delta on the same survivors vs the snapshot
    ledger = spark.read.parquet(os.path.join(corpus, "near_dup_verdicts"))
    got = {
        (r["doc_id"], r["status"], r["dup_of"]) for r in ledger.collect()
    }
    batch_in = curate_docs(
        with_arrival_ts(spark.read.parquet(os.path.join(delta_dir, "documents.parquet")))
    ).select("doc_id", "text")
    want = {
        (r["doc_id"], r["status"], r["dup_of"])
        for r in dedup_delta(spark, near_ref, batch_in)["verdicts"].collect()
    }
    assert got == want and len(got) == 2
    assert {s for _, s, _ in got} == {"near_dup", "kept"}

    # replay (fresh checkpoint, same fixture): exact tier drops both
    # docs before the near tier — corpus unchanged, loud-error path
    # never reached
    run_curation_stream(
        spark, delta_dir, store, corpus,
        str(tmp_path_factory.mktemp("nd_ck3")),
        near_dup_store=near_store,
    )
    assert spark.read.parquet(os.path.join(corpus, "corpus")).count() == n_base + 1


def test_near_dup_tier_crash_after_store_append_replays_convergent(
    spark, tmp_path_factory
):
    """r13 (r12 ADVICE #1): the old near tier ran
    ``dedup_delta(append=True)`` inside the commit-token path, so a
    crash AFTER the band-store append but BEFORE the batch's commit
    marker made every redelivery raise the id-monotonicity ValueError
    — the stream was permanently wedged. Ledger-first +
    ``dedup_store_append`` must instead converge: replay reuses the
    committed ledger, appends nothing to the store, and restores the
    lost corpus partition and marker."""
    import shutil

    from commodity_price_forecasting_spark.operators.dedup_store import (
        dedup_store_build, dedup_store_load,
    )
    from commodity_price_forecasting_spark.streaming.curation_stream import (
        _append_batch,
    )

    store = str(tmp_path_factory.mktemp("ndc_store"))
    corpus = str(tmp_path_factory.mktemp("ndc_corpus"))
    text_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    fresh_text = "totally novel river mill crow morning light quiet hill " * 4
    near_store = str(tmp_path_factory.mktemp("ndc_bands"))
    dedup_store_build(
        spark.createDataFrame(
            [(0, text_a), (1, "unrelated filler zebra yankee xray whiskey " * 4)],
            "doc_id long, text string",
        ),
        near_store, rows_per_band=1, threshold=0.3,
    )

    # a prior committed batch keeps the curation fp store non-empty
    # across the simulated crash (as it would be mid-stream)
    prior = spark.createDataFrame(
        [(50, "fp50", "some earlier ingested content", 0.9, 5, "split_train")],
        "doc_id long, fp string, text string, quality double, "
        "n_tokens long, split string",
    )
    _append_batch(prior, store, corpus, commit_token="run-0")

    batch = spark.createDataFrame(
        [
            (100, "fpA", text_a + " tiny trailing tail", 0.9, 40, "split_train"),
            (101, "fpB", fresh_text, 0.9, 40, "split_val"),
        ],
        "doc_id long, fp string, text string, quality double, "
        "n_tokens long, split string",
    )
    _append_batch(
        batch, store, corpus, commit_token="run-1", near_dup_store=near_store
    )
    ledger_dir = os.path.join(corpus, "near_dup_verdicts", "ingest_batch=run-1")
    l0 = sorted(
        (r["doc_id"], r["status"], r["dup_of"])
        for r in spark.read.parquet(ledger_dir).collect()
    )
    assert {s for _, s, _ in l0} == {"near_dup", "kept"}
    nd0 = dedup_store_load(spark, near_store)
    s0 = (
        sorted(r["doc_id"] for r in nd0["fingerprints"].collect()),
        nd0["signatures"].count(),
        nd0["bands"].count(),
        int(nd0["meta"]["max_doc_id"]),
    )
    corpus_path = os.path.join(corpus, "corpus")
    c0 = sorted(r["doc_id"] for r in spark.read.parquet(corpus_path).collect())
    assert c0 == [50, 101]  # near-dup 100 gated out

    # crash window: band store appended + ledger committed, but the
    # curation fp partition, corpus partition, and marker were lost
    shutil.rmtree(os.path.join(store, "fingerprints", "ingest_batch=run-1"))
    shutil.rmtree(os.path.join(corpus_path, "ingest_batch=run-1"))
    os.remove(os.path.join(store, "commits", "run-1"))

    _append_batch(  # used to raise "monotone ids" here
        batch, store, corpus, commit_token="run-1", near_dup_store=near_store
    )
    l1 = sorted(
        (r["doc_id"], r["status"], r["dup_of"])
        for r in spark.read.parquet(ledger_dir).collect()
    )
    nd1 = dedup_store_load(spark, near_store)
    s1 = (
        sorted(r["doc_id"] for r in nd1["fingerprints"].collect()),
        nd1["signatures"].count(),
        nd1["bands"].count(),
        int(nd1["meta"]["max_doc_id"]),
    )
    c1 = sorted(r["doc_id"] for r in spark.read.parquet(corpus_path).collect())
    assert l1 == l0  # ledger reused, not recomputed as self-dups
    assert s1 == s0  # no duplicate store rows
    assert c1 == c0  # corpus rows recovered
    assert os.path.exists(os.path.join(store, "commits", "run-1"))


def test_auto_maintain_bounds_partitions_across_drains(
    spark, tmp_path_factory
):
    """r12 VERDICT "what's missing" #4: with ``auto_maintain=True``
    every availableNow drain ends with health + compact-if-recommended
    in the drain's own quiesced window — live partition count stays
    bounded across many drains while the unmaintained twin grows one
    partition per drain; corpus content is identical between twins."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from commodity_price_forecasting_spark.operators.store_maintenance import (
        curation_store_health,
        read_curated_corpus,
    )

    feeds = [str(tmp_path_factory.mktemp(f"am_feed_{t}")) for t in "ab"]
    bases = [str(tmp_path_factory.mktemp(f"am_{t}")) for t in "ab"]
    n_drains = 6
    rep = None
    for i in range(n_drains):
        rows = [
            (
                i * 100 + j,
                f"document number {i * 100 + j} tells of rivers mills and "
                f"crows over quiet hills where the morning light settles "
                f"softly and slowly across distinct meadow {i} {j}",
            )
            for j in range(4)
        ]
        for feed in feeds:
            pq.write_table(
                pa.table(
                    {
                        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                        "text": [r[1] for r in rows],
                        "lang": ["en"] * len(rows),
                        "source": ["feed"] * len(rows),
                        "n_chars": pa.array(
                            [len(r[1]) for r in rows], pa.int64()
                        ),
                    }
                ),
                os.path.join(feed, f"docs-{i}.parquet"),
            )
        rep = run_curation_stream(
            spark, feeds[0], os.path.join(bases[0], "store"),
            os.path.join(bases[0], "corpus"),
            os.path.join(bases[0], "ck"),
            feed_glob="*.parquet", auto_maintain=True,
        )
        run_curation_stream(
            spark, feeds[1], os.path.join(bases[1], "store"),
            os.path.join(bases[1], "corpus"),
            os.path.join(bases[1], "ck"),
            feed_glob="*.parquet",
        )
    assert rep is not None and "curation_health" in rep
    h_auto = curation_store_health(
        spark, os.path.join(bases[0], "store"), os.path.join(bases[0], "corpus")
    )
    h_raw = curation_store_health(
        spark, os.path.join(bases[1], "store"), os.path.join(bases[1], "corpus")
    )
    assert h_auto["roots"]["corpus"]["n_live_partitions"] <= 3
    assert h_raw["roots"]["corpus"]["n_live_partitions"] == n_drains
    rows_auto = sorted(
        (r["doc_id"], r["fp"], r["split"])
        for r in read_curated_corpus(
            spark, os.path.join(bases[0], "store"),
            os.path.join(bases[0], "corpus"),
        ).collect()
    )
    rows_raw = sorted(
        (r["doc_id"], r["fp"], r["split"])
        for r in read_curated_corpus(
            spark, os.path.join(bases[1], "store"),
            os.path.join(bases[1], "corpus"),
        ).collect()
    )
    assert rows_auto == rows_raw and len(rows_auto) == n_drains * 4


def _mini_batch(spark):
    rows = [
        (1, "aa", "text one", 0.9, 10, "split_train"),
        (2, "bb", "text two", 0.8, 12, "split_val"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, fp string, text string, quality double, "
        "n_tokens long, split string"
    )


def test_append_batch_exact_replay_is_idempotent(spark, tmp_path_factory):
    """r11 ADVICE #3: redelivering a fully-committed batch appends
    nothing; redelivering after a simulated crash BETWEEN the store
    append and the corpus append recovers the corpus rows instead of
    losing them forever (the old store-first ordering's failure)."""
    import shutil

    from commodity_price_forecasting_spark.streaming.curation_stream import (
        _append_batch,
    )

    store = str(tmp_path_factory.mktemp("idem_store"))
    corpus = str(tmp_path_factory.mktemp("idem_corpus"))
    batch = _mini_batch(spark)

    # committed batch + redelivery: both stores unchanged
    _append_batch(batch, store, corpus, commit_token="run-0")
    corpus_path = os.path.join(corpus, "corpus")
    fp_path = os.path.join(store, "fingerprints")
    n_corpus = spark.read.parquet(corpus_path).count()
    n_fps = spark.read.parquet(fp_path).count()
    _append_batch(batch, store, corpus, commit_token="run-0")
    assert spark.read.parquet(corpus_path).count() == n_corpus == 2
    assert spark.read.parquet(fp_path).count() == n_fps == 2

    # crash between the two writes: fps of batch run-1 landed, corpus +
    # commit marker did not (simulated by replaying with the corpus
    # partition and marker removed)
    _append_batch(batch.withColumn("doc_id", F.col("doc_id") + 10)
                  .withColumn("fp", F.concat(F.col("fp"), F.lit("x"))),
                  store, corpus, commit_token="run-1")
    shutil.rmtree(os.path.join(corpus_path, "ingest_batch=run-1"))
    os.remove(os.path.join(store, "commits", "run-1"))
    replay = _mini_batch(spark).withColumn(
        "doc_id", F.col("doc_id") + 10
    ).withColumn("fp", F.concat(F.col("fp"), F.lit("x")))
    _append_batch(replay, store, corpus, commit_token="run-1")
    # the replay must NOT be shadowed by its own crashed fps: corpus
    # holds all 4 docs exactly once, store all 4 fps exactly once
    got = spark.read.parquet(corpus_path)
    assert got.count() == 4
    assert got.select("fp").distinct().count() == 4
    fps = spark.read.parquet(fp_path)
    assert fps.count() == 4 and fps.select("fp").distinct().count() == 4
    assert os.path.exists(os.path.join(store, "commits", "run-1"))


def test_watermark_covering_spans_corpus(spark):
    """r11 ADVICE #4: the derived watermark must exceed the synthetic
    clock's corpus span (1 doc/sec), the stream==batch equality bound."""
    from commodity_price_forecasting_spark.streaming.curation_stream import (
        watermark_covering,
    )

    wm = watermark_covering(spark, SF_DIR)
    assert wm.endswith(" seconds")
    secs = int(wm.split()[0])
    docs = load_table(spark, SF_DIR, "documents")
    span = docs.agg((F.max("doc_id") - F.min("doc_id")).alias("s")).first()["s"]
    assert secs > span


def test_state_sized_partitions_input_bound(spark):
    """r11 second bound: tiny per-trigger input caps partitions below
    the state bound (the curation sweep: 4,071-key state, 100-row
    triggers — 4 partitions measured 2x faster than the state rule's
    clamped 32)."""
    from commodity_price_forecasting_spark.streaming.events_stream import (
        state_sized_partitions,
    )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        # big state, tiny triggers -> input bound wins: ceil(100/32)=4
        assert state_sized_partitions(spark, 4071, rows_per_trigger=100) == 4
        # big state, no input hint -> state bound, clamped at default
        assert state_sized_partitions(spark, 4071) == 32
        # big state, big triggers -> input bound does not widen past state/default
        assert state_sized_partitions(spark, 4071, rows_per_trigger=10**6) == 32
        # tiny state stays narrow regardless of input (the r10 PSI cell)
        assert state_sized_partitions(spark, 48, rows_per_trigger=10**6) == 3
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_quality_prefix_is_map_only(spark):
    """The redact→score prefix must be a shuffle-free projection chain
    (the map-only 100 TB shape, and the reason the row-wise score can
    legally precede the stream's stateful dedup)."""
    from commodity_price_forecasting_spark.operators.textops import pii_redact

    docs = load_table(spark, SF_DIR, "documents")
    red = pii_redact(docs, keep=("lang",))
    q = quality_score_rowwise(red, text_col="redacted", keep=("lang",))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_auto_maintain_covers_near_dup_store(spark, tmp_path_factory):
    """The hook's near-dup branch: with the tier on, the post-drain
    report carries the band store's health, compacts it when its
    per-delta appends have fragmented it, and the compacted store
    still verdicts a fresh probe correctly (content no-op)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from commodity_price_forecasting_spark.operators.dedup_store import (
        dedup_delta,
        dedup_store_build,
    )

    base_rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota " * 4),
        (1, "one two three four five six seven eight nine ten " * 4),
    ]
    near_store = str(tmp_path_factory.mktemp("amnd_bands"))
    dedup_store_build(
        spark.createDataFrame(base_rows, "doc_id long, text string"),
        near_store, rows_per_band=1, threshold=0.3,
    )
    feed = str(tmp_path_factory.mktemp("amnd_feed"))
    base = str(tmp_path_factory.mktemp("amnd"))
    rep = None
    for i in range(3):
        text = (
            f"fresh document {i} about rivers mills and crows over quiet "
            f"hills where morning light settles softly across meadow {i} "
            * 2
        )
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1000 + i], pa.int64()),
                    "text": [text],
                    "lang": ["en"],
                    "source": ["feed"],
                    "n_chars": pa.array([len(text)], pa.int64()),
                }
            ),
            os.path.join(feed, f"docs-{i}.parquet"),
        )
        rep = run_curation_stream(
            spark, feed, os.path.join(base, "store"),
            os.path.join(base, "corpus"), os.path.join(base, "ck"),
            feed_glob="*.parquet", near_dup_store=near_store,
            auto_maintain=True,
        )
    assert rep is not None and "near_dup_health" in rep
    assert rep["near_dup_health"]["n_unique"] >= 5  # base 2 + 3 drains
    # whether or not a compaction fired this drain, the store must
    # still verdict a fresh probe correctly against known content
    probe = spark.createDataFrame(
        [(9000, base_rows[0][1] + " tiny tail"),
         (9001, "entirely novel content nothing shares any shingle " * 4)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in dedup_delta(spark, near_store, probe, append=False)[
            "verdicts"
        ].collect()
    }
    assert got[9000] == "near_dup" and got[9001] == "kept"
