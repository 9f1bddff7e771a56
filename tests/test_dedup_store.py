"""Incremental dedup store (operators/dedup_store.py, r10 VERDICT #2):
delta verdicts must equal the full-rebuild decision, the store must
never be read lazily across its own append, and bridges (a delta doc
gluing two store clusters) must be detected and chased."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from commodity_price_forecasting_spark.operators.dedup_store import (
    dedup_delta,
    dedup_store_build,
    dedup_store_load,
)
from commodity_price_forecasting_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def _reference_verdicts(spark, docs, full_store_path):
    """Full-rebuild reference: per delta doc, derive the verdict from
    the FULL store's fingerprint table (fp → holder, canon)."""
    full = dedup_store_load(spark, full_store_path)
    from commodity_price_forecasting_spark.operators.dedup import (
        content_fingerprint,
    )

    fp = docs.select(
        "doc_id", content_fingerprint(F.col("text")).alias("fp")
    )
    j = fp.join(
        full["fingerprints"].select(
            "fp", F.col("doc_id").alias("_holder"), F.col("canon_id").alias("_canon")
        ),
        "fp",
    )
    return j.select(
        "doc_id",
        F.when(F.col("_holder") < F.col("doc_id"), F.lit("exact_dup"))
        .when(F.col("_canon") < F.col("doc_id"), F.lit("near_dup"))
        .otherwise(F.lit("kept"))
        .alias("status"),
        F.when(
            (F.col("_holder") < F.col("doc_id"))
            | (F.col("_canon") < F.col("doc_id")),
            F.col("_canon"),
        ).alias("dup_of"),
    )


def _as_set(df):
    return {
        (r["doc_id"], r["status"], r["dup_of"]) for r in df.collect()
    }


def test_delta_verdicts_equal_full_rebuild_on_fixture(spark, tmp_path):
    """Store from the first 80% of the fixture corpus, delta = the
    rest: dedup_delta's verdicts must match what a from-scratch full
    rebuild over old ∪ delta decides — statuses AND chased dup_of."""
    docs = load_table(spark, SF_SMOKE, "documents")
    cut = 400
    old = docs.filter(F.col("doc_id") < cut)
    delta = docs.filter(F.col("doc_id") >= cut)

    dedup_store_build(old, str(tmp_path / "store"))
    dedup_store_build(docs, str(tmp_path / "full"))

    res = dedup_delta(spark, str(tmp_path / "store"), delta)
    got = _as_set(res["verdicts"])
    want = _as_set(_reference_verdicts(spark, delta, str(tmp_path / "full")))
    assert got == want
    assert len(got) == delta.count()
    # some signal in the comparison: the fixture delta must not be
    # all-kept (else the equality is near-vacuous)
    assert any(s != "kept" for _, s, _ in got), "fixture delta had no dups"


def test_iterated_deltas_stay_consistent(spark, tmp_path):
    """Append then a SECOND delta: verdicts still equal full rebuild
    (valid while no bridge forces a store-side canon rewrite — the
    run asserts that precondition from the returned bridge frames)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    old = docs.filter(F.col("doc_id") < 300)
    d1 = docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
    d2 = docs.filter(F.col("doc_id") >= 400)

    dedup_store_build(old, str(tmp_path / "store"))
    dedup_store_build(docs, str(tmp_path / "full"))

    r1 = dedup_delta(spark, str(tmp_path / "store"), d1, append=True)
    assert r1["n_appended"] > 0
    r2 = dedup_delta(spark, str(tmp_path / "store"), d2, append=True)
    if r1["bridges"].count() == 0 and r2["bridges"].count() == 0:
        full_d1 = _reference_verdicts(spark, d1, str(tmp_path / "full"))
        full_d2 = _reference_verdicts(spark, d2, str(tmp_path / "full"))
        assert _as_set(r1["verdicts"]) == _as_set(full_d1)
        assert _as_set(r2["verdicts"]) == _as_set(full_d2)
    # after both appends the store must hold every unique content
    store = dedup_store_load(spark, str(tmp_path / "store"))
    full = dedup_store_load(spark, str(tmp_path / "full"))
    assert (
        store["fingerprints"].select("fp").distinct().count()
        == full["fingerprints"].select("fp").distinct().count()
    )
    assert int(store["meta"]["max_doc_id"]) == 499


def _write_docs(spark, rows, path):
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(path)
    return spark.read.parquet(path)


def test_bridge_detected_and_dup_of_chased(spark, tmp_path):
    """A delta doc similar to TWO previously-independent store
    survivors: its dup_of must chase to the merged component's min
    (the full-rebuild answer), and the glued canonical pair must be
    reported in ``bridges``."""
    a = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " * 4
    b = "kilo lima mike november oscar papa quebec romeo sierra tango " * 4
    filler = "unrelated filler content zebra yankee xray whiskey victor " * 4
    old = _write_docs(
        spark,
        [(0, a), (1, b), (2, filler)],
        str(tmp_path / "old.parquet"),
    )
    # J(d, a) and J(d, b) are each ~0.45-0.5 (d's shingles ⊇ both
    # sets); J(a, b) ~ 0 — so threshold 0.3 links d to both without
    # linking a to b directly. rows_per_band=1 so a mid-similarity
    # pair reliably collides in at least one band (P(collide) =
    # 1-(1-J)^12 vs J³ per 3-row band).
    built = dedup_store_build(
        old, str(tmp_path / "store"), rows_per_band=1, threshold=0.3
    )
    assert built["n_survivors"] == 3  # a, b, filler all independent

    delta = _write_docs(spark, [(10, a + " " + b)], str(tmp_path / "d.parquet"))
    res = dedup_delta(spark, str(tmp_path / "store"), delta)
    [v] = res["verdicts"].collect()
    assert v["status"] == "near_dup"
    assert v["dup_of"] == 0  # chased to min(0, 1), not just "a store doc"
    assert [(r["canon_a"], r["canon_b"]) for r in res["bridges"].collect()] == [
        (0, 1)
    ]

    # full rebuild agrees on the delta verdict (store-side divergence
    # — doc 1 would be dropped — is exactly what `bridges` reports)
    alldocs = old.unionByName(delta)
    dedup_store_build(
        alldocs, str(tmp_path / "full"), rows_per_band=1, threshold=0.3
    )
    want = _as_set(
        _reference_verdicts(spark, delta, str(tmp_path / "full"))
    )
    assert _as_set(res["verdicts"]) == want


def test_exact_dup_tiers_and_guards(spark, tmp_path):
    """Exact-dup verdicts across store and delta; id-monotonicity
    guard; empty delta no-op; store append skips already-known
    content."""
    old = _write_docs(
        spark,
        [(0, "the quick brown fox jumps over the lazy dog " * 3),
         (1, "entirely different content about market data feeds " * 3)],
        str(tmp_path / "old.parquet"),
    )
    dedup_store_build(old, str(tmp_path / "store"))

    delta = _write_docs(
        spark,
        [
            (10, "the quick brown fox jumps over the lazy dog " * 3),  # = doc 0
            (11, "fresh unseen text about delta ingestion paths " * 3),
            (12, "fresh unseen text about delta ingestion paths " * 3),  # = 11
        ],
        str(tmp_path / "d.parquet"),
    )
    res = dedup_delta(spark, str(tmp_path / "store"), delta, append=True)
    got = {r["doc_id"]: (r["status"], r["dup_of"]) for r in res["verdicts"].collect()}
    assert got[10] == ("exact_dup", 0)
    assert got[11] == ("kept", None)
    assert got[12] == ("exact_dup", 11)
    # only doc 11's content is new → one appended unique
    assert res["n_appended"] == 1
    store = dedup_store_load(spark, str(tmp_path / "store"))
    assert store["fingerprints"].count() == 3  # 2 old uniques + 1 new
    assert int(store["meta"]["max_doc_id"]) == 12

    # monotonicity guard: ids at-or-below store max raise
    bad = _write_docs(spark, [(5, "whatever " * 5)], str(tmp_path / "bad.parquet"))
    with pytest.raises(ValueError, match="monotone ids"):
        dedup_delta(spark, str(tmp_path / "store"), bad)

    # empty delta: clean no-op
    empty = delta.limit(0)
    r0 = dedup_delta(spark, str(tmp_path / "store"), empty)
    assert r0["n_appended"] == 0 and r0["verdicts"].count() == 0


def _store_state(spark, path):
    """Full comparable content of a dedup store's three artifacts +
    meta max_doc_id (column-name-keyed sets, order-insensitive)."""
    s = dedup_store_load(spark, path)
    sig_cols = [c for c in s["signatures"].columns]
    return (
        {tuple(r) for r in s["fingerprints"].select("fp", "doc_id", "canon_id").collect()},
        {tuple(r) for r in s["signatures"].select(*sorted(sig_cols)).collect()},
        {tuple(r) for r in s["bands"].select("doc_id", "band", "sig").collect()},
        int(s["meta"]["max_doc_id"]),
    )


def test_store_append_from_ledger_equals_inline_and_is_idempotent(
    spark, tmp_path
):
    """r13 (r12 ADVICE #1): ``dedup_delta(append=False)`` +
    ``dedup_store_append(docs, verdicts)`` must land the IDENTICAL
    store state as ``dedup_delta(append=True)``, and the append must
    be row-idempotent — replaying it whole, or resuming after a
    simulated crash that landed only SOME artifacts, converges with no
    duplicate and no missing rows."""
    from commodity_price_forecasting_spark.operators.dedup_store import (
        dedup_store_append,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    old = docs.filter(F.col("doc_id") < 400)
    delta = docs.filter(F.col("doc_id") >= 400)
    inline, ledgered = str(tmp_path / "inline"), str(tmp_path / "ledgered")
    dedup_store_build(old, inline)
    dedup_store_build(old, ledgered)

    want_res = dedup_delta(spark, inline, delta, append=True)
    res = dedup_delta(spark, ledgered, delta, append=False)
    verd = res["verdicts"].localCheckpoint(eager=True)
    assert _as_set(verd) == _as_set(want_res["verdicts"])

    n1 = dedup_store_append(spark, ledgered, delta, verd)
    assert n1 == want_res["n_appended"] > 0
    assert _store_state(spark, ledgered) == _store_state(spark, inline)

    # whole-call replay (crash after append, before the batch marker —
    # the scenario that used to wedge the stream): appends nothing
    assert dedup_store_append(spark, ledgered, delta, verd) == 0
    assert _store_state(spark, ledgered) == _store_state(spark, inline)

    # partial-crash resume: rebuild the pre-append store, land ONLY
    # the fingerprint artifact (a crash mid-append), then replay —
    # the per-artifact anti-joins must fill in signatures and bands
    # without duplicating the fingerprints already landed
    partial = str(tmp_path / "partial")
    dedup_store_build(old, partial)
    import os

    fp_only = (
        spark.read.parquet(os.path.join(ledgered, "fingerprints"))
        .filter(F.col("doc_id") >= 400)
        .localCheckpoint(eager=True)
    )
    assert fp_only.count() == n1
    fp_only.write.mode("append").parquet(os.path.join(partial, "fingerprints"))
    dedup_store_append(spark, partial, delta, verd)
    assert _store_state(spark, partial) == _store_state(spark, inline)


def test_store_append_with_sig_wide_equals_recompute(spark, tmp_path):
    """r14 (r13 ADVICE #2): handing dedup_delta(keep_frames=True)'s
    checkpointed MinHash frame to dedup_store_append must land the
    byte-identical store state as letting the append re-shingle from
    text — the streaming tier's single-shingle fast path is a pure
    compute saving, never a content change."""
    from commodity_price_forecasting_spark.operators.dedup_store import (
        dedup_store_append,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    old = docs.filter(F.col("doc_id") < 400)
    delta = docs.filter(F.col("doc_id") >= 400)
    fast, slow = str(tmp_path / "fast"), str(tmp_path / "slow")
    dedup_store_build(old, fast)
    dedup_store_build(old, slow)

    res = dedup_delta(spark, fast, delta, append=False, keep_frames=True)
    verd = res["verdicts"].localCheckpoint(eager=True)
    assert "sig_wide" in res and res["sig_wide"].count() > 0
    n_fast = dedup_store_append(
        spark, fast, delta, verd, sig_wide=res["sig_wide"]
    )
    n_slow = dedup_store_append(spark, slow, delta, verd)
    assert n_fast == n_slow > 0
    assert _store_state(spark, fast) == _store_state(spark, slow)
