"""Corpus-curation quality gates (beyond-reference extension,
training-data-pipeline tier): Gopher-style repetition filtering and
benchmark decontamination.

Both are the shapes a 100 TB pre-training pipeline runs corpus-wide:

* repetition filtering (Rae et al. 2021, "Scaling Language Models"
  §A1.1 quality heuristics — public paper): documents dominated by a
  single repeated n-gram, or with a high duplicate-n-gram mass, are
  boilerplate and get dropped before training;
* decontamination: any document sharing a 5-gram with a held-out
  evaluation/benchmark set is flagged so eval data never leaks into
  the training corpus.

Spark shape: n-grams come from array indexing inside the scan
partition (``operators/textops.word_ngrams`` — no window, no sort),
the only shuffles are the per-doc count groupBys, and the benchmark
n-gram set (small by construction: benchmarks are MBs, corpora are
TBs) broadcasts into the contamination join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from commodity_price_forecasting_spark.operators.textops import word_ngrams
from commodity_price_forecasting_spark.plans.registry import register
from commodity_price_forecasting_spark.sources.readers import load_table

# DuckDB mirror of word_ngrams: parallel UNNEST zips token+index;
# positions renumbered after the empty-token filter (adjacency).
_TOK = """
WITH tok0 AS (
  SELECT doc_id, source,
         UNNEST(string_split(trim(text), ' ')) AS token,
         UNNEST(range(len(string_split(trim(text), ' ')))) AS pos0
  FROM documents
), tok AS (
  SELECT doc_id, source, token,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos0) AS pos
  FROM tok0 WHERE token <> ''
)
"""


# --- Gopher-style repetition filter -------------------------------------

_REPETITION_ORACLE = (
    _TOK
    + """
, big AS (
  SELECT doc_id,
         token || ' ' || LEAD(token) OVER (PARTITION BY doc_id ORDER BY pos)
           AS bigram
  FROM tok
), cnt AS (
  SELECT doc_id, bigram, COUNT(*) AS c
  FROM big WHERE bigram IS NOT NULL GROUP BY 1, 2
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_bigrams,
       CAST(MAX(c) AS BIGINT) AS top_bigram_count,
       CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
         AS dup_bigram_tokens,
       ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_bigram_frac,
       ROUND(CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / SUM(c), 6)
         AS dup_bigram_frac,
       CASE WHEN 10 * MAX(c) > SUM(c)
              OR 2 * SUM(CASE WHEN c > 1 THEN c ELSE 0 END) > SUM(c)
            THEN 'drop' ELSE 'keep' END AS gopher_flag
FROM cnt GROUP BY doc_id
"""
)


@register("quality_gopher_repetition", oracle=_REPETITION_ORACLE, tags=("datapipe", "text"))
def quality_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition gate per document: top-bigram mass fraction
    and duplicate-bigram mass fraction, with the keep/drop rule
    (drop if top bigram > 10% of bigram mass OR duplicated bigrams
    > 50% of mass). Thresholds compare CROSS-MULTIPLIED on exact
    integer counts (10*max > sum), never against a float fraction,
    so both engines flag identical documents. Bigrams come from
    array indexing inside the scan partition — the plan has exactly
    one shuffle (the per-doc-bigram count)."""
    big = word_ngrams(load_table(spark, sf_dir, "documents"), n=2)
    cnt = big.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    n_big = F.sum("c")
    top = F.max("c")
    dup = F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
    return cnt.groupBy("doc_id").agg(
        n_big.cast("long").alias("n_bigrams"),
        top.cast("long").alias("top_bigram_count"),
        dup.cast("long").alias("dup_bigram_tokens"),
        F.round(top.cast("double") / n_big, 6).alias("top_bigram_frac"),
        F.round(dup.cast("double") / n_big, 6).alias("dup_bigram_frac"),
        F.when((10 * top > n_big) | (2 * dup > n_big), F.lit("drop"))
        .otherwise(F.lit("keep"))
        .alias("gopher_flag"),
    )


# --- benchmark decontamination ------------------------------------------

_BENCH_SOURCE = "src0"

_DECONTAM_ORACLE = (
    _TOK
    + f"""
, ng AS (
  SELECT doc_id, source,
         token || ' ' || LEAD(token, 1) OVER w || ' ' || LEAD(token, 2) OVER w
               || ' ' || LEAD(token, 3) OVER w || ' ' || LEAD(token, 4) OVER w
           AS ngram
  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), dng AS (
  SELECT DISTINCT doc_id, source, ngram FROM ng WHERE ngram IS NOT NULL
), bench AS (
  SELECT DISTINCT ngram FROM dng WHERE source = '{_BENCH_SOURCE}'
), corpus AS (
  SELECT doc_id, COUNT(*) AS n_ngrams
  FROM dng WHERE source <> '{_BENCH_SOURCE}' GROUP BY 1
), hits AS (
  SELECT d.doc_id, COUNT(*) AS n_hits
  FROM dng d JOIN bench b ON d.ngram = b.ngram
  WHERE d.source <> '{_BENCH_SOURCE}' GROUP BY 1
)
SELECT c.doc_id,
       CAST(c.n_ngrams AS BIGINT) AS n_ngrams,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_contaminated,
       ROUND(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / c.n_ngrams, 6)
         AS contamination_rate,
       CAST(CASE WHEN COALESCE(h.n_hits, 0) > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS flagged
FROM corpus c LEFT JOIN hits h ON c.doc_id = h.doc_id
"""
)


@register("quality_decontaminate", oracle=_DECONTAM_ORACLE, tags=("datapipe", "text"))
def quality_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: documents from `{src0}` play the
    held-out eval set; every other document is scored by how many of
    its distinct 5-grams appear anywhere in the eval set. The eval
    n-gram set is DISTINCT-reduced then BROADCAST (benchmarks are
    small; the corpus is the big side and never re-shuffles for the
    probe), so at 100 TB the contamination check is a map-side join
    over the corpus scan."""
    dng = (
        word_ngrams(
            load_table(spark, sf_dir, "documents"), n=5, keep_cols=("source",)
        )
        .select("doc_id", "source", "gram")
        .distinct()
    )
    bench = (
        dng.filter(F.col("source") == _BENCH_SOURCE).select("gram").distinct()
    )
    corpus = dng.filter(F.col("source") != _BENCH_SOURCE)
    totals = corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_ngrams"))
    hits = (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return totals.join(hits, "doc_id", "left").select(
        "doc_id",
        F.col("n_ngrams").cast("long").alias("n_ngrams"),
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_contaminated"),
        F.round(
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("double") / F.col("n_ngrams"), 6
        ).alias("contamination_rate"),
        F.when(F.coalesce(F.col("n_hits"), F.lit(0)) > 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("flagged"),
    )


# --- token-budget shard packing (concat-then-chunk layout) --------------

_SHARD_TOKENS = 500

_PACK_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         len(list_filter(string_split(trim(text), ' '), t -> t <> ''))
           AS n_tokens
  FROM documents
), cum AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tokens
  FROM tok
)
SELECT CAST(FLOOR((cum_tokens - n_tokens) / {_SHARD_TOKENS}.0) AS BIGINT)
         AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc,
       CAST(MAX(doc_id) AS BIGINT) AS last_doc
FROM cum GROUP BY 1
"""


@register("pack_token_shards", oracle=_PACK_ORACLE, tags=("datapipe", "layout"))
def pack_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard assignment — the concat-then-chunk layout a
    pre-training data loader consumes: documents in deterministic
    doc_id order, each assigned to the shard its starting token
    offset falls in ({_SHARD_TOKENS}-token budget). The global
    running offset comes from ``operators/distributed.prefix_sum``
    (range-partition + two-job prefix offsets), NOT a
    single-partition window — at 100 TB every partition computes its
    local cumsum independently and only one tiny per-partition total
    row per task reaches the driver. Token counts are array lengths
    inside the scan (no explode at all)."""
    from commodity_price_forecasting_spark.operators.distributed import prefix_sum

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.trim(F.col("text")), " "), lambda t: t != F.lit("")
            )
        ).cast("long").alias("n_tokens"),
    )
    cum = prefix_sum(tok, "doc_id", "n_tokens", out_col="cum_tokens")
    return (
        cum.withColumn(
            "shard_id",
            F.floor(
                (F.col("cum_tokens") - F.col("n_tokens")) / F.lit(float(_SHARD_TOKENS))
            ).cast("long"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        )
    )


# --- per-source document cap (RefinedWeb-style) -------------------------

_DOMAIN_CAP = 20

_DOMAIN_CAP_ORACLE = f"""
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN rk <= {_DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN rk > {_DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       CAST(SUM(CASE WHEN rk <= {_DOMAIN_CAP} THEN n_chars ELSE 0 END)
            AS BIGINT) AS kept_chars
FROM ranked GROUP BY source
"""


@register("quality_domain_cap", oracle=_DOMAIN_CAP_ORACLE, tags=("datapipe", "text"))
def quality_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (RefinedWeb, Penedo et al. 2023 —
    public: over-represented domains are capped so no single crawl
    host dominates the training mix): keep the top {_DOMAIN_CAP}
    documents per source by length (doc_id as the deterministic
    tiebreak), report kept/dropped counts and surviving char mass per
    source. One hash-partitioned window keyed on source — domains are
    numerous so the key fans out across executors; a pathological
    mega-domain only needs its own top-K, which AQE skew-split plus
    the rank's early cutoff keep bounded (per-partition top-K then
    merge, never a global sort)."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    )
    ranked = docs.select("source", "doc_id", "n_chars", rk.alias("rk"))
    kept = F.sum(F.when(F.col("rk") <= _DOMAIN_CAP, 1).otherwise(0))
    dropped = F.sum(F.when(F.col("rk") > _DOMAIN_CAP, 1).otherwise(0))
    kept_chars = F.sum(
        F.when(F.col("rk") <= _DOMAIN_CAP, F.col("n_chars")).otherwise(F.lit(0))
    )
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        kept.cast("long").alias("n_kept"),
        dropped.cast("long").alias("n_dropped"),
        kept_chars.cast("long").alias("kept_chars"),
    )


# --- cross-document duplicated n-gram coverage --------------------------

_COVERAGE_N = 8

_NGRAM_COVERAGE_ORACLE = (
    _TOK
    + """
, ng AS (
  SELECT doc_id,
         token || ' ' || LEAD(token, 1) OVER w || ' ' || LEAD(token, 2) OVER w
               || ' ' || LEAD(token, 3) OVER w || ' ' || LEAD(token, 4) OVER w
               || ' ' || LEAD(token, 5) OVER w || ' ' || LEAD(token, 6) OVER w
               || ' ' || LEAD(token, 7) OVER w
           AS ngram
  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), dng AS (
  SELECT DISTINCT doc_id, ngram FROM ng WHERE ngram IS NOT NULL
), freq AS (
  SELECT ngram, COUNT(*) AS n_docs FROM dng GROUP BY 1
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_ngrams,
       CAST(SUM(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared,
       ROUND(CAST(SUM(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS shared_frac,
       CASE WHEN 2 * SUM(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) > COUNT(*)
            THEN 'near_dup' ELSE 'unique' END AS coverage_flag
FROM dng d JOIN freq f ON d.ngram = f.ngram
GROUP BY d.doc_id
"""
)


@register(
    "dedup_ngram_coverage", oracle=_NGRAM_COVERAGE_ORACLE, tags=("datapipe", "text")
)
def dedup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-n-gram coverage — the statistic behind
    exact-substring deduplication (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better" — public): per
    document, the fraction of its distinct {_COVERAGE_N}-grams that
    occur in at least one OTHER document; >50% shared mass flags a
    near-duplicate (cross-multiplied on exact counts, like the Gopher
    gate). Spark shape: n-grams assemble inside the scan partition
    (array slicing, no window), the global frequency table is a
    groupBy on the gram hash, and the join back to per-doc grams is
    already co-partitioned on the gram key from that aggregate — two
    shuffles total, both keyed on the gram, both AQE-coalesced; the
    flag threshold compares integers so both engines agree exactly."""
    dng = (
        word_ngrams(load_table(spark, sf_dir, "documents"), n=_COVERAGE_N)
        .select("doc_id", "gram")
        .distinct()
    )
    freq = dng.groupBy("gram").agg(F.count(F.lit(1)).alias("n_docs"))
    shared = F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
    total = F.count(F.lit(1))
    return (
        dng.join(freq, "gram")
        .groupBy("doc_id")
        .agg(
            total.cast("long").alias("n_ngrams"),
            shared.cast("long").alias("n_shared"),
            F.round(shared.cast("double") / total, 6).alias("shared_frac"),
            F.when(2 * shared > total, F.lit("near_dup"))
            .otherwise(F.lit("unique"))
            .alias("coverage_flag"),
        )
    )


# --- character-entropy quality gate -------------------------------------

_ENTROPY_ORACLE = """
WITH chars AS (
  SELECT doc_id, UNNEST(string_split_regex(replace(text, ' ', ''), '')) AS ch
  FROM documents
), c2 AS (
  SELECT doc_id, ch, COUNT(*) AS c FROM chars WHERE ch <> '' GROUP BY 1, 2
), tot AS (
  SELECT doc_id, SUM(c) AS n FROM c2 GROUP BY 1
)
SELECT c2.doc_id,
       CAST(tot.n AS BIGINT) AS n_chars_used,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
       ROUND(-SUM((c * 1.0 / tot.n) * LN(c * 1.0 / tot.n)) / LN(2), 6)
         AS char_entropy_bits,
       CASE WHEN -SUM((c * 1.0 / tot.n) * LN(c * 1.0 / tot.n)) / LN(2) < 2.0
            THEN 'drop' ELSE 'keep' END AS entropy_flag
FROM c2 JOIN tot ON c2.doc_id = tot.doc_id
GROUP BY c2.doc_id, tot.n
"""


@register("quality_char_entropy", oracle=_ENTROPY_ORACLE, tags=("datapipe", "text"))
def quality_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon character entropy (bits) — the cheap
    garbage/mojibake/boilerplate detector every curation pipeline runs
    (degenerate repetitive text has low entropy; binary spew has
    anomalously high): H = -Σ p_c log2 p_c over non-space characters,
    with a keep/drop gate at 2 bits. Spark shape: characters explode
    inside the scan partition, one (doc_id, char) count groupBy, one
    per-doc rollup — both shuffles keyed on doc_id prefixes,
    map-side combinable. The entropy sum's addition order differs
    between engines only at 1e-16; rounded once at the edge."""
    docs = load_table(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id",
        F.explode(
            F.split(F.regexp_replace(F.col("text"), " ", ""), "")
        ).alias("ch"),
    ).filter(F.col("ch") != "")
    c2 = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql import Window as W

    n = F.sum("c").over(W.partitionBy("doc_id"))
    p = F.col("c") / F.col("n")
    ent = -F.sum(p * F.log(p)) / F.lit(float(__import__("math").log(2)))
    return (
        c2.withColumn("n", n)
        .groupBy("doc_id", "n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
            F.round(ent, 6).alias("char_entropy_bits"),
            F.when(ent < 2.0, F.lit("drop")).otherwise(F.lit("keep")).alias(
                "entropy_flag"
            ),
        )
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_chars_used"),
            "n_distinct_chars",
            "char_entropy_bits",
            "entropy_flag",
        )
    )


# --- deterministic weighted sampling (A-Res) ----------------------------

_WSAMPLE_K = 50

_WSAMPLE_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
            + 1.0) / 4294967297.0 AS u,
         POWER(
           (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
              + 1.0) / 4294967297.0,
           1.0 / n_chars) AS akey
  FROM documents WHERE n_chars > 0
), ranked AS (
  SELECT doc_id, lang, n_chars, akey,
         ROW_NUMBER() OVER (ORDER BY akey DESC, doc_id) AS rk
  FROM keyed
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
FROM ranked WHERE rk <= {_WSAMPLE_K}
GROUP BY lang
"""


@register("curation_weighted_sample", oracle=_WSAMPLE_ORACLE, tags=("datapipe", "sampling"))
def curation_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, A-Res scheme (Efraimidis
    & Spirakis 2006 — public): each document draws key u^(1/w) with
    w = its char mass and a DETERMINISTIC md5-of-id uniform u ∈ (0,1)
    (no RNG state — reproducible across engines and reruns, the same
    trick as the stratified sampler); the global top-{_WSAMPLE_K} keys
    are the sample, summarized per language. At 100 TB the top-K is a
    per-partition heap + driver merge (TakeOrderedAndProject), never
    a global sort — the one-pass distributed weighted sampler."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + 1.0
    ) / 4294967297.0
    keyed = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.pow(u, 1.0 / F.col("n_chars")).alias("akey"),
    )
    top = keyed.orderBy(F.desc("akey"), F.asc("doc_id")).limit(_WSAMPLE_K)
    return top.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.sum("n_chars").cast("long").alias("sampled_chars"),
    )


# --- per-source unigram KL divergence (corpus-mix drift) ----------------

_KL_ORACLE = (
    _TOK
    + """
, tf AS (
  SELECT source, token, COUNT(*) AS c FROM tok GROUP BY 1, 2
), src_tot AS (
  SELECT source, SUM(c) AS n FROM tf GROUP BY 1
), gtok AS (
  SELECT token, SUM(c) AS g FROM tf GROUP BY 1
), glob_tot AS (
  SELECT SUM(c) AS gn FROM tf
)
SELECT tf.source,
       CAST(src_tot.n AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       ROUND(SUM((tf.c * 1.0 / src_tot.n)
                 * LN((tf.c * 1.0 / src_tot.n) / (gtok.g * 1.0 / glob_tot.gn)))
             / LN(2), 6) AS kl_bits
FROM tf
JOIN src_tot ON tf.source = src_tot.source
JOIN gtok ON tf.token = gtok.token
CROSS JOIN glob_tot
GROUP BY tf.source, src_tot.n
"""
)


@register("quality_source_kl", oracle=_KL_ORACLE, tags=("datapipe", "text"))
def quality_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram KL divergence against the corpus-wide token
    distribution, D(p_src || p_corpus) in bits — the mixture-drift
    diagnostic a curation pipeline tracks per crawl/domain (a source
    whose distribution diverges is over-represented boilerplate or
    off-domain). Every source token also occurs in the global
    distribution by construction, so the KL sum is always finite.
    Spark shape: one (source, token) count shuffle, then the
    per-source, per-token-global and corpus totals all come from
    windows OVER THE SAME counted frame (no second scan, no join);
    the final rollup is keyed on source. At 100 TB the token-global
    window is the big one and is keyed on the token hash — the same
    partitioning the count already produced."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("token"),
    ).filter(F.col("token") != "")
    tf = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql import Window as W

    n = F.sum("c").over(W.partitionBy("source"))
    g = F.sum("c").over(W.partitionBy("token"))
    # corpus total: a 1-row broadcast aggregate, NEVER an empty
    # partitionBy() window (that would move the whole frame to one
    # partition at scale)
    tot = tf.agg(F.sum("c").alias("gn"))
    enriched = tf.select(
        "source",
        "c",
        n.alias("n"),
        g.alias("g"),
    ).crossJoin(F.broadcast(tot))
    p = F.col("c") / F.col("n")
    q = F.col("g") / F.col("gn")
    kl = F.sum(p * F.log(p / q)) / F.lit(float(__import__("math").log(2)))
    return enriched.groupBy("source", "n").agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.round(kl, 6).alias("kl_bits"),
    ).select(
        "source",
        F.col("n").cast("long").alias("n_tokens"),
        "n_types",
        "kl_bits",
    )


_WATERFILL_ORACLE = """
WITH avail AS (
  SELECT source,
         SUM(length(text) - length(replace(text, ' ', '')) + 1) AS avail_tok
  FROM documents GROUP BY source
), tot AS (
  SELECT SUM(avail_tok) AS corpus_tok, COUNT(*) AS k FROM avail
), r1 AS (
  SELECT a.source, a.avail_tok, t.corpus_tok, t.k,
         0.5 * t.corpus_tok / t.k AS fair_share,
         LEAST(CAST(a.avail_tok AS DOUBLE), 0.5 * t.corpus_tok / t.k)
           AS alloc1
  FROM avail a CROSS JOIN tot t
), r2 AS (
  SELECT source, avail_tok, corpus_tok, fair_share, alloc1,
         0.5 * corpus_tok - SUM(alloc1) OVER () AS leftover,
         CASE WHEN alloc1 < avail_tok THEN 1 ELSE 0 END AS open,
         SUM(CASE WHEN alloc1 < avail_tok THEN 1 ELSE 0 END) OVER ()
           AS n_open
  FROM r1
)
SELECT source,
       CAST(avail_tok AS BIGINT) AS avail_tok,
       ROUND(fair_share, 6) AS fair_share,
       ROUND(LEAST(CAST(avail_tok AS DOUBLE),
                   alloc1 + open * leftover / n_open), 6) AS alloc_tok,
       ROUND(LEAST(CAST(avail_tok AS DOUBLE),
                   alloc1 + open * leftover / n_open) / avail_tok, 6)
         AS fill_ratio
FROM r2
"""


@register("curation_mix_waterfill", oracle=_WATERFILL_ORACLE, tags=("datapipe", "sampling", "quality"))
def curation_mix_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted source-mixing schedule by two-round waterfilling:
    spend a 50%-of-corpus token budget equally across sources, cap
    each source at what it actually has, then redistribute the
    unspent remainder equally over the non-exhausted sources (one
    redistribution round — the fixed-point waterfill's first-order
    approximation, documented as such). The allocation table a
    mixing sampler consumes: per source, available tokens, fair
    share, final allocation, fill ratio.

    Everything after the per-source token aggregate runs on the
    |sources|-row frame (window-over-dimension); the corpus is
    scanned once for lengths."""
    docs = load_table(spark, sf_dir, "documents")
    avail = docs.groupBy("source").agg(
        (
            F.sum(
                F.length("text")
                - F.length(F.regexp_replace("text", " ", ""))
                + 1
            )
        ).alias("avail_tok")
    )
    tot = avail.agg(
        F.sum("avail_tok").alias("corpus_tok"),
        F.count(F.lit(1)).alias("k"),
    )
    r1 = avail.crossJoin(F.broadcast(tot)).select(
        "source",
        "avail_tok",
        "corpus_tok",
        (0.5 * F.col("corpus_tok") / F.col("k")).alias("fair_share"),
        F.least(
            F.col("avail_tok").cast("double"),
            0.5 * F.col("corpus_tok") / F.col("k"),
        ).alias("alloc1"),
    )
    wall = Window.partitionBy()
    r2 = (
        r1.withColumn(
            "leftover",
            0.5 * F.col("corpus_tok") - F.sum("alloc1").over(wall),
        )
        .withColumn(
            "open",
            F.when(F.col("alloc1") < F.col("avail_tok"), 1).otherwise(0),
        )
        .withColumn("n_open", F.sum("open").over(wall))
    )
    alloc = F.least(
        F.col("avail_tok").cast("double"),
        F.col("alloc1") + F.col("open") * F.col("leftover") / F.col("n_open"),
    )
    return r2.select(
        "source",
        F.col("avail_tok").cast("long").alias("avail_tok"),
        F.round("fair_share", 6).alias("fair_share"),
        F.round(alloc, 6).alias("alloc_tok"),
        F.round(alloc / F.col("avail_tok"), 6).alias("fill_ratio"),
    )


# --- RAKE keyword extraction --------------------------------------------

_RAKE_STOPS = ("a", "the")
_RAKE_MAX_PHRASE = 4

_RAKE_ORACLE = (
    _TOK
    + """
, marked AS (
  SELECT doc_id, token, pos,
         SUM(CASE WHEN token IN ('a', 'the') THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS pid
  FROM tok
), words AS (
  SELECT doc_id, pid, pos, token
  FROM marked WHERE token NOT IN ('a', 'the')
), phrases AS (
  SELECT doc_id, pid,
         STRING_AGG(token, ' ' ORDER BY pos) AS phrase,
         COUNT(*) AS plen
  FROM words GROUP BY doc_id, pid
  HAVING COUNT(*) BETWEEN 1 AND 4
), pw AS (
  SELECT w.doc_id, w.pid, w.token, p.phrase, p.plen
  FROM words w JOIN phrases p USING (doc_id, pid)
), ws AS (
  SELECT token, COUNT(*) AS freq, SUM(plen) AS degree
  FROM pw GROUP BY token
), inst AS (
  SELECT w.doc_id, w.pid, w.phrase,
         SUM(CAST(s.degree AS DOUBLE) / s.freq) AS score
  FROM pw w JOIN ws s USING (token)
  GROUP BY w.doc_id, w.pid, w.phrase
)
SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       ROUND(AVG(score), 6) AS rake_score
FROM inst GROUP BY phrase
ORDER BY ROUND(AVG(score), 6) DESC, phrase LIMIT 20
"""
)


@register("text_rake_keywords", oracle=_RAKE_ORACLE, tags=("datapipe", "text"))
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010, public): candidate
    phrases are maximal stopword-free token runs (runs longer than 4
    words dropped, the common RAKE cap), each word scores
    degree/freq where degree sums the lengths of phrases containing
    it, and a phrase scores the sum of its member-word scores; top-20
    distinct phrases by score. The corpus-level cousin of TF-IDF
    keywording that needs NO document frequency table — degree/freq
    rewards words that appear inside longer collocations.

    Plan shape: one tokenize, one cumulative-sum window per document
    (stopword count = phrase id, the sessionize trick), then three
    key-partitioned aggregates (phrase assembly, word stats, phrase
    scoring) — word stats are vocabulary-sized, the ranking is a
    TakeOrderedAndProject on the rounded score."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), " ")).alias("pos0", "token"),
    ).filter(F.col("token") != "")
    is_stop = F.col("token").isin(*_RAKE_STOPS)
    marked = toks.withColumn(
        "pid",
        F.sum(F.when(is_stop, 1).otherwise(0)).over(
            Window.partitionBy("doc_id").orderBy("pos0")
        ),
    )
    words = marked.filter(~is_stop)
    phrase_txt = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos0", "token"))),
            lambda s: s["token"],
        ),
        " ",
    )
    phrases = (
        words.groupBy("doc_id", "pid")
        .agg(phrase_txt.alias("phrase"), F.count(F.lit(1)).alias("plen"))
        .filter(F.col("plen") <= _RAKE_MAX_PHRASE)
    )
    pw = words.select("doc_id", "pid", "token").join(
        phrases, ["doc_id", "pid"]
    )
    ws = pw.groupBy("token").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("degree"),
    )
    inst = (
        pw.join(ws, "token")
        .groupBy("doc_id", "pid", "phrase")
        .agg(
            F.sum(
                F.col("degree").cast("double") / F.col("freq")
            ).alias("score")
        )
    )
    return (
        inst.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.round(F.avg("score"), 6).alias("rake_score"),
        )
        .orderBy(F.desc("rake_score"), F.asc("phrase"))
        .limit(20)
    )


# PII injected deterministically from doc_id (the fixture text is
# letters+spaces, so every match is the injected one); counts are
# per-pattern matches in the RAW text, independent per pattern — the
# SSN-shaped id intentionally also counts as a phone-shaped digit
# run, in BOTH engines, because the audit counts measure pattern
# exposure, not disjoint classification.
_PII_ORACLE = """
WITH raw AS (
  SELECT doc_id,
         text || ' mail u' || CAST(doc_id AS VARCHAR)
              || '@ex.org tel +1 (555) 010-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' ip 10.2.' || CAST(doc_id % 250 AS VARCHAR)
              || '.7 id 123-45-6789' AS t
  FROM documents
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b', '<ID>', 'g'),
           '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IP>', 'g'),
         '\\+?[0-9][0-9 ()-]{6,}[0-9]', '<PHONE>', 'g') AS redacted,
       len(regexp_extract_all(t,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
       len(regexp_extract_all(t,
         '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b')) AS n_id,
       len(regexp_extract_all(t,
         '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS n_ip,
       len(regexp_extract_all(t,
         '\\+?[0-9][0-9 ()-]{6,}[0-9]')) AS n_phone
FROM raw
"""


@register("quality_pii_redact", oracle=_PII_ORACLE, tags=("datapipe", "text", "quality"))
def quality_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (r8) — the compliance pass a training pipeline
    runs corpus-wide before any other stage sees the text: emails,
    SSN-shaped ids, IPv4 addresses and phone-shaped digit runs
    become typed placeholders, with per-pattern audit counts taken on
    the raw text (``operators/textops.pii_redact`` — one chained
    regexp_replace projection, whole-stage codegen, zero shuffle).
    The fixture text carries no PII, so the query injects a
    deterministic doc_id-derived suffix (email, phone, IP, SSN shape)
    identically in Spark and the oracle — the value gate then checks
    the REDACTED STRING byte-for-byte plus all four counts per doc.
    Patterns are the Java∩RE2 regex subset (classes + bounded
    repetition, no lookaround), so both engines match identically;
    redaction order is load-bearing and documented in
    ``PII_PATTERNS``."""
    from commodity_price_forecasting_spark.operators.textops import pii_redact

    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" mail u"),
            F.col("doc_id").cast("string"),
            F.lit("@ex.org tel +1 (555) 010-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ip 10.2."),
            (F.col("doc_id") % 250).cast("string"),
            F.lit(".7 id 123-45-6789"),
        ).alias("text"),
    )
    out = pii_redact(injected)
    return out.select(
        "doc_id",
        "redacted",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_id").cast("long").alias("n_id"),
        F.col("n_ip").cast("long").alias("n_ip"),
        F.col("n_phone").cast("long").alias("n_phone"),
    )


# Checksum-gated PII (r8 VERDICT ask #6): the fixture text is
# letters+spaces, so the query injects — per doc, doc_id-derived,
# identically in both engines — a Luhn-VALID card, a Luhn-INVALID
# card (check digit +5 mod 10), a mod-97-VALID IBAN, and an INVALID
# one (check value −1, which shifts the remainder off 1 for every
# possible m). The valid pair must become <CC>/<IBAN>; the invalid
# pair must survive the gate and fall through to the coarse phone
# class. Both engines compute the check digits with the SAME integer
# folds (Luhn over left positions 1..15, doubled at odd p; streaming
# mod-97 over the digit expansion of bban||'131400').
_PII_CHECKSUM_ORACLE = """
WITH base AS (
  SELECT doc_id, text,
         '411111' || lpad(CAST(doc_id % 1000000000 AS VARCHAR), 9, '0') AS pay,
         '3704' || lpad(CAST(doc_id % 100000000 AS VARCHAR), 8, '0') || '013000' AS bban
  FROM documents
), der AS (
  SELECT doc_id, text, pay, bban,
    CAST((10 - (CAST(list_sum(list_transform(range(1, 16),
        p -> CASE WHEN p % 2 = 1
             THEN CASE WHEN 2 * CAST(substring(pay, p, 1) AS INTEGER) > 9
                  THEN 2 * CAST(substring(pay, p, 1) AS INTEGER) - 9
                  ELSE 2 * CAST(substring(pay, p, 1) AS INTEGER) END
             ELSE CAST(substring(pay, p, 1) AS INTEGER) END)) AS INTEGER) % 10)) % 10
      AS INTEGER) AS ccd,
    list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(range(1, len(bban || '131400') + 1),
          i -> CAST(substring(bban || '131400', i, 1) AS BIGINT))),
        (acc, d) -> (acc * 10 + d) % 97) AS m97
  FROM base
), inj AS (
  SELECT doc_id,
    text || ' card ' || pay || CAST(ccd AS VARCHAR)
         || ' alt ' || pay || CAST((ccd + 5) % 10 AS VARCHAR)
         || ' acct DE' || lpad(CAST(98 - m97 AS VARCHAR), 2, '0') || bban
         || ' ref DE' || lpad(CAST(97 - m97 AS VARCHAR), 2, '0') || bban AS t
  FROM der
), gated AS (
  SELECT doc_id, t,
    list_filter(regexp_extract_all(t, '\\b[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}\\b'),
      x -> list_sum(list_transform(range(1, len(regexp_replace(x, '[ -]', '', 'g')) + 1),
             i -> CASE WHEN i % 2 = 0
                  THEN CASE WHEN 2 * CAST(substring(regexp_replace(x, '[ -]', '', 'g'), len(regexp_replace(x, '[ -]', '', 'g')) - i + 1, 1) AS INTEGER) > 9
                       THEN 2 * CAST(substring(regexp_replace(x, '[ -]', '', 'g'), len(regexp_replace(x, '[ -]', '', 'g')) - i + 1, 1) AS INTEGER) - 9
                       ELSE 2 * CAST(substring(regexp_replace(x, '[ -]', '', 'g'), len(regexp_replace(x, '[ -]', '', 'g')) - i + 1, 1) AS INTEGER) END
                  ELSE CAST(substring(regexp_replace(x, '[ -]', '', 'g'), len(regexp_replace(x, '[ -]', '', 'g')) - i + 1, 1) AS INTEGER) END))
           % 10 = 0) AS cc_ok,
    list_filter(regexp_extract_all(t, '\\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\\b'),
      x -> list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, len(x) + 1),
               i -> CAST(ascii(substring(substring(x, 5) || substring(x, 1, 4), i, 1)) AS BIGINT))),
             (acc, a) -> CASE WHEN a <= 57 THEN (acc * 10 + (a - 48)) % 97
                              ELSE (acc * 100 + (a - 55)) % 97 END) = 1) AS ib_ok,
    len(regexp_extract_all(t, '\\b[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}\\b')) AS n_cc,
    len(regexp_extract_all(t, '\\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\\b')) AS n_iban
  FROM inj
)
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        list_reduce(
          list_prepend(
            list_reduce(
              list_prepend(
                regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                list_distinct(cc_ok)),
              (acc, s) -> replace(acc, s, '<CC>')),
            list_distinct(ib_ok)),
          (acc, s) -> replace(acc, s, '<IBAN>')),
        '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b', '<ID>', 'g'),
      '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IP>', 'g'),
    '\\+?[0-9][0-9 ()-]{6,}[0-9]', '<PHONE>', 'g') AS redacted,
  n_cc, len(cc_ok) AS n_cc_valid, n_iban, len(ib_ok) AS n_iban_valid
FROM gated
"""


@register(
    "quality_pii_checksum",
    oracle=_PII_CHECKSUM_ORACLE,
    tags=("datapipe", "text", "quality"),
)
def quality_pii_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum-gated PII scrubbing (r9): credit-card candidates
    redact only when the Luhn mod-10 check passes, IBAN candidates
    only at mod-97 remainder 1 (``operators/textops.luhn_valid`` /
    ``iban_valid`` — pure column-expression folds, zero shuffle, no
    Python). The doc_id-derived injection plants one VALID and one
    INVALID instance of each class per doc; the value gate checks the
    redacted string BYTE-FOR-BYTE (valid → <CC>/<IBAN>; invalid →
    left for the coarse <PHONE> class) plus all four audit counts.
    Extends ``quality_pii_redact``'s Java∩RE2 pattern discipline to
    checksum classes computed with identical integer folds in both
    engines."""
    from commodity_price_forecasting_spark.operators.textops import pii_redact

    docs = load_table(spark, sf_dir, "documents")
    pay = F.concat(
        F.lit("411111"),
        F.lpad((F.col("doc_id") % 1000000000).cast("string"), 9, "0"),
    )
    bban = F.concat(
        F.lit("3704"),
        F.lpad((F.col("doc_id") % 100000000).cast("string"), 8, "0"),
        F.lit("013000"),
    )
    luhn_sum = F.aggregate(
        F.sequence(F.lit(1), F.lit(15)),
        F.lit(0),
        lambda acc, p: acc
        + F.when(
            p % 2 == 1,
            F.when(
                pay.substr(p, F.lit(1)).cast("int") * 2 > 9,
                pay.substr(p, F.lit(1)).cast("int") * 2 - 9,
            ).otherwise(pay.substr(p, F.lit(1)).cast("int") * 2),
        ).otherwise(pay.substr(p, F.lit(1)).cast("int")),
    )
    ccd = (F.lit(10) - luhn_sum % 10) % 10
    mstr = F.concat(bban, F.lit("131400"))
    m97 = F.aggregate(
        F.sequence(F.lit(1), F.length(mstr)),
        F.lit(0).cast("long"),
        lambda acc, i: (acc * 10 + mstr.substr(i, F.lit(1)).cast("long")) % 97,
    )
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" card "),
            pay,
            ccd.cast("string"),
            F.lit(" alt "),
            pay,
            ((ccd + 5) % 10).cast("string"),
            F.lit(" acct DE"),
            F.lpad((F.lit(98) - m97).cast("string"), 2, "0"),
            bban,
            F.lit(" ref DE"),
            F.lpad((F.lit(97) - m97).cast("string"), 2, "0"),
            bban,
        ).alias("text"),
    )
    out = pii_redact(injected)
    return out.select(
        "doc_id",
        "redacted",
        F.col("n_cc").cast("long").alias("n_cc"),
        F.col("n_cc_valid").cast("long").alias("n_cc_valid"),
        F.col("n_iban").cast("long").alias("n_iban"),
        F.col("n_iban_valid").cast("long").alias("n_iban_valid"),
    )


# --- exact-substring span removal (Lee et al. 2022 ExactSubstr) ----------

_REMOVE_K = 8

_SUBSTRING_REMOVE_ORACLE = """
WITH tok0 AS (
  SELECT doc_id, UNNEST(string_split(trim(text), ' ')) AS token,
         UNNEST(range(len(string_split(trim(text), ' ')))) AS pos0
  FROM documents
), tok AS (
  SELECT doc_id, token,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos0) AS pos
  FROM tok0 WHERE token <> ''
), ng AS (
  SELECT doc_id, pos,
         token || ' ' || LEAD(token, 1) OVER w || ' ' || LEAD(token, 2) OVER w
               || ' ' || LEAD(token, 3) OVER w || ' ' || LEAD(token, 4) OVER w
               || ' ' || LEAD(token, 5) OVER w || ' ' || LEAD(token, 6) OVER w
               || ' ' || LEAD(token, 7) OVER w AS gram
  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), occ AS (
  SELECT doc_id, pos,
         ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rk,
         COUNT(*) OVER (PARTITION BY gram) AS cnt
  FROM ng WHERE gram IS NOT NULL
), cov AS (
  SELECT DISTINCT doc_id, cpos FROM (
    SELECT doc_id, pos + UNNEST(range(8)) AS cpos
    FROM occ WHERE cnt > 1 AND rk > 1
  )
), kept AS (
  SELECT t.doc_id, t.pos, t.token
  FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.cpos
  WHERE c.doc_id IS NULL
), agg AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(token, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
), ntok AS (
  SELECT doc_id, COUNT(*) AS n_tokens FROM tok GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(n.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(n.n_tokens, 0) - COALESCE(a.n_kept, 0) AS BIGINT)
         AS n_removed,
       COALESCE(a.clean_text, '') AS clean_text
FROM documents d
LEFT JOIN ntok n ON d.doc_id = n.doc_id
LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


@register(
    "dedup_substring_remove",
    oracle=_SUBSTRING_REMOVE_ORACLE,
    tags=("datapipe", "text"),
)
def dedup_substring_remove(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span REMOVAL (r9 VERDICT ask #5 — Lee et al.
    2022's actual ExactSubstr transform, not just its coverage
    statistic): every duplicated {_REMOVE_K}-token span is removed
    from everywhere except its corpus-first occurrence (lexicographic
    (doc_id, position)); the cleaned text is the surviving tokens
    re-joined in order. ``dedup_ngram_coverage`` recomputed over this
    output collapses to ~0 duplicated mass (pinned in
    tests/test_plans.py). Byte-exact oracle: positions, tie-breaks
    and reassembly are all integer/string ops both engines agree on.

    Spark shape (operators/dedup.substring_remove): grams assemble
    inside the scan partition; duplicate occurrences are row_number>1
    under ONE gram-hash window (a single shuffle — the same shape as
    this oracle's occ CTE); the coverage explode is k rows per
    DUPLICATE occurrence only; the rebuild is one doc_id groupBy.
    Linear in corpus tokens + k x duplicated mass — no all-pairs, no
    corpus-sized join."""
    from commodity_price_forecasting_spark.operators.dedup import (
        substring_remove,
    )

    return substring_remove(
        load_table(spark, sf_dir, "documents"), k=_REMOVE_K
    )


# --- BPE-ish token budgeting (r12) ----------------------------------------

_BPE_BUDGET_ORACLE = """
WITH per_doc AS (
  SELECT lang,
         len(regexp_extract_all(text, '[^ \\t\\n]+')) AS ws,
         len(regexp_extract_all(
           text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n]+')) AS bpe
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ws) AS BIGINT) AS ws_tokens,
       CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
       ROUND(SUM(bpe) * 1.0 / SUM(ws), 6) AS bpe_per_ws
FROM per_doc
GROUP BY lang
"""


@register(
    "text_bpe_token_budget",
    oracle=_BPE_BUDGET_ORACLE,
    tags=("datapipe", "text"),
)
def text_bpe_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token budget per language under BOTH counters a
    training-data pipeline quotes: whitespace words and BPE-ish
    pretokens (``operators/textops.BPE_PRETOKEN_RE`` — the
    GPT-2-style pretokenizer in the Java∩RE2 regex subset: space-
    prefixed letter runs, digit runs, punctuation runs; token budgets
    are quoted in BPE tokens; pretokens LOWER-bound them — BPE only
    splits further within a pretoken — and the measured bpe/ws ratio
    replaces the assumed ~1.3x words-to-tokens fudge factor per
    language slice). Both counts are single regexp passes inside the scan
    partition — no explode, no shuffle until the per-language
    aggregate; at 100 TB this is one map-side pass plus a
    |languages|-row reduce."""
    from commodity_price_forecasting_spark.operators.textops import (
        bpe_ish_token_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit("[^ \\t\\n]+"), 0)
        ).alias("ws"),
        bpe_ish_token_count(F.col("text")).alias("bpe"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ws").cast("long").alias("ws_tokens"),
        F.sum("bpe").cast("long").alias("bpe_tokens"),
        F.round(F.sum("bpe") / F.sum("ws"), 6).alias("bpe_per_ws"),
    )
