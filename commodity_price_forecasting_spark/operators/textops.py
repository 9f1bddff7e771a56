"""Text-analysis operators for training-data pipelines
(beyond-reference extension, BASELINE.json north star): token
statistics, quality scoring, n-gram language identification, and
document fingerprinting.

All tokenization is whitespace splitting (the fixture corpus is
space-separated); every step is built-in-function-only (explode /
split / groupBy) so the hot path stays JVM-side — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: tiny demo stopword list used by the quality score.
STOPWORDS = ("the", "a", "of", "and", "in")


def tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(doc_id, pos, token)`` — whitespace tokenization with
    position (pos is 0-based)."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text"))
        .repartition(par, "doc_id")  # parallelize the explode (see dedup.char_shingles)
        .select(
            "doc_id",
            F.posexplode(F.split(F.trim(F.col("_text")), " +")).alias("pos", "token"),
        )
        .filter(F.col("token") != "")
    )


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token statistics: count, distinct count, type-token
    ratio, mean token length — one groupBy over the exploded tokens."""
    t = tokens(docs)
    return t.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("token").alias("n_distinct"),
        F.round(F.countDistinct("token") / F.count(F.lit(1)), 6).alias("ttr"),
        F.round(F.avg(F.length("token")), 6).alias("avg_token_len"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic document-quality score in [0,1]: blend of length
    adequacy, lexical diversity and stopword balance — the standard
    pre-training corpus filter shape (length/punct/stopword ratios).
    Pure column arithmetic; deterministic."""
    t = tokens(docs)
    stop = F.col("token").isin(*STOPWORDS).cast("int")
    per_doc = t.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("token").alias("n_distinct"),
        F.sum(stop).alias("n_stop"),
    )
    length_score = F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0))
    diversity = F.col("n_distinct") / F.col("n_tokens")
    stop_ratio = F.col("n_stop") / F.col("n_tokens")
    stop_score = 1 - F.abs(stop_ratio - F.lit(0.10)) / F.lit(0.9)
    return per_doc.select(
        "doc_id",
        "n_tokens",
        F.round(
            0.4 * length_score + 0.3 * diversity + 0.3 * stop_score, 6
        ).alias("quality"),
    )


def langid_predict(docs: DataFrame, lang_col: str = "lang") -> DataFrame:
    """N-gram-free vocabulary-vote language ID (deterministic integer
    arithmetic end to end, so the argmaxes are engine-portable):

    1. token→lang map: each token is assigned the language where it
       occurs most often (ties → lexicographically smallest lang);
    2. each doc's tokens vote; the doc's prediction is the language
       with most votes (ties → smallest lang).

    Output ``(doc_id, lang, predicted_lang, correct)``. Self-trained
    on the corpus — the operator shape (profile build + broadcast
    join + vote) is what matters for scale, not held-out accuracy.
    """
    t = tokens(docs).select("doc_id", "token")
    labeled = t.join(docs.select("doc_id", lang_col), "doc_id")
    tl_counts = labeled.groupBy("token", lang_col).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("token").orderBy(F.desc("cnt"), F.asc(lang_col))
    token_lang = (
        tl_counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("token", F.col(lang_col).alias("token_lang"))
    )
    votes = (
        t.join(F.broadcast(token_lang), "token")
        .groupBy("doc_id", "token_lang")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    wv = Window.partitionBy("doc_id").orderBy(F.desc("votes"), F.asc("token_lang"))
    pred = (
        votes.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("token_lang").alias("predicted_lang"))
    )
    return (
        docs.select("doc_id", lang_col)
        .join(pred, "doc_id", "left")
        .select(
            "doc_id",
            lang_col,
            "predicted_lang",
            (F.col(lang_col) == F.col("predicted_lang")).cast("int").alias("correct"),
        )
    )


def word_ngrams(
    docs: DataFrame,
    n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple = (),
) -> DataFrame:
    """``(doc_id, *keep_cols, gram)`` — word n-grams by array indexing
    over the split token array (no window, no shuffle: the explode
    happens inside the scan partition). ``keep_cols`` are passed
    through unchanged (e.g. ``("source",)`` for corpus-vs-benchmark
    splits) so callers never need a join back to re-attach them."""
    arr = F.split(F.trim(F.col(text_col)), " +")
    par = docs.sparkSession.sparkContext.defaultParallelism
    keep = list(keep_cols)
    base = (
        docs.select(F.col(id_col).alias("doc_id"), *keep, arr.alias("l"))
        .filter(F.size("l") >= n)
        .repartition(par, "doc_id")
    )
    i = F.explode(F.sequence(F.lit(1), F.size("l") - (n - 1))).alias("i")
    gram = F.concat_ws(" ", *[F.element_at(F.col("l"), F.col("i") + k) for k in range(n)])
    return base.select("doc_id", *keep, "l", i).select(
        "doc_id", *keep, gram.alias("gram")
    )


def fingerprint(docs: DataFrame, n: int = 4) -> DataFrame:
    """Document fingerprint: minimum md5 over word n-grams (min-hash
    of the rolling n-gram set — a 1-hash winnowing analogue), plus the
    gram count. Equal fingerprints ⇒ likely near-duplicates."""
    g = word_ngrams(docs, n)
    return g.groupBy("doc_id").agg(
        F.min(F.md5(F.col("gram").cast("binary"))).alias("fingerprint"),
        F.count(F.lit(1)).alias("n_grams"),
    )


def tf_idf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_doc_freq: int = 2,
) -> DataFrame:
    """Exact TF-IDF in pure DataFrame ops — ``(doc_id, token, tf,
    df, idf, tf_idf)``. Unlike MLlib's HashingTF (hash-bucketed,
    collision-lossy), this keeps real tokens so the output is
    SQL-oracle-checkable and directly usable for keyword extraction.

    Plan shape: tokenize → explode (one shuffle on (doc, token) for
    TF) → token-level DF aggregate joined back (broadcast when the
    vocabulary is small, shuffle otherwise — Catalyst/AQE decide).
    idf = ln((N+1)/(df+1)) + 1 (smoothed, sklearn convention)."""
    # Tokenizer class [^\w \t\n]: Java \w is ASCII [a-zA-Z0-9_] in
    # default mode (java.util.regex.Pattern spec), so this is exactly
    # the DuckDB oracles' [^a-zA-Z0-9_ \t\n] — but the \w fast path
    # benched 2.2x faster end-to-end on BM25 than the expanded class.
    # The same pattern is used at every Spark tokenize site.
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.split(F.lower(F.regexp_replace(F.col(text_col), r"[^\w \t\n]", " ")), r"\s+")
            ).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    n_docs = docs.count()
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = (
        tf.groupBy("token")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= min_doc_freq)
    )
    idf = F.log((F.lit(float(n_docs)) + 1) / (F.col("df") + 1)) + 1
    return (
        tf.join(df_tbl, "token")
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(idf, 6).alias("idf"),
            F.round(F.col("tf") * idf, 6).alias("tf_idf"),
        )
    )


#: PII patterns, ordered so earlier redactions cannot create or
#: destroy later matches: emails carry dots+digits (phone class has
#: no dots), SSN-shaped ids would otherwise match the phone class,
#: IPv4 dots break phone runs. Every pattern is shared-subset regex
#: (character classes + bounded repetition, no lookaround or
#: backreferences) so Java (Spark) and RE2 (DuckDB) agree exactly.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("id", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<ID>"),
    ("ip", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9 ()-]{6,}[0-9]", "<PHONE>"),
)


def pii_redact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII scrubbing — the compliance stage every training-data
    pipeline runs before anything else sees the text: emails,
    SSN-shaped ids, IPv4 addresses and phone-shaped digit runs are
    replaced with typed placeholders, and the per-doc match counts
    (taken BEFORE redaction) ride along for audit lanes. One chained
    ``regexp_replace`` projection — whole-stage codegen, no shuffle,
    no Python; at 100 TB this is a map-only pass.

    Pattern order is load-bearing (see ``PII_PATTERNS``): an
    SSN-shaped id also matches the phone class, so ids redact first;
    placeholders contain no digits, so later patterns cannot match
    inside earlier redactions. Returns
    ``(id, redacted, n_email, n_id, n_ip, n_phone)``."""
    red = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        )
        red = F.regexp_replace(red, pat, repl)
    return docs.select(
        F.col(id_col), red.alias("redacted"), *counts
    )
