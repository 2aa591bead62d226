"""Text-analysis operators: language-ID, quality scoring, token counts,
document fingerprints.  All built-in JVM expressions (no UDFs)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fastparquet_spark.analytics.relational import load

# tiny per-language marker sets (n-gram heuristic stand-in; the corpus is
# synthetic word soup, so prediction quality is irrelevant — determinism
# and cross-engine parity are what's tested)
LANG_MARKERS = {
    "en": ("the", "a", "value", "fast"),
    "es": ("row", "data", "slow"),
    "de": ("table", "scan", "hash"),
    "fr": ("query", "merge", "sort"),
    "zh": ("window", "batch", "spark"),
}


def _words(col="text"):
    return F.split(F.trim(F.lower(F.regexp_replace(F.col(col), "[^a-zA-Z0-9 ]", " "))), " +")


def text_langid(spark, sf_dir):
    """Marker-word language ID: argmax over per-language marker counts,
    ties broken by language name (deterministic)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(_words()).alias("w"))
    scores = toks.groupBy("doc_id").agg(*[
        F.sum(F.when(F.col("w").isin(*marks), 1).otherwise(0)).cast("long").alias(f"s_{lang}")
        for lang, marks in sorted(LANG_MARKERS.items())])
    stacked = scores.select("doc_id", F.explode(F.map_from_arrays(
        F.array(*[F.lit(lang) for lang in sorted(LANG_MARKERS)]),
        F.array(*[F.col(f"s_{lang}") for lang in sorted(LANG_MARKERS)]),
    )).alias("pred_lang", "score"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "pred_lang")
    return (stacked.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).select("doc_id", "pred_lang", "score"))


def text_quality(spark, sf_dir):
    """Quality scoring: char length, word count, mean word length,
    stopword ratio, all-caps ratio -> composite score."""
    docs = load(spark, sf_dir, "documents")
    w = _words()
    stop = ("the", "a", "of", "and", "to")
    d = (docs
         .withColumn("n_chars2", F.length("text"))
         .withColumn("n_words", F.size(w))
         .withColumn("n_stop", F.size(F.filter(w, lambda x: x.isin(*stop)))))
    return d.select(
        "doc_id", "n_chars2", "n_words",
        F.round(F.col("n_chars2") / F.col("n_words"), 6).alias("mean_wlen"),
        F.round(F.col("n_stop") / F.col("n_words"), 6).alias("stop_ratio"),
        F.round(
            F.least(F.col("n_words") / F.lit(100.0), F.lit(1.0)) * 0.5
            + (1 - F.col("n_stop") / F.col("n_words")) * 0.5, 6).alias("quality"))


def text_token_count(spark, sf_dir):
    """Token counting: whitespace words + a BPE-ish subword estimate
    (chars/4 heuristic, the common LLM rule of thumb)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(_words()).alias("ws_tokens"),
        F.ceil(F.length("text") / 4).cast("long").alias("bpe_est"))


def text_fingerprint(spark, sf_dir):
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (rolling-hash stand-in usable as a dedup/shard key at scale).

    The md5 is computed ONCE in an inner projection and the shard key is
    derived from the materialized column — interpreted-mode fallbacks
    don't do subexpression elimination, so repeating the expression would
    normalize+hash every document twice."""
    docs = load(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), " +", " "))
    fp = docs.select("doc_id", F.md5(norm.cast("binary")).alias("fp"))
    return fp.select("doc_id", "fp", F.substring("fp", 1, 4).alias("shard"))
