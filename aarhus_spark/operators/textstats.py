"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting. All pure
column expressions (JVM-side, whole-stage codegen) — no UDFs — so each
has an exact DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKS_EXPR = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"

# tiny per-language stopword lists for the n-gram/stopword heuristic
EN_STOPWORDS = ["the", "of", "and", "to", "a", "in", "is", "for", "on", "it"]


def _h(expr: str) -> str:
    return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def language_id(df: DataFrame, threshold: float = 0.04) -> DataFrame:
    """Stopword-ratio language ID: predict 'en' when the fraction of
    tokens that are English stopwords exceeds the threshold."""
    stop_set = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return (
        df.withColumn("toks", F.expr(TOKS_EXPR))
        .withColumn("n_tok", F.expr("size(toks)"))
        .withColumn("n_stop", F.expr(
            f"size(filter(toks, t -> t IN ({stop_set})))"))
        .withColumn("stop_ratio", F.when(F.col("n_tok") > 0,
                                         F.col("n_stop") / F.col("n_tok")).otherwise(0.0))
        .select("doc_id",
                F.round("stop_ratio", 6).alias("stop_ratio_r"),
                F.when(F.col("stop_ratio") > threshold, "en").otherwise("other").alias("predicted"))
    )


def quality_score(df: DataFrame) -> DataFrame:
    """Composite quality score from length / digit ratio / stopword
    ratio — the classic web-text quality-filter features."""
    stop_set = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return (
        df.withColumn("toks", F.expr(TOKS_EXPR))
        .withColumn("n_tok", F.expr("size(toks)"))
        .withColumn("n_stop", F.expr(f"size(filter(toks, t -> t IN ({stop_set})))"))
        .withColumn("n_digit_tok", F.expr("size(filter(toks, t -> t rlike '^[0-9]+$'))"))
        .filter(F.col("n_tok") > 0)
        .withColumn("len_score", F.least(F.lit(1.0), F.col("n_tok") / F.lit(200.0)))
        .withColumn("stop_score", F.col("n_stop") / F.col("n_tok"))
        .withColumn("digit_ratio", F.col("n_digit_tok") / F.col("n_tok"))
        .select(
            "doc_id", F.col("n_tok").cast("long").alias("n_tok"),
            F.round(F.col("len_score") * 0.5 + F.col("stop_score") * 0.3
                    + (1 - F.col("digit_ratio")) * 0.2, 6).alias("quality_r"))
    )


def token_counts(df: DataFrame) -> DataFrame:
    """Token counting two ways: frozen-tokenizer regex and whitespace
    split (the BPE-ish regex vs whitespace comparison)."""
    return df.select(
        "doc_id",
        F.expr(f"CAST(size({TOKS_EXPR}) AS BIGINT)").alias("n_regex"),
        F.expr("CAST(CASE WHEN length(trim(text)) = 0 THEN 0 "
               "ELSE size(split(trim(text), '\\\\s+')) END AS BIGINT)").alias("n_ws"),
    )


def fingerprints(df: DataFrame, n: int = 5) -> DataFrame:
    """Document fingerprinting: min-hash over n-gram shingles (winnowing
    lite — one representative hash per doc) + a prefix hash."""
    parts = ", ".join(f"element_at(toks, i + {j})" for j in range(n))
    return (
        df.withColumn("toks", F.expr(TOKS_EXPR))
        .withColumn("shs", F.expr(
            f"CASE WHEN size(toks) >= {n} THEN "
            f"transform(sequence(1, size(toks) - {n - 1}), i -> concat_ws(' ', {parts})) "
            f"ELSE array(text) END"))
        .select(
            "doc_id",
            F.expr(f"array_min(transform(shs, s -> {_h('s')}))").alias("fp_min"),
            F.expr(_h("substr(text, 1, 64)")).alias("fp_prefix"))
    )
