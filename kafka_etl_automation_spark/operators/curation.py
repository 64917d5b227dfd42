"""End-to-end corpus curation: the composed training-data pipeline.

The individual operators (quality scoring, language ID, exact dedup,
content-hash splitting — operators.text / operators.dedup) are each
registered and oracle-checked on their own; this module composes them the
way a real pretraining-data pipeline runs them, as ONE logical plan:

    score (pure projections)  ->  filter (quality / lang / token bounds)
      ->  exact dedup, keep canonical (one fingerprint-keyed shuffle)
      ->  deterministic content-hash train/eval split

Scale properties (the reason this is a single plan, not four jobs):
- every score is a Catalyst projection computed in the SAME scan pass —
  the corpus is read once;
- the raw text column dies at the scan: only (id, scores, fingerprint,
  split) survive into the shuffle, so the one exchange moves ~50 bytes a
  row regardless of document size;
- dedup uses min_by over a struct (partial-aggregable, map-side combine)
  rather than a ranking window — no sort, no second pass;
- the filters run BEFORE the shuffle, so rejected documents never leave
  their input partition (predicate pushdown for free via Catalyst).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_etl_automation_spark.operators import text
from kafka_etl_automation_spark.operators.dedup import normalized_text


def curate(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.4,
    langs: tuple[str, ...] = ("en",),
    min_tokens: int = 12,
    max_tokens: int = 100_000,
    train_pct: int = 90,
) -> DataFrame:
    """Curated corpus manifest: (doc_id, lang, n_tokens, quality, split),
    one row per surviving canonical document."""
    toks = F.split(normalized_text(text_col), " ")
    scored = documents.select(
        F.col(id_col).alias("doc_id"),
        text.lang_id(text_col).alias("lang"),
        text.token_count(text_col).alias("n_tokens"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("unique_ratio"),
        text.stopword_ratio(text_col).alias("stopword_ratio"),
        F.md5(normalized_text(text_col)).alias("fingerprint"),
        text.hash_split(text_col, train_pct).alias("split"),
    ).select(
        "doc_id",
        "lang",
        "n_tokens",
        "fingerprint",
        "split",
        F.round(
            F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.4
            + F.col("unique_ratio") * 0.3
            + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.3,
            6,
        ).alias("quality"),
    )
    kept = scored.filter(
        (F.col("quality") >= min_quality)
        & F.col("lang").isin(*langs)
        & F.col("n_tokens").between(min_tokens, max_tokens)
    )
    return (
        kept.groupBy("fingerprint")
        .agg(
            F.min_by(
                F.struct("doc_id", "lang", "n_tokens", "quality", "split"),
                F.col("doc_id"),
            ).alias("r")
        )
        .select("r.doc_id", "r.lang", "r.n_tokens", "r.quality", "r.split")
    )
