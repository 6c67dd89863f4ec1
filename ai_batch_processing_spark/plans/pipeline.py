"""Reference end-to-end pipeline as one declarative plan (SURVEY.md §3.2-§3.3).

ingest → group → template → LLM map (mock) → order-restoring sort →
export projection. This is the reference's whole job expressed in a handful
of DataFrame calls; the oracle reproduces every rule in SQL so the export
shape itself is hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_batch_processing_spark.io.writers import export_projection
from ai_batch_processing_spark.operators.llm_map import LLMConfig, llm_map
from ai_batch_processing_spark.registry import register
from ai_batch_processing_spark.session import load_tables

_TEMPLATE = "Review {source}/{doc_id}: {text}"
_PROMPT_SQL = (
    "'Review ' || COALESCE(CAST(source AS VARCHAR), '') || '/' || "
    "COALESCE(CAST(doc_id AS VARCHAR), '') || ': ' || COALESCE(CAST(text AS VARCHAR), '')"
)


@register(
    "q34_pipeline_export",
    oracle=f"""
        WITH p AS (
            SELECT
                *,
                {_PROMPT_SQL} AS prompt,
                ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
            FROM documents
        )
        SELECT
            lang AS "group",
            COALESCE(CAST(text AS VARCHAR), '') AS main_content,
            COALESCE(CAST(doc_id AS VARCHAR), '') AS doc_id,
            COALESCE(CAST(lang AS VARCHAR), '') AS lang,
            COALESCE(CAST(n_chars AS VARCHAR), '') AS n_chars,
            COALESCE(CAST(source AS VARCHAR), '') AS source,
            COALESCE(CAST(text AS VARCHAR), '') AS text,
            prompt,
            'mock:' || md5(prompt) || ':' || CAST(2 * (rn - 1) AS VARCHAR) AS response
        FROM p
        ORDER BY doc_id
    """,
    doc=(
        "whole reference pipeline: grouped mock LLM map + export projection "
        "(column order group, main_content, originals-sorted, prompt, response; "
        "'' defaults; main.py:697-733)."
    ),
    bench=True,
    tags=("reference", "pipeline", "export"),
)
def q34_pipeline_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    cfg = LLMConfig(
        prompt_template=_TEMPLATE,
        group_by="lang",
        main_content="text",
        order_by=["doc_id"],
    )
    result = llm_map(t["documents"], cfg).drop("timestamp")  # export-time stamps aren't hashable
    return export_projection(result, include_prompt=True)


# --- q73: the training-data filter pipeline ----------------------------------
# The capstone composition a 100 TB curation run actually executes:
# quality gate → language filter → exact dedup (keep min id) → join to
# the embedding table. Every stage is an operator proven individually
# (q49 quality, q40 dedup, joins); this query proves they compose in one
# plan — quality/lang predicates run scan-side, the dedup is one shuffle
# on text, the embedding join is the only other shuffle.
@register(
    "q73_training_data_filter",
    oracle=r"""
        WITH feats AS (
            SELECT
                doc_id, lang, text,
                length(text) AS n_chars,
                len(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS n_tokens,
                length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars,
                length(text) - length(regexp_replace(text, '[\.,;:!\?''"()\[\]{}-]', '', 'g')) AS punct_chars,
                len(list_filter(
                    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> ''),
                    t -> list_contains(['the','and','of','to','a','in','is','that','for','with'], t)
                )) AS stop_hits
            FROM documents
        ),
        scored AS (
            SELECT doc_id, lang, text, n_tokens,
                ROUND(
                    (CASE WHEN n_chars BETWEEN 20 AND 20000 THEN 1.0 ELSE 0.25 END)
                    * (CASE WHEN n_chars > 0 THEN CAST(alpha_chars AS DOUBLE) / n_chars ELSE 0.0 END)
                    * (1 - (CASE WHEN n_chars > 0 THEN CAST(punct_chars AS DOUBLE) / n_chars ELSE 0.0 END))
                    * LEAST(1.0, (CASE WHEN n_tokens > 0 THEN CAST(stop_hits AS DOUBLE) / n_tokens ELSE 0.0 END) * 4 + 0.5),
                6) AS quality_score
            FROM feats
        ),
        kept AS (
            SELECT MIN(doc_id) AS doc_id, ANY_VALUE(n_tokens) AS n_tokens,
                   ANY_VALUE(quality_score) AS quality_score
            FROM scored
            WHERE lang = 'en' AND quality_score >= 0.5
            GROUP BY text
        )
        SELECT k.doc_id, k.n_tokens, k.quality_score,
               ROUND(sqrt(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x))), 4) AS emb_norm
        FROM kept k JOIN embeddings e ON e.vec_id = k.doc_id
        ORDER BY k.doc_id
    """,
    doc="capstone curation pipeline: quality gate → lang filter → exact dedup → embedding join.",
    bench=True,
    tags=("pipeline", "dedup", "quality", "join"),
)
def q73_training_data_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_batch_processing_spark.operators.text import quality_features

    t = load_tables(spark, sf_dir, ["documents", "embeddings"])
    scored = quality_features(t["documents"]).select("doc_id", "lang", "text", "n_tokens", "quality_score")
    kept = (
        scored.filter((F.col("lang") == "en") & (F.col("quality_score") >= 0.5))
        .groupBy("text")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.first("n_tokens").alias("n_tokens"),
            F.first("quality_score").alias("quality_score"),
        )
    )
    emb = t["embeddings"]
    norm_sq = F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return (
        kept.join(emb, kept.doc_id == emb.vec_id)
        .select("doc_id", "n_tokens", "quality_score", F.round(F.sqrt(norm_sq), 4).alias("emb_norm"))
        .orderBy("doc_id")
    )
