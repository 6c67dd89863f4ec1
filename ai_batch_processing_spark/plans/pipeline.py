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
