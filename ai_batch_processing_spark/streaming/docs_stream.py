"""Streaming document-ingest curation: the q73 batch pipeline's streaming
twin, for corpora that arrive continuously (crawler output, log shipping).

``readStream`` over a landing directory → quality scoring (pure Catalyst —
the same ``text.quality_features`` expressions run unchanged on a streaming
plan) → fingerprint near-exact dedup with WATERMARK-BOUNDED state → emit.

Dedup-state scale story (the design decision that matters at 100 TB):
``dropDuplicates`` on a stream without a watermark keeps every key forever —
an unbounded state store is the classic streaming-dedup scale-killer. Here
each document carries an ``ingest_ts`` and the stream is watermarked on it,
so per-fingerprint state is evicted once the watermark passes; duplicates
arriving within the window are suppressed exactly, and older re-ingests are
left to the periodic BATCH pass (``corpus.incremental_dedup`` anti-joins
the full historical corpus) — the standard lambda split: streaming handles
the hot window with bounded state, batch owns full-history exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_batch_processing_spark.operators.text import fingerprint_expr, quality_features

DOC_STREAM_SCHEMA = (
    "doc_id long, text string, lang string, source string, ingest_ts timestamp"
)


def stream_curate_documents(
    spark: SparkSession,
    source_dir: str,
    min_quality: float = 0.1,
    langs: tuple[str, ...] = ("en", "es", "de", "fr"),
    watermark: str = "1 hour",
    schema: str = DOC_STREAM_SCHEMA,
) -> DataFrame:
    """Continuous curation over a document landing directory.

    Returns the curated append-mode stream: quality-scored, language-
    filtered, fingerprint-deduped rows (doc_id, lang, source, ingest_ts,
    quality_score, fp). Start it with ``.writeStream`` + any sink; every
    transformation is stateless except the watermark-bounded dedup.
    """
    stream = spark.readStream.schema(schema).json(source_dir)
    scored = quality_features(stream)
    kept = scored.filter(
        (F.col("quality_score") >= min_quality) & F.col("lang").isin(*langs)
    ).withColumn("fp", fingerprint_expr("text"))
    # dropDuplicatesWithinWatermark, NOT dropDuplicates(["fp"]): plain
    # dedup only evicts state when the event-time column is part of the
    # key set (events.py uses ["event_id", "ts"] for that reason) — on a
    # bare fp key it would keep one state entry per distinct fingerprint
    # FOREVER. The within-watermark form keeps fp-only dedup semantics
    # while evicting each entry once the watermark passes its arrival.
    return (
        kept.withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
        .select("doc_id", "lang", "source", "ingest_ts", "quality_score", "fp")
    )
