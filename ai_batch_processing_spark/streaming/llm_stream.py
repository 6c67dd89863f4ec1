"""Streaming LLM map — chunked micro-batch processing with resume.

The reference's pause/resume (main.py:391-392, 631-638) has no Spark
batch analog (SURVEY.md §7.4-3); the honest Spark shape is micro-batch
streaming: documents arrive as files, each trigger processes a bounded
chunk through ``llm_map``, results append to a sink, and the checkpoint
makes stop/restart exact — "pause" is stopping the trigger, "resume" is
restarting the query, and no row is ever processed twice.

``foreachBatch`` is the right boundary: inside the hook each micro-batch
is an ordinary DataFrame, so the full batch operator (template, grouping,
retry, error isolation) is reused verbatim — one code path for batch and
streaming, which is the point of Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ai_batch_processing_spark.operators.llm_map import LLMConfig, llm_map

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def stream_llm_map(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: LLMConfig,
    schema: str = DOC_SCHEMA,
    max_files_per_trigger: int = 1,
    client_factory=None,
):
    """Process document files through the LLM map as they land.

    Returns the started StreamingQuery (trigger=availableNow: drain what
    exists, then stop — call again after new files arrive to resume from
    the checkpoint). ``max_files_per_trigger`` bounds chunk size, the
    micro-batch analog of the reference's batch-size cap.
    """

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = llm_map(batch_df, cfg, client_factory=client_factory)
        out.write.mode("append").parquet(out_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(source_dir)
    )
    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
