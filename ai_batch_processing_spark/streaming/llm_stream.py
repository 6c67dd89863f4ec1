"""Streaming LLM map — chunked micro-batch processing with pause/resume.

The reference's pause/resume (main.py:391-392, 631-638) has no Spark
batch analog (SURVEY.md §7.4-3); the honest Spark shape is micro-batch
streaming: documents arrive as files, each trigger processes a bounded
chunk through ``llm_map``, results append to a sink, and the checkpoint
makes stop/restart exact — "pause" is stopping the trigger, "resume" is
restarting the query from the checkpoint (:class:`LLMStreamJob`).

``foreachBatch`` is the right boundary: inside the hook each micro-batch
is an ordinary DataFrame, so the full batch operator (template, grouping,
retry, error isolation) is reused verbatim — one code path for batch and
streaming, which is the point of Structured Streaming.

Delivery semantics: ``foreachBatch`` alone is at-least-once — a failure
between the sink write and the checkpoint commit replays the micro-batch.
The sink here is therefore keyed by ``batch_id``: a replayed batch
overwrites its own directory (idempotent) and a batch whose ``_SUCCESS``
marker already exists is skipped entirely, which also avoids paying for
the same API calls twice. Net effect: exactly-once output.
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
        sess = batch_df.sparkSession
        target = f"{out_dir}/batch_id={batch_id}"
        # Idempotence gate: replay of a committed batch (at-least-once
        # foreachBatch) is a no-op; an uncommitted partial write is
        # overwritten atomically under the same batch_id key.
        marker = sess._jvm.org.apache.hadoop.fs.Path(target + "/_SUCCESS")
        fs = marker.getFileSystem(sess._jsc.hadoopConfiguration())
        if fs.exists(marker):
            return
        out = llm_map(batch_df, cfg, client_factory=client_factory)
        out.write.mode("overwrite").parquet(target)

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


class LLMStreamJob:
    """Pause/resume surface over the micro-batch LLM stream.

    The reference pauses by flipping a flag the sequential loop polls
    (main.py:631-638); the Spark analog is trigger control: ``pause()``
    stops the StreamingQuery (checkpoint intact — the in-flight batch
    either commits or is replayed idempotently on resume), ``resume()``
    restarts from the checkpoint so already-committed batches are never
    reprocessed. Register instances with ``JobRegistry.register_stream``
    for the job-control surface.
    """

    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        out_dir: str,
        checkpoint_dir: str,
        cfg: LLMConfig,
        schema: str = DOC_SCHEMA,
        max_files_per_trigger: int = 1,
        client_factory=None,
    ):
        self._spark = spark
        self._source_dir = source_dir
        self._out_dir = out_dir
        self._checkpoint_dir = checkpoint_dir
        self._cfg = cfg
        self._schema = schema
        self._max_files = max_files_per_trigger
        self._client_factory = client_factory
        self._query = None
        self.paused = False

    def start(self) -> "LLMStreamJob":
        self._query = stream_llm_map(
            self._spark,
            self._source_dir,
            self._out_dir,
            self._checkpoint_dir,
            self._cfg,
            schema=self._schema,
            max_files_per_trigger=self._max_files,
            client_factory=self._client_factory,
        )
        self.paused = False
        return self

    def pause(self) -> bool:
        """Stop the trigger, keep the checkpoint. False if not running."""
        q = self._query
        if q is None or not q.isActive:
            return False
        q.stop()
        q.awaitTermination(60)
        self.paused = True
        return True

    def resume(self) -> "LLMStreamJob":
        """Restart from the checkpoint (also picks up files that arrived
        while paused)."""
        return self.start()

    def wait(self, timeout: float | None = None) -> bool:
        """Block until the current drain finishes (availableNow stops on
        its own once everything pending is processed)."""
        if self._query is None:
            return True
        return self._query.awaitTermination(timeout)

    @property
    def active(self) -> bool:
        return self._query is not None and self._query.isActive
