"""LLM-map operator: retry taxonomy, rate limiter, error isolation,
conversation ordering (main.py:308-629 parity, SURVEY.md §2.10)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ai_batch_processing_spark.operators.llm_map import (
    LLMConfig,
    LLMError,
    MockLLMClient,
    SlidingWindowRateLimiter,
    call_with_retry,
    llm_map,
)


# --------------------------------------------------------------------------
# retry taxonomy (main.py:533-604)
# --------------------------------------------------------------------------
class FlakyClient:
    """Raises the given errors in order, then answers."""

    def __init__(self, errors):
        self.errors = list(errors)
        self.calls = 0

    def complete(self, model, messages, temperature, max_tokens):
        self.calls += 1
        if self.errors:
            raise RuntimeError(self.errors.pop(0))
        return "ok"


def test_rate_limit_retries_with_2x_backoff():
    sleeps = []
    client = FlakyClient(["429 rate limit exceeded", "rate limit hit"])
    cfg = LLMConfig(prompt_template="", retry_attempts=3)
    out = call_with_retry(client, cfg, [{"role": "user", "content": "x"}], sleep=sleeps.append)
    assert out == "ok"
    assert sleeps == [2, 4]  # (2**0)*2, (2**1)*2


def test_generic_error_retries_with_1x_backoff():
    sleeps = []
    client = FlakyClient(["connection reset", "timeout"])
    cfg = LLMConfig(prompt_template="", retry_attempts=3)
    assert call_with_retry(client, cfg, [], sleep=sleeps.append) == "ok"
    assert sleeps == [1, 2]  # (2**0)*1, (2**1)*1


@pytest.mark.parametrize(
    "msg", ["invalid api key", "401 unauthorized", "quota exceeded", "billing issue", "model xyz not found"]
)
def test_fatal_errors_do_not_retry(msg):
    client = FlakyClient([msg, msg, msg])
    cfg = LLMConfig(prompt_template="", retry_attempts=3)
    with pytest.raises(LLMError):
        call_with_retry(client, cfg, [], sleep=lambda s: None)
    assert client.calls == 1


def test_retries_exhausted():
    client = FlakyClient(["boom"] * 10)
    cfg = LLMConfig(prompt_template="", retry_attempts=2)
    with pytest.raises(LLMError, match="retries exhausted"):
        call_with_retry(client, cfg, [], sleep=lambda s: None)
    assert client.calls == 3  # initial + 2 retries


# --------------------------------------------------------------------------
# rate limiter (main.py:606-629)
# --------------------------------------------------------------------------
def test_rate_limiter_sliding_window():
    clock = {"t": 0.0}
    sleeps = []

    def sleep(s):
        sleeps.append(s)
        clock["t"] += s

    rl = SlidingWindowRateLimiter(rpm=2, now=lambda: clock["t"], sleep=sleep)
    rl.wait()
    rl.wait()
    assert sleeps == []
    rl.wait()  # window full → sleep until the first stamp expires
    assert sleeps == [60.0]


def test_rate_limiter_clamps_rpm():
    assert SlidingWindowRateLimiter(0).rpm == 1
    assert SlidingWindowRateLimiter(1000).rpm == 60  # main.py:608


# --------------------------------------------------------------------------
# the operator
# --------------------------------------------------------------------------
def _docs(spark):
    return spark.createDataFrame(
        [(1, "a", "hello"), (2, "a", "world"), (3, "b", "again")],
        "id long, grp string, body string",
    )


def test_ungrouped_map_deterministic(spark):
    cfg = LLMConfig(prompt_template="say {body}", main_content="body", order_by=["id"])
    out = llm_map(_docs(spark), cfg).orderBy("id").collect()
    digest = hashlib.md5(b"say hello").hexdigest()
    assert out[0].response == f"mock:{digest}:0"
    assert out[0].error is None
    assert out[0].main_content == "hello"
    assert out[0].group == "row_0"
    assert [r.row_index for r in out] == [0, 1, 2]


def test_ungrouped_with_system_prompt_counts_history(spark):
    cfg = LLMConfig(prompt_template="{body}", system_prompt="sys", order_by=["id"])
    out = llm_map(_docs(spark), cfg).orderBy("id").collect()
    assert out[0].response.endswith(":1")  # system + current user → 1 prior


def test_grouped_conversation_order_and_history(spark):
    cfg = LLMConfig(prompt_template="{body}", group_by="grp", order_by=["id"])
    out = llm_map(_docs(spark), cfg).orderBy("id").collect()
    # group 'a': rows id=1 (0 prior), id=2 (2 prior: u+a); group 'b': id=3 (0 prior)
    assert out[0].response.endswith(":0")
    assert out[1].response.endswith(":2")
    assert out[2].response.endswith(":0")
    assert out[0].group == "a" and out[2].group == "b"


def test_grouped_null_key_goes_to_unknown_bucket(spark):
    df = spark.createDataFrame([(1, None, "x")], "id long, grp string, body string")
    cfg = LLMConfig(prompt_template="{body}", group_by="grp", order_by=["id"])
    out = llm_map(df, cfg).collect()
    assert out[0].group == "unknown"  # main.py:363


def test_per_row_error_isolation(spark):
    # One poisoned row must not fail the job (main.py:487-502).
    class ExplodingClient:
        def complete(self, model, messages, temperature, max_tokens):
            if "world" in messages[-1]["content"]:
                raise RuntimeError("model xyz not found")
            return "fine"

    cfg = LLMConfig(prompt_template="{body}", order_by=["id"])
    out = llm_map(_docs(spark), cfg, client_factory=lambda c: ExplodingClient()).orderBy("id").collect()
    assert out[0].response == "fine" and out[0].error is None
    assert out[1].response is None and "model_not_found" in out[1].error
    assert out[2].response == "fine"


def test_grouped_failed_row_leaves_no_history_trace(spark):
    # row id=2 fails; row id=3 would see history of only row 1's turn...
    df = spark.createDataFrame(
        [(1, "a", "one"), (2, "a", "world"), (3, "a", "three")],
        "id long, grp string, body string",
    )
    cfg = LLMConfig(prompt_template="{body}", group_by="grp", order_by=["id"])

    class CountingClient:
        def complete(self, model, messages, temperature, max_tokens):
            if "world" in messages[-1]["content"]:
                raise RuntimeError("quota exceeded")
            return f"n={len(messages) - 1}"

    out = llm_map(df, cfg, client_factory=lambda c: CountingClient()).orderBy("id").collect()
    assert out[0].response == "n=0"
    assert out[1].error is not None
    assert out[2].response == "n=2"  # only row 1's user+assistant remain


def test_result_schema_matches_reference_record(spark):
    # main.py:450-462: group, main_content, response, timestamp, prompt,
    # row_index + original columns.
    cfg = LLMConfig(prompt_template="{body}", main_content="body", order_by=["id"])
    cols = set(llm_map(_docs(spark), cfg).columns)
    assert {"group", "main_content", "response", "timestamp", "prompt", "row_index", "error"} <= cols
    assert {"id", "grp", "body"} <= cols


def test_ungrouped_concurrency_overlaps_and_preserves_order(spark):
    """concurrency=8 must overlap I/O waits (wall ≪ serial) and keep
    responses aligned to their rows (executor.map order)."""
    import time as _time

    from ai_batch_processing_spark.operators.llm_map import LLMConfig, llm_map

    class SlowClient:
        def complete(self, model, messages, temperature, max_tokens):
            _time.sleep(0.15)
            return "echo:" + messages[-1]["content"]

    df = spark.range(32).selectExpr("id", "cast(id as string) as txt").coalesce(1)
    cfg = LLMConfig(prompt_template="{txt}", concurrency=8)
    t0 = _time.time()
    out = llm_map(df, cfg, client_factory=lambda c: SlowClient()).collect()
    wall = _time.time() - t0
    assert wall < 32 * 0.15 * 0.6  # serial would be ≥4.8 s; require <2.9 s
    assert all(r.response == "echo:" + r.txt for r in out)
    assert all(r.error is None for r in out)


def test_rate_limiter_thread_safe_budget():
    """N threads hammering one limiter admit exactly rpm calls per window."""
    import threading as _threading

    from ai_batch_processing_spark.operators.llm_map import SlidingWindowRateLimiter

    clock = {"t": 0.0}
    sleeps = []

    def fake_sleep(s):
        sleeps.append(s)
        clock["t"] += s

    limiter = SlidingWindowRateLimiter(10, now=lambda: clock["t"], sleep=fake_sleep)
    admitted = []

    def worker():
        limiter.wait()
        admitted.append(clock["t"])

    threads = [_threading.Thread(target=worker) for _ in range(25)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(admitted) == 25
    # first 10 admitted at t=0; the rest had to wait ≥ one window hop
    assert sum(1 for a in admitted if a == 0.0) == 10
    assert sleeps  # blocking actually happened


# --------------------------------------------------------------------------
# real-provider adapter contracts (stub SDK modules — no network)
# --------------------------------------------------------------------------
def _install_fake_openai(monkeypatch, calls):
    import sys
    import types

    class _Completions:
        def create(self, model, messages, temperature, max_tokens):
            calls.update(model=model, messages=messages, temperature=temperature, max_tokens=max_tokens)
            msg = types.SimpleNamespace(content="openai-says-hi")
            return types.SimpleNamespace(choices=[types.SimpleNamespace(message=msg)])

    class _OpenAI:
        def __init__(self, api_key):
            calls["api_key"] = api_key
            self.chat = types.SimpleNamespace(completions=_Completions())

    mod = types.ModuleType("openai")
    mod.OpenAI = _OpenAI
    monkeypatch.setitem(sys.modules, "openai", mod)


def _install_fake_anthropic(monkeypatch, calls, raise_err=None):
    import sys
    import types

    not_given = object()

    class _Messages:
        def create(self, model, system, messages, temperature, max_tokens):
            if raise_err is not None:
                raise raise_err
            calls.update(
                model=model, system=system, messages=messages,
                temperature=temperature, max_tokens=max_tokens,
            )
            return types.SimpleNamespace(content=[types.SimpleNamespace(text="provider-b-says-hi")])

    class _Anthropic:
        def __init__(self, api_key):
            calls["api_key"] = api_key
            self.messages = _Messages()

    mod = types.ModuleType("anthropic")
    mod.Anthropic = _Anthropic
    mod.NOT_GIVEN = not_given
    monkeypatch.setitem(sys.modules, "anthropic", mod)
    return not_given


def test_openai_adapter_contract(monkeypatch):
    """System message stays INLINE in the messages list for OpenAI; config
    values thread through; response text is unwrapped from choices[0]."""
    from ai_batch_processing_spark.operators.llm_map import _make_client

    calls = {}
    _install_fake_openai(monkeypatch, calls)
    cfg = LLMConfig(
        prompt_template="{x}", provider="openai", model="gpt-test",
        api_key="sk-unit", temperature=0.25, max_tokens=17,
    )
    client = _make_client(cfg)
    msgs = [{"role": "system", "content": "be brief"}, {"role": "user", "content": "hi"}]
    out = client.complete("gpt-test", msgs, 0.25, 17)
    assert out == "openai-says-hi"
    assert calls["api_key"] == "sk-unit"
    assert calls["model"] == "gpt-test" and calls["temperature"] == 0.25 and calls["max_tokens"] == 17
    assert calls["messages"][0] == {"role": "system", "content": "be brief"}


def test_anthropic_adapter_extracts_system_out_of_band(monkeypatch):
    """Anthropic takes system OUT of the messages list (main.py:546-568):
    system= kwarg gets the content, messages keep only user/assistant;
    with no system message, system= must be NOT_GIVEN."""
    from ai_batch_processing_spark.operators.llm_map import _make_client

    calls = {}
    not_given = _install_fake_anthropic(monkeypatch, calls)
    cfg = LLMConfig(
        prompt_template="{x}", provider="anthropic", model="modelb-unit-test", api_key="sk-ant-unit"
    )
    client = _make_client(cfg)
    msgs = [
        {"role": "system", "content": "be kind"},
        {"role": "user", "content": "q1"},
        {"role": "assistant", "content": "a1"},
        {"role": "user", "content": "q2"},
    ]
    assert client.complete("modelb-unit-test", msgs, 0.7, 1000) == "provider-b-says-hi"
    assert calls["system"] == "be kind"
    assert [m["role"] for m in calls["messages"]] == ["user", "assistant", "user"]

    client.complete("modelb-unit-test", [{"role": "user", "content": "solo"}], 0.7, 1000)
    assert calls["system"] is not_given


def test_real_sdk_exception_shapes_map_to_retry_taxonomy(monkeypatch):
    """Exception strings shaped like the real SDKs' errors must classify
    into the right retry bucket (rate-limit backoff ×2 vs fail-fast)."""
    from ai_batch_processing_spark.operators.llm_map import _make_client

    # openai.RateLimitError str form: "Error code: 429 - {...}"
    err = RuntimeError("Error code: 429 - {'error': {'message': 'Rate limit reached'}}")
    calls = {}
    _install_fake_anthropic(monkeypatch, calls, raise_err=err)
    cfg = LLMConfig(
        prompt_template="{x}", provider="anthropic", model="modelb-unit-test",
        api_key="sk-ant-unit", retry_attempts=2,
    )
    client = _make_client(cfg)
    sleeps = []
    with pytest.raises(LLMError, match="rate_limit"):
        call_with_retry(client, cfg, [{"role": "user", "content": "x"}], sleep=sleeps.append)
    assert sleeps == [2, 4]  # ×2 backoff, retried to exhaustion

    # authentication failure must NOT retry
    err2 = RuntimeError("Error code: 401 - Incorrect API key provided")
    _install_fake_anthropic(monkeypatch, {}, raise_err=err2)
    client2 = _make_client(cfg)
    sleeps2 = []
    with pytest.raises(LLMError, match="invalid_key"):
        call_with_retry(client2, cfg, [], sleep=sleeps2.append)
    assert sleeps2 == []


def test_shared_limiter_one_window_per_process_key():
    """Grouped mode must NOT reset the 60 s window per group: the registry
    hands back the SAME limiter for the same config key (round-1 advice —
    per-group fresh limiters let aggregate rate scale with parallelism)."""
    from ai_batch_processing_spark.operators.llm_map import _shared_limiter

    a = _shared_limiter(("mock", "m", None, 6), 6)
    b = _shared_limiter(("mock", "m", None, 6), 6)
    c = _shared_limiter(("mock", "m", "grp", 6), 6)
    assert a is b  # same key → same window (stamps persist across groups)
    assert a is not c
    assert a.rpm == 6


def test_grouped_rate_limit_bounds_concurrent_tasks(spark):
    """With rate_limit set, grouped mode repartitions groups into n_lanes
    tasks (hash on group key satisfies ClusteredDistribution — no second
    Exchange), so total in-flight rate ≤ n_lanes × rpm_share ≤ rpm."""
    # 20 rows / 7 groups keeps every lane ≤ its rpm share (6) so the real
    # limiter admits everything without sleeping — the test pins the PLAN
    # shape, not wall-clock throttling (that's the clock-injected tests).
    df = spark.createDataFrame(
        [(i, f"g{i % 7}", f"t{i}") for i in range(20)], "id long, grp string, body string"
    )
    cfg = LLMConfig(prompt_template="{body}", group_by="grp", order_by=["id"], rate_limit=60)
    out = llm_map(df, cfg)
    # Plan-shape pin WITHOUT executing (executing would engage the real
    # wall-clock limiter): the lane repartition IS the group shuffle — one
    # REPARTITION_BY_NUM(group, 10) and no ENSURE_REQUIREMENTS re-shuffle.
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re as _re

    assert _re.search(r"hashpartitioning\(group#\d+, 10\), REPARTITION_BY_NUM", plan)
    assert not _re.search(r"hashpartitioning\(group#\d+, \d+\), ENSURE_REQUIREMENTS", plan)


def test_grouped_skew_guard_fails_fast_with_group_key(spark):
    df = spark.createDataFrame(
        [(1, "big", "a"), (2, "big", "b"), (3, "big", "c"), (4, "ok", "d")],
        "id long, grp string, body string",
    )
    cfg = LLMConfig(prompt_template="{body}", group_by="grp", order_by=["id"], max_group_rows=2)
    with pytest.raises(Exception) as exc:
        llm_map(df, cfg).collect()
    assert "big" in str(exc.value) and "max_group_rows" in str(exc.value)


def test_validate_config_rules(spark):
    import pytest as _pytest

    from ai_batch_processing_spark.operators.llm_map import ConfigError, LLMConfig, llm_map, validate_config

    cols = ["id", "text"]
    validate_config(LLMConfig(prompt_template="{text}"), cols)  # ok
    for bad in [
        LLMConfig(prompt_template="{text}", temperature=3.0),
        LLMConfig(prompt_template="{text}", max_tokens=0),
        LLMConfig(prompt_template="{text}", rate_limit=0),
        LLMConfig(prompt_template="{text}", retry_attempts=11),
        LLMConfig(prompt_template="no placeholders here"),
        LLMConfig(prompt_template="{nope}"),
        LLMConfig(prompt_template="{text}", group_by="missing"),
        LLMConfig(prompt_template="{text}", provider="openai", api_key="bad"),
        LLMConfig(prompt_template="{text}", provider="anthropic", api_key="sk-wrong"),
    ]:
        with _pytest.raises(ConfigError):
            validate_config(bad, cols)
    # enforced at the operator boundary, before any job starts
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with _pytest.raises(ConfigError):
        llm_map(df, LLMConfig(prompt_template="{missing_only}"))


def test_llm_map_cached_calls_once_per_distinct_prompt(spark):
    """Cache semantics: N rows with k distinct prompts → exactly k client
    calls, every row still gets its prompt's response, grouped rejected."""
    import pytest as _pytest

    from ai_batch_processing_spark.operators.llm_map import (
        ConfigError,
        LLMConfig,
        MockLLMClient,
        llm_map_cached,
    )

    class UniquePerCallMock(MockLLMClient):
        """Every CALL returns a distinct token (client code runs on
        executors, so a driver-side counter can't observe it): the number
        of distinct responses across rows IS the number of API calls."""

        def complete(self, model, messages, temperature, max_tokens):
            import uuid

            return f"call:{uuid.uuid4().hex}"

    df = spark.createDataFrame(
        [(1, "en", "a"), (2, "en", "b"), (3, "fr", "c"), (4, "fr", "d"), (5, "de", "e")],
        "doc_id long, lang string, text string",
    )
    cfg = LLMConfig(prompt_template="lang: {lang}", main_content="text", order_by=["doc_id"])
    cached_df = llm_map_cached(df, cfg, client_factory=lambda _cfg: UniquePerCallMock())
    # drop-in contract: same columns, same order as the row-wise map
    from ai_batch_processing_spark.operators.llm_map import llm_map as _plain

    assert cached_df.columns == _plain(df, cfg).columns
    out = cached_df.collect()
    assert len(out) == 5
    assert len({r.response for r in out}) == 3  # one request per distinct prompt
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].response == by_id[2].response  # same prompt, same response
    assert by_id[1].response != by_id[3].response
    assert all(r.error is None for r in out)

    with _pytest.raises(ConfigError):
        llm_map_cached(df, LLMConfig(prompt_template="{text}", group_by="lang"), None)


def test_llm_map_cached_preserves_preindexed_column_order(spark):
    """Drop-in parity also when the caller pre-indexed the input: the row
    index column is renamed IN PLACE, matching llm_map's order."""
    from ai_batch_processing_spark.operators.llm_map import LLMConfig, llm_map, llm_map_cached
    from ai_batch_processing_spark.operators.template import with_row_index

    df = with_row_index(
        spark.createDataFrame([(1, "en", "a"), (2, "fr", "b")], "doc_id long, lang string, text string"),
        order_by=["doc_id"],
    ).select("_row_index", "doc_id", "lang", "text")  # index mid/front of schema
    cfg = LLMConfig(prompt_template="lang: {lang}", main_content="text")
    assert llm_map_cached(df, cfg).columns == llm_map(df, cfg).columns


def _acquire_worker(args):
    """Module-level so multiprocessing can pickle it: each WORKER PROCESS
    builds its OWN limiter instance over the shared lease dir and grabs
    as many tokens as it can from the current window."""
    lease_dir, rpm, attempts = args
    from ai_batch_processing_spark.operators.llm_map import GlobalTokenBucketLimiter

    lim = GlobalTokenBucketLimiter(rpm, lease_dir)
    got = 0
    for _ in range(attempts):
        if lim.try_acquire():
            got += 1
    return got


def test_global_token_bucket_aggregate_rpm_across_processes(tmp_path):
    """Round-4 verdict item 6: with the global scope, aggregate
    acquisitions across SEPARATE worker processes (independent limiter
    instances, shared lease dir) never exceed the rpm budget per window —
    and the budget is fully utilizable (exactly rpm granted, not
    rpm // n_workers)."""
    import multiprocessing as mp

    import os
    from collections import Counter

    lease = str(tmp_path / "leases")
    rpm = 12
    with mp.get_context("spawn").Pool(4) as pool:
        grants = pool.map(_acquire_worker, [(lease, rpm, 50)] * 4)
    # budget accounting is per 60 s window: tolerate a wall-clock window
    # rollover mid-test by asserting the PER-WINDOW ledger, which is the
    # actual guarantee (≤ rpm leases can ever exist per window)
    per_window = Counter(n.split(".", 1)[0] for n in os.listdir(lease))
    assert all(c <= rpm for c in per_window.values())
    assert sum(grants) == sum(per_window.values())  # every grant is ledgered
    assert sum(grants) >= rpm  # full budget utilizable (≥ in case of rollover)
    # a follow-up wave drains at most whatever a fresh window offers; its
    # window's ledger still never exceeds rpm
    _acquire_worker((lease, rpm, 20))
    per_window = Counter(n.split(".", 1)[0] for n in os.listdir(lease))
    assert all(c <= rpm for c in per_window.values())


def test_global_token_bucket_window_rollover_and_gc(tmp_path):
    """Tokens replenish at the window boundary; stale windows are GC'd."""
    import os

    from ai_batch_processing_spark.operators.llm_map import GlobalTokenBucketLimiter

    lease = str(tmp_path / "leases")
    t = {"now": 0.0}
    slept = []
    lim = GlobalTokenBucketLimiter(
        3, lease, now=lambda: t["now"], sleep=lambda s: (slept.append(s), t.__setitem__("now", t["now"] + s))
    )
    for _ in range(3):
        lim.wait()
    assert not slept
    lim.wait()  # budget spent → sleeps into the next window
    assert slept and t["now"] >= 60.0
    # windows ≥ 2 behind are removed on later acquisitions
    t["now"] = 200.0
    lim.wait()
    names = os.listdir(lease)
    assert all(int(n.split(".", 1)[0]) >= 2 for n in names)


def test_llm_map_global_rate_scope_end_to_end(spark, tmp_path):
    """llm_map with rate_limit_scope='global': every row's call leases
    from the shared budget (lease ledger size == successful calls when
    under budget), and validation demands the lease dir."""
    import os

    import pytest

    from ai_batch_processing_spark.operators.llm_map import ConfigError, LLMConfig, llm_map

    df = spark.createDataFrame(
        [(i, f"t{i}", "en", "s", 2) for i in range(8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    lease = str(tmp_path / "leases")
    cfg = LLMConfig(
        prompt_template="say: {text}",
        rate_limit=60,
        rate_limit_scope="global",
        rate_limit_dir=lease,
        order_by=["doc_id"],
    )
    out = llm_map(df, cfg).collect()
    assert len(out) == 8 and all(r.error is None for r in out)
    assert len([n for n in os.listdir(lease) if n.endswith(".lease")]) == 8

    with pytest.raises(ConfigError, match="rate_limit_dir"):
        llm_map(df, LLMConfig(prompt_template="say: {text}", rate_limit=10, rate_limit_scope="global"))
