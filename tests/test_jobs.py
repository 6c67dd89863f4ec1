"""Job control: stop-with-cancellation, status metrics, progress events."""

from __future__ import annotations

import time

from ai_batch_processing_spark.jobs import JobRegistry


def _slow_df(spark, n_tasks: int = 16, sleep_s: float = 1.0):
    df = spark.range(n_tasks * 10, numPartitions=n_tasks)

    def slow(it):
        import time as _t

        for pdf in it:
            _t.sleep(sleep_s)
            yield pdf

    return df.mapInPandas(slow, df.schema)


def test_job_completes_with_progress(spark):
    reg = JobRegistry(spark, poll_interval=0.05)
    events = []
    job_id = reg.submit(lambda s: _slow_df(s, n_tasks=4, sleep_s=0.3).count(), on_progress=events.append)
    st = reg.wait(job_id, timeout=60)
    assert st.status == "completed"
    assert st.result == 40
    assert events and events[-1]["event"] == "job_finished"
    snap = reg.status(job_id)
    assert snap["status"] == "completed"
    # completed a 4-task job → live rate/ETA metrics present (main.py:653-657)
    assert "rate_per_min" in snap and snap["eta_seconds"] == 0


def test_job_stop_cancels_running_tasks(spark):
    reg = JobRegistry(spark, poll_interval=0.05)
    t0 = time.time()
    job_id = reg.submit(lambda s: _slow_df(s, n_tasks=64, sleep_s=1.0).count())
    time.sleep(1.0)  # let tasks start
    assert reg.stop(job_id)
    st = reg.wait(job_id, timeout=30)
    assert st.status == "stopped"
    # 64 tasks x 1 s on 8 threads would take ~8 s serially; cancellation
    # must land well before that.
    assert time.time() - t0 < 7
    assert not reg.stop(job_id)  # already stopped → False


def test_reset_clears_jobs(spark):
    reg = JobRegistry(spark, poll_interval=0.05)
    job_id = reg.submit(lambda s: s.range(10).count())
    reg.wait(job_id, timeout=30)
    reg.reset()
    assert reg._jobs == {}
