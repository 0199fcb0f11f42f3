"""PipelineRunner + retry + idempotency tests (reference
tests/integration/test_pipeline_flow.py:69-138 and unit retry/idempotency
suites)."""

import pytest

from data_pipeline_platform_spark.plans.runner import PipelineRunner, compute_data_id
from data_pipeline_platform_spark.sinks.writers import BatchWriter
from data_pipeline_platform_spark.utils.idempotency import FileKVStore, IdempotencyManager
from data_pipeline_platform_spark.utils.retry import RetryError, retry, retry_call


@pytest.fixture()
def runner(spark, tmp_warehouse):
    return PipelineRunner(spark, writer=BatchWriter(spark, base_path=tmp_warehouse))


def test_full_pipeline_sql(runner, users_df):
    users_df.createOrReplaceTempView("users_src")
    result = runner.run(
        {
            "ingestion": {"query": "SELECT * FROM users_src"},
            "transformation": {
                "type": "sql",
                "query": "SELECT id, UPPER(name) AS name_upper, age * 2 AS age_doubled "
                "FROM input_data",
            },
            "persistence": {"table": "dest_users", "strategy": "replace"},
        }
    )
    assert result["status"] == "success"
    assert result["row_count"] == 5
    out = runner.writer.read_table("dest_users")
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["name_upper"] == "ALICE" and rows[1]["age_doubled"] == 50


def test_full_pipeline_config(runner, users_df):
    users_df.createOrReplaceTempView("users_src")
    result = runner.run(
        {
            "ingestion": {"query": "SELECT * FROM users_src"},
            "transformation": {
                "type": "config",
                "config": {"select": ["id", "name"], "rename": {"name": "full_name"}},
            },
            "persistence": {"table": "cfg_out", "strategy": "replace"},
        }
    )
    assert result["status"] == "success"
    assert runner.writer.read_table("cfg_out").columns == ["id", "full_name"]


def test_pipeline_code_stage(runner, users_df):
    from pyspark.sql import functions as F

    users_df.createOrReplaceTempView("users_src")
    result = runner.run(
        {
            "ingestion": {"query": "SELECT * FROM users_src WHERE age > 30"},
            "transformation": {
                "type": "code",
                "function": lambda df: df.withColumn("age", F.col("age") + 1),
            },
        }
    )
    assert result["status"] == "success"
    assert result["row_count"] == 3


def test_pipeline_error_shape(runner):
    result = runner.run({"ingestion": {"query": "SELECT * FROM no_such_table"}})
    assert result["status"] == "error"
    assert "error" in result and result["pipeline_id"]


def test_pipeline_status_and_health(runner, users_df):
    users_df.createOrReplaceTempView("users_src")
    r = runner.run({"ingestion": {"query": "SELECT * FROM users_src"}}, pipeline_id="p1")
    assert runner.get_status("p1")["status"] == "success"
    h = runner.health()
    assert h["is_healthy"] and h["pipelines_run"] >= 1


def test_data_id_stable(users_df):
    a = compute_data_id(users_df)
    b = compute_data_id(users_df)
    assert a == b and len(a) == 16


def test_retry_succeeds_after_failures():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise IOError("transient")
        return "ok"

    assert retry_call(flaky, max_retries=3, base_delay=0.01) == "ok"
    assert calls["n"] == 3


def test_retry_exhausted_raises_retry_error():
    @retry(max_retries=2, base_delay=0.01)
    def always_fails():
        raise ValueError("nope")

    with pytest.raises(RetryError) as exc_info:
        always_fails()
    assert isinstance(exc_info.value.last_exception, ValueError)


def test_retry_exception_filter():
    def fails():
        raise KeyError("not retryable")

    with pytest.raises(KeyError):
        retry_call(fails, max_retries=3, base_delay=0.01, retry_on=(IOError,))


def test_idempotency_set_nx(tmp_path):
    mgr = IdempotencyManager(store=FileKVStore(str(tmp_path)))
    key = mgr.make_key("src", {"q": 1})
    assert mgr.check_and_set(key) is True  # first time
    assert mgr.check_and_set(key) is False  # duplicate


def test_idempotency_fail_open(tmp_path):
    class BrokenStore:
        def set_nx(self, *a, **k):
            raise IOError("store down")

        def get(self, *a, **k):
            raise IOError("store down")

        def delete(self, *a, **k):
            raise IOError("store down")

    mgr = IdempotencyManager(store=BrokenStore())
    assert mgr.check_and_set("k") is True  # fail-open (reference :52-82)


def test_idempotency_disabled(tmp_path):
    mgr = IdempotencyManager(store=FileKVStore(str(tmp_path)), enabled=False)
    assert mgr.check_and_set("k") is True
    assert mgr.check_and_set("k") is True


def test_idempotent_decorator_caches(tmp_path):
    from data_pipeline_platform_spark.utils.idempotency import idempotent

    mgr = IdempotencyManager(store=FileKVStore(str(tmp_path)))
    calls = {"n": 0}

    @idempotent(manager=mgr, source_id="job1")
    def job(x):
        calls["n"] += 1
        return {"result": x * 2}

    assert job(21) == {"result": 42}
    assert job(21) == {"result": 42}  # cached, not re-run
    assert calls["n"] == 1


def test_retry_async_succeeds_after_failures():
    import asyncio

    from data_pipeline_platform_spark.utils.retry import retry_async

    calls = {"n": 0}
    seen = []

    @retry_async(max_retries=3, base_delay=0.01, on_retry=lambda a, e: seen.append(a))
    async def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise IOError("transient")
        return "ok"

    assert asyncio.run(flaky()) == "ok"
    assert calls["n"] == 3 and seen == [1, 2]


def test_retry_async_exhaustion_and_filter():
    import asyncio

    from data_pipeline_platform_spark.utils.retry import retry_async

    @retry_async(max_retries=2, base_delay=0.01)
    async def always_fails():
        raise ValueError("nope")

    with pytest.raises(RetryError, match="failed after 2 attempts"):
        asyncio.run(always_fails())

    @retry_async(max_retries=5, base_delay=0.01, retry_on=(IOError,))
    async def wrong_type():
        raise KeyError("not retried")

    with pytest.raises(KeyError):  # outside retry_on -> immediate
        asyncio.run(wrong_type())
