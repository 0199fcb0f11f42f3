"""CLI + API-service tests (reference tests/unit/test_cli.py and
tests/integration/test_api.py shapes, minus HTTP transport)."""

import json

import pytest

from data_pipeline_platform_spark.cli import build_parser, load_config_file, main


def test_parser_subcommands():
    p = build_parser()
    args = p.parse_args(["run", "--query", "SELECT 1", "--table", "t"])
    assert args.command == "run" and args.table == "t"
    args = p.parse_args(["persist", "--path", "/x.parquet", "--table", "t", "--strategy", "upsert"])
    assert args.strategy == "upsert"
    with pytest.raises(SystemExit):
        p.parse_args(["persist"])  # missing required --table


def test_config_file_loading(tmp_path):
    f = tmp_path / "p.json"
    f.write_text(json.dumps({"ingestion": {"query": "SELECT 1"}}))
    assert load_config_file(str(f))["ingestion"]["query"] == "SELECT 1"
    y = tmp_path / "p.yaml"
    y.write_text("ingestion:\n  query: SELECT 2\n")
    assert load_config_file(str(y))["ingestion"]["query"] == "SELECT 2"


def test_cli_run_end_to_end(spark, tmp_path, capsys):
    cfg = {
        "ingestion": {"path": "/root/testdata/sf0.001/region.parquet", "format": "parquet"},
        "transformation": {"type": "sql", "query": "SELECT r_regionkey, UPPER(r_name) AS name FROM input_data"},
        "persistence": {"table": "regions_out", "strategy": "replace"},
    }
    f = tmp_path / "cfg.json"
    f.write_text(json.dumps(cfg))
    rc = main(["run", "--config", str(f), "--warehouse", str(tmp_path / "wh")])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["status"] == "success" and out["row_count"] == 5


def test_cli_run_error_exit_code(spark, tmp_path, capsys):
    f = tmp_path / "bad.json"
    f.write_text(json.dumps({"ingestion": {"query": "SELECT * FROM missing_tbl"}}))
    rc = main(["run", "--config", str(f), "--warehouse", str(tmp_path / "wh")])
    assert rc == 1
    out = json.loads(capsys.readouterr().out)
    assert out["status"] == "error"


def test_api_service_submit_and_poll(spark, tmp_warehouse):
    from data_pipeline_platform_spark.api import PipelineService
    from data_pipeline_platform_spark.plans.runner import PipelineRunner
    from data_pipeline_platform_spark.sinks.writers import BatchWriter

    service = PipelineService(PipelineRunner(spark, writer=BatchWriter(spark, base_path=tmp_warehouse)))
    sub = service.submit_pipeline(
        {"ingestion": {"path": "/root/testdata/sf0.001/nation.parquet", "format": "parquet"}}
    )
    assert sub["status"] == "submitted"
    import time

    for _ in range(60):
        st = service.pipeline_status(sub["pipeline_id"])
        if st["status"] not in ("running", "submitted"):
            break
        time.sleep(0.5)
    assert st["status"] == "success"
    assert st["result"]["row_count"] == 25
    assert service.workers()["completed"] >= 1
    assert service.health()["status"] == "healthy"
    service.shutdown()


def test_api_unknown_pipeline(spark):
    from data_pipeline_platform_spark.api import PipelineService
    from data_pipeline_platform_spark.plans.runner import PipelineRunner

    service = PipelineService(PipelineRunner(spark))
    assert service.pipeline_status("nope")["status"] == "unknown"
    service.shutdown()


def test_create_app_without_fastapi_raises(spark):
    from data_pipeline_platform_spark import api

    if not api.HAS_FASTAPI:
        with pytest.raises(ImportError):
            api.create_app()


def test_cli_status_cross_process(spark, tmp_path, capsys):
    cfg = {"ingestion": {"path": "/root/testdata/sf0.001/region.parquet", "format": "parquet"},
           "persistence": {"table": "r_out", "strategy": "replace"}}
    f = tmp_path / "c.json"
    f.write_text(json.dumps(cfg))
    wh = str(tmp_path / "wh")
    rc = main(["run", "--config", str(f), "--warehouse", wh])
    out = json.loads(capsys.readouterr().out)
    pid = out["pipeline_id"]
    # a NEW runner instance (fresh process analog) finds the run
    rc = main(["status", "--warehouse", wh, pid])
    st = json.loads(capsys.readouterr().out)
    assert rc == 0 and st["status"] == "success" and st["row_count"] == 5
    rc = main(["status", "--warehouse", wh, "nonexistent"])
    assert rc == 1
    assert json.loads(capsys.readouterr().out)["status"] == "unknown"


def test_cli_workers(spark, capsys):
    rc = main(["workers"])
    info = json.loads(capsys.readouterr().out)
    assert rc == 0 and info["default_parallelism"] >= 1 and "spark_version" in info


def _wait_task(service, task_id, timeout=30.0):
    import time

    deadline = time.time() + timeout
    while time.time() < deadline:
        st = service.task_status(task_id)
        if st["status"] not in ("pending",):
            return st
        time.sleep(0.25)
    raise TimeoutError(f"task {task_id} still pending")


def test_api_per_stage_task_chain(spark, tmp_warehouse):
    """POST /tasks/ingest -> /tasks/transform -> /tasks/persist with
    data_id hand-off, GET /tasks/{id} polling between stages (reference
    api/main.py:267-401)."""
    from data_pipeline_platform_spark.api import PipelineService
    from data_pipeline_platform_spark.plans.runner import PipelineRunner
    from data_pipeline_platform_spark.sinks.writers import BatchWriter

    writer = BatchWriter(spark, base_path=tmp_warehouse)
    service = PipelineService(PipelineRunner(spark, writer=writer))

    sub = service.submit_ingest(
        {"path": "/root/testdata/sf0.001/nation.parquet", "format": "parquet"}
    )
    assert sub["status"] == "submitted" and sub["pipeline_id"] == "ingest_task"
    ing = _wait_task(service, sub["task_id"])
    assert ing["status"] == "completed"
    assert ing["result"]["row_count"] == 25
    data_id = ing["result"]["data_id"]
    assert data_id.startswith("data_")

    sub = service.submit_transform(
        data_id,
        {"type": "sql", "query": "SELECT n_regionkey, COUNT(*) AS n FROM input_data GROUP BY n_regionkey"},
    )
    tr = _wait_task(service, sub["task_id"])
    assert tr["status"] == "completed" and tr["result"]["row_count"] == 5
    assert tr["result"]["data_id"] != data_id

    sub = service.submit_persist(tr["result"]["data_id"], {"table": "per_region"})
    pe = _wait_task(service, sub["task_id"])
    assert pe["status"] == "completed" and pe["result"]["rows_written"] == 5
    assert writer.read_table("per_region").count() == 5
    service.shutdown()


def test_api_task_failures_and_unknown(spark):
    from data_pipeline_platform_spark.api import PipelineService
    from data_pipeline_platform_spark.plans.runner import PipelineRunner

    service = PipelineService(PipelineRunner(spark))
    # missing query/path rejected synchronously (api/main.py:275-279)
    with pytest.raises(ValueError, match="Query is required"):
        service.submit_ingest({})
    # unknown data_id fails the task with the reference's message
    sub = service.submit_transform("data_nope", {"type": "sql", "query": "SELECT 1"})
    st = _wait_task(service, sub["task_id"])
    assert st["status"] == "failed"
    assert "Data not found for data_id: data_nope" in st["error"]
    assert service.task_status("missing")["status"] == "unknown"
    service.shutdown()


def test_api_workers_health(spark):
    from data_pipeline_platform_spark.api import PipelineService
    from data_pipeline_platform_spark.plans.runner import PipelineRunner

    service = PipelineService(PipelineRunner(spark))
    out = service.workers_health(timeout=60.0)
    assert out["status"] == "healthy"
    assert out["result"]["is_healthy"] is True
    assert out["result"]["probe_rows"] == 1
    service.shutdown()


def test_cli_explain(spark, capsys):
    from data_pipeline_platform_spark.cli import main

    rc = main(["explain", "--list"])
    out = capsys.readouterr().out
    assert rc == 0 and "pricing_summary" in out

    rc = main(["explain", "pricing_summary"])
    out = capsys.readouterr().out
    assert rc == 0 and "Physical Plan" in out and "Exchange" in out

    rc = main(["explain", "no_such_query"])
    assert rc == 2


def test_api_health_probe_unaffected_by_saturated_pool(spark):
    """A busy pool must read as busy, not broken: with every worker
    occupied by a slow task, workers_health still succeeds because the
    probe runs on its own single-thread lane (r02 advisory: submitting
    the probe to the work pool reported 'unhealthy' under saturation)."""
    import threading

    from data_pipeline_platform_spark.api import PipelineService
    from data_pipeline_platform_spark.plans.runner import PipelineRunner

    service = PipelineService(PipelineRunner(spark), max_workers=2)
    gate = threading.Event()

    def _block():
        gate.wait(30)
        return {"status": "success"}

    # occupy both workers
    ids = [service._submit_task("ingest", _block)["task_id"] for _ in range(2)]
    try:
        out = service.workers_health(timeout=30.0)
        assert out["status"] == "healthy", out
        w = service.workers()
        assert w["running"] >= 0  # pool stats still served under load
    finally:
        gate.set()
    for t in ids:
        st = _wait_task(service, t)
        assert st["status"] == "completed"
    service.shutdown()


def test_http_server_end_to_end(spark, tmp_warehouse):
    """All ten routes over REAL HTTP (stdlib ThreadingHTTPServer):
    the transport seam fastapi's absence left untested. Mirrors the
    reference's route contract (api/main.py:117-455) including the
    422/400/404 error bodies."""
    import json as _json
    import threading
    import urllib.error
    import urllib.request

    from data_pipeline_platform_spark.api import build_http_server
    from data_pipeline_platform_spark.plans.runner import PipelineRunner
    from data_pipeline_platform_spark.sinks.writers import BatchWriter

    writer = BatchWriter(spark, base_path=tmp_warehouse)
    server = build_http_server(PipelineRunner(spark, writer=writer))
    base = f"http://127.0.0.1:{server.server_port}"
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    def call(method, path, body=None):
        req = urllib.request.Request(f"{base}{path}", method=method)
        data = None
        if body is not None:
            data = _json.dumps(body).encode()
            req.add_header("Content-Type", "application/json")
        try:
            with urllib.request.urlopen(req, data=data, timeout=30) as resp:
                return resp.status, _json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, _json.loads(e.read())

    def wait_task(task_id, timeout=60.0):
        import time

        deadline = time.time() + timeout
        while time.time() < deadline:
            code, st = call("GET", f"/tasks/{task_id}")
            assert code == 200
            if st["status"] != "pending":
                return st
            time.sleep(0.25)
        raise TimeoutError(task_id)

    try:
        code, root = call("GET", "/")
        assert code == 200 and root["status"] == "ok"
        code, health = call("GET", "/health")
        assert code == 200 and health["status"] == "healthy"
        code, workers = call("GET", "/workers")
        assert code == 200 and workers["max_workers"] >= 1
        code, wh = call("GET", "/workers/health")
        assert code == 200 and wh["status"] in ("healthy", "degraded")

        # full pipeline via POST /pipelines + status polling
        code, sub = call(
            "POST",
            "/pipelines",
            {
                "pipeline_config": {
                    "ingestion": {
                        "path": "/root/testdata/sf0.001/region.parquet",
                        "format": "parquet",
                    },
                    "persistence": {"table": "http_out", "strategy": "replace"},
                }
            },
        )
        assert code == 200 and sub["status"] == "submitted"
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            code, st = call("GET", f"/pipelines/{sub['pipeline_id']}/status")
            assert code == 200
            if st["status"] not in ("running", "submitted", "pending"):
                break
            time.sleep(0.25)
        assert st["status"] == "success" and st["result"]["row_count"] == 5

        # per-stage chain: ingest -> transform -> persist over HTTP
        code, ing = call(
            "POST",
            "/tasks/ingest",
            {"path": "/root/testdata/sf0.001/nation.parquet", "format": "parquet"},
        )
        assert code == 200
        ing_done = wait_task(ing["task_id"])
        assert ing_done["status"] == "completed"
        data_id = ing_done["result"]["data_id"]

        code, tr = call(
            "POST",
            "/tasks/transform",
            {
                "data_id": data_id,
                "transformation_config": {
                    "type": "sql",
                    "query": "SELECT n_regionkey, COUNT(*) AS n "
                    "FROM input_data GROUP BY n_regionkey",
                },
            },
        )
        assert code == 200
        tr_done = wait_task(tr["task_id"])
        assert tr_done["status"] == "completed" and tr_done["result"]["row_count"] == 5

        code, pe = call(
            "POST",
            "/tasks/persist",
            {"data_id": tr_done["result"]["data_id"], "table": "http_per_region"},
        )
        assert code == 200
        pe_done = wait_task(pe["task_id"])
        assert pe_done["status"] == "completed" and pe_done["result"]["rows_written"] == 5
        assert writer.read_table("http_per_region").count() == 5

        # error contract: 422 missing fields, 400 bad ingest, 404 route
        assert call("POST", "/pipelines", {})[0] == 422
        assert call("POST", "/tasks/transform", {"x": 1})[0] == 422
        assert call("POST", "/tasks/persist", {})[0] == 422
        code, err = call("POST", "/tasks/ingest", {})
        assert code == 400 and "Query is required" in err["detail"]
        assert call("GET", "/nope")[0] == 404
        # unknown ids answer, not 500 (reference api/main.py:241-249)
        code, st = call("GET", "/pipelines/zzz/status")
        assert code == 200 and st["status"] == "unknown"
        code, st = call("GET", "/tasks/zzz")
        assert code == 200 and st["status"] == "unknown"
    finally:
        server.shutdown()
        server.service.shutdown()


def test_fastapi_testclient_round_trip(spark, tmp_warehouse):
    """TestClient round-trip over create_app() covering the ten mirrored
    reference routes (api/main.py:117-455). Skips where fastapi is not
    installed (this container); runs under `pip install .[api]` — the
    stdlib-transport twin above keeps the HTTP seam exercised here."""
    fastapi = pytest.importorskip("fastapi")  # noqa: F841
    testclient = pytest.importorskip("fastapi.testclient")
    import time

    from data_pipeline_platform_spark.api import create_app
    from data_pipeline_platform_spark.plans.runner import PipelineRunner
    from data_pipeline_platform_spark.sinks.writers import BatchWriter

    writer = BatchWriter(spark, base_path=tmp_warehouse)
    app = create_app(PipelineRunner(spark, writer=writer))
    client = testclient.TestClient(app)

    assert client.get("/").json()["status"] == "ok"
    assert client.get("/health").json()["status"] == "healthy"
    assert client.get("/workers").json()["max_workers"] >= 1
    assert client.get("/workers/health").json()["status"] in ("healthy", "degraded")

    sub = client.post("/pipelines", json={"pipeline_config": {
        "ingestion": {"path": "/root/testdata/sf0.001/region.parquet",
                      "format": "parquet"},
        "persistence": {"table": "fa_out", "strategy": "replace"},
    }})
    assert sub.status_code == 200 and sub.json()["status"] == "submitted"
    pid = sub.json()["pipeline_id"]
    deadline = time.time() + 60
    while time.time() < deadline:
        st = client.get(f"/pipelines/{pid}/status").json()
        if st["status"] not in ("running", "submitted", "pending"):
            break
        time.sleep(0.25)
    assert st["status"] == "success" and st["result"]["row_count"] == 5

    ing = client.post("/tasks/ingest", json={
        "path": "/root/testdata/sf0.001/nation.parquet", "format": "parquet"})
    assert ing.status_code == 200
    tid = ing.json()["task_id"]
    deadline = time.time() + 60
    while time.time() < deadline:
        st = client.get(f"/tasks/{tid}").json()
        if st["status"] != "pending":
            break
        time.sleep(0.25)
    assert st["status"] == "completed"
    data_id = st["result"]["data_id"]

    tr = client.post("/tasks/transform", json={
        "data_id": data_id,
        "transformation_config": {
            "type": "sql",
            "query": "SELECT n_regionkey, COUNT(*) AS n "
                     "FROM input_data GROUP BY n_regionkey"}})
    assert tr.status_code == 200

    # error contract parity with the reference routes
    assert client.post("/pipelines", json={}).status_code == 422
    assert client.post("/tasks/transform", json={"x": 1}).status_code == 422
    assert client.post("/tasks/persist", json={}).status_code == 422
    bad = client.post("/tasks/ingest", json={})
    assert bad.status_code == 400 and "Query is required" in bad.json()["detail"]
    assert client.get("/pipelines/zzz/status").json()["status"] == "unknown"
    assert client.get("/tasks/zzz").json()["status"] == "unknown"


def test_cli_dq_gate(spark, tmp_path, capsys):
    """`pipeline-cli dq` runs a rules file against a parquet path,
    prints one JSON line per rule, and exits nonzero when a rule fails
    (the CI data-gate contract)."""
    import json as _json

    from data_pipeline_platform_spark.cli import main

    data = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(1, "US"), (2, "XX"), (2, "DE")], "id long, c string"
    ).write.parquet(data)
    rules = tmp_path / "rules.json"
    rules.write_text(
        _json.dumps(
            [
                {"rule": "not_null", "column": "id"},
                {"rule": "unique", "column": "id"},
                {"rule": "in_set", "column": "c", "values": ["US", "DE"]},
            ]
        )
    )
    rc = main(["dq", data, "--rules", str(rules)])
    out = [_json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rc == 1  # unique and in_set fail
    by_rule = {r["rule"]: r for r in out}
    assert by_rule["not_null"]["passed"] is True
    assert by_rule["unique"]["violations"] == 1
    assert by_rule["in_set"]["violations"] == 1

    ok_rules = tmp_path / "ok.json"
    ok_rules.write_text(_json.dumps([{"rule": "not_null", "column": "id"}]))
    assert main(["dq", data, "--rules", str(ok_rules)]) == 0
