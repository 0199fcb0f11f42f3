"""Bench harness robustness: one broken query must not zero the round's
perf signal (r4 post-mortem — an AnalysisException in query 13 of 14
aborted the whole run and discarded 12 completed timings)."""

import json

import bench


def test_bench_isolates_query_errors(spark, monkeypatch, capsys, tmp_path):
    def boom(_spark, _sf_dir):
        raise RuntimeError("deliberately broken")

    def ok(spark_, _sf_dir):
        return spark_.range(3)

    monkeypatch.setattr(bench, "HEADLINE", ["good_q", "broken_q", "also_good_q"])
    monkeypatch.setattr(
        "data_pipeline_platform_spark.queries.all_queries",
        lambda: {"good_q": ok, "broken_q": boom, "also_good_q": ok},
    )
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    # keep the round's real bench_detail files at the repo root intact
    # (r12 verdict #1: this test used to clobber it with fixture data)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DIR", str(tmp_path))
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "4")

    bench.main()

    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert isinstance(out["queries"]["good_q"], float)
    assert isinstance(out["queries"]["also_good_q"], float)
    assert str(out["queries"]["broken_q"]).startswith("ERROR: RuntimeError")
    assert out["errors"] == 1
    assert out["value"] > 0
    # the redirected side file landed in tmp_path, not the repo root —
    # stamped with the cpu count (r13 verdict #7: the driver's 8-core
    # scaling run used to overwrite the 32-core detail)
    detail = json.loads((tmp_path / "bench_detail_c4.json").read_text())
    assert set(detail["queries"]) == {"good_q", "broken_q", "also_good_q"}


def test_bench_headline_names_exist_in_registry():
    """A typo in HEADLINE silently becomes an ERROR entry per round —
    catch it at test time instead."""
    from data_pipeline_platform_spark.queries import all_queries

    registry = set(all_queries())
    missing = [q for q in bench.HEADLINE if q not in registry]
    assert missing == []


def test_bench_stdout_line_fits_driver_tail_window(
    spark, monkeypatch, capsys, tmp_path
):
    """The driver records only the last ~2000 chars of stdout; the
    bench line must fit (BENCH_r11/r12 recorded parsed=null because
    the full queries dict overflowed). With 120 registered queries the
    stdout line carries the top-50 slowest + errors + the rest as an
    aggregate, while the detail side file keeps everything."""
    import json as _json

    def mk(i):
        def q(spark_, _sf):
            return spark_.range(1)
        return q

    names = [f"headline_query_with_a_long_name_{i:03d}" for i in range(120)]
    registry = {n: mk(i) for i, n in enumerate(names)}
    monkeypatch.setattr(bench, "HEADLINE", names)
    monkeypatch.setattr(
        "data_pipeline_platform_spark.queries.all_queries", lambda: registry
    )
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DIR", str(tmp_path))
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "4")

    bench.main()

    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(line) <= 2000, len(line)
    out = _json.loads(line)
    assert out["n_queries"] == 120
    assert 0 < len(out["queries"]) <= 50
    assert isinstance(out["others_total"], float)
    # the side file still has every query at full precision
    detail = _json.loads((tmp_path / "bench_detail_c4.json").read_text())
    assert len(detail["queries"]) == 120
    # total includes the omitted entries, not just the printed ones
    assert out["value"] >= sum(
        v for v in out["queries"].values() if isinstance(v, float)
    ) - 0.5
