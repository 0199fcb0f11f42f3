"""Gap-fill regularization (functions/timeseries.py): dense calendar,
LOCF carry, leading NULLs, staleness ages — hand-computed."""

from data_pipeline_platform_spark.functions.timeseries import gapfill_locf


def test_gapfill_locf_hand_case(spark):
    daily = spark.createDataFrame(
        [("a", 1, 2, 10), ("a", 4, 1, 40), ("b", 3, 5, 30)],
        "g string, d long, n long, v long",
    )
    out = gapfill_locf(daily, "g", "d", ["v"], "n")
    rows = {
        (r["g"], r["d"]): (r["n"], r["v_locf"], r["observed"],
                           r["days_since_obs"])
        for r in out.collect()
    }
    # global grid: days 1..4 for BOTH groups
    assert len(rows) == 8
    assert rows[("a", 1)] == (2, 10, True, 0)
    assert rows[("a", 2)] == (0, 10, False, 1)
    assert rows[("a", 3)] == (0, 10, False, 2)
    assert rows[("a", 4)] == (1, 40, True, 0)
    # leading days before b's first observation: nothing to carry
    assert rows[("b", 1)] == (0, None, False, None)
    assert rows[("b", 2)] == (0, None, False, None)
    assert rows[("b", 3)] == (5, 30, True, 0)
    assert rows[("b", 4)] == (0, 30, False, 1)
