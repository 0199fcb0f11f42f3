"""Deterministic token-dropout augmentation (functions/augment.py)."""

from data_pipeline_platform_spark.functions.augment import token_dropout


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dropout_is_deterministic_and_seeded(spark):
    docs = _docs(spark, [(1, " ".join(f"w{i}" for i in range(200)))])
    a = token_dropout(docs, rate_pct=20, seed=7).collect()[0]
    b = token_dropout(docs, rate_pct=20, seed=7).collect()[0]
    assert (a["n_kept"], a["aug_text"]) == (b["n_kept"], b["aug_text"])
    # a different seed gives a different (independent) augmentation
    c = token_dropout(docs, rate_pct=20, seed=8).collect()[0]
    assert c["aug_text"] != a["aug_text"]
    # ~20% dropped, with generous slack at n=200
    assert 130 <= a["n_kept"] <= 190
    # kept tokens preserve original order
    kept = a["aug_text"].split(" ")
    idx = [int(t[1:]) for t in kept]
    assert idx == sorted(idx)


def test_rate_extremes(spark):
    docs = _docs(spark, [(1, "a b c d e")])
    keep_all = token_dropout(docs, rate_pct=0, seed=7).collect()[0]
    assert keep_all["n_kept"] == 5 and keep_all["aug_text"] == "a b c d e"
    drop_all = token_dropout(docs, rate_pct=100, seed=7).collect()[0]
    assert drop_all["n_kept"] == 0 and drop_all["aug_text"] == ""


def test_position_not_content_drives_dropout(spark):
    # identical tokens at different positions decide independently;
    # identical docs with the same id always agree
    docs = _docs(spark, [(5, "x x x x x x x x x x x x x x x x x x x x")])
    out = token_dropout(docs, rate_pct=50, seed=1).collect()[0]
    assert 0 < out["n_kept"] < 20
