"""Privacy-risk analytics (functions/privacy.py): k-anonymity class
reports, l-diversity, and the generalization ladder."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_platform_spark.functions.privacy import (
    k_anonymity_classes,
    k_anonymize_ladder,
)


@pytest.fixture()
def tbl(spark):
    # QI = (zip, age_band); sensitive = diagnosis
    return spark.createDataFrame(
        [
            ("02138", "20s", "flu"),
            ("02138", "20s", "flu"),
            ("02138", "20s", "cold"),
            ("02139", "20s", "flu"),
            ("02139", "30s", "covid"),
            ("02139", "30s", "covid"),
        ],
        "zip string, age string, dx string",
    )


def test_classes_sizes_and_l_diversity(spark, tbl):
    out = {
        (r["zip"], r["age"]): r
        for r in k_anonymity_classes(tbl, ["zip", "age"], "dx", k=2).collect()
    }
    assert out[("02138", "20s")]["class_size"] == 3
    assert out[("02138", "20s")]["l_diversity"] == 2
    assert not out[("02138", "20s")]["at_risk"]
    # singleton class -> re-identifiable
    assert out[("02139", "20s")]["class_size"] == 1
    assert out[("02139", "20s")]["at_risk"]
    # homogeneity: big enough class but l = 1
    assert out[("02139", "30s")]["l_diversity"] == 1


def _ladder():
    return [
        ("fine", [F.col("zip").alias("qi1"), F.col("age").alias("qi2")]),
        ("zip_only", [F.col("zip").alias("qi1"), F.lit("*").alias("qi2")]),
        ("all", [F.lit("*").alias("qi1"), F.lit("*").alias("qi2")]),
    ]


def test_ladder_picks_first_qualifying_level(spark, tbl):
    out = k_anonymize_ladder(tbl, _ladder(), k=3).collect()
    # fine has a singleton; zip_only gives classes of 3 and 3
    assert {r["level"] for r in out} == {"zip_only"}
    assert sorted(r["class_size"] for r in out) == [3, 3]
    # k=2 qualifies at the finest level... no: fine has a size-1 class
    out2 = k_anonymize_ladder(tbl, _ladder(), k=1).collect()
    assert {r["level"] for r in out2} == {"fine"}


def test_ladder_exhausted_raises(spark, tbl):
    with pytest.raises(ValueError, match="no ladder level"):
        k_anonymize_ladder(tbl, _ladder(), k=100)
