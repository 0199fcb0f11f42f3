#!/usr/bin/env python
"""Model-evaluation example composing the r7b statistics wave: split the
corpus into content-addressed folds, score retrieval quality (MAP/MRR),
run distribution tests between event segments, calibrate a prediction
interval, and release a DP-noised summary — the evaluation half of a
training-data pipeline, end to end.

Run: python examples/model_eval_example.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_platform_spark import get_spark
from data_pipeline_platform_spark.functions.folds import (
    q_stratified_kfold,
    q_weighted_sample_aes,
)
from data_pipeline_platform_spark.functions.privacy import q_dp_noisy_counts
from data_pipeline_platform_spark.functions.ranktests import (
    q_ks_test,
    q_mann_whitney_u,
)
from data_pipeline_platform_spark.functions.regression import q_conformal_interval
from data_pipeline_platform_spark.functions.retrieval import q_retrieval_eval


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("model-eval-example")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. reproducible folds: the balance audit a trainer checks first
    folds = q_stratified_kfold(spark, sf_dir)
    print("fold balance (lang x fold doc counts):")
    folds.orderBy("lang", "fold").show(10, truncate=False)

    # 2. retrieval quality of the embedding space, label = relevance
    ev = q_retrieval_eval(spark, sf_dir)
    map10 = ev.selectExpr("avg(ap10) AS map10", "avg(rr) AS mrr").collect()[0]
    print(f"MAP@10 = {map10['map10']:.4f}  MRR = {map10['mrr']:.4f}")

    # 3. are event-type value distributions actually different?
    mwu = {(r.type_a, r.type_b): r.auc_a for r in q_mann_whitney_u(spark, sf_dir).collect()}
    ks = {(r.type_a, r.type_b): r.reject_95 for r in q_ks_test(spark, sf_dir).collect()}
    flagged = [p for p, rej in ks.items() if rej]
    print(f"KS rejects at 95%: {len(flagged)}/{len(ks)} pairs; "
          f"AUC range {min(mwu.values()):.3f}..{max(mwu.values()):.3f}")

    # 4. distribution-free error bars for the deployed predictor
    ci = q_conformal_interval(spark, sf_dir).collect()[0]
    print(f"conformal 90% interval: +/- ${ci.q_hat_cents / 100:.2f}, "
          f"realized coverage {ci.coverage:.3f}")

    # 5. weighted sample for human review, longest-docs-first bias
    sample = q_weighted_sample_aes(spark, sf_dir)
    print("review sample head:")
    sample.show(5, truncate=False)

    # 6. publish per-language counts through the Laplace mechanism
    print("DP release (eps=1):")
    q_dp_noisy_counts(spark, sf_dir).orderBy("lang").show(truncate=False)


if __name__ == "__main__":
    main()
