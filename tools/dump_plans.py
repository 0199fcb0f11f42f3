#!/usr/bin/env python
"""Regenerate PLANS.md: the executed physical plan of each headline
query at sf0.1, annotated with what to look for. Evidence that the
scale-critical plan properties (pushdown, broadcast, partial agg,
codegen) actually hold — run after changing any headline query.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NOTES = {
    "pricing_summary": "one exchange only (final group-by); partial_sum map-side; integer-cents sums in codegen",
    "revenue_by_segment_year": "customer broadcast — orders never shuffles for the join",
    "multi_join_revenue": "3 broadcast dims + 1 fact-fact join; single agg exchange",
    "filter_family": "PushedFilters on the scan; ReadSchema pruned to 5 of 11 columns",
    "window_rank": "agg shuffle then window shuffle (different keys — irreducible)",
    "upsert_merge": "left_anti + union, no cartesian",
    "curation_pipeline": "quality filters evaluated in the scan stage, no Python",
    "dedup_minhash_lsh": "ONE exchange builds (band,sig) posting lists; in-bucket pair expansion, never n^2",
    "training_data_pipeline": "quality filter in the scan stage; anti-joins for dedup/decontam; the three required exchanges only",
    "contamination_check": "shingle equi-join (no nested loop); distinct pushed below the join",
    "pack_sequences": "single window exchange; token counting stays in the scan stage",
    "pack_sequences_sharded": "lang-partitioned running-sum window; no single-partition exchange",
    "market_share": "TPC-H Q8 shape: every dim broadcast, single fact pass, one agg exchange",
    "product_profit": "TPC-H Q9 shape: part filter pushed to scan before the fact join chain",
    "rolling_30d_revenue": "RANGE frame over pre-aggregated days — window input is days, not rows",
    "full_outer_recon": "full-outer on keys = SortMergeJoin (no nested loop); aggregates pre-join",
    "events_retention": "one events scan feeds both cohort and activity sides via self-join on user",
    "important_parts": "TPC-H Q11 shape: ONE fact scan/agg; global total via window over the per-part frame",
    "promo_part_suppliers": "TPC-H Q20 shape: one (part,supp) agg exchange; ratio window on the aggregated frame",
    "waiting_suppliers": "TPC-H Q21 shape: double-correlated EXISTS collapsed to one agg + one window — no fact self-joins",
    "idle_customers": "TPC-H Q22 shape: broadcast scalar stats; anti-join on pre-distinct 1998 custkeys",
    "repetition_stats": "pure array-lambda projection — no hash/range exchange, zero Python",
    "gopher_quality_filter": "all five rules in one codegen'd projection over the scan",
    "unigram_logprob": "vocab-sized frequency table broadcast; scoring join shuffle-free; one doc_id re-agg",
    "bigram_logprob": "bigram table shuffle-joins (outgrows broadcast at web scale); unigram broadcasts twice",
    "dedup_bow": "row-local sort+hash key; one groupBy on a uniform 128-bit key",
    "dedup_keep_best": "cluster argmax window over the pair-derived (tiny) clusters frame",
    "events_anomaly": "one map-side-combinable moments pass; |users|-sized stats broadcast back — flagging shuffle-free",
    "corpus_report": "three shuffles: uniform BOW key, doc_id join-back, lang rollup; dup-key set broadcast",
    "events_ewma": "one user-keyed shuffle; the halving fold is row-local over each user's ordered events",
    "hll_distinct_users": "register build = map-side-combinable MAX agg; shuffle payload is m registers per group",
    "whiten_embeddings": "component vector enters as a broadcast literal; one row-local projection pass",
    "semantic_stratified_sample": "quantizer = two 16-row broadcast-scored scans; quota window partitions by cell",
    "semantic_dedup": "pair join keyed on cell — candidate set bounded by cell size, never corpus^2",
    # bpe_train_merges intentionally absent: its result frame is a
    # driver-local merge table (LocalTableScan — nothing to read); the
    # interesting plans are the per-step pair-count jobs over the
    # vocab-sized frame, documented in functions/bpe.py
    "events_multires_rollup": "one scan + Expand (3 grouping sets) -> single exchange; not three rollup jobs",
    "data_quality_report": "N rules = one conditional-agg pass; FK check is a key-pruned anti-join",
    "salted_skew_join": "salt changes the exchange keys only — graded equal to the plain join",
    "winnow_fingerprints": "all hashing in one scan-stage of higher-order exprs; doc-grain output",
    "multimodal_byte_features": "single ArrowEvalPython (mapInPandas) stage; blob never shuffles",
    "bpe_token_stats": "pure projection — no exchange at all",
    "quality_classifier": "classifier inference rides the scan: hash+weights+sum in one projection, no key shuffle",
    "fuzzy_contamination": "benchmark band keys broadcast; (band,sig) equi-join candidates; exact-Jaccard verify",
    "pagerank": "per-iteration equi-join + agg on node keys; pair set + edge+degree frame persisted once",
    "chunk_documents": "token-window chunking rides the scan: one explode, no key shuffle, no Python",
    "cms_heavy_hitters": "cell build map-side combinable (<= d*w rows); probe joins the broadcast sketch",
    "dup_span_fraction": "ONE gram-hash exchange (window census, no self-join); span fold in a doc-keyed window",
    "bloom_prune_join": "xxhash64 bit tests scan-side under the broadcast one-row filter; join sees survivors only",
    "dsir_importance_weights": "hashed censuses broadcast; scoring join shuffle-free; one doc_id re-agg",
    "bpe_encode_stats": "vocab-sized merge folds; word->length table broadcast; one doc_id agg exchange",
    "quantize_embeddings": "row-local codec + audit folds — no exchange at all",
    # r6 second wave
    "source_overlap": "corpus collapses to |sources|x64 rows in ONE map-side-combinable min-merge; pairwise runs on the signature frame",
    "cusum_changepoints": "one hourly-rollup exchange; both windows over the per-type hourly frame",
    "similar_parts_topk": "row-local basket pair expansion; degrees broadcast; rank window partitions by part",
    "vocab_growth": "one token-keyed min census; the only ordered window spans the constant 100-bucket frame",
    "pmi_cooccurrence": "window pairs generated row-locally (no positions self-join); unigram/total frames broadcast",
    "doremi_mixture_step": "vocab table broadcast; per-source agg then |sources|-row arithmetic",
    "dedup_span_clean": "same gram-census exchange as dup_span_fraction; rewrite is row-local after the starts collect",
    "dedup_containment": "stop-shingle-bounded inverted index; orientation picked row-locally; exact verify on candidates only",
    "knn_classify": "cell equi-join bounds candidates; both windows partition by vec_id",
    "embedding_outliers": "two map-side-combinable aggs + broadcast joins; z-test row-local, no window",
    "session_paths": "lead x2 over the session sort (no self-join); rank over the bounded path frame",
    "quality_ablation_report": "gate rides one codegen'd projection; unpivot row-local; 5-row reduce",
    "benford_check": "digit census map-side combinable; 9-row frame math row-local",
    "seasonality_decompose": "one date-keyed rollup; windows over the calendar-bounded daily frame",
    "tokenizer_fertility": "vocab-sized merge folds; word->length broadcast; |langs|-row reduce",
    # r6 third/fourth/fifth waves
    "char_entropy": "entropy fold is a pure row-local projection — no exchange at all",
    "language_confusion": "classifier rides the scan; matrix census map-side combinable; marginals broadcast",
    "holt_forecast": "one date-keyed rollup; the Holt fold runs over the collected calendar-bounded series",
    "ab_ttest": "one conditional-moments agg (map-side combinable); t/df math on a 1-row frame",
    "chi2_independence": "customer broadcast onto the fact scan; cell census map-side; marginals broadcast back",
    "cohort_ltv": "two user/cohort-keyed shuffles; cumulative window over the bounded cohort triangle",
    "bootstrap_ci": "B-way expansion is row-local and collapses map-side to B rows; CI ranks over the B-row frame",
    "km_survival": "user-keyed lifetime agg; at-risk and KM cumsums over the calendar-bounded hours frame",
    "user_features": "bounds agg + same-key join-back + one conditional agg; no window",
    "heldout_perplexity": "train vocab broadcast; held-out scoring join shuffle-free; one doc agg",
    "winsorize_events": "percentile bounds broadcast; capping row-local; no ordered window",
    "dedup_cluster_sizes": "two dimension-sized aggs over the clusters frame",
    "corpus_health_report": "all inputs reduce to |sources|-row frames before the joins",
    "contamination_span_fraction": "benchmark gram set broadcast semi-join; span fold in a doc-keyed window",
    "seasonal_cusum": "decompose subtree + prefix algebra over the calendar-bounded daily frame",
    "pca_variance_explained": "power-iteration subtree + one extra row-local trace pass (exact DECIMAL sums)",
    # r7 wave
    "dq_checks_orders": "all six content rules in ONE agg pass (distinct expand included); FK orphans via broadcast anti-join",
    "dq_profile_documents": "one-pass profile: every per-column stat rides a single agg; struct-array unpivot is row-local",
    "scd2_customer_dim": "delta batch broadcast against CURRENT rows only; one merge keyed (key, valid_from)",
    "record_linkage_parts": "ONE block-key equi-join; Jaccard via array built-ins in codegen — no UDF, no cross product",
    "kcenter_coreset": "k rounds of scan + TakeOrderedAndProject argmax; running min-dist column, localCheckpoint lineage",
    "mmr_rerank": "corpus cost = broadcast cosine top-N; MMR rounds on the bounded candidate frame",
    "hard_negatives": "label predicate in the scan stage; parallel TakeOrderedAndProject",
    "acid_change_feed": "diff reads only files added/removed between versions; full-outer on keys over the touched rows",
    "k_anonymity_customer": "one QI groupBy; exchange carries |classes| rows (QI domain, not table)",
    "events_in_busy_windows": "binned interval join: hash equi-join on bin + exact re-check, no nested loop",
    "label_noise_screen": "probes broadcast; one corpus scan; per-probe keyed window (never global)",
    "materialized_agg_orders": "map-side-combinable partials; merge rewrites only touched-group files",
    "augment_token_dropout": "pure row-local array lambdas — no exchange, no Python",
    "scd2_asof_enrichment": "key equi-join carries the selectivity; interval residual on bounded version chains",
    "copurchase_hops": "shrinking-frontier joins; anti-join visited; linear plan via localCheckpoint",
    "mann_whitney_u": "fact reduces ONCE to the cent-bin census; ranks/CDFs are windows over the bounded census, keyed per type-pair",
    "ks_test": "same census shuffle; sup-distance via keyed prefix windows, no global sort",
    "gini_by_nation": "per-customer rollup then dollar-bin census; pairwise-|diff| collapses to one per-nation prefix window",
    "retrieval_eval": "probes broadcast against one corpus scan; per-probe WindowGroupLimit top-10",
    "kneser_ney_bigram": "three combinable stat censuses; held-out scoring joins them (broadcast at this SF)",
    "theil_sen_trend": "calendar-bounded daily census self-join; medians are percentile aggregates, no ordered window",
    "label_propagation": "per-round edge join + (node,label) census + keyed argmax; localCheckpoint keeps the plan linear",
    "conformal_interval": "two-level census selection: dollar window bounded by price range/100, cent window <= 100 rows",
    "weighted_sample_aes": "row-local A-ES keys; TakeOrderedAndProject top-K, zero shuffles",
    "hashed_bow_vectors": "vocabulary-free: one explode + one combinable groupBy, no broadcast dictionary",
    "link_prediction_parts": "wedge join on the dimension-cardinality edge set; anti-join edges; orderBy/limit head",
    # r8 wave
    "important_parts": "per-part agg persisted (InMemoryTableScan x2); scalar total = 1-row agg broadcast back — no empty-partitionBy window funnel",
    "skyline_parts": "per-cent min census + exclusive running-min over the census; parts join the broadcast census — never the O(n^2) dominance self-join",
    "order_gap_islands": "customer-partitioned row_number window; two combinable groupBys; no global ordering",
    "mad_outliers": "two scalar percentile aggregates broadcast back (1-row frames); no window at all",
    "cdf_incremental_view": "CDF diff reads only entered/left files; silver fold merges only touched groups; marker rides the fold commit",
    "multimodal_container_metadata": "one Arrow-batched mapInPandas stage (build + parse); no shuffle before it",
    "ingest_roundtrip": "explicit-schema text scans; union + one agg exchange",
    # r8b wave
    "k_core": "per-round node-keyed degree census + two semi-joins on a monotonically shrinking edge frame; localCheckpoint per round",
    "hits_authority": "per half-step: one node-keyed join+agg over the PERSISTED edge list, 1-row max broadcast back; no 2^iters lineage replay",
    "textrank_keywords": "narrow zip_with tokenize; PageRank iterations touch only the vocabulary-bounded word graph",
    "matryoshka_recall": "one corpus scan x broadcast probe panel; both cosines per row JVM-side; keyed windows only",
    "rrf_fusion": "same scan shape as matryoshka_recall; fusion is per-row arithmetic + one keyed rank window",
    "decision_stump_price": "fact pass -> dollar-bin census; cumulative + gain scan run on the census; argmax via orderBy/limit 1",
    "acf_daily_revenue": "one date rollup; centering/lag joins on the calendar-bounded daily frame",
    # r8c/r8d wave
    "roc_auc_returns": "cent-census groupBy is the only fact shuffle; midrank windows partitioned by status over the census",
    "nation_shortest_path": "Bellman-Ford rounds as node-keyed min-agg joins; localCheckpoint keeps the plan linear in rounds",
    "table_fingerprint": "one map-side-combinable scan per table; 1-row unions, no data-row shuffle",
    "fk_orphan_profile": "distinct child keys anti-joined to parent keys per edge — keys move, rows never do",
    "join_skew_profile": "per-key size census then scalar percentile aggregates; report precedes the expensive join",
    "mutual_information_pairs": "one cell census per pair; MI arithmetic on the broadcast category-bounded frame",
    # r8e wave
    "keyness_dunning": "ONE token census shuffle; 1-row totals broadcast; row-local G2; TakeOrderedAndProject top-50 — no window",
    "js_divergence_sources": "(source,token) census is the single fact shuffle; token-keyed marginal join co-located with it; source totals broadcast",
    # r9 wave
    "hll_distinct_sources": "register build = ONE map-side-combinable (source,bucket) MAX shuffle; reduced payload |sources|x1024; estimator is census-sized arithmetic",
    "salted_skew_join_events": "SortMergeJoin keyed (user_id, salt) — hot key spreads over 8 partitions; phase-1 agg keeps the salt, final fold drops it; no broadcast, no rand",
}


def main() -> None:
    from data_pipeline_platform_spark.queries import all_queries
    from data_pipeline_platform_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    out = [
        "# PLANS — executed physical plans of the headline queries",
        "",
        f"Generated by `tools/dump_plans.py` at `{sf_dir}`. The annotations name",
        "the property each plan must keep; `tests/test_plan_quality.py` asserts",
        "them in CI form.",
        "",
    ]
    for name, note in NOTES.items():
        df = registry[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # finalize AQE plan
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep the operator tree, drop the verbose per-node detail section
        tree = plan.split("\n\n")[0]
        out += [f"## {name}", "", f"*{note}*", "", "```", tree, "```", ""]

    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(NOTES)} plans)")


if __name__ == "__main__":
    main()
