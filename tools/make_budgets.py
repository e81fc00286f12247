#!/usr/bin/env python3
"""Regenerate bench_budgets.json from clean-idle-machine Bench JSON lines.

Usage: python3 tools/make_budgets.py <bench_json_file>[,<file2>,...] <source_note>

TWO-RUN RULE (VERDICT r11 #7): pass at least two isolated clean runs,
comma-separated; each key's budget is the MAX across runs. The r11
betweenness episode showed single-run budgets are fragile — one lucky
measurement writes a ceiling the same code misses under ordinary
session-order variance. A single file still works (bootstrap), but the
source note should say why.

Reads the one-line {"queries": {key: sec, ...}} JSON the Bench main prints,
and writes bench_budgets.json with:
  - budgets_sec: one entry per non-family key (the measured time, floored
    at 0.05 s so a 0-ish measurement can't create an unmeetable budget);
  - families: the memoized clusters whose per-key times measure whichever
    member ran first (VERDICT r7: "budgets should bind family totals for
    the memoized clusters") — each family carries its member list and the
    SUM of member times as the budget.

BenchSpec asserts every SparkEntry.queries key appears in exactly one of
the two sections, so a new query without a budget fails CI until this is
re-run.
"""
import json, sys

# memoized clusters: one shared kernel (the CC label table) dominates; the
# first member to run pays it, the rest are cache reads — per-key budgets
# would encode bench ORDER, family totals don't.
FAMILIES = {
    "cc_labels": [
        "dedup_connected", "dedup_cluster_stats", "dedup_canonical_pick",
        "corpus_dedup_survivorship", "graph_component_density",
        "sample_dedup_weight",
    ],
    # Graph.lpaLabels is memoized the same way: whichever of the two
    # consumers runs first pays the 2-round LPA build
    "lpa_labels": ["graph_label_prop", "graph_modularity"],
    # TextOps.wordCounts: the corpus-linear explode+count is paid once by
    # whichever of the four consumers runs first; the rest read the
    # vocab-sized memo
    "word_counts": ["agg_countmin", "text_hapax_stats",
                    "text_template_mining", "text_doc_perplexity",
                    "text_perplexity_buckets", "corpus_quality_tradeoff"],
    # Dedup.simhashBanded: the FNV-per-token signature build is paid once
    # by whichever simhash consumer runs first
    "simhash_sig": ["dedup_simhash", "dedup_method_overlap",
                    "dedup_lsh_bucket_skew"],
    # Graph.dupPairs: the verified near-dup pair list is built once by
    # whichever wedge/closure query runs first; the other four read the
    # memoized cache
    "dup_pairs": ["graph_triangles", "graph_common_neighbors",
                  "graph_clustering_coeff", "graph_adamic_adar",
                  "graph_jaccard_linkpred"],
    # Aggregates.kmvMembers: the distinct + md5 membership table is paid
    # once by whichever sketch op runs first
    "kmv_sketch": ["agg_kmv_intersect", "agg_kmv_difference",
                   "agg_kmv_jaccard"],
    # Similarity.pqBest: the PQ encode (distance sweep + argmin) is paid
    # once by whichever PQ consumer runs first
    "pq_best": ["embedding_pq", "embedding_pq_distortion",
                "sim_pq_adc_topk", "sim_pq_recall_eval",
                "sim_ivfpq_topk", "sim_ivfpq_recall_eval"],
    # Similarity.signCodes: the O(N·16·d) sign-projection shuffle is paid
    # once by whichever binary-code consumer runs first
    "sign_codes": ["embedding_sign_lsh", "sim_hamming_topk_eval"],
    # Similarity.knnEdges: the corpus-wide IVF probe + cluster search that
    # builds the kNN graph is paid once by whichever graph consumer runs
    # first (the HNSW amortization shape)
    "knn_edges": ["embedding_knn_graph", "embedding_hubness",
                  "sim_graph_beam", "sim_graph_beam_recall"],
    # TrainPrep contamination_grams memo: the 5-gram explode over the
    # corpus is paid once by whichever contamination consumer runs first
    # (r13: the source matrix now rides the same memo)
    "contamination_grams": ["contamination_check", "decontaminate_apply",
                            "contamination_source_matrix"],
    # r13: Dedup.exactPairStats + Dedup.minhashPairs are memoized — the
    # inverted-index pair kernel and the banded-LSH verified pair list are
    # each paid once by whichever consumer runs first; every other member
    # reads the pinned pair tables. (dedup_method_overlap also rides both
    # but already sits in simhash_sig; cc_labels members ride minhashPairs
    # through the memoized label table they already share.)
    "dedup_pair_kernels": [
        "dedup_minhash", "dedup_cross_source", "dedup_split_leakage",
        "dedup_lsh_audit", "dedup_ngram_jaccard", "dedup_containment",
        "dedup_threshold_sweep", "dedup_pair_similarity_hist",
        "dedup_minhash_estimate", "dedup_weighted_jaccard",
        "dedup_editdist_blocked",
    ],
    # Windows.dayRevSeries memo: the zero-filled daily revenue series is
    # paid once by whichever forecasting consumer runs first
    "day_rev_series": ["forecast_backtest", "win_ar2_forecast"],
    # r14: Analytics.markovPairCounts — the corpus lag-window pass behind
    # the transition matrix is paid once by whichever markov key runs
    # first; the other two read the O(types²) memo
    "markov_pairs": ["events_markov", "events_markov_attribution",
                     "events_markov_stationary"],
    # Similarity.decimalVecs memo: the rounded-decimal vector projection
    # is paid once by whichever residual-fold consumer runs first
    "embedding_vecs_dec6": ["embedding_centroid_drift",
                            "embedding_outlier_dist"],
    # Similarity.ivfAssign memo (seed codebook): the corpus-wide
    # nearest-centroid argmin window is paid once by whichever IVF
    # consumer runs first (ivfpq/knn consumers sit in pq_best/knn_edges,
    # which pay their own dominant kernels)
    "ivf_assign": ["sim_topk_ivf", "sim_recall_eval", "sim_ivf_cell_skew",
                   "sim_ivf_rebuild_churn", "sim_range_search",
                   "sim_range_recall", "sim_ivf_nprobe_sweep",
                   # r13: the streaming ingest census reads the same
                   # memoized seed assignment
                   "stream_ann_ingest",
                   # r14: ivfTopK legs now share one scored-candidate
                   # memo per codebook (ivfScoredCands); rank_ndcg_eval
                   # calls ivfTopK and sorts alphabetically FIRST among
                   # the consumers, so it pays the assign + scored-cands
                   # builds in bench order
                   "rank_ndcg_eval"],
}

def main(bench_file, source_note):
    files = bench_file.split(",")
    if len(files) < 2:
        print("WARNING: single-run budgets are fragile (two-run rule); "
              "pass two comma-separated clean runs when possible",
              file=sys.stderr)
    runs = [json.load(open(f))["queries"] for f in files]
    keys = set(runs[0])
    for i, r in enumerate(runs[1:], 2):
        if set(r) != keys:
            raise SystemExit(f"run {i} key set differs from run 1: "
                             f"{set(r) ^ keys}")
    # max across runs: a budget must hold on an ordinary clean run, not
    # just the luckiest one
    times = {k: max(r[k] for r in runs) for k in keys}
    fam_keys = {k for ks in FAMILIES.values() for k in ks}
    missing = fam_keys - times.keys()
    if missing:
        raise SystemExit(f"family keys missing from bench run: {missing}")
    budgets = {k: round(max(v, 0.05), 3)
               for k, v in sorted(times.items()) if k not in fam_keys}
    families = {
        name: {"keys": ks,
               "budget_sec": round(sum(times[k] for k in ks), 3)}
        for name, ks in FAMILIES.items()}
    out = {
        "sf_dir": "/root/testdata/sf0.1",
        "source": source_note,
        "rule": "per-key: fail when measured > 2 * budget + 0.5s "
                "(retry floor 2.0s inside the full suite); family: fail "
                "when the member-time SUM > 2 * budget_sec + 2.0s",
        "families": families,
        "budgets_sec": budgets,
    }
    with open("/root/repo/bench_budgets.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"{len(budgets)} per-key budgets + "
          f"{sum(len(v['keys']) for v in families.values())} family keys "
          f"across {len(families)} families")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
