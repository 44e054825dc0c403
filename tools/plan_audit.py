"""Physical-plan anti-pattern audit over every registered query.

Renders each queries() entry's formatted physical plan at a small
fixture and flags the operators that do not survive a 100 TB scale-up:

- CartesianProduct          unpartitioned all-pairs; never acceptable
- BroadcastNestedLoopJoin   acceptable ONLY when the broadcast side is
                            provably tiny (documented allowlist below)
- BatchEvalPython           row-at-a-time Python UDF on the hot path
- ArrowEvalPython /         Python with Arrow batching — acceptable only
  FlatMapGroupsInPandas /   where no native expression exists
  MapInPandas               (multimodal feature extraction)

The allowlist is part of the contract: every entry names the design
that justifies the operator, so a NEW query acquiring one of these
nodes fails tests/test_plans.py::test_no_unexpected_plan_antipatterns
until it is either re-planned or explicitly justified here.

Usage: python tools/plan_audit.py [sf_dir]   (default sf0.001; prints
one line per flagged query and exits non-zero on unexpected flags)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (query, node) pairs that are deliberate, documented designs.
ALLOWED = {
    # broadcast top-k/cross designs: the broadcast side is the N_QUERIES
    # query vectors or an O(1) aggregate — tiny by construction
    ("similarity_topk_bruteforce", "BroadcastNestedLoopJoin"),
    ("similarity_ann_recall", "BroadcastNestedLoopJoin"),
    ("similarity_ivf_recall", "BroadcastNestedLoopJoin"),
    # quantized brute-force recall: broadcast(N_QUERIES quantized
    # vectors) x corpus on <> — same deliberate baseline shape as
    # similarity_topk_bruteforce, on 4x narrower codes
    ("similarity_quantize_recall", "BroadcastNestedLoopJoin"),
    # IVF-SQ8 recall: the loop join is the EXACT arm (the same
    # broadcast(N_QUERIES) x corpus baseline every recall metric
    # embeds); the quantized-IVF arm under test is cell equi-join only
    ("similarity_ann_quantized", "BroadcastNestedLoopJoin"),
    ("join_cross", "BroadcastNestedLoopJoin"),  # the cross-join surface itself
    ("q22_dormant_customers", "BroadcastNestedLoopJoin"),  # scalar-threshold broadcast
    ("q11_important_parts", "BroadcastNestedLoopJoin"),    # scalar-threshold broadcast
    ("q15_top_supplier", "BroadcastNestedLoopJoin"),       # max-scalar broadcast
    ("agg_approx_bounds", "BroadcastNestedLoopJoin"),      # O(1) bounds row
    # quartile cutpoints: broadcast 1-row percentile aggregate (the
    # scale-correct form of ntile(4) — text.py quality_bins docstring)
    ("text_quality_binning", "BroadcastNestedLoopJoin"),
    ("agg_approx", "BroadcastNestedLoopJoin"),             # O(1) bounds row
    ("dq_audit_orders", "BroadcastNestedLoopJoin"),        # O(1) stats-row assembly
    ("subquery_scalar", "BroadcastNestedLoopJoin"),        # scalar subquery
    # broadcast 1-row total_docs aggregate (the oracle's CROSS JOIN n
    # mirrored) replacing a per-plan-construction driver count (r8)
    ("text_tfidf_top_terms", "BroadcastNestedLoopJoin"),
    # unigram-LM logp table: broadcast 1-row corpus-total aggregate
    # against the |vocab|-row counts frame (text.py perplexity_proxy
    # docstring) — same O(1)-row shape as tfidf's total_docs
    ("text_perplexity_proxy", "BroadcastNestedLoopJoin"),
    # temperature mixture: broadcast 1-row grand-total and 1-row c_max
    # aggregates against the |hosts|-row weight table (sampling.py
    # domain_reweight docstring) — same shape as sample_corpus_mix
    ("sample_domain_reweight", "BroadcastNestedLoopJoin"),
    # 3-row band table broadcast against the fact scan: the interval
    # predicate is the query's entire point, and the fact side never
    # shuffles (relational.py join_nonequi_range docstring)
    ("join_nonequi_range", "BroadcastNestedLoopJoin"),
    # skew plan's phase-1: broadcast 1-row frequency-stats join (the
    # data-derived hot threshold) + broadcast hot-key membership
    # ANNOTATION joins (skew.py hot_keys/salted_join_hotkey) — both
    # broadcast sides are O(1)/O(hot keys); the fact tables hash-join
    ("join_salted_skew", "BroadcastNestedLoopJoin"),
    # centroid assignment: corpus x broadcast(n_cells centroids) — at
    # 100 TB centroids are trained offline and stay broadcast-sized
    # (similarity.py IVF docstring)
    ("similarity_ann_ivf", "BroadcastNestedLoopJoin"),
    # RRF fusion reuses the IVF branch's broadcast centroid assignment
    ("similarity_rrf_fusion", "BroadcastNestedLoopJoin"),
    # SemDeDup clusters with the same broadcast centroid assignment;
    # the pair compare itself is an equi-join on cell_id
    ("dedup_semantic", "BroadcastNestedLoopJoin"),
    # Python-with-Arrow where no native expression exists (SURVEY §2.2
    # UDF posture): multimodal feature extraction over binary payloads
    ("multimodal_blob_metadata", "ArrowEvalPython"),
    ("multimodal_blob_metadata", "MapInPandas"),
    ("multimodal_blob_metadata", "FlatMapGroupsInPandas"),
    # nearest-neighbor image resize: pixel-block manipulation has no
    # native expression — numpy over Arrow batches is the design
    # (llm_ops/multimodal.resize_images docstring)
    ("multimodal_resize", "MapInPandas"),
    ("multimodal_resize", "ArrowEvalPython"),
    # perceptual image hash: pixel decode -> 64-bit dHash has no
    # native expression — numpy over Arrow batches, then the banded
    # hamming join is pure built-ins (llm_ops/multimodal.image_dhash)
    ("dedup_image_dhash", "MapInPandas"),
    ("dedup_image_dhash", "ArrowEvalPython"),
    ("dedup_image_clusters", "MapInPandas"),
    ("dedup_image_clusters", "ArrowEvalPython"),
    # ANN index append: corpus x broadcast(n_cells frozen centroids),
    # the same deliberate design as similarity_ann_ivf's assignment
    ("similarity_index_update", "BroadcastNestedLoopJoin"),
    # ANN index delete: the takedown itself is a hash anti-join, but
    # the index(t+1) it deletes from is built by the same broadcast
    # centroid assignment as the append row above
    ("similarity_index_delete", "BroadcastNestedLoopJoin"),
    # corpus mix: the 1-row c_max feasibility scalar broadcast onto
    # the |sources|-row rate table (sampling.sample_corpus_mix)
    ("sample_corpus_mix", "BroadcastNestedLoopJoin"),
    # pre-staged for the deferred-registration queue (COVERAGE.md
    # round-15 note; names fixed here so registration can't drift):
    # DSIR's 1-row corpus-totals broadcast onto the DSIR_BUCKETS-row
    # log-ratio table, and epoch planning's 1-row source-count
    # broadcast — both the same O(1)-row shape as tfidf/perplexity.
    # Verified r15 extended session: these are the ONLY flagged nodes
    # in any pre-built plan (soft_dedup_weights / c4_rules are clean).
    ("sample_dsir_importance", "BroadcastNestedLoopJoin"),
    ("sample_epoch_plan", "BroadcastNestedLoopJoin"),
    # CCNet bucketing: the 2-number tertile-cutpoint aggregate
    # broadcast back — quality_bins' exact idiom, plus the nested
    # perplexity plan's own allowlisted 1-row totals broadcast
    ("text_ccnet_bucket", "BroadcastNestedLoopJoin"),
    # curriculum quality mix: inherits text_quality_binning's 3-number
    # percentile-cutpoint broadcast (the scalar-threshold idiom); the
    # mix itself adds only a map-side filter + 4-row audit aggregate
    ("sample_quality_mix", "BroadcastNestedLoopJoin"),
    # pre-staged for the round-16 deferred-registration queue
    # (COVERAGE.md round-16 note; names fixed here so registration
    # can't drift — the r15 discipline):
    # purged temporal holdout: the 2-number min/max time-range
    # aggregate broadcast back (the scalar-threshold idiom)
    ("sample_temporal_holdout", "BroadcastNestedLoopJoin"),
    # PQ: corpus x broadcast(M x codewords codebook) assignment and
    # queries x broadcast(codebook) LUT — both broadcast sides are
    # O(M x codewords) frozen training rows, the similarity_ann_ivf
    # centroid shape (similarity.py pq_codes/ann_topk_pq docstrings)
    ("similarity_ann_pq", "BroadcastNestedLoopJoin"),
    # pre-staged for the round-18 deferred-registration queue
    # (COVERAGE.md round-17 note; name fixed here so registration
    # can't drift): IVF-PQ inherits BOTH parents' deliberate crosses —
    # queries x broadcast(n_cells frozen centroids) routing and the
    # PQ codebook assignment/LUT crosses above (text_embed_hash, the
    # other r18 queue member, has a clean explode/agg/join plan and
    # needs no row)
    ("similarity_ann_ivfpq", "BroadcastNestedLoopJoin"),
    # registered r18: broadcast(N_QUERIES generated vectors) x corpus
    # on <> — the similarity_topk_bruteforce baseline shape over the
    # engine-generated embed-hash vectors (similarity.embed_hash_topk
    # docstring; the IVF/LSH/PQ tiers are the corpus-contact path)
    ("similarity_embed_hash_topk", "BroadcastNestedLoopJoin"),
    # Python-with-Arrow where no native expression exists: audio
    # header decode over binary payloads (multimodal.audio_metadata)
    ("multimodal_audio_metadata", "MapInPandas"),
    ("multimodal_audio_metadata", "ArrowEvalPython"),
    # pre-staged for the round-19 deferred-registration queue
    # (COVERAGE.md round-18 note; name fixed here so registration
    # can't drift): the ISO-BMFF box walk over binary payloads is the
    # same no-native-expression class as the audio row above
    ("multimodal_video_metadata", "MapInPandas"),
    ("multimodal_video_metadata", "ArrowEvalPython"),
    # pre-staged r19 (same note): the recall metric embeds BOTH
    # certified arms — the brute-force exact baseline's broadcast
    # cross AND the IVF-PQ chain's centroid/codebook crosses
    ("similarity_ivfpq_recall", "BroadcastNestedLoopJoin"),
    # pre-staged r19: the Lloyd step's assignment is the certified
    # corpus x broadcast(n_cells frozen centroids) cross
    # (similarity_ann_ivf's exact shape); the mean recompute itself
    # is one (cell, dim)-keyed hash-aggregate
    ("similarity_kmeans_refine", "BroadcastNestedLoopJoin"),
    # pre-staged for the round-19 deferred-registration queue, second
    # tranche (COVERAGE.md round-18-extended note; names fixed here so
    # registration can't drift): the AVI/MKV container walk over
    # binary payloads is the same no-native-expression class as the
    # audio/video rows above. The other three tranche members
    # (events_attribution, events_anomaly_mad, text_bpe_pair_counts)
    # have clean equi-join/hash-aggregate plans — verified flagless at
    # sf0.1 in the r18 extended session — and need no row.
    ("multimodal_container_metadata", "MapInPandas"),
    ("multimodal_container_metadata", "ArrowEvalPython"),
    # pre-staged for the round-20 deferred-registration queue
    # (COVERAGE.md round-18-extended note; name fixed here so
    # registration can't drift): the BPE merge argmax is a 1-row
    # aggregate broadcast over the |vocab|-row frame — the
    # scalar-threshold idiom (sample_corpus_mix's shape). Its queue
    # sibling events_path_transitions has a clean window +
    # hash-aggregate + hash-join plan (verified flagless) and needs
    # no row.
    ("text_bpe_merge_step", "BroadcastNestedLoopJoin"),
    # pre-staged r20 (same note): the power step's uniform start
    # vector is a 1-row aggregate broadcast onto the |types|^2
    # transition matrix — the scalar-threshold idiom again
    ("events_markov_stationary", "BroadcastNestedLoopJoin"),
}

NODES = (
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
)

# Queries whose CONSTRUCTION executes jobs (real streams, iterative
# convergence loops): planning them is not side-effect-free, so the
# audit runs them at the smoke fixture where that execution is cheap.
EXECUTES_ON_BUILD = {"stream_batch_parity", "stream_dedup_parity",
                     "stream_incremental_dedup",
                     "stream_stateful_profile_parity",
                     "stream_index_update_parity",
                     "stream_ann_index_parity",
                     "stream_index_delete_parity",
                     "stream_ann_index_delete_parity",
                     "stream_late_data_parity",
                     "stream_late_sliding_parity",
                     "stream_dedup_expiry_parity",
                     "stream_index_multi_tick_parity",
                     "dedup_index_compact",
                     "dedup_components", "dedup_clusters",
                     "dedup_image_clusters",
                     # r16 review: the end-to-end verdict runs the
                     # same connected-components convergence loop on
                     # construction (real actions + localCheckpoint
                     # truncation) as the three rows above
                     "dedup_minhash_keep_representative",
                     # r18 registrations: both run a real availableNow
                     # stream + replay probe on construction
                     "stream_bloom_bits_parity",
                     "stream_embed_hash_parity",
                     # pre-staged for the r20 queue (COVERAGE.md
                     # round-18-extended note): runs a real
                     # availableNow two-tick stream + replay probe on
                     # construction, like the two r18 rows above
                     "stream_path_transitions_parity"}


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def audit(spark, sf_dir: str, names=None) -> list[tuple[str, str]]:
    """Returns [(query, node)] for every unexpected anti-pattern."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    flags: list[tuple[str, str]] = []
    for name in (names or qs):
        plan = formatted_plan(qs[name](spark, sf_dir))
        for node in NODES:
            if node in plan and (name, node) not in ALLOWED:
                flags.append((name, node))
    return flags


def main() -> int:
    from coursera_etl_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    flags = audit(spark, sf_dir)
    for name, node in flags:
        print(f"FLAG  {name}: {node}")
    print(f"{len(flags)} unexpected anti-pattern(s)")
    return 1 if flags else 0


if __name__ == "__main__":
    sys.exit(main())
