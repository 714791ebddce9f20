package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** The determinism law behind the whole oracle strategy: results must be
  * IDENTICAL (values, not just sets) under different shuffle partition
  * counts — i.e. independent of physical parallelism. Exact-decimal
  * aggregation (Policy) is what makes this hold for float-derived
  * columns; this suite is the regression guard for it (SURVEY §5.B #3).
  */
class PartitionInvarianceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  // Queries chosen to cover: decimal agg, window, set ops, LSH join,
  // integer-quantized cosine, UDAF, as-of composite, simhash votes,
  // prefix-filtered similarity join, IVF argmax assignment, hash split,
  // running-prefix-sum packing, native sorted-merge as-of (round 6 —
  // the merge must not depend on how keys fall into partitions),
  // broadcast-semi decontamination, md5-Bernoulli mixture sampling.
  private val names = Seq(
    "q01_pricing_summary", "q08_segment_share", "q13_running_revenue",
    "q18_value_intersect", "q23_near_dup_minhash", "q24_cosine_topk",
    "q30_weighted_avg_price", "q37_asof_last_order", "q32_simhash_near_dup",
    "q45_ngram_jaccard", "q24d_ann_ivf", "q46_train_split",
    "q47_context_packing", "q37b_asof_native", "q52_decontamination",
    "q54_mixture_sampling",
    // round-6 second wave: decorrelated scalar subqueries (the rewrite
    // must not leak partition-dependent agg order), delta-merge partial
    // sums, size-blocked levenshtein join
    "q63_above_avg_orders", "q66_delta_merge", "q65_fuzzy_edit_dedup",
    // round-6 fourth/fifth wave: ordered string agg (collect_set order
    // is partition-dependent until array_sort pins it), log-free tfidf
    // ranking, array HOF folds over collect_list, custom DSv2 source
    "q72_string_agg", "q74_tfidf_top_terms", "q81_array_hof",
    "q70_range_source",
    // round-7 wave: recursive CTE (per-level frontier must not depend
    // on partitioning), null-safe join (NULL bucket hashes once per
    // side), collated grouping (collation-aware hash), stratified
    // md5-ranked sample (WindowGroupLimit local top-k must commute
    // with partitioning), BPE pair counts, pipe-syntax SQL UDF path
    "q85_recursive_tree", "q86_null_safe_join", "q87_collated_group",
    "q88_stratified_sample", "q89_bpe_pairs", "q90_pipe_sql",
    // round-8 wave: binary codec decodes reduce to exact integer sums
    // (must commute with partitioning), the persisted q93 summary is
    // hit from two consumers regardless of layout, the q94 MV fold's
    // partial aggregates must merge identically, LISTAGG's in-group
    // ORDER BY pins intra-group order under any shuffle
    "q31b_image_decode", "q31c_audio_decode", "q31d_video_decode",
    "q91_listagg", "q93_cached_share", "q94_incremental_mv",
    // round-10 wave: content-addressed chunk ids must not depend on how
    // documents fall into partitions; semantic dedup's LSH buckets,
    // planted-copy union and keep-lowest window must all commute with
    // partitioning; the KMV bottom-k (WindowGroupLimit partial limits
    // merging into one global rank) must yield the same v_k regardless
    // of which partition carried which hash
    "q101_doc_chunking", "q102_semantic_dedup", "q15c_distinct_parts_kmv",
    // q31e: the encode→resize→decode chain is per-row, but its integer
    // channel sums must merge identically under any partial-agg layout
    "q31e_image_resize",
    // q103: ITERATIVE determinism — the argmin (min(struct(d2,cid))
    // partial aggregates), the exact micro-sum centroid update, and the
    // second assignment must each commute with partitioning, or round-2
    // centroids would drift per layout and cascade
    "q103_kmeans_clusters",
    // q104: the corpus-frequency join-back — vocab counts and per-doc
    // int64 sums must merge identically under any partial-agg layout,
    // and the WindowGroupLimit local top-5 must commute with it
    "q104_token_rarity",
    // q24e: the global min/max stats, the integer code dots, and the
    // topk_by_score heap merges must all commute with partitioning —
    // a float min/max is partition-order-free, and everything after it
    // is exact integers + fixed-tree double arithmetic
    "q24e_ann_sq8",
    // q105: k-means blocking feeding a dedup — cluster assignment AND
    // the within-cluster pair set must be layout-independent end-to-end
    "q105_semantic_dedup_kmeans",
    // q106: the greedy budget fill — the per-source running token sum
    // (total-order window) and the kept-set cutoff must not depend on
    // which partition carried which document
    "q106_token_budget_select",
    // q107: map-only classifier inference — the per-document score is a
    // pure row function (no cross-row state at all), so only the report
    // aggregate's int64 partial sums can vary with layout; they must not
    "q107_quality_classifier",
    // q89b (round 11): the trainer's per-round argmax comes off a
    // partial-aggregated pair count — the driver-side merge table, and
    // with it every downstream fold, must be identical however pair
    // occurrences fall into partitions
    "q89b_bpe_trainer",
    // q24f (round 11): PQ training (min(struct) argmins + micro-sum
    // codebook update), the driver-collected LUT, the ADC lookups and
    // the topk heap merges must all commute with partitioning
    "q24f_ann_pq",
    // q109 (round 11): the two-model bucket counts, the per-doc int64
    // importance sums, and the GLOBAL top-100 rank (map-side
    // WindowGroupLimit merging into one partition) must all be
    // layout-independent, or the selected set itself would drift
    "q109_dsir_select",
    // q110 (round 11): min-hash family aggregates, the band equi-join's
    // candidate set, and the sorted collect_list arrays feeding the
    // sorted_icount verify must all commute with partitioning
    "q110_incremental_dedup",
    // q110b (round 12): same contract THROUGH the materialized index —
    // the parquet round-trip of bands/sets must not introduce any
    // layout sensitivity the in-query form lacks
    "q110b_indexed_dedup",
    // q110c (round 14): the append cycle adds a delta-segment WRITE in
    // the middle of the query — kept-set carve, the overwrite round
    // trip, and the base∪delta union must all commute with layout
    "q110c_index_append_cycle",
    // q110e (round 15): compaction adds a fold WRITE (base ∪ delta →
    // new base) between the two ingest steps — the folded segment's
    // content and the batch-2 dedup against it must not depend on how
    // either write's input fell into partitions
    "q110e_index_compaction",
    // q113 (round 14): integer mixture fitting — per-source counts,
    // the broadcast plan join-back, and the salted-md5 accept test
    // must be layout-independent or the sampled set itself drifts
    "q113_domain_mixture",
    // q114 (round 14): the bench×corpus LSH candidate set, the exact
    // integer cosines, and the min-bench attribution window must all
    // commute with partitioning
    "q114_semantic_decontam",
    // q115 (round 14): the CC fixpoint's min-label partial aggregates
    // and the cluster-keyed split assignment must be layout-independent
    // or documents would change splits per shuffle layout
    "q115_leakage_safe_split",
    // q116/q117 (round 14): the count_if partials, the unpartitioned
    // window over the aggregated frame, and the batch-gram semi/anti
    // chain must all commute with partitioning
    "q116_ingest_drift", "q117_ngram_novelty",
    // q118 (round 14): the min/max-over-chunk_md5 cross-doc flag and
    // the countDistinct(docs_affected) partials must commute with
    // layout or the boilerplate set itself would drift
    "q118_boilerplate_prune",
    // q119 (round 14): the LSH candidate distinct, the label-gated
    // scoring, and the topk_by_score heap merges must all commute
    // with partitioning (same contract as q24b plus the gate)
    "q119_hard_negatives",
    // q120 (round 14): the difficulty-histogram cumsum, the broadcast
    // stage map, and the ORDER-SENSITIVE per-stage prefix sum (total
    // order (difficulty, doc_id) is unique) must be layout-independent
    // or docs would change bins per shuffle layout
    "q120_curriculum_pack",
    // q121 (round 14): the cross-table id join, the contingency
    // partials, and the purity argmax (deterministic count-desc/lang-
    // asc tie-break) must commute with partitioning
    "q121_alignment_audit",
    // q110f (round 16): the mid-stream compaction fold and the batch-1
    // dedup against the compacted-only read must both commute with
    // layout — same contract as q110e, now through the checkpointed
    // streaming path (fresh scratch dirs per run, so the three layouts
    // never share state)
    "q110f_stream_compaction",
    // q117c (round 16): the probe semi/anti chain, the admitted-gram
    // delta round trip, and the base∪delta union probe must all
    // commute with partitioning or batch-2's novelty would drift
    "q117c_gram_index_append",
    // q117d (round 16): q117c's contract through the checkpointed
    // streaming path — per-batch segment/sink writes must carry no
    // layout sensitivity (fresh scratch dirs per run)
    "q117d_stream_gram_append",
    // q117e (round 17): q117d's contract plus the fold — the per-fold
    // segment membership and the fold-alone probe must commute with
    // layout or batch-1's novelty would drift
    "q117e_stream_gram_compaction",
    // q122 (round 17): the composed capstone — the shared shingle
    // pass, both delta families, both sinks and the read-time drift
    // join must all commute with partitioning; any layout sensitivity
    // in EITHER composed monitor would surface in the wide row
    "q122_stream_ingest_capstone")

  private def canonical(name: String): Seq[String] = {
    val df = Registry.byName(name).run(spark, dir)
    df.collect().map(_.toSeq.map {
      case null => "\\N"
      case d: Double => java.lang.Double.doubleToLongBits(d).toString
      case x => x.toString
    }.mkString("|")).toSeq
  }

  for (name <- names) test(s"$name is identical under 1, 4 and 13 shuffle partitions") {
    val results = Seq("1", "4", "13").map { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p)
      try canonical(name)
      finally spark.conf.set("spark.sql.shuffle.partitions", Sessions.cpus)
    }
    assert(results(0) === results(1))
    assert(results(1) === results(2))
  }
}
