package graft.tools

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.{Files, Paths}

import graft.{Sessions, SparkEntry}

/** Writes PLANS.md: the formatted physical plans of the representative
  * queries, as reviewable evidence of the scale properties the code
  * comments argue (pushdown, pruning, broadcast-vs-shuffle choice,
  * banded joins, window rewrites). Regenerate after plan-affecting
  * changes:  sbt "runMain graft.tools.PlanDump /root/testdata/sf0.1" */
object PlanDump {
  private val picks = Seq(
    "q01_pricing_summary"    -> "scan pushdown + pruning + partial/final decimal agg",
    "q03_region_revenue"     -> "star join: shuffled facts, broadcast dims",
    "q03b_bucketed_revenue"  -> "bucketed fact-fact SMJ: zero exchanges below the join",
    "q19_order_pairs_30d"    -> "range pair-count as a window, not a self-join",
    "q23_near_dup_minhash"   -> "banded LSH: equi-joins only, no cartesian",
    "q24_cosine_topk"        -> "broadcast query vectors + topk_by_score partial/final",
    "q24b_ann_lsh"           -> "LSH ANN: map-only sign-bit banding, broadcast multi-probe join, candidates-only scoring",
    "q57_codec_parity"       -> "five-codec parity union incl. the custom graftavro BatchScan (pruned reader schema)",
    "q37_asof_last_order"    -> "as-of composite: union + single keyed window",
    "q37b_asof_native"       -> "native as-of: AsOfJoinExec with planner-planted exchange/sort",
    "q55_pruned_year_revenue" -> "static partition pruning: PartitionFilters on the year layout",
    "q56_dpp_era_revenue"    -> "dynamic partition pruning: DynamicPruningSubquery reusing the dim broadcast",
    "q70_range_source"       -> "custom DSv2 source: exact pushed bounds + planning-time slice pruning",
    "q71_not_in_nulls"       -> "NOT IN three-valued logic as a null-aware broadcast anti join",
    "q75_lateral_topn"       -> "correlated LATERAL LIMIT decorrelated to WindowGroupLimit + broadcast join",
    "q85_recursive_tree"     -> "WITH RECURSIVE as UnionLoop: bounded work per level",
    "q86_null_safe_join"     -> "EqualNullSafe is an equi key: hash join, no BNLJ",
    "q93_cached_share"       -> "CACHE-once, read-twice: both consumers scan InMemoryTableScan, parquet scanned once",
    "q31d_video_decode"      -> "video decode: header-only avi_meta filter BELOW the avi_frames Generate fan-out",
    "q100_pipeline_e2e"      -> "end-to-end training-data funnel: scan-stage gates, WindowGroupLimit dedup, all-broadcast decontamination, one plan",
    "q102_semantic_dedup"    -> "semantic dedup: LSH bucket self-join (equi only), candidates-only cosine, keep-lowest window",
    "q24e_ann_sq8"           -> "SQ8 ANN: 1-row stats fanout, code-space dotq scan, topk heap merge, id-keyed exact rescore",
    "q103_kmeans_clusters"   -> "k-means: broadcast k-row centroids, codegen'd l2q assignment, O(k·64) shuffles per Lloyd round",
    "q105_semantic_dedup_kmeans" -> "verbatim SemDeDup: k-means blocking, cid-equi-keyed cluster self-join, candidates-only cosine",
    "q104_token_rarity"      -> "corpus-model join-back: broadcast vocab stats, map-side WindowGroupLimit per-lang tails",
    "q107_quality_classifier" -> "classifier inference: model folded into a scan-stage HOF — no Generate, no join, 2 exchanges",
    "q89b_bpe_trainer"       -> "BPE trainer final job: native bpe_merge over checkpointed words, merge-table join-back, explode only for the bounded final count",
    "q108_bigram_lm_score"   -> "bigram LM join-back: scan-stage bigram Generate, broadcast model, map-side WindowGroupLimit tails",
    "q89c_bpe_encode"        -> "tokenizer apply: 3 nested bpe_merge literals in one scan stage (word Generate + map), no join before the |langs|-row report",
    "q24f_ann_pq"            -> "PQ ANN: broadcast codebook training passes, LUT-as-literals ADC over 4-bit codes, id-keyed exact rescore",
    "q109_dsir_select"       -> "DSIR selection: fixed 64-row model broadcast join-back, TakeOrderedAndProject global top-k, reused scored exchange",
    "q110_incremental_dedup" -> "incremental dedup: batch-vs-corpus band equi-join, sorted_icount verify on candidates only, |sources|-row funnel",
    // round-14 ten (verdict item 4: the spec-pinned plans in reviewable
    // form) + round-15 compaction. The streaming entries (q110d/q110f/
    // q116b/q117b) are absent HERE because their returned DataFrames
    // are change-log sink reads (the q44 caveat) — their real per-batch
    // work is dumped from the RECORDED inner foreachBatch plans in the
    // streaming section below (round-15 verdict item 4).
    "q110c_index_append_cycle" -> "index append cycle: base∪delta union of pruned index scans, broadcast kept-id semis, delta segment written mid-query",
    "q110e_index_compaction" -> "index compaction: base∪delta folded into one segment, batch 2 reads a single pruned scan per relation — no delta anywhere",
    "q113_domain_mixture"    -> "DoReMi-lite mixture: |sources|-row broadcast plan join-back, scan-stage md5 accept coin",
    "q114_semantic_decontam" -> "semantic decontamination: benchmark side broadcast end-to-end, corpus map-only — no corpus-side shuffle",
    "q115_leakage_safe_split" -> "leakage-safe split: bounded min-label fixpoint, ONE cluster-label equi-join, scan-stage split rule",
    "q116_ingest_drift"      -> "ingest drift: one scan-stage carve, |sources|-row count_if aggregate, window over the bounded aggregated frame",
    "q117_ngram_novelty"     -> "n-gram novelty: broadcast batch gram set, ONE map-only semi-joined corpus pass — corpus never shuffles",
    "q118_boilerplate_prune" -> "boilerplate suppression: cross-doc min/max flag inside the one chunk_md5 exchange, zero extra shuffles",
    "q119_hard_negatives"    -> "hard-negative mining: banded LSH candidates, label gate BEFORE exact rescore, bounded topk_by_score heap",
    "q120_curriculum_pack"   -> "curriculum packing: value-based quartiles from a bounded histogram, stage-map broadcast, per-stage packing",
    "q121_alignment_audit"   -> "alignment audit: id equi-join, map-side contingency collapse, purity window on the bounded label frame",
    // round 16
    "q117c_gram_index_append" -> "cumulative gram append: one broadcast-semi probe feeds report AND delta write; batch 2 probes base∪delta union map-only")

  /** Streaming entries whose real work happens INSIDE foreachBatch
    * (the returned DataFrame is a sink read): running the query
    * records each micro-batch kernel's plan via
    * StreamingJobs.recordInnerPlan, and the sections below dump them —
    * the per-batch dedup/probe join shapes a 100 TB operator reads
    * first (round-15 verdict item 4). */
  private val streamPicks = Seq(
    "q110d_stream_index_dedup" -> "streaming incremental dedup — per-batch dedup vs base ∪ strictly-earlier deltas (`batch < id`), broadcast kept-id semis",
    "q110f_stream_compaction"  -> "streaming compaction, compact-every-k cadence (k=1 here) — batch 0 dedups vs base then folds; batch 1 scans the immutable fold=0 segment alone (no base, no delta)",
    "q116b_stream_drift"       -> "streaming drift — stateless |sources|-row count inside foreachBatch; corpus joined at read time",
    "q117b_stream_novelty"     -> "streaming novelty — bounded batch grams broadcast-semi against ONE pruned gram-index scan per batch",
    "q117d_stream_gram_append" -> "streaming cumulative gram append — per-batch probe of index ∪ strictly-earlier deltas (`batch < id`), novel grams appended as the batch's own segment",
    "q117e_stream_gram_compaction" -> "streaming gram compaction, compact-every-k cadence (k=1 here) — batch 0 probes the base gram index then folds; batch 1 probes the immutable fold=0 segment alone",
    "q122_stream_ingest_capstone" -> "streaming ingest capstone — ONE replay drain per batch: shared shingle pass feeds the dedup kernel AND the gram probe, both riding ONE compact-every-k fold cadence (k=1 here: batch 1's dedup and probe scan fold=0 segments alone)")

  /** Replace per-run /tmp scratch paths (Scratch.dir and the replay
    * temp dirs — `createTempDirectory(tag)` = tag + a random digit
    * run) with the stable `<tag>` placeholder, so regenerating
    * PLANS.md doesn't churn the diff with nondeterministic paths
    * (round-16 ADVICE item 4). The lookahead pins the digit run to the
    * END of the path component — tags like "graft-q110d-sink" keep
    * their interior digits. CONTRACT: temp-dir tags must not END in a
    * digit (the split between tag and random suffix would be
    * ambiguous and two tags could normalize to one placeholder —
    * review finding; "graft-replay4" was renamed for this). */
  private[tools] def normalizeScratch(text: String): String =
    text.replaceAll(
      "/tmp/(graft-[A-Za-z0-9.-]+?)\\d+(?![A-Za-z0-9.-])", "<$1>")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("graft-plandump")
    val out = new StringBuilder
    out ++= "# PLANS — formatted physical plans of representative queries\n\n"
    out ++= s"Generated by `graft.tools.PlanDump` over `$sfDir`. Reviewed\n"
    out ++= "evidence for the scale arguments in the query scaladocs; the\n"
    out ++= "machine-checked versions of these properties live in\n"
    out ++= "`PlanShapeSpec`.\n"
    picks.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val buf = new ByteArrayOutputStream()
      Console.withOut(new PrintStream(buf, true, "UTF-8")) {
        df.explain("formatted")
      }
      out ++= s"\n## $name — $why\n\n```\n${buf.toString("UTF-8").trim}\n```\n"
    }
    var streamSections = 0
    streamPicks.foreach { case (name, why) =>
      // building the DataFrame RUNS the replay (the q44 caveat), which
      // records each micro-batch kernel's plan as a side effect
      SparkEntry.queries(name)(spark, sfDir)
      val keys = graft.streaming.StreamingJobs.innerPlanKeys
        .filter(_.startsWith(name + " "))
      require(keys.nonEmpty, s"$name recorded no inner plans")
      out ++= s"\n## $name — $why (recorded inner foreachBatch plans)\n"
      keys.foreach { k =>
        val plan = graft.streaming.StreamingJobs.innerPlanOf(k).get.trim
        out ++= s"\n### $k\n\n```\n$plan\n```\n"
        streamSections += 1
      }
    }
    Files.writeString(Paths.get("PLANS.md"), normalizeScratch(out.toString))
    println(s"[plandump] wrote PLANS.md (${picks.size} plans + " +
      s"$streamSections streaming inner plans)")
    spark.stop()
  }
}
