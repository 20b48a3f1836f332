package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: dump `explain("formatted")` plans of representative
  * queries to docs/PLANS.md — the curated evidence that the plans we
  * claim (pushdown, broadcasts, WindowGroupLimit pruning, codegen
  * spans, id-only shuffles) are the plans Catalyst actually produces.
  * Regenerate with: sbt 'runMain graft.tools.PlanDump'
  */
object PlanDump {

  private val picks: Seq[(String, String)] = Seq(
    "q2_filter_project" ->
      "predicate + projection pushdown: PushedFilters and a pruned ReadSchema reach the parquet scan",
    "q5_local_supplier" ->
      "6-way join: constant dims (region/nation) hinted broadcast; customer/supplier scale with SF so AQE sizes those joins; the fact-fact join shuffles on its key",
    "q1_pricing_summary" ->
      "partial aggregation + whole-stage codegen over the scan",
    "window_topn" ->
      "WindowGroupLimit prunes per-group rows before the rank shuffle",
    "asof_join" ->
      "union + carry-forward as-of: ONE key shuffle, no cross product",
    "dedup_minhash" ->
      "ids-only band join behind the bloom pre-pass: definite-unique rows pruned map-side by a constant bloom, no signature arrays in any Exchange",
    "part_pagerank" ->
      "iterative rank: persisted edges, one dst-keyed shuffle per iteration, rank/deg joins AQE-sized (no forced broadcast of node-cardinality tables)",
    "ann_pq" ->
      "native pq_encode/pq_dist_table kernels: the corpus encode map stays inside whole-stage codegen (no 64 KB fallback)",
    "ann_lsh" ->
      "persisted corpus index + broadcast query side; candidate dedup on ids only",
    "embedding_covariance" ->
      "single-pass vec_cov_sum: ObjectHashAggregate partials, no row fan-out",
    "group_topk" ->
      "bounded-state top-k aggregate: partial buffers map-side, k rows/group/task shuffle",
    "cdc_materialize" ->
      "one hash partition by key; both windows share the exchange",
    "char_entropy" ->
      "native one-pass expression: a pure map over the scan, no char fan-out, only the output sort shuffles",
    "triangle_count" ->
      "degree-ordered orientation: three id-keyed hash joins, only (src, dst, rank) longs in the shuffles",
    "ann_topk_agg" ->
      "deep-shortlist shape: bounded-state top_k_by partials map-side, merge-only reduce — no window sort of the scored corpus",
    "bloom_prune_join" ->
      "explicit runtime filter: constant-bloom probe prunes the fact scan BEFORE the join shuffle; exact join settles false positives",
    "funnel_attribution" ->
      "ONE user-keyed window carries the whole last-touch computation (ignore-nulls frames) — no event-stream self-join",
    "gopher_rules" ->
      "native token_stats kernel: all four rule statistics from one codegen'd pass over the scan, zero shuffles before the presentation sort",
    "embedding_rp" ->
      "native rp_project kernel: the JL projection is a pure map fused into the scan (the HOF fold it replaced ran interpreted)",
    "ann_rp" ->
      "codebook-free cascade: 16-long sketch scan shortlists, original vectors re-read only for ~50 ids per query via hash join",
    "pareto_skyline" ->
      "O(n log n) skyline: strictly-cheaper dominance folded into ONE integer RANGE-frame running-min window — no O(n²) dominance self-join",
    "hits_scores" ->
      "normalized integer fixpoint: per-half-round persisted aggregate + literal max divisor (one 8-byte scalar to the driver per round) — the frame is referenced once, so no lineage cut, accurate cache stats, planner-sized score joins",
    "adamic_adar" ->
      "support-filtered wedge join: hub fan-out bounded by the repeat-pair backbone, only id/term longs in the shuffles",
    "text_fingerprint" ->
      "native rolling_hash kernel: the Rabin-Karp fold is a pure map inside the scan's codegen loop (the split/transform/aggregate HOF chain it replaced ran interpreted, one lambda frame per character)",
    "ks_test" ->
      "exact two-sample ECDF compare: one partial agg per group onto the 4dp grid, a GRID-cardinality running-sum window, then a 1-row max — raw events never shuffle",
    "cdc_replay_asof" ->
      "point-in-time replay: the offset cutoff (1-row broadcast) filters BEFORE the per-key window, so only the replayed prefix rides the shuffle",
    "anomaly_mad" ->
      "two-phase robust stats: per-group exact percentile aggregates (value-histogram state), group-stat frames broadcast back over the scan, integer-only outlier comparisons",
    "kmeans_train" ->
      "exact-integer Lloyd output: literal-centroid argmin fused into the cached scan (no explode for assignment), ONE cluster-keyed partial agg, model-sized centroid frame joined back",
    "graph_lpa" ->
      "weighted label propagation: dst-pre-partitioned edge cache — at scale each vote round shuffles only the node-cardinality label table (at this toy SF AQE instead broadcasts the 7 MiB cached edges, the size-based call); argmax is a map-side struct-max, no window",
    "embedding_communities" ->
      "LSH similarity graph + LPA: candidate pairs are ids-only through the bucket join and distinct; vectors re-join BY ID for the cosine edge; the propagation rounds read the edge cache",
    "bitext_mine" ->
      "margin mining: the source batch broadcasts against one corpus scan; per-endpoint neighborhoods via bounded-state top_k_by partials (no corpus-keyed window sort); 3-long pair rows in every exchange; TakeOrdered final cut",
    "seq_patterns" ->
      "sequential-pattern support: the user×type min/max aggregate is cached PRE-PARTITIONED on user_id, so both self-join sides read co-located partitions — the pair join is type-vocab² per user, never event-quadratic",
    "label_noise_detect" ->
      "kNN label voting on distinct-embedding class representatives behind the md5-smallest bucket cap (<=64 classes per LSH table/bucket — candidate budget cap^2/2 per bucket at ANY corpus size), members re-enter as k+1-id slices, bounded-state top_k_by, label joins by id",
    "spearman_corr" ->
      "rank correlation from the joint value grid: the corpus shuffles only (xq, yq) cell pairs; midrank cumsums read ≤50-row grids; every rank sum is exact DECIMAL(38,0) integer arithmetic",
    "dsir_weights" ->
      "hashed-ngram importance model: ONE (doc_id, bucket) partial-count exchange feeds both distributions (reused exchange) and the 256-row ln-ratio model broadcasts back over it — the corpus text never leaves its scan",
    "dedup_substring" ->
      "stride-1 window dedup: only (md5, packed-pos) pairs ride the keeper agg and fp join; the run merge is a doc_id-keyed window over that doc's duplicate offsets",
    "ann_eval" ->
      "oracle-exact recall@5: composes the LSH and brute-force parents, then joins only query-batch-sized top-5 frames",
    "classifier_auc" ->
      "exact AUC: one partial agg onto the score-domain grid, grid cumsum, integer rank-sum — the corpus contributes one scan per training round plus one scoring pass",
    "graph_powerlaw_fit" ->
      "CSN power-law MLE: one edge pass to node degrees, one distinct-degree grid agg; the KS window and the alpha totals both read the PERSISTED grid (InMemoryTableScan), so the edge pass runs once",
    "bootstrap_ci" ->
      "Poisson bootstrap: the x40 replicate fan-out explodes INSIDE the map-side partial aggregate — the exchange carries 40 rows per partition, never 40x the corpus; order stats and SE run on the 40-row replicate grid",
    "cdc_key_churn" ->
      "hot-key audit: one key-keyed partial agg collapses the changelog to key cardinality, the log2 bucketing re-aggregates to a <=64-row grid; cumulative shares are grid windows",
    "winnowing_fingerprint" ->
      "MOSS winnowing: the gram/window-min stage is RELATIONAL (posexplode + trailing-ROWS min — in-row array HOFs box the whole hash array per element and measured quadratic); the stop-fingerprint df-cap bounds the ids-only pair join to cap^2/2 per fingerprint",
    "ann_rptree" ->
      "RP-tree ANN: leaf routing is a map-only sign cascade over the write-once 7-plane model; the 4 probe rows per query broadcast into a leaf equi-join — the corpus is never crossed or shuffled; exact integer re-rank on the shortlist",
    "coverage_curve" ->
      "one-pass subsample coverage: each gram's SMALLEST occurrence percentile answers every sample rate, so one gram-keyed min aggregate (map-side partial) serves the whole 7-point curve — grams never re-explode per rate",
    "propensity_ipw" ->
      "stratified IPW: one orders aggregate to customers, one customer aggregate to the |segments| cell grid; weights are exact floor-divided DECIMAL(38,0) integers; one row out",
    "pca_projection" ->
      "PC1 projection: the 64-value integer eigenvector is a LITERAL inside the codegen'd vec_dot over the scan (every partial < 2^53 so the double accumulation is exact) — zero exchanges; the top-|score| cut is TakeOrderedAndProject, never a global sort",
    "gumbel_sample" ->
      "weighted sampling without replacement: ln(w) - ln(-ln u) keys from md5-derived 48-bit uniforms are a pure per-row map; the k-largest cut is TakeOrderedAndProject — zero shuffles at any corpus size",
    "countmin_topk" ->
      "Count-Min audit: one key-collapse aggregate, then the 4x|keys| bucket fan-out collapses map-side into the FIXED 1024-cell sketch (the mergeable-sketch property); the top-20 audit joins broadcast against the 1024-row counters",
    "conformal_calibration" ->
      "split-conformal thresholds: ONE (score,split) partial agg collapses the corpus to the <=1e6+1-value score grid; the order statistic comes from grid cumulative counts (no global sort) and the 3-alpha threshold join broadcasts",
    "hll_audit" ->
      "HyperLogLog audit: per column ONE map-side-combining 256-register aggregate (the mergeable-sketch property — partials are registers too); the exact side is one distinct+count, deliberately paid ONCE to calibrate the sketch; estimators are single divisions over exact integers",
    "context_length_sweep" ->
      "context-length economics: one token-count scan crossed with a BROADCAST 6-row grid, collapsed map-side to |grid| cells — the whole truncation-vs-packing tradeoff table for one corpus pass, no per-L rescan",
    "graph_ppr" ->
      "personalized PageRank: the chunked-adjacency list is built once and persisted; each iteration is probe -> explode -> partial agg with a LEFT join against the static degree table so frontier-absent seeds keep their teleport; only (node, pr) longs ride the loop shuffles",
    "basket_rules_3" ->
      "triple rules: Apriori item pre-prune (items in no support>=2 pair dropped by semi-join) BEFORE the C(k,3) fan-out from TWO nested suffix slices per sorted basket — never an |li|^3 self-join; the decorations join id-keyed grid aggregates",
    "rerank_prf" ->
      "two-stage retrieval: the QL first stage is the only corpus-scale work; the PRF centroid is a model-sized driver collect baked back as a LITERAL into the codegen'd vec_dot_l over the 20-row shortlist",
    "substring_longest_match" ->
      "fingerprint pyramid: all four doubling levels built inside ONE per-doc projection (zero shuffles); the single corpus-cardinality exchange keys (lvl, fp) counts and is REUSED by the join back",
    "ann_lsh_multiprobe" ->
      "multi-probe LSH: the SAME persisted corpus index as ann_lsh — only the broadcast query side fans out (k+1)x with the 1-flip probe buckets, so extra recall costs zero index build/storage and the candidate join stays ids-only",
    "matrix_profile_discords" ->
      "matrix profile: the all-pairs stage is keyed (type, offset) over the calendar-bounded daily grid — O(m^2) in SERIES length, invariant to corpus volume; everything upstream is the one shared partial-agg scan",
    "ann_ivf_sweep" ->
      "nprobe sweep: ONE widest-probe scored scan serves every sweep point (probe rank carried per candidate, narrower widths are filters); the exact reference is one corpus-linear full scan; output is |sweep| rows",
    "ann_ivf_incr" ->
      "incremental IVF maintenance: the batch assigns to FROZEN literal centroids inside one codegen'd scan (work ~ |batch|, never |corpus|); the old side contributes only its write-once model + k-row occupancy broadcast; merge receipt joins are broadcast-sized",
    "semdedup_paragraph" ->
      "paragraph semantic dedup: md5-routed integer term counts, 1024-row broadcast plane table, capped bloom-prepass band join — only (pid, tbl, bucket) longs in the candidate shuffles; exact cosine re-joins components BY ID on the capped pair set",
    "drift_retrain_gate" ->
      "drift-retrain loop: two (window, score)-keyed partial aggs collapse the corpus; PSI terms, breach rule, per-window conformal taus, and the in-force threshold window all run on |windows|x|bins| grids — raw docs never re-shuffle")

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get(4)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val sb = new StringBuilder
    sb.append("# PLANS — curated physical-plan evidence (generated)\n\n")
    sb.append(s"Source: `sbt 'runMain graft.tools.PlanDump'` over `$dir`.\n")
    sb.append("Each section: why this plan shape is the 100 TB-safe one, then the\n")
    sb.append("`explain(\"formatted\")` output Catalyst actually produced.\n")
    picks.foreach { case (name, why) =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n$why\n\n```\n$plan```\n")
    }
    Files.createDirectories(Paths.get("docs"))
    Files.write(Paths.get("docs/PLANS.md"),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[plandump] wrote docs/PLANS.md (${picks.size} plans)")
    spark.stop()
  }
}
