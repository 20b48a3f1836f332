package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Corpus-curation operators a training-data pipeline runs between raw
  * ingest and tokenization: benchmark decontamination, context-window
  * chunking, and quality-percentile bucketing.
  *
  * Scale design notes per operator are on each method; the common theme
  * is that the corpus side never shuffles wide rows — benchmark state is
  * broadcast, chunking is a pure map, and bucketing aggregates fixed-size
  * per-bucket rows.
  */
object Curation {

  /** Non-empty whitespace-separated tokens. */
  private def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  private val GramN = 3

  /** Benchmark decontamination: flag corpus documents that share any
    * n-token n-gram with an evaluation set, the standard leak check run
    * before training (the eval set here is the deterministic pseudo-set
    * `doc_id % 97 = 0`; in production it is MMLU/GSM8K et al.). Gram
    * width 3 on this corpus's 31-word vocabulary gives the same hit
    * selectivity real pipelines get from 13-grams on open vocabulary.
    *
    * Scale: eval sets are tiny (≤ millions of grams) — their distinct
    * gram table BROADCASTS, so the corpus side is scan → explode →
    * broadcast-hash semi-probe with no shuffle of document text; only
    * the (doc_id, hit) pairs that survive the probe reach the final
    * doc_id aggregate. Corpus grams are deduped per-doc before the probe
    * so the aggregate's count is distinct-hit count without a distinct.
    */
  /** Per-doc distinct gram table (doc_id, grams, n_grams) from any
    * (doc_id, text) frame — narrow expressions only, so it applies to a
    * streaming frame unchanged (see StreamQueries.streamDecontam).
    * Split across two projections: in a single select the two gram
    * references would each re-run the transform (CollapseProject
    * inlines aliases per use).
    */
  private[graft] def gramTable(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).as("n"))
    base.select(col("doc_id"),
        when(col("n") >= GramN,
          array_distinct(transform(sequence(lit(1), col("n") - (GramN - 1)),
            i => concat_ws(" ", slice(col("t"), i, lit(GramN))))))
          .otherwise(array().cast("array<string>")).as("grams"))
      .select(col("doc_id"), col("grams"), size(col("grams")).as("n_grams"))
  }

  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // both the bench and corpus branches read this — persist, or each
    // branch re-tokenizes and re-shingles the full corpus
    val withGrams = gramTable(Tables.documents(spark, dir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bench = withGrams.filter($"doc_id" % 97 === 0)
      .select(explode($"grams").as("gram")).distinct()
    val corpus = withGrams.filter($"doc_id" % 97 =!= 0)
    Release.checkpointed(
      corpus.select($"doc_id", $"n_grams", explode($"grams").as("gram"))
        .join(broadcast(bench), "gram")
        .groupBy($"doc_id")
        .agg(max($"n_grams").as("n_grams"), count(lit(1)).as("n_hits"))
        .select($"doc_id", $"n_grams", $"n_hits",
          round($"n_hits".cast("double") / $"n_grams".cast("double"), 6)
            .as("hit_ratio"))
        .orderBy($"doc_id"),
      withGrams)
  }

  val decontaminateSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    s"""WITH t AS (
      |  SELECT doc_id, $toks AS t, len($toks) AS n FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    CASE WHEN n >= 3 THEN list_distinct(
      |      [array_to_string(t[i:i+2], ' ') FOR i IN range(1, n - 1)])
      |    ELSE [] END AS grams
      |  FROM t),
      |bench AS (
      |  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0),
      |hits AS (
      |  SELECT c.doc_id, max(c.n_grams) AS n_grams, count(*) AS n_hits
      |  FROM (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram
      |        FROM g WHERE doc_id % 97 <> 0) c
      |  JOIN bench ON c.gram = bench.gram
      |  GROUP BY c.doc_id)
      |SELECT doc_id, CAST(n_grams AS INT) AS n_grams,
      |  CAST(n_hits AS BIGINT) AS n_hits,
      |  round(CAST(n_hits AS DOUBLE) / CAST(n_grams AS DOUBLE), 6) AS hit_ratio
      |FROM hits ORDER BY doc_id""".stripMargin
  }

  /** Span-level contamination report: WHERE inside each corpus document
    * the benchmark overlap sits, as token intervals. [[decontaminate]]
    * answers "which documents leak"; this answers "which spans" — the
    * shape needed to surgically excise quoted benchmark text instead of
    * dropping whole documents (and to distinguish a verbatim block from
    * scattered common phrases). Matched 3-gram start positions are
    * grouped into maximal runs (gaps-and-islands: pos − row_number per
    * doc is constant within a consecutive run), each emitted as
    * [span_start, span_end] token coverage plus its gram-hit count.
    *
    * Scale: same broadcast-probe shape as [[decontaminate]] — corpus
    * text never shuffles; only matched (doc_id, pos) int pairs reach
    * the island window, keyed by doc_id. All arithmetic is integer set
    * algebra; the oracle mirrors it bit-identically.
    */
  def docSpanOverlaps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", tokens($"text").as("t"))
      .withColumn("n", size($"t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grams = toks.filter($"n" >= GramN)
      .select($"doc_id", posexplode(expr(
        s"transform(sequence(1, n - ${GramN - 1}), i -> array_join(slice(t, i, $GramN), ' '))"))
        .as(Seq("p0", "gram")))
      .select($"doc_id", ($"p0" + 1).as("pos"), $"gram")
    val bench = grams.filter($"doc_id" % 97 === 0).select($"gram").distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos")
    Release.checkpointed(
      grams.filter($"doc_id" % 97 =!= 0)
        .join(broadcast(bench), "gram")
        .select($"doc_id", $"pos")
        .withColumn("island", $"pos" - row_number().over(w))
        .groupBy($"doc_id", $"island")
        .agg(min($"pos").as("span_start"),
          (max($"pos") + (GramN - 1)).as("span_end"),
          count(lit(1)).as("n_hits"))
        .select($"doc_id", $"span_start", $"span_end", $"n_hits")
        .orderBy($"doc_id", $"span_start"),
      toks)
  }

  val docSpanOverlapsSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    s"""WITH tk AS (
      |  SELECT doc_id, $toks AS t, len($toks) AS n FROM documents),
      |g AS (
      |  SELECT doc_id, CAST(i AS INT) AS pos,
      |    array_to_string(t[i:i+2], ' ') AS gram
      |  FROM tk, unnest(range(1, n - 1)) AS r(i) WHERE n >= 3),
      |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
      |hits AS (
      |  SELECT c.doc_id, c.pos FROM g c
      |  JOIN bench ON c.gram = bench.gram
      |  WHERE c.doc_id % 97 <> 0),
      |isl AS (
      |  SELECT doc_id, pos,
      |    pos - CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS INT)
      |      AS island
      |  FROM hits)
      |SELECT doc_id, min(pos) AS span_start, max(pos) + 2 AS span_end,
      |  CAST(count(*) AS BIGINT) AS n_hits
      |FROM isl GROUP BY doc_id, island ORDER BY doc_id, span_start""".stripMargin
  }

  /** Contamination sweep across n-gram sizes {3, 5, 8} — the standard
    * eval-leak report (pipelines sweep sizes because short grams
    * over-flag common phrases and long grams miss paraphrase overlap;
    * GPT-3-style 13-gram vs Gopher-style 8-gram debates live on this
    * curve). One row per size: contaminated-doc count and gram-hit
    * mass. The token arrays are built once and shared by every size
    * (persist), each size contributes one gram explode + broadcast
    * bench join; output is |sizes| rows at any corpus scale.
    */
  def contaminationSweep(spark: SparkSession, dir: String,
                         sizes: Seq[Int] = Seq(3, 5, 8)): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", filter(split($"text", "\\s+"), t => t =!= "").as("t"))
      .withColumn("n", size($"t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = sizes.map { k =>
      val grams = toks.filter($"n" >= k)
        .select($"doc_id", explode(expr(
          s"transform(sequence(1, n - $k + 1), i -> array_join(slice(t, i, $k), ' '))"))
          .as("gram"))
      val bench = grams.filter($"doc_id" % 97 === 0).select($"gram").distinct()
      grams.filter($"doc_id" % 97 =!= 0)
        .join(broadcast(bench), "gram")
        .agg(countDistinct($"doc_id").as("contaminated_docs"),
          count(lit(1)).as("gram_hits"))
        .select(lit(k).as("gram_size"), $"contaminated_docs", $"gram_hits")
    }.reduce(_.unionByName(_)).orderBy($"gram_size")
    // the result is |sizes| rows at ANY corpus scale: materialize it
    // eagerly so the shared token table can be unpersisted here rather
    // than leaking into the caller's executor cache
    val rows = out.collect().toSeq
    toks.unpersist()
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), out.schema)
  }

  val contaminationSweepSql: String = {
    val toksExpr = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    def block(k: Int) =
      s"""SELECT $k AS gram_size,
        |  count(DISTINCT c.doc_id) AS contaminated_docs,
        |  CAST(count(*) AS BIGINT) AS gram_hits
        |FROM (SELECT doc_id, array_to_string(t[i:i+${k - 1}], ' ') AS gram
        |      FROM tk, unnest(range(1, n - ${k} + 2)) AS r(i) WHERE n >= $k) c
        |JOIN (SELECT DISTINCT array_to_string(t[i:i+${k - 1}], ' ') AS gram
        |      FROM tk, unnest(range(1, n - ${k} + 2)) AS r(i)
        |      WHERE n >= $k AND doc_id % 97 = 0) b ON c.gram = b.gram
        |WHERE c.doc_id % 97 <> 0""".stripMargin
    s"""WITH tk AS (
      |  SELECT doc_id, $toksExpr AS t, len($toksExpr) AS n FROM documents)
      |${Seq(3, 5, 8).map(block).mkString("\n|UNION ALL\n|")}
      |ORDER BY gram_size""".stripMargin
  }

  /** Does the quality score track document length, per language? —
    * the calibration check run before using a heuristic quality score
    * as a sampling weight (a score that is secretly a length proxy
    * skews the mixture). Pairwise Pearson correlations among token
    * count, char count, and the quality score, per language, from
    * EXACT decimal sufficient statistics (the [[Profile.columnCorr]]
    * doctrine: integer-grid inputs — the 6dp score scales to micro
    * units losslessly — DECIMAL(38,0) sums, fixed-order double
    * derivation with one conversion per factor and IEEE sqrt).
    *
    * Scale: quality scoring is a scan-fused map; the stats are one
    * lang-keyed partial agg; output is |langs| rows.
    */
  def qualityCorr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d38 = "decimal(38,0)"
    val q = TextAnalysis.textQuality(spark, dir)
      .select($"doc_id", $"n_tokens", $"quality_score")
    val s = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", length($"text").cast("long").as("ci"))
      .join(q, "doc_id")
      .select($"lang", $"ci", $"n_tokens".cast("long").as("ti"),
        round($"quality_score" * 1000000d, 0).cast("long").as("qi"))
      .groupBy($"lang")
      .agg(count(lit(1)).cast(d38).as("n"),
        sum($"ti".cast(d38)).as("st"), sum($"ci".cast(d38)).as("sc"),
        sum($"qi".cast(d38)).as("sq"),
        sum(($"ti" * $"ti").cast(d38)).as("stt"),
        sum(($"ci" * $"ci").cast(d38)).as("scc"),
        sum(($"qi" * $"qi").cast(d38)).as("sqq"),
        sum(($"ti" * $"ci").cast(d38)).as("stc"),
        sum(($"ti" * $"qi").cast(d38)).as("stq"),
        sum(($"ci" * $"qi").cast(d38)).as("scq"))
    def corr(sxy: Column, sx: Column, sy: Column,
        sxx: Column, syy: Column): Column =
      round(($"n" * sxy - sx * sy).cast("double")
        / (sqrt(($"n" * sxx - sx * sx).cast("double"))
          * sqrt(($"n" * syy - sy * sy).cast("double"))), 6)
    s.select($"lang", $"n".cast("long").as("n"),
        corr($"stc", $"st", $"sc", $"stt", $"scc").as("corr_tokens_chars"),
        corr($"stq", $"st", $"sq", $"stt", $"sqq").as("corr_tokens_quality"),
        corr($"scq", $"sc", $"sq", $"scc", $"sqq").as("corr_chars_quality"))
      .orderBy($"lang")
  }

  val qualityCorrSql: String =
    s"""WITH q AS (${TextAnalysis.textQualitySql}),
      |x AS (
      |  SELECT d.lang,
      |    CAST(length(d.text) AS BIGINT) AS ci,
      |    CAST(q.n_tokens AS BIGINT) AS ti,
      |    CAST(round(q.quality_score * 1000000, 0) AS BIGINT) AS qi
      |  FROM documents d JOIN q ON d.doc_id = q.doc_id),
      |s AS (
      |  SELECT lang,
      |    CAST(count(*) AS DECIMAL(38,0)) AS n,
      |    CAST(sum(ti) AS DECIMAL(38,0)) AS st,
      |    CAST(sum(ci) AS DECIMAL(38,0)) AS sc,
      |    CAST(sum(qi) AS DECIMAL(38,0)) AS sq,
      |    CAST(sum(ti * ti) AS DECIMAL(38,0)) AS stt,
      |    CAST(sum(ci * ci) AS DECIMAL(38,0)) AS scc,
      |    CAST(sum(qi * qi) AS DECIMAL(38,0)) AS sqq,
      |    CAST(sum(ti * ci) AS DECIMAL(38,0)) AS stc,
      |    CAST(sum(ti * qi) AS DECIMAL(38,0)) AS stq,
      |    CAST(sum(ci * qi) AS DECIMAL(38,0)) AS scq
      |  FROM x GROUP BY lang)
      |SELECT lang, CAST(n AS BIGINT) AS n,
      |  round(CAST(n * stc - st * sc AS DOUBLE)
      |    / (sqrt(CAST(n * stt - st * st AS DOUBLE))
      |      * sqrt(CAST(n * scc - sc * sc AS DOUBLE))), 6) AS corr_tokens_chars,
      |  round(CAST(n * stq - st * sq AS DOUBLE)
      |    / (sqrt(CAST(n * stt - st * st AS DOUBLE))
      |      * sqrt(CAST(n * sqq - sq * sq AS DOUBLE))), 6) AS corr_tokens_quality,
      |  round(CAST(n * scq - sc * sq AS DOUBLE)
      |    / (sqrt(CAST(n * scc - sc * sc AS DOUBLE))
      |      * sqrt(CAST(n * sqq - sq * sq AS DOUBLE))), 6) AS corr_chars_quality
      |FROM s ORDER BY lang""".stripMargin

  private val ChunkW = 32
  private val ChunkS = 24

  /** Context-window chunking: split each document into token windows of
    * width 32 with stride 24 (the overlap keeps boundary context for
    * training examples). Chunk k covers tokens [k·S+1, k·S+W]; the count
    * is 1 + ⌈max(0, n−W)/S⌉ in pure integer arithmetic, so the last
    * chunk may be short but every token is covered.
    *
    * Scale: a pure per-row map (sequence → explode → slice) with zero
    * shuffles — exactly what a 100 TB pre-tokenization pass must be. The
    * final orderBy exists only for the deterministic oracle compare.
    */
  def docChunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", tokens($"text").as("t"))
      .select($"doc_id", $"t", size($"t").as("n"))
      .withColumn("nch",
        lit(1) + ((greatest(lit(0), $"n" - ChunkW) + lit(ChunkS - 1)) / lit(ChunkS)).cast("int"))
    docs.select($"doc_id", $"t", $"n",
        explode(sequence(lit(0), $"nch" - 1)).as("k"))
      .select($"doc_id", $"k".as("chunk_id"),
        ($"k" * ChunkS + 1).as("start_tok"),
        least(lit(ChunkW), $"n" - ($"k" * ChunkS + 1) + 1).as("chunk_tokens"),
        concat_ws(" ", slice($"t", $"k" * ChunkS + 1, lit(ChunkW))).as("chunk_text"))
      .orderBy($"doc_id", $"chunk_id")
  }

  val docChunksSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    s"""WITH t AS (
      |  SELECT doc_id, $toks AS t, len($toks) AS n FROM documents),
      |c AS (SELECT doc_id, t, n,
      |        1 + (greatest(0, n - 32) + 23) // 24 AS nch FROM t),
      |e AS (SELECT doc_id, t, n, unnest(range(0, nch)) AS k FROM c)
      |SELECT doc_id, CAST(k AS INT) AS chunk_id,
      |  CAST(k * 24 + 1 AS INT) AS start_tok,
      |  CAST(least(32, n - (k * 24 + 1) + 1) AS INT) AS chunk_tokens,
      |  array_to_string(t[k * 24 + 1 : k * 24 + 32], ' ') AS chunk_text
      |FROM e ORDER BY doc_id, chunk_id""".stripMargin
  }

  private val PackBudget = 512 // tokens per training sequence
  private val PackShards = 32

  /** Sequence PACKING: assign documents to fixed-token-budget training
    * sequences (the step after chunking/cleaning that decides what a
    * trainer actually reads). Docs are sharded by `doc_id % 32` and
    * packed within each shard in doc_id order by cumulative token
    * count: a doc's sequence is `floor(tokens_before / 512)` — the
    * standard first-fit-by-offset packing whose boundary docs straddle
    * two sequences (flagged, so the trainer can split or pad). Fully
    * deterministic: shard, order, and cumsum are all pure integer
    * functions of the input.
    *
    * Scale: packing is embarrassingly parallel across shards — the
    * window partitions by shard, so no global sort exists anywhere; at
    * 100 TB you raise the shard count to the write parallelism you
    * want and each shard packs independently. One hash shuffle of
    * (doc_id, n_tokens) pairs + the presentation sort.
    */
  def docPack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"shard").orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select($"doc_id", size(tokens($"text")).cast("long").as("n_tokens"))
      .withColumn("shard", pmod($"doc_id", lit(PackShards)).cast("int"))
      .withColumn("tokens_before", coalesce(sum($"n_tokens").over(w), lit(0L)))
      .select($"doc_id", $"shard",
        ($"tokens_before" / PackBudget).cast("long").as("seq_no"),
        ($"tokens_before" % PackBudget).as("seq_offset"),
        $"n_tokens",
        ($"tokens_before" % PackBudget + $"n_tokens" > PackBudget).as("straddles"))
      .orderBy($"doc_id")
  }

  val docPackSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    s"""WITH d AS (
      |  SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens,
      |    CAST(doc_id % $PackShards AS INT) AS shard
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, shard, n_tokens,
      |    coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
      |  FROM d)
      |SELECT doc_id, shard,
      |  CAST(tokens_before // $PackBudget AS BIGINT) AS seq_no,
      |  CAST(tokens_before % $PackBudget AS BIGINT) AS seq_offset,
      |  n_tokens,
      |  (tokens_before % $PackBudget + n_tokens > $PackBudget) AS straddles
      |FROM c ORDER BY doc_id""".stripMargin
  }

  /** Quality-percentile bucketing: decile buckets over the composite
    * quality score (CCNet-style head/middle/tail selection generalized
    * to 10 buckets), with per-bucket volume stats used to pick the
    * keep-fraction per tier. Sum of scores runs in DECIMAL so the mean
    * is bit-exact across engines.
    *
    * Scale: ntile over a global order is a single-partition sort — fine
    * for the exactness gate, but at 100 TB the bucket boundaries come
    * from an approx-quantile pass (see Profile.valueHistogram's
    * equi-width variant) and bucket assignment becomes a broadcast
    * range lookup, i.e. a pure map. The aggregate itself is 10 rows.
    */
  def qualityBuckets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"quality_score", $"doc_id")
    TextAnalysis.textQuality(spark, dir)
      .withColumn("bucket", ntile(10).over(w))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_docs"),
        min($"quality_score").as("min_score"),
        max($"quality_score").as("max_score"),
        round(sum($"quality_score".cast("decimal(12,6)")).cast("double")
          / count(lit(1)).cast("double"), 6).as("avg_score"),
        sum($"n_tokens").cast("long").as("total_tokens"))
      .orderBy($"bucket")
  }

  val qualityBucketsSql: String =
    s"""WITH q AS (${TextAnalysis.textQualitySql})
      |SELECT bucket, count(*) AS n_docs,
      |  min(quality_score) AS min_score, max(quality_score) AS max_score,
      |  round(CAST(sum(CAST(quality_score AS DECIMAL(12,6))) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE), 6) AS avg_score,
      |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      |FROM (SELECT q.*, ntile(10) OVER (ORDER BY quality_score, doc_id) AS bucket
      |      FROM q) b
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  /** The 100 TB path [[qualityBuckets]]'s scaladoc promises, implemented:
    * decile THRESHOLDS from a bounded-state quantile sketch (9 numbers
    * cross the driver), broadcast back as a range lookup over the scan —
    * a per-row binary search instead of a global sort. No ntile, no
    * full-corpus window. Bucket populations are sketch-approximate at
    * the boundaries (rows-only; CurationSpec bounds the deviation vs the
    * exact deciles and pins the threshold count).
    */
  def qualityBucketsApprox(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = TextAnalysis.textQuality(spark, dir)
    val cuts = scored.stat.approxQuantile(
      "quality_score", (1 to 9).map(_ / 10.0).toArray, 0.001)
    val cutsLit = array(cuts.map(lit(_)): _*)
    // bucket = 1 + #thresholds strictly below the score (ties: upper
    // bucket, matching the ascending-ntile convention closely enough
    // for a sketch-bounded report)
    scored
      .withColumn("bucket",
        (lit(1) + aggregate(cutsLit, lit(0),
          (acc, c) => acc + when($"quality_score" > c, 1).otherwise(0))).cast("int"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_docs"),
        min($"quality_score").as("min_score"),
        max($"quality_score").as("max_score"),
        sum($"n_tokens").cast("long").as("total_tokens"))
      .orderBy($"bucket")
  }

  /** Quality-threshold sweep: for each cutoff t ∈ {0.1 … 0.9}, the doc
    * count and token mass that SURVIVE `quality_score ≥ t` — the
    * "how much corpus does each bar cost" dial a pipeline reads before
    * committing to a filter (the quality twin of contamination_sweep /
    * dedup_threshold_curve). Scores land on an exact micro grid
    * (round(q·10⁶) of the 6dp score — identical longs in both engines),
    * so every comparison is integer.
    *
    * Scale: ONE corpus scan aggregates into ≤ 11 decile buckets
    * (map-side combine to 11 rows/partition); the sweep is a ≤ 9×11
    * grid join over those buckets — the cumulative table never touches
    * corpus rows again. Shares are exact micro-unit floor divisions.
    */
  def qualitySweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perBucket = TextAnalysis.textQuality(spark, dir)
      .select($"n_tokens".cast("long").as("n_tok"),
        round($"quality_score" * 1000000d, 0).cast("long").as("sm"))
      // bucket = floor(score_micro/10⁵): score ≥ t·10⁵ ⇔ bucket ≥ t
      .groupBy((($"sm" - ($"sm" % 100000L)) / 100000L).cast("long").as("bucket"))
      .agg(count(lit(1)).as("docs"), sum($"n_tok").as("toks"))
    val tot = perBucket.agg(sum($"docs").as("nd"), sum($"toks").as("nt"))
    val thr = spark.range(1, 10).select($"id".as("t"))
    thr.join(perBucket, perBucket("bucket") >= thr("t"), "left")
      .groupBy($"t")
      .agg(coalesce(sum($"docs"), lit(0L)).as("n_docs_kept"),
        coalesce(sum($"toks"), lit(0L)).as("tokens_kept"))
      .crossJoin(broadcast(tot))
      .select(($"t" * 100000L).as("threshold_micro"),
        $"n_docs_kept", $"tokens_kept",
        ((($"n_docs_kept" * 1000000L) - (($"n_docs_kept" * 1000000L) % $"nd"))
          / $"nd").cast("long").as("doc_share_micro"),
        ((($"tokens_kept" * 1000000L) - (($"tokens_kept" * 1000000L) % $"nt"))
          / $"nt").cast("long").as("token_share_micro"))
      .orderBy($"threshold_micro")
  }

  val qualitySweepSql: String =
    s"""WITH q AS (${TextAnalysis.textQualitySql}),
      |b AS (
      |  SELECT CAST(round(quality_score * 1000000, 0) AS BIGINT) // 100000
      |      AS bucket,
      |    count(*) AS docs, CAST(sum(n_tokens) AS BIGINT) AS toks
      |  FROM q GROUP BY 1),
      |tot AS (SELECT CAST(sum(docs) AS BIGINT) AS nd,
      |               CAST(sum(toks) AS BIGINT) AS nt FROM b),
      |thr AS (SELECT CAST(t AS BIGINT) AS t FROM generate_series(1, 9) AS gs(t)),
      |cum AS (
      |  SELECT thr.t,
      |    CAST(coalesce(sum(b.docs), 0) AS BIGINT) AS n_docs_kept,
      |    CAST(coalesce(sum(b.toks), 0) AS BIGINT) AS tokens_kept
      |  FROM thr LEFT JOIN b ON b.bucket >= thr.t GROUP BY thr.t)
      |SELECT t * 100000 AS threshold_micro, n_docs_kept, tokens_kept,
      |  (n_docs_kept * 1000000 - (n_docs_kept * 1000000) % nd) // nd
      |    AS doc_share_micro,
      |  (tokens_kept * 1000000 - (tokens_kept * 1000000) % nt) // nt
      |    AS token_share_micro
      |FROM cum CROSS JOIN tot ORDER BY threshold_micro""".stripMargin

  // ------------------------------------------------------------------
  // coverage_curve — distinct-gram coverage vs deterministic sample size
  // ------------------------------------------------------------------

  private val CoveragePcts = Seq(1, 2, 5, 10, 25, 50, 100)

  /** Distinct-3-gram coverage curve over deterministic document
    * samples: for each sample rate p%, what fraction of the corpus'
    * distinct grams does the md5-percentile-p sample already contain —
    * the subsampling diagnostic read before dataset pruning ("how much
    * of the corpus' phrase diversity survives a 10% cut?"), the
    * empirical counterpart of Heaps-law extrapolation over the same
    * corpus [[graft.operators.TextModel.vocabGrowth]] charts by time.
    *
    * Exactness and the ONE-PASS trick: each gram's coverage status at
    * every rate is determined by the SMALLEST doc-percentile it occurs
    * under, so one (gram → min percentile) aggregate answers every
    * rate — grams are never re-exploded per rate; the curve is 7
    * conditional counts over the gram grid stacked into rows, shares
    * are single double divisions. Scale: one explode + one gram-keyed
    * aggregate (map-side partial min) regardless of |rates|.
    */
  def coverageCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val gmin = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size($"t") >= GramN)
      .withColumn("h", expr(
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)" +
          " AS BIGINT) % 100"))
      .select($"h", explode(expr(
        s"transform(sequence(1, size(t) - ${GramN - 1})," +
          s" i -> array_join(slice(t, i, $GramN), ' '))")).as("g"))
      .groupBy($"g").agg(min($"h").as("hmin"))
    val agg = gmin.agg(count(lit(1)).as("total"),
      CoveragePcts.map(p => count(when($"hmin" < p, lit(1))).as(s"c$p")): _*)
    agg.select(explode(array(CoveragePcts.map(p => struct(
        lit(p.toLong).as("sample_pct"),
        col(s"c$p").as("grams_covered"),
        $"total".as("grams_total"))): _*)).as("r"))
      .select($"r.sample_pct", $"r.grams_covered", $"r.grams_total",
        round($"r.grams_covered".cast("double") / $"r.grams_total", 6)
          .as("coverage"))
      .orderBy($"sample_pct")
  }

  val coverageCurveSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    val branches = CoveragePcts.map(p =>
      s"""SELECT CAST($p AS BIGINT) AS sample_pct,
         |  CAST(count(CASE WHEN hmin < $p THEN 1 END) AS BIGINT) AS grams_covered,
         |  CAST(count(*) AS BIGINT) AS grams_total
         |FROM gmin""".stripMargin).mkString("\nUNION ALL\n")
    s"""WITH t AS (
      |  SELECT doc_id, $toks AS t FROM documents),
      |g AS (
      |  SELECT list_reduce(list_transform(
      |      split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), ''),
      |      c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)),
      |      (a, c) -> a * 16 + c) % 100 AS h,
      |    unnest([array_to_string(t[i:i+${GramN - 1}], ' ')
      |            for i in range(1, len(t) - ${GramN - 2})]) AS g
      |  FROM t WHERE len(t) >= $GramN),
      |gmin AS MATERIALIZED (SELECT g, CAST(min(h) AS BIGINT) AS hmin
      |                      FROM g GROUP BY g)
      |SELECT sample_pct, grams_covered, grams_total,
      |  round(CAST(grams_covered AS DOUBLE) / grams_total, 6) AS coverage
      |FROM ($branches)
      |ORDER BY sample_pct""".stripMargin
  }

  // ------------------------------------------------------------------
  // context_length_sweep — truncation/packing economics per ctx length
  // ------------------------------------------------------------------

  private val CtxGrid = Seq(64L, 128L, 256L, 512L, 1024L, 2048L)

  /** Context-length economics sweep: for each candidate training
    * context length L, how much of the corpus survives truncate-at-L
    * and how efficiently it packs — docs over L, token mass kept
    * (Σ min(tokens, L)), the truncation waste rate, the greedy-packing
    * lower bound on bin count (⌈kept/L⌉ — [[docPack]]'s floor), and
    * the utilization that bound implies. The "pick the context length"
    * table every pretraining run consults before committing 100 TB of
    * tokenization: longer contexts waste less by truncation but pack
    * worse against short docs; this emits the whole tradeoff from ONE
    * corpus pass.
    *
    * Exactness: all cells are integer sums/divisions (micro rates use
    * the DIV convention — positive operands, truncation identical in
    * both engines). Scale: one token-count scan × a broadcast 6-row
    * grid, partial-aggregated map-side into ≤ |grid| rows — nothing
    * downstream is corpus-cardinality.
    */
  def contextLengthSweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select(size(tokens($"text")).cast("long").as("n_tok"))
    val grid = CtxGrid.toDF("ctx_len")
    toks.crossJoin(broadcast(grid))
      .groupBy($"ctx_len")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"n_tok" > $"ctx_len", 1L).otherwise(0L)).as("docs_over"),
        sum($"n_tok").as("tokens_total"),
        sum(least($"n_tok", $"ctx_len")).as("tokens_kept"))
      .select($"ctx_len", $"n_docs", $"docs_over", $"tokens_total",
        $"tokens_kept",
        expr("(tokens_total - tokens_kept) * 1000000 DIV tokens_total")
          .as("waste_micro"),
        expr("(tokens_kept + ctx_len - 1) DIV ctx_len").as("bins_lb"),
        when($"tokens_kept" > 0,
          expr("tokens_kept * 1000000 DIV " +
            "(((tokens_kept + ctx_len - 1) DIV ctx_len) * ctx_len)"))
          .otherwise(lit(0L)).as("util_micro"))
      .orderBy($"ctx_len")
  }

  val contextLengthSweepSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    s"""WITH t AS (
      |  SELECT CAST(len($toks) AS BIGINT) AS n_tok FROM documents),
      |g AS (SELECT CAST(unnest([${CtxGrid.mkString(", ")}]) AS BIGINT)
      |      AS ctx_len),
      |a AS (
      |  SELECT ctx_len, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(CASE WHEN n_tok > ctx_len THEN 1 ELSE 0 END) AS BIGINT)
      |      AS docs_over,
      |    CAST(sum(n_tok) AS BIGINT) AS tokens_total,
      |    CAST(sum(least(n_tok, ctx_len)) AS BIGINT) AS tokens_kept
      |  FROM t CROSS JOIN g GROUP BY 1)
      |SELECT ctx_len, n_docs, docs_over, tokens_total, tokens_kept,
      |  (tokens_total - tokens_kept) * 1000000 // tokens_total AS waste_micro,
      |  (tokens_kept + ctx_len - 1) // ctx_len AS bins_lb,
      |  CASE WHEN tokens_kept > 0
      |    THEN tokens_kept * 1000000
      |      // (((tokens_kept + ctx_len - 1) // ctx_len) * ctx_len)
      |    ELSE 0 END AS util_micro
      |FROM a ORDER BY ctx_len""".stripMargin
  }
}
