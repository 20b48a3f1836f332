package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deterministic corpus sampling/splitting for training-data pipelines.
  *
  * Splits must be STABLE across runs, engines, and re-partitioning — a
  * doc's split assignment can never depend on row order, partition
  * count, or an RNG seed that another engine can't reproduce. The
  * assignment key is a cryptographic hash of (doc_id, text), so it is
  * reproducible bit-for-bit anywhere md5 exists, and uniform enough
  * that hex-prefix thresholds give the requested proportions. This is a
  * per-row codegen'd map over the scan: zero shuffles at any corpus
  * size, and adding data never reassigns existing docs.
  */
object Sampling {

  /** Train/val/test assignment by md5 hex prefix: 256 buckets,
    * 'cc' = 204/256 ≈ 79.7% train, 'e6' = 230/256 → ≈10.2% val,
    * remainder ≈10.2% test.
    */
  def sampleSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        substring(md5(concat($"doc_id".cast("string"), lit(":"), $"text")), 1, 2)
          .as("bucket"))
      .withColumn("split",
        when($"bucket" < "cc", lit("train"))
          .when($"bucket" < "e6", lit("val"))
          .otherwise(lit("test")))
      .orderBy($"doc_id")
  }

  val sampleSplitSql: String =
    """SELECT doc_id,
      |  substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 2) AS bucket,
      |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 2) < 'cc' THEN 'train'
      |       WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 2) < 'e6' THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Stratified deterministic sampling: a per-stratum keep-rate applied
    * by content-hash threshold, so each event_type is down-sampled to
    * its own rate (the class-rebalancing primitive for training mixes)
    * while staying stable across runs, engines, and partitioning. The
    * hex-prefix comparison is a pure per-row predicate — zero shuffles,
    * and the sample never changes when data is appended.
    */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // per-stratum keep thresholds on the first two md5 hex chars
    // (256 buckets): purchase keeps ~100%, signup ~50%, click ~25%,
    // view ~12.5%, error ~6.25%
    val cut = typedLit(Map(
      "purchase" -> "zz", "signup" -> "80", "click" -> "40",
      "view" -> "20", "error" -> "10"))
    graft.sources.Tables.events(spark, dir)
      .withColumn("bucket",
        substring(md5(concat($"event_id".cast("string"), lit(":"), $"event_type")), 1, 2))
      .filter($"bucket" < element_at(cut, $"event_type"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_kept"))
      .orderBy($"event_type")
  }

  val sampleStratifiedSql: String =
    """SELECT event_type, count(*) AS n_kept
      |FROM events
      |WHERE substr(md5(CAST(event_id AS VARCHAR) || ':' || event_type), 1, 2) <
      |  CASE event_type WHEN 'purchase' THEN 'zz' WHEN 'signup' THEN '80'
      |    WHEN 'click' THEN '40' WHEN 'view' THEN '20' WHEN 'error' THEN '10'
      |    ELSE '00' END
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** One-row corpus profile: sizes, token mass, and the exact-dup rate
    * (distinct md5 over total). One scan + one global aggregate; the
    * count(DISTINCT) is the only shuffle and carries 16-byte digests,
    * not documents.
    */
  def corpusStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = filter(split($"text", "\\s+"), t => t =!= "")
    Tables.documents(spark, dir)
      .select($"doc_id", $"text", size(toks).cast("long").as("n_tok"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tok").as("total_tokens"),
        sum(length($"text").cast("long")).as("total_chars"),
        round(sum($"n_tok").cast("double") / count(lit(1)).cast("double"), 6)
          .as("avg_tokens"),
        countDistinct(md5($"text")).as("n_unique_texts"))
  }

  val corpusStatsSql: String =
    """SELECT count(*) AS n_docs,
      |  CAST(sum(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS BIGINT) AS total_tokens,
      |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
      |  round(CAST(sum(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE), 6) AS avg_tokens,
      |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts
      |FROM documents""".stripMargin

  /** Deterministic k-per-group sample: the k docs per source with the
    * smallest md5(text) — a content-hash "reservoir" that is stable
    * across runs, partitionings, and appends of non-winning rows (the
    * balanced eval-slice builder). Rank is WindowGroupLimit-prunable:
    * each partition keeps ≤ k rows per group before the group shuffle,
    * so the sort never sees the full corpus.
    */
  def samplePerGroup(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy(md5($"text"), $"doc_id")
    Tables.documents(spark, dir)
      .select($"doc_id", $"source", $"text")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= k)
      .select($"source", $"rk".cast("int").as("rk"), $"doc_id")
      .orderBy($"source", $"rk")
  }

  val samplePerGroupSql: String =
    """SELECT source, CAST(rk AS INT) AS rk, doc_id FROM (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rk
      |  FROM documents) t
      |WHERE rk <= 10 ORDER BY source, rk""".stripMargin

  /** WATER-FILLING mixture: the exact level L with Σ min(srcᵢ, L) = B,
    * so the realized token count hits the budget instead of
    * undershooting when small sources can't fill their equal share
    * (the naive plan leaves their surplus on the table —
    * [[mixturePlan]] documents that gap). Sources are ranked ascending;
    * k = the largest rank where flattening everything above rank k to
    * sₖ still fits the budget (cumₖ + sₖ·(n−k) ≤ B); then
    * L = (B − cumₖ)/(n − k). All window math runs on the |sources|-row
    * table — the corpus contributes one groupBy.
    */
  def mixtureWaterfill(spark: SparkSession, dir: String,
                       budgetFrac: Double = 0.5): DataFrame = {
    import spark.implicits._
    val toks = filter(split($"text", "\\s+"), t => t =!= "")
    val perSource = Tables.documents(spark, dir)
      .select($"source", size(toks).cast("long").as("n_tok"))
      .groupBy($"source")
      .agg(sum($"n_tok").as("src_tokens"))
    val totals = perSource.agg(sum($"src_tokens").as("total_tokens"),
      count(lit(1)).as("n_sources"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"src_tokens", $"source")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val ranked = perSource.crossJoin(broadcast(totals))
      .withColumn("idx", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"src_tokens", $"source")))
      .withColumn("cum", sum($"src_tokens").over(w))
      .withColumn("budget", lit(budgetFrac) * $"total_tokens".cast("double"))
      .withColumn("feasible",
        $"cum".cast("double")
          + $"src_tokens".cast("double") * ($"n_sources" - $"idx").cast("double")
          <= $"budget")
    val kRow = ranked.agg(
      coalesce(max(when($"feasible", $"idx")), lit(0)).as("k"),
      coalesce(max(when($"feasible", $"cum")), lit(0L)).as("cum_k"))
    ranked.crossJoin(broadcast(kRow))
      .withColumn("level",
        ($"budget" - $"cum_k".cast("double")) / ($"n_sources" - $"k").cast("double"))
      .select($"source", $"src_tokens",
        when($"idx" <= $"k" || $"n_sources" === $"k", lit(1.0))
          .otherwise(round($"level" / $"src_tokens".cast("double"), 6)).as("keep_rate"),
        when($"idx" <= $"k" || $"n_sources" === $"k", $"src_tokens")
          .otherwise(floor(round($"level" / $"src_tokens".cast("double"), 6)
            * $"src_tokens".cast("double")).cast("long")).as("planned_tokens"))
      .orderBy($"source")
  }

  val mixtureWaterfillSql: String =
    """WITH per AS (
      |  SELECT source,
      |    CAST(sum(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS BIGINT)
      |      AS src_tokens
      |  FROM documents GROUP BY source),
      |t AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens,
      |             count(*) AS n_sources FROM per),
      |ranked AS (
      |  SELECT per.*, t.n_sources,
      |    row_number() OVER (ORDER BY src_tokens, source) AS idx,
      |    sum(src_tokens) OVER (ORDER BY src_tokens, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    0.5 * CAST(t.total_tokens AS DOUBLE) AS budget
      |  FROM per CROSS JOIN t),
      |f AS (SELECT ranked.*,
      |    CAST(cum AS DOUBLE) + CAST(src_tokens AS DOUBLE)
      |      * CAST(n_sources - idx AS DOUBLE) <= budget AS feasible
      |  FROM ranked),
      |kk AS (SELECT coalesce(max(CASE WHEN feasible THEN idx END), 0) AS k,
      |              coalesce(max(CASE WHEN feasible THEN cum END), 0) AS cum_k
      |       FROM f)
      |SELECT source, src_tokens,
      |  CASE WHEN idx <= k OR n_sources = k THEN CAST(1.0 AS DOUBLE)
      |       ELSE round(((budget - CAST(cum_k AS DOUBLE))
      |         / CAST(n_sources - k AS DOUBLE)) / CAST(src_tokens AS DOUBLE), 6)
      |  END AS keep_rate,
      |  CASE WHEN idx <= k OR n_sources = k THEN src_tokens
      |       ELSE CAST(floor(round(((budget - CAST(cum_k AS DOUBLE))
      |         / CAST(n_sources - k AS DOUBLE)) / CAST(src_tokens AS DOUBLE), 6)
      |         * CAST(src_tokens AS DOUBLE)) AS BIGINT)
      |  END AS planned_tokens
      |FROM f CROSS JOIN kk ORDER BY source""".stripMargin

  /** Training-mix plan: per-source keep rates that hit a token budget
    * (half the corpus) at equal source shares — the data-mixing sheet a
    * pipeline produces before sampling. A source smaller than its equal
    * share is kept whole (rate capped at 1.0); the realized token count
    * is reported per source. One groupBy to source cardinality, one
    * broadcast scalar total — the plan is |sources| rows at any scale,
    * and the actual sampling applies the rate as a map-side md5
    * predicate (see [[sampleStratified]]).
    */
  def mixturePlan(spark: SparkSession, dir: String,
                  budgetFrac: Double = 0.5): DataFrame = {
    import spark.implicits._
    val toks = filter(split($"text", "\\s+"), t => t =!= "")
    val perSource = Tables.documents(spark, dir)
      .select($"source", size(toks).cast("long").as("n_tok"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("src_tokens"))
    val totals = perSource.agg(
      sum($"src_tokens").as("total_tokens"),
      count(lit(1)).as("n_sources"))
    perSource.crossJoin(broadcast(totals))
      .select($"source", $"n_docs", $"src_tokens",
        round(least(lit(1.0),
          (lit(budgetFrac) * $"total_tokens".cast("double") / $"n_sources".cast("double"))
            / $"src_tokens".cast("double")), 6).as("keep_rate"))
      .withColumn("planned_tokens",
        floor($"keep_rate" * $"src_tokens".cast("double")).cast("long"))
      .orderBy($"source")
  }

  val mixturePlanSql: String =
    """WITH per AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(sum(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS BIGINT)
      |      AS src_tokens
      |  FROM documents GROUP BY source),
      |t AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens,
      |             count(*) AS n_sources FROM per)
      |SELECT source, n_docs, src_tokens,
      |  round(least(CAST(1.0 AS DOUBLE),
      |    (0.5 * CAST(total_tokens AS DOUBLE) / CAST(n_sources AS DOUBLE))
      |      / CAST(src_tokens AS DOUBLE)), 6) AS keep_rate,
      |  CAST(floor(round(least(CAST(1.0 AS DOUBLE),
      |    (0.5 * CAST(total_tokens AS DOUBLE) / CAST(n_sources AS DOUBLE))
      |      / CAST(src_tokens AS DOUBLE)), 6) * CAST(src_tokens AS DOUBLE)) AS BIGINT)
      |    AS planned_tokens
      |FROM per CROSS JOIN t ORDER BY source""".stripMargin

  /** Quality-WEIGHTED deterministic sampling: each doc is kept with
    * probability ∝ its quality score (targeting a 0.5 overall rate,
    * capped at 1) — the doc-level rebalance that keeps more of the
    * good tail than a uniform sample at the same budget. Deterministic
    * Bernoulli: the doc's content hash yields a 16-bit bucket and the
    * doc is kept iff bucket < ⌊p·65536⌋ rendered in hex — stable across
    * runs, engines, partitionings, and appends, like [[sampleSplit]].
    * The mean quality normalizer is a decimal-exact sum (6dp scores)
    * over one broadcast scalar; the per-row decision is a pure map.
    */
  def sampleWeighted(spark: SparkSession, dir: String,
                     targetRate: Double = 0.5): DataFrame = {
    import spark.implicits._
    val q = TextAnalysis.textQuality(spark, dir)
      .select($"doc_id", $"quality_score")
    val hashed = Tables.documents(spark, dir)
      .select($"doc_id",
        substring(md5(concat(lit("wq:"), $"doc_id".cast("string"), lit(":"), $"text")), 1, 4)
          .as("bucket"))
    val avg = q.agg((sum($"quality_score".cast("decimal(12,6)")).cast("double")
      / count(lit(1)).cast("double")).as("avg_q"))
    q.join(hashed, "doc_id")
      .crossJoin(broadcast(avg))
      .withColumn("keep_prob",
        round(least(lit(1.0), lit(targetRate) * $"quality_score" / $"avg_q"), 6))
      .withColumn("cut", least(floor($"keep_prob" * 65536d).cast("long"), lit(65535L)))
      .select($"doc_id", $"quality_score", $"keep_prob",
        ($"bucket" < lower(lpad(hex($"cut"), 4, "0"))).as("kept"))
      .orderBy($"doc_id")
  }

  val sampleWeightedSql: String =
    s"""WITH q AS (${TextAnalysis.textQualitySql.replace("ORDER BY doc_id", "")}),
      |h AS (
      |  SELECT doc_id,
      |    substr(md5('wq:' || CAST(doc_id AS VARCHAR) || ':' || text), 1, 4) AS bucket
      |  FROM documents),
      |a AS (SELECT CAST(sum(CAST(quality_score AS DECIMAL(12,6))) AS DOUBLE)
      |        / CAST(count(*) AS DOUBLE) AS avg_q FROM q),
      |p AS (
      |  SELECT q.doc_id, q.quality_score, h.bucket,
      |    round(least(1.0, 0.5 * q.quality_score / avg_q), 6) AS keep_prob
      |  FROM q JOIN h ON q.doc_id = h.doc_id CROSS JOIN a)
      |SELECT doc_id, quality_score, keep_prob,
      |  bucket < printf('%04x', CAST(least(floor(keep_prob * 65536), 65535) AS BIGINT)) AS kept
      |FROM p ORDER BY doc_id""".stripMargin

  /** Temperature-scaled mixture weights (τ = 2, i.e. w_s ∝ tokens_s^(1/τ)
    * = √tokens_s) — the standard rebalance that upweights small sources
    * without letting any source dominate (multilingual/multi-corpus
    * training mixes). Emits per-source sampling weight and its boost
    * over the proportional share.
    *
    * Engine-exactness: √x is IEEE correctly rounded (exact in both
    * engines, unlike a general pow), and each √tokens is quantized to
    * integer micro-units BEFORE the normalizing sum, so the total is an
    * exact integer and every emitted ratio is a fixed-order double
    * expression over exact integers. One groupBy to |sources| rows +
    * a broadcast scalar.
    */
  def mixtureTemperature(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = filter(split($"text", "\\s+"), t => t =!= "")
    val perSource = Tables.documents(spark, dir)
      .select($"source", size(toks).cast("long").as("n_tok"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("src_tokens"))
      .withColumn("q", round(sqrt($"src_tokens".cast("double")) * 1000000d, 0).cast("long"))
    val totals = perSource.agg(
      sum($"q").as("qt"), sum($"src_tokens").as("tt"))
    perSource.crossJoin(broadcast(totals))
      .select($"source", $"n_docs", $"src_tokens",
        round($"q".cast("double") / $"qt".cast("double"), 6).as("weight"),
        round(($"q".cast("double") / $"qt".cast("double"))
          / ($"src_tokens".cast("double") / $"tt".cast("double")), 6).as("boost"))
      .orderBy($"source")
  }

  val mixtureTemperatureSql: String =
    """WITH per AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(sum(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS BIGINT)
      |      AS src_tokens
      |  FROM documents GROUP BY source),
      |q AS (
      |  SELECT source, n_docs, src_tokens,
      |    CAST(round(sqrt(CAST(src_tokens AS DOUBLE)) * 1000000, 0) AS BIGINT) AS q
      |  FROM per),
      |t AS (SELECT CAST(sum(q) AS BIGINT) AS qt, CAST(sum(src_tokens) AS BIGINT) AS tt FROM q)
      |SELECT source, n_docs, src_tokens,
      |  round(CAST(q AS DOUBLE) / CAST(qt AS DOUBLE), 6) AS weight,
      |  round((CAST(q AS DOUBLE) / CAST(qt AS DOUBLE))
      |    / (CAST(src_tokens AS DOUBLE) / CAST(tt AS DOUBLE)), 6) AS boost
      |FROM q CROSS JOIN t ORDER BY source""".stripMargin

  /** Deterministic k-fold cross-validation assignment (k=5): each doc's
    * fold comes from its content-hash bucket (md5 hex prefix split at
    * 0x33/0x66/0x99/0xcc — 51/51/51/51/52 of the 256 buckets), so folds
    * are stable across runs, engines, and partitioning, and appending
    * data never reassigns an existing doc. The per-row fold map is a
    * pure predicate (zero shuffles); the summary is one partial-agg
    * groupBy to a k-row table.
    */
  def crossvalFolds(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucket = substring(
      md5(concat($"doc_id".cast("string"), lit(":"), $"text")), 1, 2)
    Tables.documents(spark, dir)
      .withColumn("fold",
        when(bucket < "33", 0).when(bucket < "66", 1).when(bucket < "99", 2)
          .when(bucket < "cc", 3).otherwise(4))
      .groupBy($"fold")
      .agg(count(lit(1)).as("n_docs"),
        sum(length($"text")).as("n_chars"),
        min($"doc_id").as("min_doc"))
      .orderBy($"fold")
  }

  val crossvalFoldsSql: String =
    """WITH f AS (
      |  SELECT doc_id, text,
      |    CASE WHEN b < '33' THEN 0 WHEN b < '66' THEN 1 WHEN b < '99' THEN 2
      |         WHEN b < 'cc' THEN 3 ELSE 4 END AS fold
      |  FROM (SELECT doc_id, text,
      |          substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 2) AS b
      |        FROM documents))
      |SELECT fold, count(*) AS n_docs,
      |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
      |  min(doc_id) AS min_doc
      |FROM f GROUP BY fold ORDER BY fold""".stripMargin

  /** Split-bias audit: is the hash split independent of language? Each
    * (lang, split) cell reports observed count, the independence-
    * expected count, and its chi-square contribution — the QA gate
    * proving the content-hash split didn't correlate with a stratum
    * (a biased split silently shifts the val/test mixture). Cells with
    * large terms are the evidence; summing terms against the chi-square
    * table is the caller's call.
    *
    * Scale: one (lang, split) partial agg; margins reduce FROM the
    * cell table (no second corpus pass) and broadcast back; the scored
    * table is |langs|·|splits| rows. Exactness: counts and margins are
    * exact integers; expected and the chi term are per-row fixed-order
    * double expressions (no float aggregation anywhere), rounded
    * through the validated pair.
    */
  def samplingBiasReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val b = substring(
      md5(concat($"doc_id".cast("string"), lit(":"), $"text")), 1, 2)
    val cells = Tables.documents(spark, dir)
      .select($"lang",
        when(b < "cc", lit("train")).when(b < "e6", lit("val"))
          .otherwise(lit("test")).as("split"))
      .groupBy($"lang", $"split").agg(count(lit(1)).as("n"))
    val langTot = cells.groupBy($"lang").agg(sum($"n").as("lang_n"))
    val splitTot = cells.groupBy($"split").agg(sum($"n").as("split_n"))
    val total = cells.agg(sum($"n").as("total"))
    val e = ($"lang_n" * $"split_n").cast("double") / $"total".cast("double")
    cells.join(langTot, "lang").join(splitTot, "split")
      .crossJoin(broadcast(total))
      .select($"lang", $"split", $"n",
        round(e, 6).as("expected"),
        round(($"n".cast("double") - e) * ($"n".cast("double") - e) / e, 6)
          .as("chi2_term"))
      .orderBy($"lang", $"split")
  }

  val samplingBiasReportSql: String =
    """WITH s AS (
      |  SELECT lang,
      |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 2) < 'cc'
      |           THEN 'train'
      |         WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 2) < 'e6'
      |           THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents),
      |c AS (SELECT lang, split, CAST(count(*) AS BIGINT) AS n
      |      FROM s GROUP BY lang, split),
      |lt AS (SELECT lang, CAST(sum(n) AS BIGINT) AS lang_n FROM c GROUP BY lang),
      |st AS (SELECT split, CAST(sum(n) AS BIGINT) AS split_n FROM c GROUP BY split),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
      |SELECT c.lang, c.split, n,
      |  round(CAST(lang_n * split_n AS DOUBLE) / CAST(total AS DOUBLE), 6)
      |    AS expected,
      |  round((CAST(n AS DOUBLE)
      |      - CAST(lang_n * split_n AS DOUBLE) / CAST(total AS DOUBLE))
      |    * (CAST(n AS DOUBLE)
      |      - CAST(lang_n * split_n AS DOUBLE) / CAST(total AS DOUBLE))
      |    / (CAST(lang_n * split_n AS DOUBLE) / CAST(total AS DOUBLE)), 6)
      |    AS chi2_term
      |FROM c JOIN lt ON c.lang = lt.lang JOIN st ON c.split = st.split, t
      |ORDER BY c.lang, c.split""".stripMargin

  /** Deterministic GLOBAL shuffle of the corpus — the "shuffle the
    * training data" step every epoch pipeline needs, WITHOUT a single
    * global sort: the md5 order is realized as a two-level rank.
    * Bucket = first 2 hash hex chars (256 buckets, ~uniform); rank
    * within bucket is a PARTITIONED window; the 256-row bucket-count
    * table turns into cumulative offsets (grid-cardinality serial
    * window — exempted like mixture_waterfill's plan table) that
    * broadcast back; ordinal = offset + in-bucket rank. Because the
    * bucket is a PREFIX of the sort hash, (bucket, hash) order IS
    * global hash order — the oracle proves it with one flat
    * row_number over the full order. Deterministic, engine-portable,
    * and append-stable in distribution (the md5 doctrine); at 100 TB
    * the only serial state is the 256-row offset table.
    */
  def globalShuffle(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val h = md5(concat(lit("gs:"), $"doc_id".cast("string")))
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", h.as("h"), substring(h, 1, 2).as("bucket"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy($"bucket").orderBy($"h", $"doc_id")
    val ranked = docs.withColumn("rk", row_number().over(wIn).cast("long"))
    val counts = docs.groupBy($"bucket").agg(count(lit(1)).as("bn"))
    val wOff = org.apache.spark.sql.expressions.Window
      .orderBy($"bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = counts.withColumn("off",
      coalesce(sum($"bn").over(wOff), lit(0L)))
    ranked.join(broadcast(offsets.select($"bucket", $"off")), "bucket")
      .select($"doc_id", ($"off" + $"rk").as("ord"))
      .orderBy($"ord")
  }

  val globalShuffleSql: String =
    """SELECT doc_id,
      |  CAST(row_number() OVER (
      |    ORDER BY md5('gs:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS ord
      |FROM documents ORDER BY ord""".stripMargin

  // ------------------------------------------------------------------
  // domain_reweight — multiplicative-weights domain mixing
  // ------------------------------------------------------------------

  private val RwEta = 500000L  // MW step, micro (0.5)
  private val RwRounds = 4

  /** Exact floor division on (possibly signed) long columns: identical
    * pmod expansion in both engines (Training.fdiv doctrine). */
  private def rwFdiv(a: Column, b: Column): Column =
    ((a - ((a % b + b) % b)) / b).cast("long")
  private def rwFdivSql(a: String, b: String): String =
    s"CAST((($a) - ((($a) % ($b) + ($b)) % ($b))) / ($b) AS BIGINT)"

  /** DoReMi-style learned domain mixture: multiplicative-weights
    * (Hedge) over sources, where each round re-weights every source by
    * its quality loss relative to the CURRENT weighted-average loss —
    * sources better than the mix grow, worse shrink, and the dynamics
    * genuinely iterate because the average moves with the weights
    * (unlike a static closed-form reweight). Loss proxy: 10⁶ − mean
    * quality score (micro). Update per round, all micro-exact:
    * L̄ = ⌊Σ wₛ·Lₛ/10⁶⌋, mₛ = 10⁶ + ⌊η(L̄−Lₛ)/10⁶⌋,
    * rawₛ = ⌊wₛ·mₛ/10⁶⌋, wₛ' = ⌊rawₛ·10⁶/Σraw⌋ — so the DuckDB oracle
    * replays all four rounds bit-identically (floor renormalization may
    * leave Σw ≤ 10⁶ by < |S| micro; documented, deterministic).
    *
    * Scale: ONE corpus scan for the per-source quality aggregate
    * (decimal-exact 6dp sums) collapses the corpus to the |sources|-row
    * model (~20 rows); the MW rounds then run on the collected model in
    * the driver with the same Long floor-division arithmetic (the IVF
    * centroid precedent — driver traffic is O(model), the corpus is
    * read once). r7 shipped the rounds as nested crossJoin(broadcast)
    * plans instead; each round referenced the previous one ~3×, so the
    * final tree re-expanded the base subtree ~3⁴ times and fired a
    * broadcast-job cascade at write time — the r8 rewrite keeps the
    * output bit-identical (Math.floorDiv ≡ the pmod expansion for
    * positive divisors) with a single-scan plan.
    */
  def domainReweight(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = TextAnalysis.textQuality(spark, dir)
      .join(Tables.documents(spark, dir).select($"doc_id", $"source"), "doc_id")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens".cast("long")).as("src_tokens"),
        (sum($"quality_score".cast("decimal(12,6)")) * 1000000)
          .cast("decimal(38,0)").cast("long").as("qsum_micro"))
    // model collapse: (source, n_docs, src_tokens, loss_micro) — one row
    // per source. All divisors below are positive, so Math.floorDiv
    // reproduces rwFdiv's pmod expansion exactly.
    val rows = base.collect().map { r =>
      val nDocs = r.getLong(1)
      (r.getString(0), nDocs, r.getLong(2),
        M - Math.floorDiv(r.getLong(3), nDocs))
    }.sortBy(_._1)
    val k = rows.length.toLong
    var w = rows.map(_ => Math.floorDiv(M, k))
    for (_ <- 1 to RwRounds) {
      val lbar = Math.floorDiv(
        w.iterator.zip(rows.iterator).map { case (wi, r) => wi * r._4 }.sum, M)
      val raw = w.zip(rows).map { case (wi, r) =>
        val m = M + Math.floorDiv(RwEta * (lbar - r._4), M)
        Math.floorDiv(wi * m, M)
      }
      val tot = raw.sum
      w = raw.map(ri => Math.floorDiv(ri * M, tot))
    }
    val tt = rows.map(_._3).sum
    spark.createDataFrame(rows.zip(w).map { case ((src, nDocs, tok, loss), wi) =>
      (src, nDocs, tok, loss, wi, Math.floorDiv(tok * M, tt))
    }.toSeq).toDF("source", "n_docs", "src_tokens", "loss_micro",
      "weight_micro", "token_share_micro")
      .orderBy($"source")
  }

  private val M = 1000000L

  val domainReweightSql: String = {
    val sb = new StringBuilder
    sb ++= s"""WITH q AS (${TextAnalysis.textQualitySql}),
      |per AS (
      |  SELECT d.source, count(*) AS n_docs,
      |    CAST(sum(CAST(q.n_tokens AS BIGINT)) AS BIGINT) AS src_tokens,
      |    CAST(sum(CAST(q.quality_score AS DECIMAL(12,6))) * 1000000 AS BIGINT)
      |      AS qsum_micro
      |  FROM q JOIN documents d USING (doc_id) GROUP BY d.source),
      |base AS (
      |  SELECT source, n_docs, src_tokens,
      |    1000000 - ${rwFdivSql("qsum_micro", "n_docs")} AS loss_micro
      |  FROM per),
      |k AS (SELECT count(*) AS k FROM base),
      |w0 AS (
      |  SELECT source, loss_micro, ${rwFdivSql("1000000", "k.k")} AS w
      |  FROM base CROSS JOIN k)""".stripMargin
    for (t <- 1 to RwRounds) {
      sb ++= s""",
      |lb$t AS (SELECT ${rwFdivSql("sum(w * loss_micro)", "1000000")} AS lbar
      |        FROM w${t - 1}),
      |raw$t AS (
      |  SELECT source, loss_micro,
      |    ${rwFdivSql(
          s"w * (1000000 + ${rwFdivSql(s"$RwEta * (lbar - loss_micro)", "1000000")})",
          "1000000")} AS raw
      |  FROM w${t - 1} CROSS JOIN lb$t),
      |tot$t AS (SELECT CAST(sum(raw) AS BIGINT) AS tot FROM raw$t),
      |w$t AS (
      |  SELECT source, loss_micro, ${rwFdivSql("raw * 1000000", "tot")} AS w
      |  FROM raw$t CROSS JOIN tot$t)""".stripMargin
    }
    sb ++= s""",
      |tt AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS tt FROM base)
      |SELECT b.source, b.n_docs, b.src_tokens, b.loss_micro,
      |  w.w AS weight_micro,
      |  ${rwFdivSql("b.src_tokens * 1000000", "tt.tt")} AS token_share_micro
      |FROM base b JOIN w$RwRounds w USING (source) CROSS JOIN tt
      |ORDER BY b.source""".stripMargin
    sb.toString
  }

  // ------------------------------------------------------------------
  // curriculum_order — length-curriculum training schedule
  // ------------------------------------------------------------------

  /** Deterministic curriculum schedule: the materialized training
    * ORDER a shard writer consumes — short documents first (the
    * standard LM warmup curriculum: easy/short sequences before
    * long ones), deterministic shuffle WITHIN each stage so no
    * within-stage ordering bias survives. Stages are fixed token
    * thresholds (48/96/144 — inside the corpus's SF-invariant length
    * distribution so every stage is populated at every scale); the
    * within-stage key is the [[sampleSplit]] content hash, stable
    * across runs/engines/appends. Each row carries its stage's doc
    * and token budget (4-row aggregate broadcast back) so a trainer
    * can cut stage boundaries without a second pass.
    *
    * Scale: stage and key are per-row codegen'd maps over the scan;
    * the stage budget is a 4-row aggregate; the only corpus-wide move
    * is the presentation sort BY (stage, key) — which at 100 TB is
    * exactly the shard-writing range partition the schedule exists to
    * feed (a trainer consumes it as the write order, not a collected
    * list). */
  def curriculumOrder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = size(filter(split($"text", "\\s+"), t => t =!= "")).cast("long")
    val staged = Tables.documents(spark, dir)
      .select($"doc_id", n.as("n_tokens"),
        least(lit(3L), rwFdiv(n, lit(48L))).cast("int").as("stage"),
        substring(md5(concat($"doc_id".cast("string"), lit(":"), $"text")), 1, 16)
          .as("order_key"))
    val budgets = staged.groupBy($"stage")
      .agg(count(lit(1)).as("stage_docs"), sum($"n_tokens").as("stage_tokens"))
    staged.join(broadcast(budgets), "stage")
      .select($"doc_id", $"n_tokens", $"stage", $"order_key",
        $"stage_docs", $"stage_tokens")
      .orderBy($"stage", $"order_key", $"doc_id")
  }

  val curriculumOrderSql: String =
    """WITH staged AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT)
      |      AS n_tokens,
      |    CAST(least(3, CAST((n_tokens - ((n_tokens % 48 + 48) % 48)) / 48 AS BIGINT))
      |      AS INT) AS stage,
      |    substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 16) AS order_key
      |  FROM documents),
      |b AS (
      |  SELECT stage, CAST(count(*) AS BIGINT) AS stage_docs,
      |    CAST(sum(n_tokens) AS BIGINT) AS stage_tokens
      |  FROM staged GROUP BY stage)
      |SELECT doc_id, n_tokens, stage, order_key, stage_docs, stage_tokens
      |FROM staged JOIN b USING (stage)
      |ORDER BY stage, order_key, doc_id""".stripMargin

  // ------------------------------------------------------------------
  // dsir_weights — hashed-ngram importance weights (DSIR)
  // ------------------------------------------------------------------

  /** (doc_id, lang, bucket, cnt) hashed-feature counts — the shared
    * input of the DSIR model and the per-doc scoring join. */
  private def dsirBuckets(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select($"doc_id", $"lang",
        explode(filter(split($"text", "\\s+"), t => t =!= "")).as("tok"))
      .select($"doc_id", $"lang", substring(md5($"tok"), 1, 2).as("bucket"))
      .groupBy($"doc_id", $"lang", $"bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** The 256-row DSIR bucket model (bucket → micro ln ratio) as a
    * frame, built from one pass over `docs`. */
  private def dsirModelDf(docBucket: DataFrame): DataFrame = {
    val spark = docBucket.sparkSession
    import spark.implicits._
    val raw = docBucket.groupBy($"bucket").agg(sum($"cnt").as("r"))
    val tgt = docBucket.filter($"lang" === "en")
      .groupBy($"bucket").agg(sum($"cnt").as("t"))
    val totals = docBucket.agg(
      sum($"cnt").as("rtot"),
      sum(when($"lang" === "en", $"cnt").otherwise(0L)).as("ttot"))
    raw.join(tgt, Seq("bucket"), "left")
      .withColumn("t", coalesce($"t", lit(0L)))
      .crossJoin(broadcast(totals))
      // each factor casts to double BEFORE the multiply: the longs stay
      // exact, the IEEE products are deterministic, and no integer
      // product can overflow at any corpus size
      .select($"bucket",
        round(log((($"t" + 1L).cast("double") * ($"rtot" + 256L).cast("double"))
          / (($"r" + 1L).cast("double") * ($"ttot" + 256L).cast("double"))) * 1e6, 0)
          .cast("long").as("lnr_micro"))
  }

  /** The trained model collected as a literal bucket → lnr_micro map —
    * O(256) driver traffic, the streaming gate's scoring constant. */
  private[graft] def dsirModelOf(docs: DataFrame): Map[String, Long] =
    dsirModelDf(dsirBuckets(docs)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Literal-model DSIR scoring: a PURE PER-ROW map (fold of map
    * lookups over the token array — no explode, no shuffle, no state),
    * so the identical projection serves batch re-scoring and the
    * streaming admission gate, bit-identical to [[dsirWeights]]'
    * distributed groupBy path (Σ over occurrences ≡ Σ over buckets of
    * cnt·lnr; spec-asserted). Buckets are total over the md5 hex
    * space by construction of the model ONLY when the model saw every
    * bucket the scored text produces — true when scoring the training
    * corpus itself (the gate's contract: the snapshot trains, the
    * stream replays the same corpus); a genuinely novel bucket would
    * surface as a null sum, loudly, not as a silent wrong score. */
  private[graft] def dsirScore(docs: DataFrame, model: Map[String, Long]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = filter(split($"text", "\\s+"), t => t =!= "")
    docs
      .withColumn("toks", toks)
      .withColumn("n_tokens", size($"toks").cast("long"))
      .withColumn("dsir_micro",
        aggregate(
          transform($"toks",
            t => element_at(typedlit(model), substring(md5(t), 1, 2))),
          lit(0L), (acc, x) => acc + x))
      .select($"doc_id", $"lang", $"n_tokens", $"dsir_micro",
        rwFdiv($"dsir_micro", $"n_tokens").as("dsir_per_token_micro"),
        (rwFdiv($"dsir_micro", $"n_tokens") > 0L).as("selected"))
  }

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document
    * by how much more likely its hashed-ngram features are under a
    * TARGET distribution (here the English sub-corpus — the domain we
    * want more of) than under the RAW corpus distribution. The
    * per-document importance weight is the log-likelihood ratio
    * log p_target(doc)/p_raw(doc) under bag-of-hashed-unigram models:
    * w_d = Σ_b count_d(b)·(ln p_t(b) − ln p_r(b)) with Laplace +1
    * smoothing over the 256-bucket hashed feature space. Selection
    * keeps documents whose PER-TOKEN ratio is positive (more
    * target-like than raw — the importance-ratio > 1 criterion; the
    * full resampling variant would draw ∝ exp(w), this is its
    * deterministic top-ratio analog).
    *
    * Feature hashing is the md5 hex-prefix convention (two chars →
    * 256 buckets) — reproducible in any engine, no murmur seed drift.
    * Exactness: both distributions are exact integer counts; each
    * bucket's ln ratio is ONE fixed double tree over exact longs,
    * quantized to micro (the pmi_collocations ln idiom); per-doc
    * weights are then exact integer sums of count·lnr_micro.
    *
    * Scale: one corpus pass explodes tokens into (doc_id, bucket)
    * partial counts — the only corpus-cardinality shuffle, ≤ 256
    * rows/doc with map-side combine. Both bucket distributions are
    * 256-row aggregates OF that table (no second scan); the scored
    * model (256 lnr rows) broadcasts back. Nothing about the plan
    * changes with corpus size except the one pass. */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docBucket = dsirBuckets(Tables.documents(spark, dir))
    val model = dsirModelDf(docBucket)
    docBucket.join(broadcast(model), "bucket")
      .groupBy($"doc_id")
      .agg(first($"lang").as("lang"),
        sum($"cnt").as("n_tokens"),
        sum($"cnt" * $"lnr_micro").as("dsir_micro"))
      .select($"doc_id", $"lang", $"n_tokens", $"dsir_micro",
        rwFdiv($"dsir_micro", $"n_tokens").as("dsir_per_token_micro"),
        (rwFdiv($"dsir_micro", $"n_tokens") > 0L).as("selected"))
      .orderBy($"doc_id")
  }

  val dsirWeightsSql: String =
    """WITH db AS (
      |  SELECT doc_id, lang, substr(md5(tok), 1, 2) AS bucket,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM (SELECT doc_id, lang, unnest(list_filter(
      |          string_split_regex(text, '\s+'), t -> t <> '')) AS tok
      |        FROM documents)
      |  GROUP BY doc_id, lang, bucket),
      |raw AS (SELECT bucket, sum(cnt) AS r FROM db GROUP BY bucket),
      |tgt AS (SELECT bucket, sum(cnt) AS t FROM db
      |        WHERE lang = 'en' GROUP BY bucket),
      |tot AS (SELECT sum(cnt) AS rtot,
      |          sum(CASE WHEN lang = 'en' THEN cnt ELSE 0 END) AS ttot
      |        FROM db),
      |model AS (
      |  SELECT raw.bucket,
      |    CAST(round(ln((CAST(COALESCE(t, 0) + 1 AS DOUBLE) * CAST(rtot + 256 AS DOUBLE))
      |      / (CAST(r + 1 AS DOUBLE) * CAST(ttot + 256 AS DOUBLE))) * 1e6, 0) AS BIGINT)
      |      AS lnr_micro
      |  FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket CROSS JOIN tot),
      |scored AS (
      |  SELECT doc_id, min(lang) AS lang,
      |    CAST(sum(cnt) AS BIGINT) AS n_tokens,
      |    CAST(sum(cnt * lnr_micro) AS BIGINT) AS dsir_micro
      |  FROM db JOIN model USING (bucket)
      |  GROUP BY doc_id)
      |SELECT doc_id, lang, n_tokens, dsir_micro,
      |  CAST((dsir_micro - ((dsir_micro % n_tokens + n_tokens) % n_tokens))
      |    / n_tokens AS BIGINT) AS dsir_per_token_micro,
      |  CAST((dsir_micro - ((dsir_micro % n_tokens + n_tokens) % n_tokens))
      |    / n_tokens AS BIGINT) > 0 AS selected
      |FROM scored ORDER BY doc_id""".stripMargin

  /** Leave-one-source-out corpus impact: for every source, the corpus
    * health metrics a mixture designer reads before dropping that
    * source — remaining doc count, remaining mean length, and the
    * remaining EXACT-duplICATE mass — computed for all k sources in
    * ONE pass over sufficient statistics, never k corpus re-scans.
    *
    * The duplicate mass is the algebraic part: with per-class sizes
    * n_c and per-(class, source) counts n_cs, the duplicated-doc count
    * after removing source s is
    *   Σ_c f(n_c − n_cs)  =  G − Σ_{c: n_cs>0} [f(n_c) − f(n_c − n_cs)]
    * with f(n) = n·[n ≥ 2] and G the full-corpus mass — so each source
    * only pays for the classes it actually touches. Cross-source
    * redeliveries are planted (doc_id < 30 re-ingested under the next
    * source id) so the correction term is non-vacuous on the synthetic
    * corpus, the same convention as `dedup_exact`.
    *
    * Scale (100 TB): ONE corpus pass builds the (fp, source)
    * sufficient-statistic table (16-byte md5 fingerprints only — text
    * never shuffles); class sizes, per-source stats, totals, and the
    * correction all re-aggregate from that persisted table. The naive
    * formulation is k full corpus passes. Totals ride a 1-row
    * broadcast.
    */
  def looSourceImpact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, dir)
      .select($"doc_id", $"text", $"source", $"n_chars")
    val planted = base.filter($"doc_id" < 30)
      .select(($"doc_id" + 3000000L).as("doc_id"), $"text",
        concat(lit("src"), pmod($"doc_id" + 1, lit(20))).as("source"),
        $"n_chars")
    val docs = base.unionByName(planted)
      .select($"doc_id", md5($"text").as("fp"), $"source", $"n_chars")
    def f(n: Column): Column = when(n >= 2, n).otherwise(lit(0L))
    // the ONE corpus pass: everything below derives from this
    // (fp, source) sufficient-statistic table by re-aggregation —
    // long sums reassociate exactly, so no precision is at stake
    val clsSrc = docs.groupBy($"fp", $"source")
      .agg(count(lit(1)).as("n_cs"), sum($"n_chars").as("chars_cs"))
      .persist()
    val cls = clsSrc.groupBy($"fp").agg(sum($"n_cs").as("n_c"))
    val corr = clsSrc.join(cls, Seq("fp"))
      .groupBy($"source")
      .agg(sum(f($"n_c") - f($"n_c" - $"n_cs")).as("dup_correction"))
    val perSrc = clsSrc.groupBy($"source")
      .agg(sum($"n_cs").as("n_docs"), sum($"chars_cs").as("chars_s"))
    val totals = perSrc.agg(sum($"n_docs").as("n_total"),
      sum($"chars_s").as("chars_total")).crossJoin(
      cls.agg(sum(f($"n_c")).as("dup_total")))
    Release.grid(
      perSrc.join(corr, Seq("source"))
        .crossJoin(broadcast(totals))
        .select($"source", $"n_docs",
          ($"n_total" - $"n_docs").as("remaining_docs"),
          round(($"chars_total" - $"chars_s").cast("double")
            / ($"n_total" - $"n_docs"), 6).as("remaining_mean_chars"),
          ($"dup_total" - $"dup_correction").as("remaining_dup_docs"),
          round(($"dup_total" - $"dup_correction").cast("double")
            / ($"n_total" - $"n_docs"), 6).as("remaining_dup_rate"),
          $"dup_total")
        .orderBy($"source"),
      clsSrc) // |sources| rows
  }

  val looSourceImpactSql: String =
    """WITH docs AS (
      |  SELECT doc_id, md5(text) AS fp, source, n_chars FROM documents
      |  UNION ALL
      |  SELECT doc_id + 3000000, md5(text),
      |    'src' || CAST(((doc_id + 1) % 20 + 20) % 20 AS VARCHAR), n_chars
      |  FROM documents WHERE doc_id < 30),
      |cls AS (SELECT fp, CAST(count(*) AS BIGINT) AS n_c FROM docs GROUP BY fp),
      |cls_src AS (SELECT fp, source, CAST(count(*) AS BIGINT) AS n_cs
      |            FROM docs GROUP BY fp, source),
      |corr AS (
      |  SELECT source,
      |    sum((CASE WHEN n_c >= 2 THEN n_c ELSE 0 END)
      |      - (CASE WHEN n_c - n_cs >= 2 THEN n_c - n_cs ELSE 0 END))
      |      AS dup_correction
      |  FROM cls_src JOIN cls USING (fp) GROUP BY source),
      |per_src AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    sum(n_chars) AS chars_s
      |  FROM docs GROUP BY source),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_total, sum(n_chars) AS chars_total,
      |    (SELECT sum(CASE WHEN n_c >= 2 THEN n_c ELSE 0 END) FROM cls) AS dup_total
      |  FROM docs)
      |SELECT source, n_docs,
      |  n_total - n_docs AS remaining_docs,
      |  round(CAST(chars_total - chars_s AS DOUBLE) / (n_total - n_docs), 6)
      |    AS remaining_mean_chars,
      |  CAST(dup_total - dup_correction AS BIGINT) AS remaining_dup_docs,
      |  round(CAST(dup_total - dup_correction AS DOUBLE) / (n_total - n_docs), 6)
      |    AS remaining_dup_rate,
      |  CAST(dup_total AS BIGINT) AS dup_total
      |FROM per_src JOIN corr USING (source) CROSS JOIN tot
      |ORDER BY source""".stripMargin

  // ------------------------------------------------------------------
  // neyman_allocation — optimal stratified sampling allocation
  // ------------------------------------------------------------------

  private val NeymanBudget = 10000L

  /** Neyman optimal allocation (Neyman 1934) of a 10,000-doc sampling
    * budget across sources: stratum h gets n·N_h·S_h / Σ N·S, where
    * S_h is the within-source stddev of document length — the
    * allocation that minimizes the variance of the estimated corpus
    * mean under a fixed budget, vs the proportional allocation
    * sample_stratified uses. Ships both so the delta is visible.
    *
    * Exactness: n_chars is integer, so per-source moments are exact
    * integer sums and S_h is one fixed double tree rounded to 6; the
    * cross-stratum weight mass m_h = round(N_h·S_h6·10³) is an exact
    * long, floors ride the pmod idiom on DECIMAL(38,0) products
    * (HUGEINT `//` in the oracle), and the leftover budget distributes
    * by largest remainder with a deterministic (remainder, source)
    * rank over the |sources|-row grid (registered grid-bounded).
    * Scale: one corpus aggregate to the source grid; everything after
    * is grid arithmetic.
    */
  def neymanAllocation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = Tables.documents(spark, dir)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sx"),
        sum($"n_chars" * $"n_chars").as("sxx"))
      // a 1-doc stratum has no within-stratum variance: drop it in
      // BOTH engines (Spark's non-ANSI /0 yields NULL, DuckDB's IEEE
      // division yields inf and errors on the BIGINT cast — the same
      // asymmetric-failure pattern guarded in anomaly_seasonal)
      .filter($"n_docs" >= 2L)
      .select($"source", $"n_docs",
        round(sqrt(($"sxx".cast("double")
          - $"sx".cast("double") * $"sx".cast("double") / $"n_docs")
          / ($"n_docs" - 1L)), 6).as("sd_chars"))
      .withColumn("m", round($"n_docs" * $"sd_chars" * 1e3, 0).cast("long"))
    val tot = g.agg(sum($"m").as("mm"), sum($"n_docs").as("nn"))
    val dec = g.crossJoin(broadcast(tot))
      .withColumn("nm", $"m".cast("decimal(38,0)") * lit(NeymanBudget))
      .withColumn("alloc_floor",
        expr(s"CAST((nm - ((nm % mm + mm) % mm)) / mm AS BIGINT)"))
      .withColumn("rem", expr("(nm % mm + mm) % mm"))
      .withColumn("prop_alloc", expr(
        s"CAST((n_docs * ${NeymanBudget}L - ((n_docs * ${NeymanBudget}L % nn + nn) % nn)) / nn AS BIGINT)"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"rem".desc, $"source")
    val wTot = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    dec
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("deficit", lit(NeymanBudget) - sum($"alloc_floor").over(wTot))
      .select($"source", $"n_docs", $"sd_chars", $"prop_alloc",
        ($"alloc_floor" + when($"rk" <= $"deficit", 1L).otherwise(0L))
          .as("neyman_alloc"),
        round($"m".cast("double")
          / $"mm".cast("double"), 6).as("neyman_weight"))
      .orderBy($"source")
  }

  val neymanAllocationSql: String =
    s"""WITH g AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    round(sqrt((CAST(sum(n_chars * n_chars) AS DOUBLE)
      |      - CAST(sum(n_chars) AS DOUBLE) * CAST(sum(n_chars) AS DOUBLE)
      |        / count(*))
      |      / (count(*) - 1)), 6) AS sd_chars
      |  FROM documents GROUP BY source HAVING count(*) >= 2),
      |m AS (
      |  SELECT *, CAST(round(n_docs * sd_chars * 1e3, 0) AS BIGINT) AS m
      |  FROM g),
      |tot AS (
      |  SELECT CAST(sum(m) AS HUGEINT) AS mm, CAST(sum(n_docs) AS BIGINT) AS nn
      |  FROM m),
      |dec AS (
      |  SELECT *, CAST(m AS HUGEINT) * ${NeymanBudget} AS nm,
      |    CAST((CAST(m AS HUGEINT) * ${NeymanBudget}) // mm AS BIGINT)
      |      AS alloc_floor,
      |    (CAST(m AS HUGEINT) * ${NeymanBudget}) % mm AS rem,
      |    CAST((n_docs * ${NeymanBudget}) // nn AS BIGINT) AS prop_alloc
      |  FROM m CROSS JOIN tot),
      |rk AS (
      |  SELECT *, CAST(row_number() OVER (ORDER BY rem DESC, source)
      |      AS BIGINT) AS rk,
      |    ${NeymanBudget} - sum(alloc_floor) OVER () AS deficit
      |  FROM dec)
      |SELECT source, n_docs, sd_chars, prop_alloc,
      |  alloc_floor + CASE WHEN rk <= deficit THEN 1 ELSE 0 END
      |    AS neyman_alloc,
      |  round(CAST(m AS DOUBLE) / CAST(mm AS DOUBLE), 6) AS neyman_weight
      |FROM rk ORDER BY source""".stripMargin

  // ------------------------------------------------------------------
  // conformal_calibration — split-conformal quality-gate thresholds
  // ------------------------------------------------------------------

  private val ConformalAlphas = Seq(5L, 10L, 20L)

  /** Split-conformal calibration (Vovk et al. 2005; the Papadopoulos
    * 2002 inductive split form) of the deterministic quality score: a
    * held-out calibration set (md5 split, ~25%) picks, per miscoverage
    * level α, the k-th smallest calibration score with k = ⌊α(n+1)⌋ —
    * the distribution-free threshold τ with P(score ≥ τ) ≥ 1−α for
    * exchangeable data. The achieved coverage on the disjoint eval set
    * is reported next to the target: THE honest way to turn a quality
    * score into a keep/drop gate with a guarantee, instead of
    * eyeballing a histogram.
    *
    * Exactness: scores live on the 10⁻⁶ integer grid (quality_score is
    * already 6dp), k and coverage are integer truncated divisions, and
    * the order statistic is computed from per-VALUE counts — no global
    * sort: the cumulative count runs on the score VALUE GRID, whose
    * cardinality is ≤ 10⁶+1 BY CONSTRUCTION at any corpus size
    * (constant in SF, the ranks-with-ties doctrine).
    *
    * Scale: ONE (score, split) partial agg collapses the corpus; the
    * threshold non-equi join (3 αs × grid) and the coverage sum are
    * grid work. The md5 split reuses the engine's stable-assignment
    * discipline — adding data never reassigns a doc.
    */
  def conformalCalibration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val flags = Tables.documents(spark, dir).select($"doc_id",
      (substring(md5(concat(lit("conf:"), $"doc_id".cast("string"),
        lit(":"), $"text")), 1, 1) < "4").as("cal"))
    val sc = TextAnalysis.textQuality(spark, dir)
      .select($"doc_id", round($"quality_score" * 1000000d, 0).cast("long").as("s"))
      .join(flags, "doc_id")
    val grid = sc.groupBy($"s", $"cal").agg(count(lit(1)).as("c"))
    val calCum = grid.filter($"cal")
      .withColumn("cc", sum($"c").over(
        org.apache.spark.sql.expressions.Window.orderBy($"s")))
    val counts = grid.groupBy($"cal").agg(sum($"c").as("n"))
    val alphas = ConformalAlphas.toDF("alpha_pct")
    val th = alphas
      .crossJoin(broadcast(counts.filter($"cal").select($"n".as("n_cal"))))
      .withColumn("k", greatest(expr("alpha_pct * (n_cal + 1) div 100"), lit(1L)))
    val tau = broadcast(th).join(calCum, calCum("cc") >= th("k"))
      .groupBy($"alpha_pct", $"k", $"n_cal").agg(min($"s").as("tau"))
    broadcast(tau)
      .join(grid.filter(!$"cal").select($"s", $"c"), $"s" >= $"tau", "left")
      .groupBy($"alpha_pct", $"k", $"n_cal", $"tau")
      .agg(coalesce(sum($"c"), lit(0L)).as("covered"))
      .crossJoin(broadcast(counts.filter(!$"cal").select($"n".as("n_eval"))))
      .select($"alpha_pct", $"k", $"n_cal",
        round($"tau".cast("double") / 1000000d, 6).as("threshold"),
        $"n_eval", $"covered",
        round(expr("covered * 1000000 div n_eval").cast("double") / 1000000d, 6)
          .as("coverage"),
        ((lit(100L) - $"alpha_pct").cast("double") / lit(100.0)).as("target"))
      .orderBy($"alpha_pct")
  }

  /** The scoring/split/grid CTE chain shared by the calibration report
    * and the streaming gate oracle (concatenated, never interpolated
    * into another stripMargin literal).
    */
  private val conformalCtes: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    val stopList = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
      .map(s => s"'$s'").mkString("[", ",", "]")
    s"""WITH t AS (
      |  SELECT doc_id, text,
      |    CAST(len($toks) AS DOUBLE) AS n_tok,
      |    CAST(len(list_filter($toks, x -> list_contains($stopList, x))) AS DOUBLE) AS n_stop,
      |    CAST(len(list_distinct($toks)) AS DOUBLE) AS n_uniq,
      |    CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) AS n_punct,
      |    CAST(length(text) AS DOUBLE) AS n_chars
      |  FROM documents),
      |sc AS (
      |  SELECT doc_id,
      |    CAST(round(round(0.35 * least(n_tok / 50.0, 1.0)
      |      + 0.25 * (n_stop / greatest(n_tok, 1.0))
      |      + 0.25 * (n_uniq / greatest(n_tok, 1.0))
      |      + 0.15 * (1.0 - n_punct / greatest(n_chars, 1.0)), 6) * 1000000, 0)
      |      AS BIGINT) AS s,
      |    substr(md5('conf:' || CAST(doc_id AS VARCHAR) || ':' || text), 1, 1) < '4' AS cal
      |  FROM t),
      |grid AS (SELECT s, cal, CAST(count(*) AS BIGINT) AS c FROM sc GROUP BY 1, 2),
      |calcum AS (
      |  SELECT s, CAST(sum(c) OVER (ORDER BY s) AS BIGINT) AS cc
      |  FROM grid WHERE cal),
      |nn AS (
      |  SELECT CAST(sum(c) FILTER (cal) AS BIGINT) AS n_cal,
      |    CAST(sum(c) FILTER (NOT cal) AS BIGINT) AS n_eval FROM grid),
      |al AS (SELECT CAST(unnest([${ConformalAlphas.mkString(", ")}]) AS BIGINT) AS alpha_pct),
      |th AS (
      |  SELECT a.alpha_pct, greatest((a.alpha_pct * (nn.n_cal + 1)) // 100, 1) AS k,
      |    nn.n_cal, nn.n_eval
      |  FROM al a, nn),
      |tau AS (
      |  SELECT t2.alpha_pct, t2.k, t2.n_cal, t2.n_eval, min(c2.s) AS tau
      |  FROM th t2 JOIN calcum c2 ON c2.cc >= t2.k
      |  GROUP BY 1, 2, 3, 4),
      |cov AS (
      |  SELECT t3.alpha_pct, t3.k, t3.n_cal, t3.tau, t3.n_eval,
      |    CAST(coalesce(sum(g.c), 0) AS BIGINT) AS covered
      |  FROM tau t3 LEFT JOIN grid g ON NOT g.cal AND g.s >= t3.tau
      |  GROUP BY 1, 2, 3, 4, 5)""".stripMargin
  }

  val conformalCalibrationSql: String = conformalCtes + "\n" +
    """SELECT alpha_pct, k, n_cal,
      |  round(CAST(tau AS DOUBLE) / 1000000, 6) AS threshold,
      |  n_eval, covered,
      |  round(CAST(covered * 1000000 // n_eval AS DOUBLE) / 1000000, 6) AS coverage,
      |  CAST(100 - alpha_pct AS DOUBLE) / 100.0 AS target
      |FROM cov ORDER BY alpha_pct""".stripMargin

  /** Per-doc keep/drop flags under the α = 10% conformal threshold —
    * the oracle of the STREAMING gate (stream_conformal_gate): every
    * doc's 10⁻⁶-grid quality score compared to the calibration-set
    * order statistic the chain above derives.
    */
  val conformalGateSql: String = conformalCtes + "\n" +
    """SELECT sc.doc_id, sc.s AS score_micro, sc.s >= t10.tau AS kept
      |FROM sc CROSS JOIN (SELECT tau FROM tau WHERE alpha_pct = 10) t10
      |ORDER BY sc.doc_id""".stripMargin

  // ------------------------------------------------------------------
  // drift_retrain_gate — drift breach ⇒ recalibration ⇒ new threshold
  // ------------------------------------------------------------------

  private val DriftWinW = 64L     // doc_ids per ingest window
  private val DriftAlphaPct = 10L // conformal α for every (re)calibration

  /** Drift-TRIGGERED retrain gate (the r12 verdict's named closed
    * loop): `psi_drift_windowed`'s trajectory composed with
    * `stream_conformal_gate`'s threshold derivation — drift breach ⇒
    * new calibration ⇒ new admission literal, the loop a production
    * ingest pipeline actually runs.
    *
    * Per ingest window (doc_id div 64 — the ordered-arrival windowing
    * of the stream_decontam discipline):
    *  1. DRIFT: PSI of the window's eval-split quality-score
    *     distribution against the pinned calibration-split reference
    *     (the exact psi_drift_windowed nano-quantized arithmetic,
    *     keyed by window instead of event type);
    *  2. BREACH: control-chart rule on the trajectory itself —
    *     4·psi_nano·|windows| > 5·Σpsi_nano, i.e. the window's PSI
    *     exceeds 1.25× the trajectory mean (exact integer predicate; an
    *     absolute dial would be SF-folklore, a relative one exercises
    *     the loop on any data with between-window variation);
    *  3. RETRAIN: a breached window re-derives the α = 10% conformal
    *     order statistic from ITS OWN calibration docs (k =
    *     max(1, ⌊α(n+1)/100⌋), the conformal_calibration rule);
    *  4. ADMIT: window w admits eval docs at the threshold in force at
    *     its start — the LATEST breached window strictly before w
    *     (last_value IGNORE NULLS over the trajectory), falling back to
    *     the initial whole-corpus calibration.
    *
    * Exactness: scores/bins/counts/PSI terms are the established
    * integer grids; breach and admission are integer comparisons; the
    * only doubles are the display psi/keep_rate. Scale: two
    * (window, score)-keyed partial aggs collapse the corpus; every
    * later stage is |windows|·|bins| grid work, and the trajectory
    * windows are unpartitioned-window-safe (≤ |corpus|/64 rows).
    * Output is |windows| rows → Release.grid.
    */
  def driftRetrainGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val W = org.apache.spark.sql.expressions.Window
    // r13: qualityScored directly — textQuality's global orderBy added
    // a range exchange + sort that the doc_id join immediately
    // destroyed. (documentsScaled on both reads was tried and measured
    // 2× WORSE here: the two independent round-robin exchanges defeat
    // the planner's one-sided broadcast of the quality frame.)
    // r14: the cal/eval split flag is derived on the SAME corpus scan
    // that feeds the quality score (qualityScored keep-through) — the
    // former shape re-scanned documents and joined the flag back by
    // doc_id (guide §2.4: one pass where one pass suffices). Same md5
    // expression, same score arithmetic ⇒ oracle unchanged.
    val sc = TextAnalysis.qualityScored(
        Tables.documents(spark, dir).select($"doc_id", $"text",
          (substring(md5(concat(lit("conf:"), $"doc_id".cast("string"),
            lit(":"), $"text")), 1, 1) < "4").as("cal")),
        keep = Seq("cal"))
      .select($"doc_id", round($"quality_score" * 1000000d, 0).cast("long").as("s"),
        $"cal")
      .withColumn("w", expr(s"doc_id div $DriftWinW"))
      .persist()
    // 1. the PSI trajectory: pinned cal reference vs per-window eval
    val ref = sc.filter($"cal")
      .groupBy(expr("s div 100000").as("bin")).agg(count(lit(1)).as("c_b"))
    val live = sc.filter(!$"cal")
      .groupBy($"w", expr("s div 100000").as("bin")).agg(count(lit(1)).as("c_c"))
    val refw = live.select($"w").distinct().crossJoin(broadcast(ref))
    val f = refw.join(live, Seq("w", "bin"), "full_outer")
      .select($"w", $"bin",
        coalesce($"c_b", lit(0L)).as("c_b"), coalesce($"c_c", lit(0L)).as("c_c"))
    val t = f.groupBy($"w")
      .agg(sum($"c_b").as("n_b"), sum($"c_c").as("n_c"), count(lit(1)).as("bins"))
    val traj = f.join(t, "w")
      .withColumn("ln_micro", round(log(
        (($"c_b" + 1) * ($"n_c" + $"bins")).cast("double")
          / (($"n_b" + $"bins") * ($"c_c" + 1)).cast("double")) * 100000d, 0)
        .cast("long"))
      .withColumn("term_nano", round(
        (($"c_b" + 1).cast("double") / ($"n_b" + $"bins").cast("double")
          - ($"c_c" + 1).cast("double") / ($"n_c" + $"bins").cast("double"))
          * $"ln_micro".cast("double") * 10000d, 0).cast("long"))
      .groupBy($"w")
      .agg(max($"n_c").as("n_eval"), sum($"term_nano").as("psi_nano"))
    // 2. breach = PSI above 1.25× the trajectory mean, exact integers
    val tot = traj.agg(sum($"psi_nano").as("sum_nano"), count(lit(1)).as("n_w"))
    val breach = traj.crossJoin(broadcast(tot))
      .withColumn("breached", $"psi_nano" * 4 * $"n_w" > $"sum_nano" * 5)
    // 3. per-window recalibration (conformal order statistic over the
    //    window's OWN cal docs)
    val calGrid = sc.filter($"cal").groupBy($"w", $"s").agg(count(lit(1)).as("c"))
    val calCum = calGrid.withColumn("cc",
      sum($"c").over(W.partitionBy($"w").orderBy($"s")))
    val kPerW = calGrid.groupBy($"w").agg(sum($"c").as("n_cal"))
      .withColumn("k", greatest(expr(s"$DriftAlphaPct * (n_cal + 1) div 100"), lit(1L)))
    val wTau = calCum.join(kPerW, "w").filter($"cc" >= $"k")
      .groupBy($"w", $"n_cal").agg(min($"s").as("tau_w"))
    // initial whole-corpus calibration (the conformal_calibration α=10%)
    val gGrid = sc.filter($"cal").groupBy($"s").agg(count(lit(1)).as("c"))
    val tau0 = gGrid.withColumn("cc", sum($"c").over(W.orderBy($"s")))
      .crossJoin(broadcast(gGrid.agg(sum($"c").as("n_cal_g"))))
      .filter($"cc" >= greatest(expr(s"$DriftAlphaPct * (n_cal_g + 1) div 100"), lit(1L)))
      .agg(min($"s").as("tau0"))
    // 4. threshold in force = latest breached recalibration before w
    val wOrd = W.orderBy($"w").rowsBetween(W.unboundedPreceding, -1)
    val inForce = breach
      .join(wTau.select($"w", $"n_cal", $"tau_w"), Seq("w"), "left")
      .withColumn("btau", when($"breached", $"tau_w"))
      .crossJoin(broadcast(tau0))
      .withColumn("tau_micro",
        coalesce(last($"btau", ignoreNulls = true).over(wOrd), $"tau0"))
    val evalGrid = sc.filter(!$"cal").groupBy($"w", $"s").agg(count(lit(1)).as("c"))
    val kept = inForce.select($"w", $"tau_micro").join(evalGrid, "w")
      .filter($"s" >= $"tau_micro")
      .groupBy($"w").agg(sum($"c").as("n_kept"))
    val out = inForce.join(kept, Seq("w"), "left")
      .select($"w", coalesce($"n_cal", lit(0L)).as("n_cal"), $"n_eval",
        $"psi_nano", round($"psi_nano".cast("double") / 1000000000d, 9).as("psi"),
        $"breached", $"tau_micro",
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        round(coalesce($"n_kept", lit(0L)).cast("double")
          / $"n_eval".cast("double"), 6).as("keep_rate"))
      .orderBy($"w")
    out.transform(o => graft.operators.Release.grid(o, sc)) // |windows| rows
  }

  val driftRetrainGateSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    val stopList = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
      .map(s => s"'$s'").mkString("[", ",", "]")
    s"""WITH t0 AS (
      |  SELECT doc_id, text,
      |    CAST(len($toks) AS DOUBLE) AS n_tok,
      |    CAST(len(list_filter($toks, x -> list_contains($stopList, x))) AS DOUBLE) AS n_stop,
      |    CAST(len(list_distinct($toks)) AS DOUBLE) AS n_uniq,
      |    CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) AS n_punct,
      |    CAST(length(text) AS DOUBLE) AS n_chars
      |  FROM documents),
      |sc AS (
      |  SELECT doc_id,
      |    CAST(round(round(0.35 * least(n_tok / 50.0, 1.0)
      |      + 0.25 * (n_stop / greatest(n_tok, 1.0))
      |      + 0.25 * (n_uniq / greatest(n_tok, 1.0))
      |      + 0.15 * (1.0 - n_punct / greatest(n_chars, 1.0)), 6) * 1000000, 0)
      |      AS BIGINT) AS s,
      |    substr(md5('conf:' || CAST(doc_id AS VARCHAR) || ':' || text), 1, 1) < '4' AS cal,
      |    doc_id // $DriftWinW AS w
      |  FROM t0),
      |ref AS (SELECT s // 100000 AS bin, CAST(count(*) AS BIGINT) AS c_b
      |        FROM sc WHERE cal GROUP BY 1),
      |live AS (SELECT w, s // 100000 AS bin, CAST(count(*) AS BIGINT) AS c_c
      |         FROM sc WHERE NOT cal GROUP BY 1, 2),
      |wins AS (SELECT DISTINCT w FROM live),
      |refw AS (SELECT wins.w, r.bin, r.c_b FROM ref r CROSS JOIN wins),
      |f AS (
      |  SELECT coalesce(a.w, b.w) AS w, coalesce(a.bin, b.bin) AS bin,
      |    coalesce(a.c_b, 0) AS c_b, coalesce(b.c_c, 0) AS c_c
      |  FROM refw a FULL OUTER JOIN live b ON a.w = b.w AND a.bin = b.bin),
      |tt AS (
      |  SELECT w, CAST(sum(c_b) AS BIGINT) AS n_b,
      |    CAST(sum(c_c) AS BIGINT) AS n_c, CAST(count(*) AS BIGINT) AS bins
      |  FROM f GROUP BY 1),
      |terms AS (
      |  SELECT f.w, n_c, CAST(round(
      |      (CAST(c_b + 1 AS DOUBLE) / CAST(n_b + bins AS DOUBLE)
      |        - CAST(c_c + 1 AS DOUBLE) / CAST(n_c + bins AS DOUBLE))
      |      * CAST(CAST(round(ln(
      |          CAST((c_b + 1) * (n_c + bins) AS DOUBLE)
      |            / CAST((n_b + bins) * (c_c + 1) AS DOUBLE)) * 100000, 0)
      |        AS BIGINT) AS DOUBLE) * 10000, 0) AS BIGINT) AS term_nano
      |  FROM f JOIN tt ON f.w = tt.w),
      |traj AS (
      |  SELECT w, max(n_c) AS n_eval, CAST(sum(term_nano) AS BIGINT) AS psi_nano
      |  FROM terms GROUP BY 1),
      |tot AS (SELECT CAST(sum(psi_nano) AS BIGINT) AS sum_nano,
      |               CAST(count(*) AS BIGINT) AS n_w FROM traj),
      |breach AS (
      |  SELECT traj.*, (psi_nano * 4 * n_w > sum_nano * 5) AS breached
      |  FROM traj CROSS JOIN tot),
      |calgrid AS (SELECT w, s, CAST(count(*) AS BIGINT) AS c
      |            FROM sc WHERE cal GROUP BY 1, 2),
      |calcum AS (
      |  SELECT w, s, CAST(sum(c) OVER (PARTITION BY w ORDER BY s) AS BIGINT) AS cc
      |  FROM calgrid),
      |kperw AS (
      |  SELECT w, CAST(sum(c) AS BIGINT) AS n_cal,
      |    greatest(($DriftAlphaPct * (sum(c) + 1)) // 100, 1) AS k
      |  FROM calgrid GROUP BY 1),
      |wtau AS (
      |  SELECT cc2.w, k2.n_cal, min(cc2.s) AS tau_w
      |  FROM calcum cc2 JOIN kperw k2 ON k2.w = cc2.w AND cc2.cc >= k2.k
      |  GROUP BY 1, 2),
      |ggrid AS (SELECT s, CAST(count(*) AS BIGINT) AS c FROM sc WHERE cal GROUP BY 1),
      |gtau AS (
      |  SELECT min(s) AS tau0 FROM (
      |    SELECT s, sum(c) OVER (ORDER BY s) AS cc FROM ggrid) g,
      |    (SELECT greatest(($DriftAlphaPct * (sum(c) + 1)) // 100, 1) AS k
      |     FROM ggrid) kk
      |  WHERE g.cc >= kk.k),
      |inforce AS (
      |  SELECT b.w, b.n_eval, b.psi_nano, b.breached,
      |    coalesce(wt.n_cal, 0) AS n_cal,
      |    coalesce(last_value(CASE WHEN b.breached THEN wt.tau_w END IGNORE NULLS)
      |      OVER (ORDER BY b.w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      g.tau0) AS tau_micro
      |  FROM breach b LEFT JOIN wtau wt ON wt.w = b.w CROSS JOIN gtau g),
      |evalgrid AS (SELECT w, s, CAST(count(*) AS BIGINT) AS c
      |             FROM sc WHERE NOT cal GROUP BY 1, 2),
      |kept AS (
      |  SELECT i.w, CAST(sum(e.c) AS BIGINT) AS n_kept
      |  FROM inforce i JOIN evalgrid e ON e.w = i.w AND e.s >= i.tau_micro
      |  GROUP BY 1)
      |SELECT i.w, i.n_cal, i.n_eval, i.psi_nano,
      |  round(CAST(i.psi_nano AS DOUBLE) / 1000000000, 9) AS psi,
      |  i.breached, i.tau_micro,
      |  coalesce(k.n_kept, 0) AS n_kept,
      |  round(CAST(coalesce(k.n_kept, 0) AS DOUBLE)
      |    / CAST(i.n_eval AS DOUBLE), 6) AS keep_rate
      |FROM inforce i LEFT JOIN kept k ON k.w = i.w
      |ORDER BY i.w""".stripMargin
  }

  // ------------------------------------------------------------------
  // gumbel_sample — weighted sampling WITHOUT replacement, stateless
  // ------------------------------------------------------------------

  private val GumbelK = 64

  /** Deterministic weighted sampling without replacement by the
    * Gumbel-top-k trick (the log form of Efraimidis & Spirakis 2006's
    * u^(1/w) reservoir keys): each doc gets key = ln(w) − ln(−ln u)
    * with w = its token count and u a 48-bit md5-derived uniform; the
    * k largest keys ARE an exact weighted sample without replacement.
    * The pipeline's "sample 64 docs proportional to length, same 64 on
    * every engine and every rerun" primitive — no RNG state, no
    * rejection loop, no driver coordination.
    *
    * Exactness: u = h48/2⁴⁸ is an exact power-of-two division of an
    * exactly-representable 48-bit integer; the key is one fixed double
    * tree over exact inputs quantized to the micro grid (the pmi ln
    * idiom). h48 is floored at 1 so u > 0 (ln(0) guard). Ties on
    * key_micro break by doc_id.
    *
    * Scale: a per-row codegen'd map over the scan + TakeOrdered — zero
    * shuffles at any corpus size.
    */
  def gumbelSample(spark: SparkSession, dir: String, k: Int = GumbelK): DataFrame = {
    import spark.implicits._
    val wt = greatest(size(filter(split($"text", "\\s+"), t => t =!= "")), lit(1))
      .cast("long")
    val h48 = greatest(
      conv(substring(md5(concat(lit("gum:"), $"doc_id".cast("string"))), 1, 12),
        16, 10).cast("long"),
      lit(1L))
    Tables.documents(spark, dir)
      .select($"doc_id", $"source", wt.as("weight"),
        round((log(wt.cast("double"))
          - log(-log(h48.cast("double") / lit(2.81474976710656e14)))) * 1e6, 0)
          .cast("long").as("key_micro"))
      .orderBy($"key_micro".desc, $"doc_id")
      .limit(k)
  }

  val gumbelSampleSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    s"""WITH w AS (
      |  SELECT doc_id, source,
      |    CAST(greatest(len($toks), 1) AS BIGINT) AS weight,
      |    greatest(CAST(('0x' || substr(md5('gum:' || CAST(doc_id AS VARCHAR)), 1, 12))
      |      AS BIGINT), 1) AS h48
      |  FROM documents)
      |SELECT doc_id, source, weight,
      |  CAST(round((ln(CAST(weight AS DOUBLE))
      |    - ln(-ln(CAST(h48 AS DOUBLE) / 281474976710656.0))) * 1e6, 0) AS BIGINT)
      |    AS key_micro
      |FROM w ORDER BY key_micro DESC, doc_id LIMIT $GumbelK""".stripMargin
  }

  // ------------------------------------------------------------------
  // epoch_plan — data-constrained repeat/epoch allocation per source
  // ------------------------------------------------------------------

  private val EpochCap = 4L // diminishing-returns repeat ceiling

  /** Data-constrained epoch plan (the Muennighoff et al. 2023 regime:
    * repeating data is worth it up to ~4 epochs, then returns decay):
    * given a training token budget of HALF the corpus split uniformly
    * across sources, each source reports its uniform share, the epoch
    * factor min(cap, share/src_tokens) that share implies, the tokens
    * the cap actually allocates, and the stranded remainder — the
    * planning table that says which sources are repeat-limited (small
    * but precious) versus sampled-down (abundant), BEFORE tokenizing
    * 100 TB. Complements [[mixtureWaterfill]]: waterfill caps
    * proportional shares; this prices REPETITION under a cap.
    *
    * Exactness: every cell is integer arithmetic on exact token
    * counts (micro epochs via the DIV convention).
    *
    * Scale: one token-count aggregate to |sources| rows; the plan
    * math runs on the grid.
    */
  def epochPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables.documents(spark, dir)
      .select($"source",
        size(filter(split($"text", "\\s+"), t => t =!= "")).cast("long")
          .as("n_tok"))
      .groupBy($"source").agg(sum($"n_tok").as("src_tokens"))
    val tot = per.agg(sum($"src_tokens").as("total_tokens"),
      count(lit(1)).as("n_sources"))
    per.crossJoin(broadcast(tot))
      .withColumn("share",
        expr("(total_tokens DIV 2) DIV n_sources"))
      .select($"source", $"src_tokens", $"share",
        least(lit(EpochCap * 1000000L),
          expr("share * 1000000 DIV src_tokens")).as("epochs_micro"),
        least($"share", lit(EpochCap) * $"src_tokens").as("tokens_alloc"),
        least($"src_tokens", $"share").as("unique_used"))
      .withColumn("stranded", $"share" - $"tokens_alloc")
      .orderBy($"source")
  }

  val epochPlanSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    s"""WITH per AS (
      |  SELECT source, CAST(sum(len($toks)) AS BIGINT) AS src_tokens
      |  FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens,
      |        CAST(count(*) AS BIGINT) AS n_sources FROM per),
      |p AS (
      |  SELECT source, src_tokens,
      |    (total_tokens // 2) // n_sources AS share
      |  FROM per CROSS JOIN tot)
      |SELECT source, src_tokens, share,
      |  least(${EpochCap * 1000000L}, share * 1000000 // src_tokens)
      |    AS epochs_micro,
      |  least(share, $EpochCap * src_tokens) AS tokens_alloc,
      |  least(src_tokens, share) AS unique_used,
      |  share - least(share, $EpochCap * src_tokens) AS stranded
      |FROM p ORDER BY source""".stripMargin
  }
}
