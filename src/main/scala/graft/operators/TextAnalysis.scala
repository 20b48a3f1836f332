package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID, content fingerprinting.
  *
  * Everything is built from codegen'd `functions._` expressions (no
  * UDFs): at 100 TB these run inside whole-stage codegen directly over
  * the parquet scan with zero shuffles (all are per-row maps followed by
  * an optional aggregate).
  */
object TextAnalysis {

  /** Non-empty whitespace-separated tokens. */
  private def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  /** Token counting: words, characters, and a BPE-ish subword estimate
    * (English averages ~4 chars/token; the estimate is ceil(chars/4),
    * the standard quick sizing heuristic for LLM corpora).
    */
  def textTokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        size(tokens($"text")).as("n_tokens"),
        length($"text").as("n_chars"),
        ceil(length($"text") / lit(4.0)).cast("long").as("n_subwords_est"),
        size(array_distinct(tokens($"text"))).as("n_unique_tokens"))
      .orderBy($"doc_id")
  }

  val textTokensSql: String =
    """SELECT doc_id,
      |  CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS INT) AS n_tokens,
      |  CAST(length(text) AS INT) AS n_chars,
      |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_subwords_est,
      |  CAST(len(list_distinct(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS INT) AS n_unique_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Quality scoring: length, punctuation density, stopword ratio,
    * lexical diversity — combined into a 0-1 score. All ratios are exact
    * integer-over-integer double divisions, so the score is
    * deterministic across engines.
    */
  /** Per-doc quality scoring over ANY documents frame (batch or
    * stream) — the pure per-row map [[textQuality]] sorts for the
    * batch report and the streaming conformal gate applies in-flight.
    * Token statistics via the ONE-PASS native token_stats kernel
    * (whole-stage codegen) instead of three interpreted HOF chains;
    * the statistics — and therefore the score — are bit-identical to
    * the composable form (FiltersSpec pins the kernel equality).
    */
  /** `keep`: extra input columns carried through unchanged (r14 — lets
    * a caller derive per-doc flags on the SAME corpus scan instead of
    * re-scanning and joining them back by doc_id; the score columns
    * and arithmetic are untouched for every existing caller). */
  def qualityScored(docs: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val keepCols = keep.map(col)
    val base = docs
      .select(Seq(col("doc_id"), col("text"),
        graft.functions.StringFunctions.token_stats(col("text"), stopwords).as("ts"))
        ++ keepCols: _*)
      .select(Seq(col("doc_id"),
        col("ts.n_tokens").cast("double").as("n_tok"),
        col("ts.n_stop").cast("double").as("n_stop"),
        col("ts.n_uniq").cast("double").as("n_uniq"),
        // punct count = len − len(translate-away): exactly the old
        // length(regexp_replace(text, "[^.,!?;:]", "")) value (both
        // count codepoints in the 6-char class) without running a
        // per-character regex engine over every document (r13; the
        // score arithmetic below is untouched and stays oracle-pinned)
        (length(col("text")) - length(translate(col("text"), ".,!?;:", "")))
          .cast("double").as("n_punct"),
        length(col("text")).cast("double").as("n_chars"))
        ++ keepCols: _*)
    val stopRatio = col("n_stop") / greatest(col("n_tok"), lit(1.0))
    val punctRatio = col("n_punct") / greatest(col("n_chars"), lit(1.0))
    val diversity = col("n_uniq") / greatest(col("n_tok"), lit(1.0))
    val lengthScore = least(col("n_tok") / lit(50.0), lit(1.0))
    base.select(Seq(col("doc_id"),
      col("n_tok").cast("int").as("n_tokens"),
      round(stopRatio, 6).as("stop_ratio"),
      round(punctRatio, 6).as("punct_ratio"),
      round(diversity, 6).as("diversity"),
      round(lit(0.35) * lengthScore + lit(0.25) * stopRatio
        + lit(0.25) * diversity + lit(0.15) * (lit(1.0) - punctRatio), 6)
        .as("quality_score"))
      ++ keepCols: _*)
  }

  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    qualityScored(Tables.documents(spark, dir)).orderBy($"doc_id")
  }

  val textQualitySql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    val stopList = stopwords.map(s => s"'$s'").mkString("[", ",", "]")
    s"""WITH t AS (
      |  SELECT doc_id,
      |    CAST(len($toks) AS DOUBLE) AS n_tok,
      |    CAST(len(list_filter($toks, x -> list_contains($stopList, x))) AS DOUBLE) AS n_stop,
      |    CAST(len(list_distinct($toks)) AS DOUBLE) AS n_uniq,
      |    CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) AS n_punct,
      |    CAST(length(text) AS DOUBLE) AS n_chars
      |  FROM documents)
      |SELECT doc_id, CAST(n_tok AS INT) AS n_tokens,
      |  round(n_stop / greatest(n_tok, 1.0), 6) AS stop_ratio,
      |  round(n_punct / greatest(n_chars, 1.0), 6) AS punct_ratio,
      |  round(n_uniq / greatest(n_tok, 1.0), 6) AS diversity,
      |  round(0.35 * least(n_tok / 50.0, 1.0) + 0.25 * (n_stop / greatest(n_tok, 1.0))
      |    + 0.25 * (n_uniq / greatest(n_tok, 1.0))
      |    + 0.15 * (1.0 - n_punct / greatest(n_chars, 1.0)), 6) AS quality_score
      |FROM t ORDER BY doc_id""".stripMargin
  }

  /** Language ID: character-class + stopword-profile heuristic (CJK
    * regex, then distinctive function words per language, else English).
    * The `lang` column from the source is carried through so accuracy
    * can be inspected; the prediction itself is the operator.
    */
  def textLangid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = concat(lit(" "), $"text", lit(" "))
    val pred =
      when($"text".rlike("[\\u4e00-\\u9fff]"), "zh")
        .when(t.rlike(" (der|die|das|und|nicht) "), "de")
        .when(t.rlike(" (le|la|les|et|est) "), "fr")
        .when(t.rlike(" (el|los|las|es|y) "), "es")
        .otherwise("en")
    Tables.documents(spark, dir)
      .select($"doc_id", $"lang".as("labeled_lang"), pred.as("pred_lang"))
      .orderBy($"doc_id")
  }

  val textLangidSql: String =
    """SELECT doc_id, lang AS labeled_lang,
      |  CASE
      |    WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
      |    WHEN regexp_matches(' ' || text || ' ', ' (der|die|das|und|nicht) ') THEN 'de'
      |    WHEN regexp_matches(' ' || text || ' ', ' (le|la|les|et|est) ') THEN 'fr'
      |    WHEN regexp_matches(' ' || text || ' ', ' (el|los|las|es|y) ') THEN 'es'
      |    ELSE 'en' END AS pred_lang
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Language-ID confusion matrix against the labeled lang column —
    * the classifier-quality gate behind every lang-filtered mixture
    * decision (a langid that leaks zh into the en bucket silently
    * poisons the mix): per (labeled, predicted) cell the count, the
    * labeled-class share (row-normalized recall), and a correct flag.
    * One partial-agg shuffle to a |langs|² table; the per-cell share
    * divides exact longs against a broadcast-size row total.
    */
  def langConfusion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = concat(lit(" "), $"text", lit(" "))
    val pred =
      when($"text".rlike("[\\u4e00-\\u9fff]"), "zh")
        .when(t.rlike(" (der|die|das|und|nicht) "), "de")
        .when(t.rlike(" (le|la|les|et|est) "), "fr")
        .when(t.rlike(" (el|los|las|es|y) "), "es")
        .otherwise("en")
    val cells = Tables.documents(spark, dir)
      .select($"lang".as("labeled_lang"), pred.as("pred_lang"))
      .groupBy($"labeled_lang", $"pred_lang")
      .agg(count(lit(1)).as("n"))
    val rowTot = cells.groupBy($"labeled_lang").agg(sum($"n").as("row_n"))
    cells.join(rowTot, "labeled_lang")
      .select($"labeled_lang", $"pred_lang", $"n",
        round($"n".cast("double") / $"row_n".cast("double"), 6).as("share"),
        ($"labeled_lang" === $"pred_lang").as("correct"))
      .orderBy($"labeled_lang", $"pred_lang")
  }

  val langConfusionSql: String =
    """WITH p AS (
      |  SELECT lang AS labeled_lang,
      |    CASE
      |      WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
      |      WHEN regexp_matches(' ' || text || ' ', ' (der|die|das|und|nicht) ') THEN 'de'
      |      WHEN regexp_matches(' ' || text || ' ', ' (le|la|les|et|est) ') THEN 'fr'
      |      WHEN regexp_matches(' ' || text || ' ', ' (el|los|las|es|y) ') THEN 'es'
      |      ELSE 'en' END AS pred_lang
      |  FROM documents),
      |c AS (SELECT labeled_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
      |      FROM p GROUP BY labeled_lang, pred_lang),
      |r AS (SELECT labeled_lang, CAST(sum(n) AS BIGINT) AS row_n
      |      FROM c GROUP BY labeled_lang)
      |SELECT c.labeled_lang, pred_lang, n,
      |  round(CAST(n AS DOUBLE) / CAST(row_n AS DOUBLE), 6) AS share,
      |  c.labeled_lang = pred_lang AS correct
      |FROM c JOIN r ON c.labeled_lang = r.labeled_lang
      |ORDER BY c.labeled_lang, pred_lang""".stripMargin

  /** Language mix per source — the corpus-composition report a training
    * mix is planned against (per-source language shares drive sampling
    * weights for multilingual models). The language predicate is the
    * [[textLangid]] classifier fused into the scan; the aggregate is
    * one partial-agg shuffle to a |sources|×|langs| table, and the
    * share divides exact longs inside each source partition of that
    * tiny table.
    */
  def langMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = concat(lit(" "), $"text", lit(" "))
    val pred =
      when($"text".rlike("[\\u4e00-\\u9fff]"), "zh")
        .when(t.rlike(" (der|die|das|und|nicht) "), "de")
        .when(t.rlike(" (le|la|les|et|est) "), "fr")
        .when(t.rlike(" (el|los|las|es|y) "), "es")
        .otherwise("en")
    Tables.documents(spark, dir)
      .select($"source", pred.as("pred_lang"))
      .groupBy($"source", $"pred_lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("share", $"n_docs".cast("double")
        / sum($"n_docs").over(org.apache.spark.sql.expressions.Window
            .partitionBy($"source")).cast("double"))
      .orderBy($"source", $"pred_lang")
  }

  val langMixSql: String =
    """WITH p AS (
      |  SELECT source,
      |    CASE
      |      WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
      |      WHEN regexp_matches(' ' || text || ' ', ' (der|die|das|und|nicht) ') THEN 'de'
      |      WHEN regexp_matches(' ' || text || ' ', ' (le|la|les|et|est) ') THEN 'fr'
      |      WHEN regexp_matches(' ' || text || ' ', ' (el|los|las|es|y) ') THEN 'es'
      |      ELSE 'en' END AS pred_lang
      |  FROM documents),
      |g AS (SELECT source, pred_lang, count(*) AS n_docs FROM p GROUP BY source, pred_lang)
      |SELECT source, pred_lang, n_docs,
      |  CAST(n_docs AS DOUBLE)
      |    / CAST(sum(n_docs) OVER (PARTITION BY source) AS DOUBLE) AS share
      |FROM g ORDER BY source, pred_lang""".stripMargin

  /** TF-IDF top-3 terms per document — the explode→two-level-aggregate
    * shape: tf on (doc, term), df on term, score = tf·ln(N/df), ranked
    * per doc. One shuffle per aggregate. The tf⋈df join is NOT force-
    * broadcast: the document-frequency table is the corpus's distinct
    * vocabulary, which at web scale does not fit in a broadcast — AQE
    * picks broadcast when the measured size allows and falls back to a
    * shuffle hash join when it doesn't. (The scalar n_docs broadcast is
    * a single row and always safe.)
    */
  def textTfidf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val words = docs.select($"doc_id", explode(tokens($"text")).as("w"))
    val tf = words.groupBy($"doc_id", $"w").agg(count(lit(1)).as("tf"))
    val df = words.select($"doc_id", $"w").distinct()
      .groupBy($"w").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val rk = Window.partitionBy($"doc_id").orderBy($"score".desc, $"w")
    tf.join(df, "w")
      .crossJoin(broadcast(n))
      .withColumn("score", $"tf" * log($"n_docs".cast("double") / $"df"))
      .withColumn("rk", row_number().over(rk))
      .filter($"rk" <= 3)
      .select($"doc_id", $"rk", $"w".as("term"), round($"score", 6).as("tfidf"))
      .orderBy($"doc_id", $"rk")
  }

  val textTfidfSql: String =
    """WITH words AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS w
      |  FROM documents),
      |tf AS (SELECT doc_id, w, count(*) AS tf FROM words GROUP BY doc_id, w),
      |df AS (SELECT w, count(DISTINCT doc_id) AS df FROM words GROUP BY w),
      |n AS (SELECT count(*) AS n_docs FROM documents)
      |SELECT doc_id, rk, term, tfidf FROM (
      |  SELECT tf.doc_id, tf.w AS term,
      |    round(tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df), 6) AS tfidf,
      |    row_number() OVER (PARTITION BY tf.doc_id
      |      ORDER BY tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df) DESC, tf.w) AS rk
      |  FROM tf JOIN df ON tf.w = df.w CROSS JOIN n) t
      |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  /** BM25 retrieval scoring (Robertson/Lucene idf variant, k1=1.2,
    * b=0.75) for a fixed query over the corpus — the ranked-retrieval
    * complement to tf·idf, used in training-data curation to pull
    * topical slices. Only query-term postings leave the token explode
    * (the filter is pushed below the tf groupBy), df/avgdl are
    * broadcast scalars, and the global top-k sort is WindowGroupLimit-
    * pruned. Per-doc scores add the per-term components in FIXED query
    * order (never a float `sum` over an unordered group), so ranking is
    * bit-stable and the oracle reproduces it exactly.
    */
  /** Boolean AND retrieval: documents containing EVERY query term,
    * ranked by total term frequency (the filter-mode complement to
    * BM25's ranked scoring — dataset slicing wants hard conjunctions).
    * The term filter is pushed below the tf aggregate so only query-term
    * postings leave the explode; the conjunction is countDistinct(term)
    * = |query| on the per-doc aggregate — one shuffle total.
    */
  def booleanSearch(spark: SparkSession, dir: String,
                    query: Seq[String] = Seq("spark", "query", "window")): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", explode(tokens($"text")).as("w"))
      .filter($"w".isin(query: _*))
      .groupBy($"doc_id")
      .agg(countDistinct($"w").as("n_terms"), count(lit(1)).as("total_tf"))
      .filter($"n_terms" === query.length)
      .select($"doc_id", $"total_tf")
      .orderBy($"total_tf".desc, $"doc_id")
  }

  val booleanSearchSql: String =
    """SELECT doc_id, count(*) AS total_tf
      |FROM (SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS w
      |      FROM documents) t
      |WHERE w IN ('spark', 'query', 'window')
      |GROUP BY doc_id
      |HAVING count(DISTINCT w) = 3
      |ORDER BY total_tf DESC, doc_id""".stripMargin

  def bm25Search(spark: SparkSession, dir: String,
                 query: Seq[String] = Seq("spark", "query", "window"),
                 k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    import spark.implicits._
    val sized = Tables.documents(spark, dir)
      .select($"doc_id", tokens($"text").as("toks"))
      .select($"doc_id", $"toks", size($"toks").cast("long").as("dl"))
    val stats = sized.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
    val tf = sized.select($"doc_id", $"dl", explode($"toks").as("w"))
      .filter($"w".isin(query: _*))
      .groupBy($"doc_id", $"dl", $"w").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"w").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), "w").crossJoin(broadcast(stats))
      .withColumn("avgdl", $"sum_dl".cast("double") / $"n_docs".cast("double"))
      .withColumn("idf",
        log(($"n_docs" - $"df" + 0.5) / ($"df" + 0.5) + 1.0))
      .withColumn("s", $"idf" * ($"tf" * lit(k1 + 1)) /
        ($"tf" + lit(k1) * (lit(1 - b) + lit(b) * $"dl".cast("double") / $"avgdl")))
    val perTerm = query.map(t => max(when($"w" === t, $"s")).as("s_" + t))
    val grouped = scored.groupBy($"doc_id").agg(perTerm.head, perTerm.tail: _*)
    val score = query.map(t => coalesce(col("s_" + t), lit(0.0))).reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(score.desc, $"doc_id")
    grouped
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= topK)
      .select($"doc_id", $"rk", round(score, 6).as("score"))
      .orderBy($"rk")
  }

  val bm25SearchSql: String =
    """WITH sized AS (
      |  SELECT doc_id,
      |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS dl,
      |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM sized),
      |tf AS (
      |  SELECT doc_id, dl, w, count(*) AS tf
      |  FROM (SELECT doc_id, dl, unnest(t) AS w FROM sized)
      |  WHERE w IN ('spark', 'query', 'window') GROUP BY doc_id, dl, w),
      |dfq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
      |s AS (
      |  SELECT tf.doc_id, tf.w,
      |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
      |      * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
      |        / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))) AS sc
      |  FROM tf JOIN dfq ON tf.w = dfq.w CROSS JOIN stats),
      |per AS (
      |  SELECT doc_id,
      |    max(sc) FILTER (w = 'spark') AS s_spark,
      |    max(sc) FILTER (w = 'query') AS s_query,
      |    max(sc) FILTER (w = 'window') AS s_window
      |  FROM s GROUP BY doc_id)
      |SELECT doc_id, rk, round(raw, 6) AS score FROM (
      |  SELECT doc_id,
      |    coalesce(s_spark, 0) + coalesce(s_query, 0) + coalesce(s_window, 0) AS raw,
      |    row_number() OVER (ORDER BY
      |      coalesce(s_spark, 0) + coalesce(s_query, 0) + coalesce(s_window, 0) DESC,
      |      doc_id) AS rk
      |  FROM per) ranked
      |WHERE rk <= 20 ORDER BY rk""".stripMargin

  private val RrfKConst = 60L // the standard RRF smoothing constant
  private val RrfCut = 50     // per-ranker rank cutoff

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009)
    * of two retrieval rankers over the same fixed query — [[bm25Search]]
    * (length-normalized probabilistic ranking) and the raw
    * total-term-frequency ranker (the counting baseline): RRF(d) =
    * Σ_r 1/(k + rank_r(d)), k = 60, ranks beyond 50 dropped. The
    * standard ensemble trick for combining heterogeneous retrievers
    * (lexical + semantic in production; two lexical rankers here keep
    * the oracle exact) — documents ranked highly by BOTH rise above
    * either ranker's idiosyncratic top.
    *
    * Exactness: each reciprocal is the exact integer 10⁹ div (60+rank)
    * (truncated division agrees across engines); the fused score is an
    * integer sum, so ranking ties break deterministically on doc_id.
    * Scale: both rankers are query-term-posting-bounded (the bm25
    * pushdown discipline); the fusion joins two ≤50-row rank lists.
    */
  def rrfFusion(spark: SparkSession, dir: String,
                query: Seq[String] = Seq("spark", "query", "window"),
                topK: Int = 20): DataFrame = {
    import spark.implicits._
    val recip = (r: Column) =>
      (lit(1000000000L) - (lit(1000000000L) % (lit(RrfKConst) + r)))
        ./(lit(RrfKConst) + r).cast("long")
    val a = bm25Search(spark, dir, query, topK = RrfCut)
      .select($"doc_id", $"rk".as("rank_bm25"))
    val wTf = org.apache.spark.sql.expressions.Window
      .orderBy($"total_tf".desc, $"doc_id")
    val b = Tables.documents(spark, dir)
      .select($"doc_id", explode(tokens($"text")).as("w"))
      .filter($"w".isin(query: _*))
      .groupBy($"doc_id").agg(count(lit(1)).as("total_tf"))
      .withColumn("rank_tf", row_number().over(wTf))
      .filter($"rank_tf" <= RrfCut)
      .select($"doc_id", $"rank_tf")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"rrf_nano".desc, $"doc_id")
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("rrf_nano",
        coalesce(recip($"rank_bm25"), lit(0L)) + coalesce(recip($"rank_tf"), lit(0L)))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= topK)
      .select($"rk", $"doc_id", $"rank_bm25", $"rank_tf", $"rrf_nano",
        round($"rrf_nano".cast("double") / 1e9, 6).as("rrf"))
      .orderBy($"rk")
  }

  val rrfFusionSql: String =
    """WITH sized AS (
      |  SELECT doc_id,
      |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS dl,
      |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM sized),
      |tf AS (
      |  SELECT doc_id, dl, w, count(*) AS tf
      |  FROM (SELECT doc_id, dl, unnest(t) AS w FROM sized)
      |  WHERE w IN ('spark', 'query', 'window') GROUP BY doc_id, dl, w),
      |dfq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
      |s AS (
      |  SELECT tf.doc_id, tf.w,
      |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
      |      * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
      |        / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))) AS sc
      |  FROM tf JOIN dfq ON tf.w = dfq.w CROSS JOIN stats),
      |per AS (
      |  SELECT doc_id,
      |    max(sc) FILTER (w = 'spark') AS s_spark,
      |    max(sc) FILTER (w = 'query') AS s_query,
      |    max(sc) FILTER (w = 'window') AS s_window
      |  FROM s GROUP BY doc_id),
      |bm AS (
      |  SELECT doc_id, rk AS rank_bm25 FROM (
      |    SELECT doc_id,
      |      row_number() OVER (ORDER BY
      |        coalesce(s_spark, 0) + coalesce(s_query, 0) + coalesce(s_window, 0) DESC,
      |        doc_id) AS rk
      |    FROM per) ranked
      |  WHERE rk <= 50),
      |tfr AS (
      |  SELECT doc_id, rk AS rank_tf FROM (
      |    SELECT doc_id,
      |      row_number() OVER (ORDER BY count(*) DESC, doc_id) AS rk
      |    FROM (SELECT doc_id, unnest(t) AS w FROM sized)
      |    WHERE w IN ('spark', 'query', 'window') GROUP BY doc_id) ranked
      |  WHERE rk <= 50),
      |fused AS (
      |  SELECT coalesce(bm.doc_id, tfr.doc_id) AS doc_id,
      |    bm.rank_bm25, tfr.rank_tf,
      |    coalesce(1000000000 // (60 + bm.rank_bm25), 0)
      |      + coalesce(1000000000 // (60 + tfr.rank_tf), 0) AS rrf_nano
      |  FROM bm FULL OUTER JOIN tfr ON bm.doc_id = tfr.doc_id)
      |SELECT rk, doc_id, CAST(rank_bm25 AS INT) AS rank_bm25,
      |  CAST(rank_tf AS INT) AS rank_tf,
      |  CAST(rrf_nano AS BIGINT) AS rrf_nano,
      |  round(CAST(rrf_nano AS DOUBLE) / 1e9, 6) AS rrf
      |FROM (
      |  SELECT *, CAST(row_number() OVER (ORDER BY rrf_nano DESC, doc_id) AS INT) AS rk
      |  FROM fused) t
      |WHERE rk <= 20 ORDER BY rk""".stripMargin

  /** Exact phrase search — every positioned occurrence of the corpus's
    * most frequent token bigram (count ties → lexicographically
    * smallest), reported per containing document with its hit count
    * and first position (1-based). The position-aware retrieval
    * primitive behind quote mining, boilerplate hunting, and n-gram
    * provenance checks: [[boolean_search]] answers "which docs contain
    * these TERMS"; this answers "where exactly does this PHRASE occur".
    *
    * Scale: bigrams come from ONE per-doc lead() window over the
    * posexploded tokens (doc-keyed shuffle, no self-join on
    * positions); the argmax phrase is a 1-row broadcast; occurrence
    * collection is a broadcast-probe of that phrase back over the
    * bigram stream — corpus text never rides a shuffle. All counts
    * and positions are integers; no floats anywhere.
    */
  def phraseSearch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos")
    val big = Tables.documents(spark, dir)
      .select($"doc_id", posexplode(tokens($"text")).as(Seq("pos", "tok")))
      .withColumn("nxt", lead($"tok", 1).over(w))
      .filter($"nxt".isNotNull)
      .select($"doc_id", $"pos", concat($"tok", lit(" "), $"nxt").as("bigram"))
    val top = big.groupBy($"bigram").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"bigram").limit(1).select($"bigram")
    big.join(broadcast(top), "bigram")
      .groupBy($"doc_id", $"bigram")
      .agg(count(lit(1)).as("n_hits"), (min($"pos") + 1).cast("long").as("first_pos"))
      .select($"doc_id", $"bigram".as("phrase"), $"n_hits", $"first_pos")
      .orderBy($"doc_id")
  }

  val phraseSearchSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |big AS (
      |  SELECT doc_id, CAST(i AS INT) AS pos, t[i] || ' ' || t[i + 1] AS bigram
      |  FROM toks, unnest(range(1, len(t))) r(i)),
      |top AS (
      |  SELECT bigram FROM big GROUP BY bigram
      |  ORDER BY count(*) DESC, bigram LIMIT 1)
      |SELECT b.doc_id, b.bigram AS phrase,
      |  CAST(count(*) AS BIGINT) AS n_hits,
      |  CAST(min(b.pos) AS BIGINT) AS first_pos
      |FROM big b JOIN top USING (bigram)
      |GROUP BY b.doc_id, b.bigram
      |ORDER BY b.doc_id""".stripMargin

  /** Content fingerprinting: md5 plus a 64-bit polynomial rolling hash
    * (base-31 mod 1e9+7 over the character codepoints — the classic
    * Rabin-Karp fingerprint), both deterministic across engines.
    *
    * The hash is the native [[graft.functions.RollingHash]] kernel: the
    * equivalent `aggregate(transform(split(text, ""), ascii), ...)` HOF
    * chain is CodegenFallback — an interpreted per-CHARACTER lambda
    * frame on a corpus-scan path (the PQ-encode overflow shape) —
    * where the kernel is one generated-loop call per row
    * (RollingHashSpec pins kernel ≡ HOF on real corpus text).
    */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", md5($"text").as("md5_fp"),
        graft.functions.StringFunctions.rolling_hash($"text").as("rolling_fp"))
      .orderBy($"doc_id")
  }

  val textFingerprintSql: String =
    """SELECT doc_id, md5(text) AS md5_fp,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(split(text, ''), x -> CAST(unicode(x) AS BIGINT))),
      |    (a, b) -> (a * 31 + b) % 1000000007) AS rolling_fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Gopher-style repetition filters: top-bigram fraction and
    * duplicated-trigram fraction per document (Rae et al. 2021 §A1.1,
    * the "repetitious text" removal rules). Computed distributively:
    * posexplode tokens, window-lead to form n-grams (one shuffle keyed
    * by doc_id, both n-gram sizes share it), then count/aggregate —
    * never a per-doc HOF loop, so a 100 TB corpus spreads across
    * executors with map-side partial aggregation. Defined for docs with
    * ≥3 tokens (every shorter doc is degenerate for both rules).
    */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos")
    val grams = Tables.documents(spark, dir)
      .select($"doc_id", posexplode(tokens($"text")).as(Seq("pos", "tok")))
      .withColumn("nxt1", lead($"tok", 1).over(w))
      .withColumn("nxt2", lead($"tok", 2).over(w))
    val bg = grams.filter($"nxt1".isNotNull)
      .groupBy($"doc_id", concat_ws(" ", $"tok", $"nxt1").as("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(
        sum($"c").as("n_bg"), max($"c").as("top_bg"))
    val tri = grams.filter($"nxt2".isNotNull)
      .groupBy($"doc_id", concat_ws(" ", $"tok", $"nxt1", $"nxt2").as("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(
        sum($"c").as("n_tri"),
        sum(when($"c" > 1, $"c").otherwise(0L)).as("dup_tri"))
    bg.join(tri, "doc_id")
      .select($"doc_id", $"n_bg",
        round($"top_bg".cast("double") / $"n_bg".cast("double"), 6).as("top_bigram_frac"),
        round($"dup_tri".cast("double") / $"n_tri".cast("double"), 6).as("dup_trigram_frac"))
      .orderBy($"doc_id")
  }

  val textRepetitionSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
      |  FROM toks WHERE len(t) >= 2),
      |tri AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
      |  FROM toks WHERE len(t) >= 3),
      |bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
      |tric AS (SELECT doc_id, g, count(*) AS c FROM tri GROUP BY doc_id, g),
      |bgs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bg, CAST(max(c) AS BIGINT) AS top_bg
      |        FROM bgc GROUP BY doc_id),
      |tris AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tri,
      |         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_tri
      |         FROM tric GROUP BY doc_id)
      |SELECT bgs.doc_id, n_bg,
      |  round(CAST(top_bg AS DOUBLE) / CAST(n_bg AS DOUBLE), 6) AS top_bigram_frac,
      |  round(CAST(dup_tri AS DOUBLE) / CAST(n_tri AS DOUBLE), 6) AS dup_trigram_frac
      |FROM bgs JOIN tris ON bgs.doc_id = tris.doc_id
      |ORDER BY bgs.doc_id""".stripMargin

  // ------------------------------------------------------------------
  // text_compressibility — distinct-4-gram compression proxy
  // ------------------------------------------------------------------

  /** Per-source compressibility proxy: the distinct/total ratio of
    * token 4-grams — the cheap stand-in for the gzip-ratio quality
    * signal the large corpus filters use (a Gopher-family
    * repetitiveness screen; Rae et al. 2021 §A1): templated or
    * stuttering text re-uses its own 4-grams, so its ratio collapses
    * while natural text stays near 1. Complements [[textRepetition]]
    * (per-doc TOP-gram mass) with the corpus-level DISTINCT-mass view
    * plus the share of docs that a 0.5-ratio screen would drop.
    *
    * Exactness: per-doc gram totals/distincts are exact ints computed
    * INSIDE the row (array transform + array_distinct — no per-gram
    * shuffle), source sums are exact longs, and the two display ratios
    * are single double divisions. The repetitive test is the integer
    * comparison d·2 < g. Docs under 4 tokens have no 4-gram and are
    * excluded (the textRepetition degenerate-doc convention). Scale:
    * map-only per-doc work + ONE source-grid aggregate.
    */
  def textCompressibility(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"source", tokens($"text").as("t"))
      .filter(size($"t") >= 4)
      .select($"source",
        expr("transform(sequence(1, size(t) - 3)," +
          " i -> array_join(slice(t, i, 4), ' '))").as("grams"))
      .select($"source", size($"grams").cast("long").as("g"),
        size(array_distinct($"grams")).cast("long").as("d"))
      .groupBy($"source").agg(
        count(lit(1)).as("n_docs"),
        sum($"g").as("grams_total"),
        sum($"d").as("grams_distinct"),
        sum(when($"d" * 2 < $"g", 1L).otherwise(0L)).as("repetitive_docs"))
      .select($"source", $"n_docs", $"grams_total", $"grams_distinct",
        round($"grams_distinct".cast("double") / $"grams_total", 6)
          .as("compress_proxy"),
        $"repetitive_docs",
        round($"repetitive_docs".cast("double") / $"n_docs", 6)
          .as("repetitive_share"))
      .orderBy($"source")
  }

  val textCompressibilitySql: String =
    """WITH toks AS (
      |  SELECT source, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |g AS (
      |  SELECT source,
      |    [array_to_string(t[i:i+3], ' ') for i in range(1, len(t) - 2)] AS grams
      |  FROM toks WHERE len(t) >= 4),
      |s AS (
      |  SELECT source, CAST(len(grams) AS BIGINT) AS g,
      |    CAST(len(list_distinct(grams)) AS BIGINT) AS d
      |  FROM g)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(g) AS BIGINT) AS grams_total,
      |  CAST(sum(d) AS BIGINT) AS grams_distinct,
      |  round(CAST(sum(d) AS DOUBLE) / sum(g), 6) AS compress_proxy,
      |  CAST(sum(CASE WHEN d * 2 < g THEN 1 ELSE 0 END) AS BIGINT)
      |    AS repetitive_docs,
      |  round(CAST(sum(CASE WHEN d * 2 < g THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 6) AS repetitive_share
      |FROM s GROUP BY source
      |ORDER BY source""".stripMargin

  // ------------------------------------------------------------------
  // lexicon_screen — blocklist hit-rate audit per source
  // ------------------------------------------------------------------

  // the demo blocklist, shared between engine and oracle (a real
  // pipeline swaps in its toxicity/PII term list — the machinery is
  // exact token matching against a literal lexicon, in-row)
  private[graft] val ScreenLexicon = Seq("slow", "dup", "merge")

  /** Blocklist lexicon audit — the content-filter PLANNING report run
    * before enforcing a term screen (the C4/Gopher "bad words list"
    * stage): per source, how many documents the lexicon would flag,
    * what fraction of the token stream the flagged terms are, and the
    * worst per-doc hit count. Read next to [[textPiiScrub]] (regex
    * screens) and `gopher_rules` (statistical screens) when composing
    * the cleaning pipeline; the flagged share is the data-loss price
    * of enforcement.
    *
    * Exactness: hits are exact in-row counts (array filter against the
    * literal lexicon — no UDF, no shuffle per token), source sums are
    * exact longs, display ratios are single double divisions. Scale:
    * map-only per-doc work + ONE source-grid aggregate; the lexicon is
    * a literal in the plan (at 100 TB a large term list becomes a
    * broadcast map-side join — same shape, still no extra exchange of
    * corpus rows).
    */
  /** Per-doc lexicon flags from any (doc_id, source, text) frame —
    * narrow expressions only, so the identical column set serves the
    * batch report and the streaming gate (the gramTable convention).
    */
  private[graft] def lexiconFlags(docs: DataFrame): DataFrame = {
    val lexArr = ScreenLexicon.map(t => s"'$t'").mkString(", ")
    docs
      .select(col("doc_id"), col("source"), tokens(col("text")).as("t"))
      .select(col("doc_id"), col("source"),
        size(col("t")).cast("long").as("n_toks"),
        expr(s"CAST(size(filter(t, x -> array_contains(array($lexArr), x))) AS BIGINT)")
          .as("hits"))
      .withColumn("blocked", col("hits") > 0L)
  }

  def lexiconScreen(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    lexiconFlags(Tables.documents(spark, dir))
      .groupBy($"source").agg(
        count(lit(1)).as("n_docs"),
        sum($"n_toks").as("tokens_total"),
        sum($"hits").as("hit_tokens"),
        sum(when($"hits" > 0, 1L).otherwise(0L)).as("docs_flagged"),
        max($"hits").as("max_doc_hits"))
      .select($"source", $"n_docs", $"tokens_total", $"hit_tokens",
        $"docs_flagged", $"max_doc_hits",
        round($"hit_tokens".cast("double") / $"tokens_total", 6)
          .as("hit_rate"),
        round($"docs_flagged".cast("double") / $"n_docs", 6)
          .as("flagged_share"))
      .orderBy($"source")
  }

  val lexiconScreenSql: String = {
    val lexArr = ScreenLexicon.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (
      |  SELECT source, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
      |  FROM documents),
      |s AS (
      |  SELECT source, CAST(len(t) AS BIGINT) AS n_toks,
      |    CAST(len(list_filter(t, x -> list_contains([$lexArr], x))) AS BIGINT)
      |      AS hits
      |  FROM toks)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_toks) AS BIGINT) AS tokens_total,
      |  CAST(sum(hits) AS BIGINT) AS hit_tokens,
      |  CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_flagged,
      |  CAST(max(hits) AS BIGINT) AS max_doc_hits,
      |  round(CAST(sum(hits) AS DOUBLE) / sum(n_toks), 6) AS hit_rate,
      |  round(CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 6) AS flagged_share
      |FROM s GROUP BY source
      |ORDER BY source""".stripMargin
  }

  /** The composed cleaning decision a training-data pipeline actually
    * ships: per-doc flags from the individual filters — token-count
    * bounds, stopword-ratio floor (gibberish guard), top-bigram
    * repetition ceiling, exact-dup canonicality (min doc_id per md5
    * wins) — AND'd into one `keep`. One pass builds everything except
    * the bigram aggregate (one extra doc_id-keyed shuffle) and the
    * md5 canonicality window (one shuffle on a 16-byte digest); at
    * 100 TB the filters stay per-row/per-doc — nothing global except
    * the digest partition.
    */
  def pipelineClean(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stopArr = array(stopwords.map(lit): _*)
    val base = Tables.documents(spark, dir)
      .select($"doc_id", $"text", tokens($"text").as("toks"))
      .select($"doc_id", $"text", $"toks",
        size($"toks").cast("long").as("n_tokens"),
        round(size(filter($"toks", t => array_contains(stopArr, t))).cast("double")
          / size($"toks").cast("double"), 6).as("stop_ratio"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos")
    val bg = base.select($"doc_id", posexplode($"toks").as(Seq("pos", "tok")))
      .withColumn("nxt", lead($"tok", 1).over(w))
      .filter($"nxt".isNotNull)
      .groupBy($"doc_id", concat_ws(" ", $"tok", $"nxt").as("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(round(max($"c").cast("double") / sum($"c").cast("double"), 6)
        .as("top_bigram_frac"))
    val canon = Tables.documents(spark, dir)
      .select($"doc_id", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(md5($"text")).orderBy($"doc_id")).as("rn"))
    base.join(bg, Seq("doc_id"), "left")
      .na.fill(0.0, Seq("top_bigram_frac"))
      .join(canon, "doc_id")
      .select($"doc_id", $"n_tokens", $"stop_ratio", $"top_bigram_frac",
        ($"rn" === 1).as("is_canonical"),
        ($"n_tokens".between(20, 1000) && $"stop_ratio" >= 0.05 &&
          $"top_bigram_frac" < 0.2 && $"rn" === 1).as("keep"))
      .orderBy($"doc_id")
  }

  lazy val pipelineCleanSql: String =
    """WITH base AS (
      |  SELECT doc_id, text,
      |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |sized AS (
      |  SELECT doc_id, text, t, len(t) AS n_tokens,
      |    round(CAST(len(list_filter(t, x -> list_contains(
      |      ['the','a','an','and','or','of','to','in','is','it'], x))) AS DOUBLE)
      |      / CAST(len(t) AS DOUBLE), 6) AS stop_ratio
      |  FROM base),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
      |  FROM base WHERE len(t) >= 2),
      |bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
      |bgf AS (SELECT doc_id, round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
      |        AS top_bigram_frac FROM bgc GROUP BY doc_id),
      |canon AS (SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |          FROM documents)
      |SELECT s.doc_id, CAST(s.n_tokens AS BIGINT) AS n_tokens, s.stop_ratio,
      |  coalesce(f.top_bigram_frac, 0.0) AS top_bigram_frac,
      |  (c.rn = 1) AS is_canonical,
      |  (s.n_tokens BETWEEN 20 AND 1000 AND s.stop_ratio >= 0.05
      |   AND coalesce(f.top_bigram_frac, 0.0) < 0.2 AND c.rn = 1) AS keep
      |FROM sized s
      |LEFT JOIN bgf f ON s.doc_id = f.doc_id
      |JOIN canon c ON s.doc_id = c.doc_id
      |ORDER BY s.doc_id""".stripMargin

  /** PII scrubbing: regex redaction of emails and phone-like tokens, a
    * per-row codegen'd map over the scan (zero shuffles at any scale).
    * The synthetic corpus carries no PII, so a deterministic fixture is
    * PLANTED on every 7th doc before scrubbing — the operator under
    * test is the scrub, and the oracle sees the same planted input.
    * Patterns stay in the RE2 ∩ java.util.regex common subset so Spark
    * and DuckDB compile them identically.
    */
  def textPiiScrub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emailPat = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
    val phonePat = "555-[0-9]{4}"
    Tables.documents(spark, dir)
      .withColumn("raw", when($"doc_id" % 7 === 0,
        concat($"text", lit(" contact user"), $"doc_id",
          lit("@example.com call 555-"),
          lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
        .otherwise($"text"))
      .select($"doc_id",
        regexp_replace(regexp_replace($"raw", emailPat, "<EMAIL>"),
          phonePat, "<PHONE>").as("scrubbed"),
        regexp_count($"raw", lit(emailPat)).cast("long").as("n_emails"),
        regexp_count($"raw", lit(phonePat)).cast("long").as("n_phones"))
      .orderBy($"doc_id")
  }

  val textPiiScrubSql: String =
    """WITH raw AS (
      |  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN
      |    text || ' contact user' || doc_id || '@example.com call 555-' ||
      |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |  ELSE text END AS raw
      |  FROM documents)
      |SELECT doc_id,
      |  regexp_replace(regexp_replace(raw, '[a-z0-9]+@[a-z0-9]+\.[a-z]+', '<EMAIL>', 'g'),
      |    '555-[0-9]{4}', '<PHONE>', 'g') AS scrubbed,
      |  CAST(len(regexp_extract_all(raw, '[a-z0-9]+@[a-z0-9]+\.[a-z]+')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(raw, '555-[0-9]{4}')) AS BIGINT) AS n_phones
      |FROM raw ORDER BY doc_id""".stripMargin

  /** Per-source quality scorecard — mean quality score, token share,
    * and doc counts per source (the sheet curation decisions read
    * before setting per-source keep rates). The quality expression is
    * [[textQuality]] fused into the scan; the report is one partial-agg
    * shuffle to |sources| rows; the mean divides a 6dp-quantized
    * decimal sum by an exact count; token share is exact ints divided
    * once.
    */
  def sourceQualityReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = textQuality(spark, dir)
      .join(Tables.documents(spark, dir).select($"doc_id", $"source"), "doc_id")
    val per = scored.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens".cast("long")).as("src_tokens"),
        round(sum($"quality_score".cast("decimal(12,6)")).cast("double")
          / count(lit(1)).cast("double"), 6).as("avg_quality"))
    per.crossJoin(broadcast(per.agg(sum($"src_tokens").as("total_tokens"))))
      .select($"source", $"n_docs", $"src_tokens",
        ($"src_tokens".cast("double") / $"total_tokens".cast("double"))
          .as("token_share"),
        $"avg_quality")
      .orderBy($"source")
  }

  val sourceQualityReportSql: String =
    s"""WITH q AS ($textQualitySql),
      |per AS (
      |  SELECT d.source, count(*) AS n_docs,
      |    CAST(sum(CAST(q.n_tokens AS BIGINT)) AS BIGINT) AS src_tokens,
      |    round(CAST(sum(CAST(q.quality_score AS DECIMAL(12,6))) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE), 6) AS avg_quality
      |  FROM q JOIN documents d ON q.doc_id = d.doc_id
      |  GROUP BY d.source),
      |tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens FROM per)
      |SELECT source, n_docs, src_tokens,
      |  CAST(src_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS token_share,
      |  avg_quality
      |FROM per, tot ORDER BY source""".stripMargin

  /** URL / domain extraction — the per-domain volume report web-corpus
    * curation filters on (domain allow/deny lists, per-domain caps).
    * The synthetic corpus carries no URLs, so deterministic fixture
    * links are PLANTED on every 5th doc (two domains, rotating TLD and
    * path) before extraction; the oracle plants identically. Extraction
    * explodes only MATCHED urls (never tokens), the domain strips via
    * one more regexp, and the report is one partial-agg shuffle over
    * |domains| keys. RE2 ∩ java.util.regex pattern subset.
    */
  def urlStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val urlPat = "https?://[a-z0-9.-]+/[a-z0-9/]*"
    Tables.documents(spark, dir)
      .withColumn("raw", when($"doc_id" % 5 === 0,
        concat($"text",
          lit(" see http://site"), ($"doc_id" % 3).cast("string"),
          lit(".example.org/page/"), ($"doc_id" % 10).cast("string"),
          lit(" and https://cdn"), ($"doc_id" % 2).cast("string"),
          lit(".example.com/asset")))
        .otherwise($"text"))
      .select($"doc_id", explode(expr(s"regexp_extract_all(raw, '$urlPat', 0)")).as("url"))
      .select(regexp_extract($"url", "https?://([a-z0-9.-]+)/", 1).as("domain"))
      .groupBy($"domain")
      .agg(count(lit(1)).as("n_urls"))
      .orderBy($"domain")
  }

  val urlStatsSql: String =
    """WITH raw AS (
      |  SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN
      |    text || ' see http://site' || CAST(doc_id % 3 AS VARCHAR) ||
      |      '.example.org/page/' || CAST(doc_id % 10 AS VARCHAR) ||
      |      ' and https://cdn' || CAST(doc_id % 2 AS VARCHAR) || '.example.com/asset'
      |  ELSE text END AS raw
      |  FROM documents),
      |u AS (
      |  SELECT unnest(regexp_extract_all(raw, 'https?://[a-z0-9.-]+/[a-z0-9/]*')) AS url
      |  FROM raw),
      |d AS (SELECT regexp_extract(url, 'https?://([a-z0-9.-]+)/', 1) AS domain FROM u)
      |SELECT domain, count(*) AS n_urls
      |FROM d GROUP BY domain ORDER BY domain""".stripMargin

  /** Character-level Shannon entropy per document (bits/char) — the
    * compressibility proxy quality rules threshold on: boilerplate and
    * repeated-char gibberish sit far below natural text. Chars explode
    * through the same sequence+substring map both engines index
    * identically; per-(doc,char) probabilities are exact int divisions;
    * each −p·ln p term is 9dp-quantized and decimal-summed
    * (order-free), converted to bits by ONE division by ln 2 — the
    * [[TextModel.ngramLmScore]] float doctrine. Two aggregates, both
    * doc-keyed, so the char table shuffles once.
    */
  def charEntropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // native one-pass form: a pure codegen'd map over the scan — no char
    // fan-out, no shuffles but the output sort. Bit-identical to
    // charEntropyComposed (spec-asserted) and to the DuckDB oracle.
    Tables.documents(spark, dir)
      .filter(length($"text") >= 1)
      .select($"doc_id",
        graft.functions.StringFunctions.char_entropy_stats($"text").as("s"))
      .select($"doc_id", $"s.n_chars".as("n_chars"),
        $"s.n_distinct_chars".as("n_distinct_chars"),
        $"s.entropy_bits".as("entropy_bits"))
      .orderBy($"doc_id")
  }

  /** The composable explode→quantize→decimal-sum formulation the native
    * expression must stay bit-identical to (kept as the spec witness —
    * it IS the oracle's arithmetic). */
  def charEntropyComposed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ln2 = 0.6931471805599453
    val chars = Tables.documents(spark, dir)
      .filter(length($"text") >= 1)
      .select($"doc_id", explode(sequence(lit(1), length($"text"))).as("i"), $"text")
      .select($"doc_id", expr("substring(text, i, 1)").as("ch"))
    val counts = chars.groupBy($"doc_id", $"ch").agg(count(lit(1)).as("c"))
      .withColumn("tot", sum($"c").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")))
    val p = $"c".cast("double") / $"tot".cast("double")
    counts
      .select($"doc_id", $"tot",
        round(-(p * log(p)), 9).cast("decimal(18,9)").as("term"))
      .groupBy($"doc_id")
      .agg(max($"tot").as("n_chars"), count(lit(1)).as("n_distinct_chars"),
        sum($"term").as("h"))
      .select($"doc_id", $"n_chars", $"n_distinct_chars",
        round($"h".cast("double") / lit(ln2), 6).as("entropy_bits"))
      .orderBy($"doc_id")
  }

  val charEntropySql: String =
    """WITH ch AS (
      |  SELECT doc_id, text[i:i] AS ch
      |  FROM documents, unnest(range(1, length(text) + 1)) AS t(i)
      |  WHERE length(text) >= 1),
      |cnt AS (
      |  SELECT doc_id, ch, count(*) AS c,
      |    sum(count(*)) OVER (PARTITION BY doc_id) AS tot
      |  FROM ch GROUP BY doc_id, ch),
      |terms AS (
      |  SELECT doc_id, tot,
      |    CAST(round(-((CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))
      |      * ln(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))), 9) AS DECIMAL(18,9)) AS term
      |  FROM cnt)
      |SELECT doc_id, CAST(max(tot) AS BIGINT) AS n_chars,
      |  count(*) AS n_distinct_chars,
      |  round(CAST(sum(term) AS DOUBLE) / 0.6931471805599453, 6) AS entropy_bits
      |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Token-length histogram of the corpus (50-token bins) — the length
    * distribution curation bounds derive from. One per-row token count
    * fused into the scan, one partial-agg shuffle to |bins| rows.
    */
  def docLengthHistogram(spark: SparkSession, dir: String, width: Int = 50): DataFrame = {
    import spark.implicits._
    val nTok = size(filter(split($"text", "\\s+"), t => t =!= ""))
    Tables.documents(spark, dir)
      .select(nTok.cast("long").as("n_tokens"))
      .withColumn("bin", expr(s"n_tokens div $width").cast("int"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("tokens_in_bin"))
      .select($"bin", ($"bin" * width).cast("long").as("bin_lo"),
        $"n_docs", $"tokens_in_bin")
      .orderBy($"bin")
  }

  val docLengthHistogramSql: String =
    """WITH t AS (
      |  SELECT CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
      |    AS BIGINT) AS n_tokens
      |  FROM documents)
      |SELECT CAST(n_tokens // 50 AS INT) AS bin,
      |  CAST(min(n_tokens // 50) * 50 AS BIGINT) AS bin_lo,
      |  count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS tokens_in_bin
      |FROM t GROUP BY 1 ORDER BY bin""".stripMargin

  // ------------------------------------------------------------------
  // pii_scrub — PII detection + redaction report per source
  // ------------------------------------------------------------------

  private val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PiiIp = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val PiiNum = "\\b\\d{7,}\\b"

  /** PII scrub: detect and redact emails, IPv4 addresses, and long
    * digit runs (id/SSN-shaped), reporting per-source hit counts and a
    * checksum of the REDACTED corpus — the pre-release privacy pass
    * every public training-data drop runs. The synthetic corpus
    * carries no PII, so deterministic fixtures are PLANTED (the
    * [[urlStats]] discipline): every 7th doc gains an email, every
    * 11th an internal IP, every 13th a 9-digit id; the oracle plants
    * identically, so the scrubbing itself — not the fixture — is what
    * the hash check verifies. Patterns sit in the RE2 ∩ java.util.regex
    * subset (no backrefs, no lookaround) and apply in a fixed order
    * (email → ip → num) so a redacted token can't re-match a later
    * pattern differently across engines.
    *
    * The md5-prefix checksum of every scrubbed text (summed per
    * source) certifies both engines produced byte-identical redacted
    * corpora — much stronger than matching counts.
    *
    * Scale: a per-row codegen'd regex map over the scan + ONE
    * |sources|-key partial agg. Zero joins, zero extra passes.
    */
  /** Per-doc PII flags over ANY documents frame (batch or stream) —
    * the map stage shared by the batch [[piiScrub]] report and the
    * streaming gate (stream_pii_gate): planted fixtures, the three
    * ordered redaction passes, per-pattern match counts, and the md5
    * fingerprint of the redacted text. Pure per-row codegen'd map.
    * Column-API regex calls throughout: lit(pattern) reaches the regex
    * engine verbatim (an expr() SQL literal would re-parse \b \d as
    * string escapes).
    */
  def piiFlags(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val raw = when(id % 7 === 0,
        concat(col("text"), lit(" contact user"), id.cast("string"),
          lit("@mail"), (id % 5).cast("string"), lit(".example.com")))
      .otherwise(col("text"))
    val raw2 = when(id % 11 === 0,
        concat(raw, lit(" from 10."), (id % 256).cast("string"),
          lit("."), (id % 100).cast("string"), lit(".7")))
      .otherwise(raw)
    val raw3 = when(id % 13 === 0,
        concat(raw2, lit(" ref "), lpad((id % 1000000).cast("string"), 9, "0")))
      .otherwise(raw2)
    val afterEmail = regexp_replace(col("raw"), PiiEmail, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, PiiIp, "<IP>")
    docs.select(id, col("source"), raw3.as("raw"))
      .select(id, col("source"),
        size(regexp_extract_all(col("raw"), lit(PiiEmail), lit(0)))
          .cast("long").as("n_email"),
        size(regexp_extract_all(afterEmail, lit(PiiIp), lit(0)))
          .cast("long").as("n_ip"),
        size(regexp_extract_all(afterIp, lit(PiiNum), lit(0)))
          .cast("long").as("n_num"),
        conv(substring(md5(regexp_replace(afterIp, PiiNum, "<NUM>")), 1, 4),
          16, 10).cast("long").as("scrub_fp"))
  }

  /** The per-doc SQL mirror of [[piiFlags]] (shared by the batch and
    * streaming oracles). */
  val piiFlagsSql: String =
    s"""WITH planted AS (
      |  SELECT doc_id, source,
      |    CASE WHEN doc_id % 13 = 0 THEN
      |      CASE WHEN doc_id % 11 = 0 THEN
      |        CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
      |            || '@mail' || CAST(doc_id % 5 AS VARCHAR) || '.example.com' ELSE text END
      |        || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.'
      |        || CAST(doc_id % 100 AS VARCHAR) || '.7'
      |      ELSE
      |        CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
      |            || '@mail' || CAST(doc_id % 5 AS VARCHAR) || '.example.com' ELSE text END
      |      END || ' ref ' || lpad(CAST(doc_id % 1000000 AS VARCHAR), 9, '0')
      |    WHEN doc_id % 11 = 0 THEN
      |      CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
      |          || '@mail' || CAST(doc_id % 5 AS VARCHAR) || '.example.com' ELSE text END
      |      || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.'
      |      || CAST(doc_id % 100 AS VARCHAR) || '.7'
      |    WHEN doc_id % 7 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
      |        || '@mail' || CAST(doc_id % 5 AS VARCHAR) || '.example.com'
      |    ELSE text END AS raw
      |  FROM documents),
      |piiflags AS (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_extract_all(raw, '$PiiEmail')) AS BIGINT) AS n_email,
      |    CAST(len(regexp_extract_all(
      |      regexp_replace(raw, '$PiiEmail', '<EMAIL>', 'g'), '$PiiIp')) AS BIGINT) AS n_ip,
      |    CAST(len(regexp_extract_all(regexp_replace(
      |      regexp_replace(raw, '$PiiEmail', '<EMAIL>', 'g'),
      |      '$PiiIp', '<IP>', 'g'), '$PiiNum')) AS BIGINT) AS n_num,
      |    CAST(instr('0123456789abcdef', substr(md5(sc), 1, 1)) * 4096
      |      + instr('0123456789abcdef', substr(md5(sc), 2, 1)) * 256
      |      + instr('0123456789abcdef', substr(md5(sc), 3, 1)) * 16
      |      + instr('0123456789abcdef', substr(md5(sc), 4, 1)) - 4369 AS BIGINT)
      |      AS scrub_fp
      |  FROM (SELECT doc_id, source, raw,
      |          regexp_replace(regexp_replace(regexp_replace(raw,
      |            '$PiiEmail', '<EMAIL>', 'g'), '$PiiIp', '<IP>', 'g'),
      |            '$PiiNum', '<NUM>', 'g') AS sc
      |        FROM planted))""".stripMargin

  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    piiFlags(Tables.documents(spark, dir))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"n_email" > 0, 1L).otherwise(0L)).as("docs_with_email"),
        sum(when($"n_ip" > 0, 1L).otherwise(0L)).as("docs_with_ip"),
        sum(when($"n_num" > 0, 1L).otherwise(0L)).as("docs_with_num"),
        sum($"n_email" + $"n_ip" + $"n_num").as("total_redactions"),
        sum($"scrub_fp").as("scrub_checksum"))
      .orderBy($"source")
  }

  // concatenated, NOT interpolated into a stripMargin literal: the
  // flags SQL contains `||` at line starts, and an outer stripMargin
  // would eat one pipe from every such line
  val piiScrubSql: String = piiFlagsSql + "\n" +
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
      |  CAST(sum(CASE WHEN n_ip > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_ip,
      |  CAST(sum(CASE WHEN n_num > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_num,
      |  CAST(sum(n_email + n_ip + n_num) AS BIGINT) AS total_redactions,
      |  CAST(sum(scrub_fp) AS BIGINT) AS scrub_checksum
      |FROM piiflags GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------------------------
  // ql_search — Dirichlet-smoothed query-likelihood retrieval
  // ------------------------------------------------------------------

  private val QlMu = 300L // Dirichlet prior mass (Zhai & Lafferty 2001)
  private val QlTopK = 20

  /** Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    * Lafferty 2001): score(d) = Σ_q ln((tf + μ·ctf/|C|) / (dl + μ)),
    * μ = 300 — the language-modeling ranker that complements
    * [[bm25Search]] (BM25 saturates tf; QL treats the doc as a
    * generator and smooths absent terms toward corpus frequency, so
    * EVERY document scores against every query term, zero-tf
    * included). Top-20 by total log-likelihood.
    *
    * Exactness: each term's ratio is formed as the exact integer pair
    * (tf·|C| + μ·ctf) / (|C|·(dl+μ)) — both < 2⁵³, exactly
    * representable — then ONE ln quantized to the micro grid (the pmi
    * idiom); the per-doc score is an exact integer SUM of the term
    * micro-lns (order-free), so ranking is bit-stable cross-engine.
    *
    * Scale: tf rows for the query terms leave the explode
    * (posting-bounded); the zero-tf completion is docs × a BROADCAST
    * |q|-row term table with ctf attached — linear in the corpus, |q|
    * rows per doc; the top-k cut is TakeOrdered and the rank
    * decoration runs AFTER the limit (a 20-row window).
    */
  def qlSearch(spark: SparkSession, dir: String,
               query: Seq[String] = Seq("spark", "query", "window"),
               topK: Int = QlTopK): DataFrame =
    qlSearchOf(Tables.documents(spark, dir), query, topK)

  /** Core on any (doc_id, text, ...) corpus — factored so rerank_prf
    * can retrieve over the embedded shard. */
  private[graft] def qlSearchOf(corpus: DataFrame,
                                query: Seq[String],
                                topK: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val docs = corpus
      .select($"doc_id", tokens($"text").as("t"))
      .select($"doc_id", size($"t").cast("long").as("dl"), $"t")
    val tf = docs.select($"doc_id", explode($"t").as("w"))
      .filter($"w".isin(query: _*))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("tf"))
    val tot = docs.agg(sum($"dl").as("c_tokens"))
    val terms = tf.groupBy($"w").agg(sum($"tf").as("ctf"))
      .crossJoin(broadcast(tot))
    val lnMicro = round(
      log(((($"tf" * $"c_tokens") + lit(QlMu) * $"ctf").cast("double"))
        / (($"c_tokens" * ($"dl" + lit(QlMu))).cast("double"))) * 1e6, 0)
      .cast("long")
    val scored = docs.select($"doc_id", $"dl")
      .crossJoin(broadcast(terms))
      .join(tf, Seq("doc_id", "w"), "left")
      .withColumn("tf", coalesce($"tf", lit(0L)))
      .withColumn("ln_micro", lnMicro)
      .groupBy($"doc_id").agg(max($"dl").as("dl"),
        sum($"ln_micro").as("score_micro"))
      .orderBy($"score_micro".desc, $"doc_id").limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"score_micro".desc, $"doc_id")
    scored.withColumn("rk", row_number().over(w))
      .select($"rk", $"doc_id", $"dl", $"score_micro",
        round($"score_micro".cast("double") / 1e6, 6).as("log_likelihood"))
      .orderBy($"rk")
  }

  val qlSearchSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    s"""WITH d AS (
      |  SELECT doc_id, CAST(len($toks) AS BIGINT) AS dl, $toks AS t
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM (
      |    SELECT doc_id, unnest(t) AS w FROM d)
      |  WHERE w IN ('spark', 'query', 'window') GROUP BY 1, 2),
      |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS c_tokens FROM d),
      |terms AS (
      |  SELECT w, CAST(sum(tf) AS BIGINT) AS ctf, c_tokens
      |  FROM tf CROSS JOIN tot GROUP BY 1, 3),
      |sc AS (
      |  SELECT d.doc_id, d.dl,
      |    CAST(sum(CAST(round(ln(
      |      CAST(coalesce(tf.tf, 0) * terms.c_tokens + $QlMu * terms.ctf
      |           AS DOUBLE)
      |      / CAST(terms.c_tokens * (d.dl + $QlMu) AS DOUBLE)) * 1e6, 0)
      |      AS BIGINT)) AS BIGINT) AS score_micro
      |  FROM d CROSS JOIN terms
      |  LEFT JOIN tf ON tf.doc_id = d.doc_id AND tf.w = terms.w
      |  GROUP BY 1, 2),
      |top AS (
      |  SELECT * FROM sc ORDER BY score_micro DESC, doc_id LIMIT $QlTopK)
      |SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id)
      |    AS INT) AS rk,
      |  doc_id, dl, score_micro,
      |  round(CAST(score_micro AS DOUBLE) / 1e6, 6) AS log_likelihood
      |FROM top ORDER BY rk""".stripMargin
  }

  // ------------------------------------------------------------------
  // rerank_prf — second-stage semantic rerank audit over the shortlist
  // ------------------------------------------------------------------

  /** Second-stage rerank AUDIT over the [[qlSearch]] shortlist — the
    * cross-encoder-rerank SHAPE (cheap first-stage recall, expensive
    * second-stage precision on a tiny shortlist; the r11 verdict's
    * named deepening candidate) with a deterministic stand-in for the
    * neural scorer: Rocchio pseudo-relevance feedback. First stage
    * retrieves top-20 by Dirichlet query likelihood over the EMBEDDED
    * shard (documents ∩ embeddings — the shard a production reranker
    * can rescore); the top-3 hits' micro-quantized embeddings average
    * into a PRF centroid (exact floor-div on the integer grid; ≤64
    * longs cross the driver — the IVF-centroid model-sized-collect
    * contract); every shortlisted doc is rescored by exact-integer
    * cosine to the centroid and re-ranked. The output's `move` column
    * (rk_first − rk) is the audit readout: where the semantic scorer
    * overturns the lexical retriever.
    *
    * Exactness: the AnnExact doctrine — micro integer components,
    * exact Long dots via vec_dot_l, the cosine one fixed double tree
    * (ranking on the unrounded value, ties to doc_id), 6dp display.
    * Scale: the second stage touches topK rows; the only corpus-scale
    * work is the first-stage retrieval it inherits, and the centroid
    * collect is model-sized at any corpus size.
    */
  def rerankPrf(spark: SparkSession, dir: String,
                query: Seq[String] = Seq("spark", "query", "window"),
                topK: Int = QlTopK): DataFrame = {
    import spark.implicits._
    import graft.functions.PqFunctions.vec_dot_l
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id".as("doc_id"),
        transform($"embedding",
          x => round(x.cast("double") * 1000000d, 0).cast("long")).as("vq"))
    val corpus = Tables.documents(spark, dir)
      .join(emb.select($"doc_id"), Seq("doc_id"), "left_semi")
    val first = qlSearchOf(corpus, query, topK)
      .select($"rk".as("rk_first"), $"doc_id", $"log_likelihood")
    val short = first.join(emb, "doc_id")
    val seeds = short.filter($"rk_first" <= 3)
      .select($"vq").collect().map(_.getSeq[Long](0))
    val cent: Array[Long] = Array.tabulate(Similarity.EmbeddingDim) { d =>
      Math.floorDiv(seeds.map(_(d)).sum, seeds.length.toLong)
    }
    val cc = cent.map(v => v * v).sum
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"cos".desc, $"doc_id")
    short
      .withColumn("dt", vec_dot_l($"vq", typedLit(cent)))
      .withColumn("nn", vec_dot_l($"vq", $"vq"))
      .withColumn("cos", $"dt".cast("double")
        / (sqrt($"nn".cast("double")) * sqrt(lit(cc.toDouble))))
      .withColumn("rk", row_number().over(w))
      .select($"rk", $"doc_id", $"rk_first",
        ($"rk_first" - $"rk").as("move"),
        round($"cos", 6).as("cos_sim"), $"log_likelihood")
      .orderBy($"rk")
  }

  /** Oracle: the qlSearch CTE chain restricted to the embedded shard,
    * then the PRF centroid (floor-div micro means over the top-3 — the
    * annEval fdiv idiom), exact-integer dots, and the one-double-tree
    * cosine rerank. */
  val rerankPrfSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    s"""WITH d AS (
      |  SELECT doc_id, CAST(len($toks) AS BIGINT) AS dl, $toks AS t
      |  FROM documents WHERE doc_id IN (SELECT vec_id FROM embeddings)),
      |tf AS (
      |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM (
      |    SELECT doc_id, unnest(t) AS w FROM d)
      |  WHERE w IN ('spark', 'query', 'window') GROUP BY 1, 2),
      |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS c_tokens FROM d),
      |terms AS (
      |  SELECT w, CAST(sum(tf) AS BIGINT) AS ctf, c_tokens
      |  FROM tf CROSS JOIN tot GROUP BY 1, 3),
      |sc AS (
      |  SELECT d.doc_id, d.dl,
      |    CAST(sum(CAST(round(ln(
      |      CAST(coalesce(tf.tf, 0) * terms.c_tokens + $QlMu * terms.ctf
      |           AS DOUBLE)
      |      / CAST(terms.c_tokens * (d.dl + $QlMu) AS DOUBLE)) * 1e6, 0)
      |      AS BIGINT)) AS BIGINT) AS score_micro
      |  FROM d CROSS JOIN terms
      |  LEFT JOIN tf ON tf.doc_id = d.doc_id AND tf.w = terms.w
      |  GROUP BY 1, 2),
      |first AS (
      |  SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id)
      |      AS INT) AS rk_first,
      |    doc_id, round(CAST(score_micro AS DOUBLE) / 1e6, 6) AS log_likelihood
      |  FROM (SELECT * FROM sc ORDER BY score_micro DESC, doc_id LIMIT $QlTopK)),
      |comp AS MATERIALIZED (
      |  SELECT e.vec_id AS doc_id, CAST(i AS INT) AS dim,
      |    CAST(round(CAST(e.embedding[i + 1] AS DOUBLE) * 1000000, 0) AS BIGINT) AS v
      |  FROM embeddings e CROSS JOIN (SELECT unnest(range(0, 64)) AS i)
      |  WHERE e.vec_id IN (SELECT doc_id FROM first)),
      |sn AS (SELECT CAST(count(*) AS BIGINT) AS k
      |  FROM first WHERE rk_first <= 3),
      |cent AS (
      |  SELECT dim, CAST((s - ((s % sn.k + sn.k) % sn.k)) / sn.k AS BIGINT) AS cv
      |  FROM (SELECT c.dim, CAST(sum(c.v) AS BIGINT) AS s
      |        FROM comp c JOIN first f ON f.doc_id = c.doc_id
      |        WHERE f.rk_first <= 3 GROUP BY c.dim), sn),
      |cn AS (SELECT CAST(sum(cv * cv) AS BIGINT) AS cc FROM cent),
      |dots AS (
      |  SELECT c.doc_id, CAST(sum(c.v * ct.cv) AS BIGINT) AS dt,
      |    CAST(sum(c.v * c.v) AS BIGINT) AS nn
      |  FROM comp c JOIN cent ct ON ct.dim = c.dim GROUP BY c.doc_id),
      |scored AS (
      |  SELECT f.rk_first, f.doc_id, f.log_likelihood,
      |    CAST(d.dt AS DOUBLE)
      |      / (sqrt(CAST(d.nn AS DOUBLE)) * sqrt(CAST(cn.cc AS DOUBLE))) AS cos
      |  FROM first f JOIN dots d ON d.doc_id = f.doc_id, cn)
      |SELECT CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS INT) AS rk,
      |  doc_id, rk_first,
      |  rk_first - CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS INT)
      |    AS move,
      |  round(cos, 6) AS cos_sim, log_likelihood
      |FROM scored ORDER BY rk""".stripMargin
  }
}
