package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Rule-based corpus filters: the published-heuristic cleaning passes a
  * training-data pipeline runs before tokenization (Gopher-style
  * repetition/length rules; C4-style span-level global dedup).
  *
  * Both operators follow the corpus discipline used across this
  * codebase: the document text itself never rides a shuffle — the rule
  * filter is a pure scan-fused map, and span dedup shuffles only
  * (md5 fingerprint, packed position, span length) tuples.
  *
  * Reference scope: the reference POC ships raw CDC text through to
  * Iceberg untouched; these are the quality gates a 100 TB corpus needs
  * on top (rule thresholds follow the Gopher/C4 papers' shapes, with
  * bounds re-centered so each rule bites on this corpus's statistics —
  * a filter that never fires verifies nothing).
  */
object Filters {

  /** Non-empty whitespace-separated tokens. */
  private def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Gopher-style document quality rules, one row per document with
    * per-rule pass flags and the keep decision:
    *
    *   - `r_len`:  token count in [40, 90]
    *   - `r_mwl`:  mean word length in [4.3, 4.75]
    *   - `r_stop`: at least 2 stopword occurrences
    *   - `r_rep`:  most-frequent token ≤ 1/8 of the document
    *
    * Every decision is an integer comparison (mean-word-length bounds
    * are cross-multiplied: 10·Σlen ≥ 43·n and 4·Σlen ≤ 19·n), so the
    * flags are bit-deterministic across engines; the reported ratio
    * columns are exact integer-over-integer divisions rounded for
    * display only. Bounds sit inside the corpus's SF-invariant
    * distributions (word-count and word-length stats don't drift with
    * scale factor), so each rule keeps a non-trivial pass AND fail
    * population at every SF — no rule is vacuous at bench scale.
    *
    * Scale: a zero-shuffle scan-fused map (the most-frequent-token
    * count is a per-row array fold over a ≤|vocab| distinct list, not
    * an aggregation) followed only by the presentation sort. At 100 TB
    * this runs inside whole-stage codegen directly over the parquet
    * scan, like [[TextAnalysis.textQuality]].
    */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    gopherFlags(Tables.documents(spark, dir)).orderBy($"doc_id")
  }

  /** The rule evaluation over any (doc_id, text) frame — narrow
    * per-row expressions only, so the SAME operator runs on a
    * Structured Streaming frame unchanged (see
    * [[graft.streaming.StreamQueries.streamQualityFilter]], the
    * [[Curation.gramTable]] batch/stream-sharing pattern).
    */
  private[graft] def gopherFlags(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    // ONE native token_stats pass (whole-stage codegen) instead of four
    // interpreted HOF chains over the same token array — HOFs are
    // CodegenFallback, and the top-token count was O(distinct·n)
    // re-scans per row; kernel ≡ HOF pinned in FiltersSpec
    val base = docs
      .select($"doc_id",
        graft.functions.StringFunctions.token_stats($"text", stopwords).as("ts"))
      .select($"doc_id",
        $"ts.n_tokens".as("n"), $"ts.sum_len".as("sum_len"),
        $"ts.n_stop".as("n_stop"), $"ts.top_cnt".as("top_cnt"))
    val rLen = $"n" >= 40 && $"n" <= 90
    val rMwl = $"sum_len" * 10 >= $"n" * 43 && $"sum_len" * 4 <= $"n" * 19
    val rStop = $"n_stop" >= 2
    val rRep = $"top_cnt" * 8 <= $"n"
    base.select($"doc_id",
        $"n".cast("int").as("n_tokens"),
        round($"sum_len".cast("double") / $"n".cast("double"), 6).as("mean_word_len"),
        $"n_stop".cast("int").as("n_stopwords"),
        round($"top_cnt".cast("double") / $"n".cast("double"), 6).as("top_token_frac"),
        rLen.as("r_len"), rMwl.as("r_mwl"), rStop.as("r_stop"), rRep.as("r_rep"),
        (rLen && rMwl && rStop && rRep).as("keep"))
  }

  val gopherRulesSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    val stopList = stopwords.map(s => s"'$s'").mkString("[", ",", "]")
    s"""WITH t AS (
      |  SELECT doc_id, $toks AS toks FROM documents),
      |s AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n,
      |    CAST(list_reduce(list_transform(toks, x -> length(x)), (a, b) -> a + b)
      |      AS BIGINT) AS sum_len,
      |    CAST(len(list_filter(toks, x -> list_contains($stopList, x))) AS BIGINT)
      |      AS n_stop,
      |    CAST(list_max(list_transform(list_distinct(toks),
      |      x -> len(list_filter(toks, t -> t = x)))) AS BIGINT) AS top_cnt
      |  FROM t)
      |SELECT doc_id, CAST(n AS INT) AS n_tokens,
      |  round(CAST(sum_len AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_word_len,
      |  CAST(n_stop AS INT) AS n_stopwords,
      |  round(CAST(top_cnt AS DOUBLE) / CAST(n AS DOUBLE), 6) AS top_token_frac,
      |  (n >= 40 AND n <= 90) AS r_len,
      |  (sum_len * 10 >= n * 43 AND sum_len * 4 <= n * 19) AS r_mwl,
      |  (n_stop >= 2) AS r_stop,
      |  (top_cnt * 8 <= n) AS r_rep,
      |  (n >= 40 AND n <= 90 AND sum_len * 10 >= n * 43 AND sum_len * 4 <= n * 19
      |    AND n_stop >= 2 AND top_cnt * 8 <= n) AS keep
      |FROM s ORDER BY doc_id""".stripMargin
  }

  private val SpanW = 8

  /** C4-style span-level GLOBAL dedup: split every document into
    * disjoint 8-token windows, fingerprint each window, and mark every
    * occurrence after the first (corpus-wide, first = smallest
    * (doc_id, window_index)) as a duplicate span. One row per document:
    * span count, duplicate-span count, tokens lost to duplicate spans,
    * and the lost-token ratio. This is the cross-document boilerplate
    * remover (C4 dedupes three-sentence spans; the window analog fits
    * this corpus's unpunctuated text) — [[Dedup.dedupExact]] catches
    * whole-document copies, [[doc_span_overlaps]] localizes benchmark
    * leaks, this catches REPEATED BOILERPLATE inside otherwise-unique
    * documents.
    *
    * Scale: the only shuffle carries (md5 fingerprint, packed position,
    * span length) — never span text. The keeper is a min aggregate on
    * the packed (doc_id·2¹⁴ + k) key, then one fingerprint-keyed hash
    * join back and a doc_id partial agg. All per-span state is O(1);
    * work is linear in corpus tokens — the same budget as the
    * tokenization pass itself.
    */
  def spanDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // NOT documentsScaled: the disjoint stride-8 grid hashes n/8
    // windows per doc — too light to amortize the text-payload
    // exchange (measured +29% with it; contrast dedupSubstring's
    // stride-1 windows at −54%)
    val spans = Tables.documents(spark, dir)
      .select($"doc_id", tokens($"text").as("toks"))
      .select($"doc_id", size($"toks").as("n"), posexplode(expr(
        s"transform(sequence(0, cast(ceil(size(toks) / ${SpanW}.0) as int) - 1)," +
          s" k -> array_join(slice(toks, k * $SpanW + 1, $SpanW), ' '))"))
        .as(Seq("k", "span")))
      .select($"doc_id", $"n", $"k",
        md5($"span").as("fp"),
        least(lit(SpanW), $"n" - $"k" * SpanW).as("span_len"),
        ($"doc_id" * 16384 + $"k").as("pos_key"))
    val keepers = spans.groupBy($"fp").agg(min($"pos_key").as("keep_key"))
    spans.join(keepers, "fp")
      .withColumn("dup", $"pos_key" > $"keep_key")
      .groupBy($"doc_id")
      .agg(max($"n").as("n_tokens"),
        count(lit(1)).cast("int").as("n_spans"),
        sum(when($"dup", 1L).otherwise(0L)).as("n_dup_spans"),
        sum(when($"dup", $"span_len".cast("long")).otherwise(0L)).as("tokens_lost"))
      .select($"doc_id", $"n_tokens", $"n_spans", $"n_dup_spans", $"tokens_lost",
        round($"tokens_lost".cast("double") / $"n_tokens".cast("double"), 6)
          .as("dup_ratio"))
      .orderBy($"doc_id")
  }

  /** The C4 step that actually SHIPS: rewrite every document with its
    * duplicate and contaminated token spans excised, emitting the
    * cleaned corpus plus per-document excision accounting. Intervals
    * come from the two existing decision operators — [[spanDedup]]'s
    * corpus-global duplicate windows ([k·8+1, k·8+len] token coverage,
    * every occurrence after the corpus-wide first) and
    * [[Curation.docSpanOverlaps]]' benchmark-contamination islands —
    * merged per document (overlapping OR adjacent intervals coalesce:
    * next.s ≤ cur.e + 1), then each document's kept tokens are
    * rebuilt into `clean_text` (single-space joined; excision is
    * token-level, so rebuilt text is whitespace-normalized by
    * construction). Conservation invariant (FiltersSpec):
    * n_tokens_clean + tokens_removed = n_tokens for every document.
    *
    * Scale: interval derivation inherits the parents' shapes (only
    * fingerprints/positions shuffle). The merge is a doc_id-keyed
    * window whose per-key row count is bounded by ⌈n_tokens/8⌉ +
    * contamination islands — document-, not corpus-cardinality. The
    * rebuild is ONE doc_id-keyed join of the corpus against its merged
    * interval lists: the interval side carries only (doc_id, int-pair
    * array) rows for AFFECTED documents, so AQE broadcasts it while it
    * fits and the corpus never leaves its scan; past broadcast size it
    * degrades to the single keyed exchange any keep-list rewrite pays
    * — one corpus pass either way, never a token explosion, never
    * text through an aggregate. The excision itself is a per-row
    * index filter in the projection. The oracle rebuilds via
    * unnest + NOT EXISTS + ordered string_agg, bit-identically.
    */
  def spanExcise(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documentsScaled(spark, dir)
      .select($"doc_id", tokens($"text").as("t"))
      .withColumn("n", size($"t"))
    val spans = docs
      .select($"doc_id", $"n", posexplode(expr(
        s"transform(sequence(0, cast(ceil(size(t) / ${SpanW}.0) as int) - 1)," +
          s" k -> array_join(slice(t, k * $SpanW + 1, $SpanW), ' '))"))
        .as(Seq("k", "span")))
      .select($"doc_id", $"k",
        md5($"span").as("fp"),
        least(lit(SpanW), $"n" - $"k" * SpanW).as("span_len"),
        ($"doc_id" * 16384 + $"k").as("pos_key"))
    val keepers = spans.groupBy($"fp").agg(min($"pos_key").as("keep_key"))
    val dupIv = spans.join(keepers, "fp")
      .filter($"pos_key" > $"keep_key")
      .select($"doc_id", ($"k" * SpanW + 1).as("s"), ($"k" * SpanW + $"span_len").as("e"))
    val contamIv = Curation.docSpanOverlaps(spark, dir)
      .select($"doc_id", $"span_start".as("s"), $"span_end".as("e"))
    // classic interval coalesce: running max of e over earlier rows;
    // a row opens a new group iff it starts past that max + 1.
    // Explicit ROWS frames on both windows — the default RANGE frame
    // would give tied (s, e) rows a shared running sum and diverge
    // from the oracle's ROWS arithmetic.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"s", $"e")
    val merged = dupIv.unionByName(contamIv)
      .withColumn("maxe", max($"e").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
      .withColumn("ng", when($"maxe".isNull || $"s" > $"maxe" + 1, 1L).otherwise(0L))
      .withColumn("grp", sum($"ng").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy($"doc_id", $"grp")
      .agg(min($"s").as("s"), max($"e").as("e"))
    val perDoc = merged.groupBy($"doc_id")
      .agg(collect_list(struct($"s", $"e")).as("ivs0"),
        count(lit(1)).cast("int").as("n_excised"))
    docs.join(perDoc, Seq("doc_id"), "left")
      .withColumn("ivs", coalesce($"ivs0", expr("cast(array() as array<struct<s:int,e:int>>)")))
      .withColumn("kept", filter($"t", (tok, i0) =>
        !exists($"ivs", iv => i0 + 1 >= iv("s") && i0 + 1 <= iv("e"))))
      .select($"doc_id",
        $"n".as("n_tokens"),
        coalesce($"n_excised", lit(0)).as("n_spans_excised"),
        ($"n" - size($"kept")).cast("long").as("tokens_removed"),
        size($"kept").cast("long").as("n_tokens_clean"),
        array_join($"kept", " ").as("clean_text"))
      .orderBy($"doc_id")
  }

  val spanExciseSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    s"""WITH tk AS (
      |  SELECT doc_id, $toks AS t, len($toks) AS n FROM documents),
      |sp AS (
      |  SELECT doc_id, n, CAST(k AS INT) AS k,
      |    md5(array_to_string(t[k * $SpanW + 1 : k * $SpanW + $SpanW], ' ')) AS fp,
      |    least($SpanW, n - k * $SpanW) AS span_len,
      |    doc_id * 16384 + k AS pos_key
      |  FROM tk, unnest(range(0, CAST(ceil(n / ${SpanW}.0) AS INT))) r(k)),
      |kp AS (SELECT fp, min(pos_key) AS keep_key FROM sp GROUP BY fp),
      |dup AS (
      |  SELECT sp.doc_id, CAST(sp.k * $SpanW + 1 AS INT) AS s,
      |    CAST(sp.k * $SpanW + sp.span_len AS INT) AS e
      |  FROM sp JOIN kp ON sp.fp = kp.fp WHERE sp.pos_key > kp.keep_key),
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
      |  FROM hits),
      |contam AS (
      |  SELECT doc_id, CAST(min(pos) AS INT) AS s, CAST(max(pos) + 2 AS INT) AS e
      |  FROM isl GROUP BY doc_id, island),
      |iv AS (SELECT * FROM dup UNION ALL SELECT * FROM contam),
      |ord AS (
      |  SELECT doc_id, s, e,
      |    max(e) OVER (PARTITION BY doc_id ORDER BY s, e
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe
      |  FROM iv),
      |gi AS (
      |  SELECT doc_id, s, e,
      |    sum(CASE WHEN maxe IS NULL OR s > maxe + 1 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY s, e
      |        ROWS UNBOUNDED PRECEDING) AS grp
      |  FROM ord),
      |merged AS (
      |  SELECT doc_id, grp, min(s) AS s, max(e) AS e FROM gi GROUP BY doc_id, grp),
      |perdoc AS (SELECT doc_id, count(*) AS n_excised FROM merged GROUP BY doc_id),
      |kept AS (
      |  SELECT tk.doc_id, i, t[i] AS tok
      |  FROM tk, unnest(range(1, n + 1)) r(i)
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM merged m
      |    WHERE m.doc_id = tk.doc_id AND i >= m.s AND i <= m.e)),
      |ka AS (
      |  SELECT doc_id, count(*) AS n_clean,
      |    string_agg(tok, ' ' ORDER BY i) AS ctext
      |  FROM kept GROUP BY doc_id)
      |SELECT tk.doc_id, CAST(tk.n AS INT) AS n_tokens,
      |  CAST(coalesce(p.n_excised, 0) AS INT) AS n_spans_excised,
      |  CAST(tk.n - coalesce(ka.n_clean, 0) AS BIGINT) AS tokens_removed,
      |  CAST(coalesce(ka.n_clean, 0) AS BIGINT) AS n_tokens_clean,
      |  coalesce(ka.ctext, '') AS clean_text
      |FROM tk LEFT JOIN perdoc p USING (doc_id) LEFT JOIN ka USING (doc_id)
      |ORDER BY tk.doc_id""".stripMargin
  }

  /** Sliding-window length for [[dedupSubstring]]; matches [[SpanW]]
    * so the two operators' duplicated-mass numbers are comparable. */
  private val SubW = 8

  /** Exact SUBSTRING-level duplication audit — the sliding-window
    * analog of the suffix-array substring dedup of Lee et al. 2022
    * ("Deduplicating Training Data Makes Language Models Better"):
    * every length-8 token window (stride 1, vs [[spanDedup]]'s
    * disjoint stride-8 grid) is fingerprinted corpus-wide, every
    * occurrence after the corpus-global first (smallest packed
    * (doc_id, offset)) is a duplicate, and each document's duplicate
    * windows are merged into maximal overlapping-or-adjacent runs so
    * the reported `dup_token_mass` counts each duplicated token ONCE.
    * This catches SHIFTED boilerplate that the disjoint grid misses
    * (a copied sentence starting at offset 3 straddles two grid spans
    * and can evade both) at 8× the window rows — the precision/cost
    * dial between the two is deliberate. Docs shorter than the window
    * emit zero windows but still report (left join), so output is
    * one row per document.
    *
    * Scale: the only corpus-cardinality shuffles carry (16-byte md5,
    * packed long) pairs — never window text; the keeper table is a
    * min-aggregate with map-side partials; the run merge is a
    * doc_id-keyed window over ONLY that doc's duplicate offsets
    * (≤ n_tokens rows per key, document- not corpus-bounded, same
    * discipline as [[spanExcise]]'s interval merge). Packing requires
    * n_tokens < 16384 per document — the doc_chunks contract shared
    * by the span family. */
  def dedupSubstring(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documentsScaled(spark, dir)
      .select($"doc_id", tokens($"text").as("t"))
      .select($"doc_id", size($"t").as("n"), $"t")
    val wins = docs.filter($"n" >= SubW)
      .select($"doc_id", $"n", posexplode(expr(
        s"transform(sequence(0, size(t) - $SubW)," +
          s" k -> array_join(slice(t, k + 1, $SubW), ' '))")).as(Seq("k", "w")))
      .select($"doc_id", $"n", $"k", md5($"w").as("fp"),
        ($"doc_id" * 16384 + $"k").as("pos_key"))
    val keep = wins.groupBy($"fp").agg(min($"pos_key").as("keep_key"))
    val dups = wins.join(keep, "fp").filter($"pos_key" > $"keep_key")
      .select($"doc_id", $"k")
    // merge overlapping/adjacent windows into runs: ordered by offset,
    // a window starts a new run iff it clears the previous window's
    // coverage (equal lengths ⇒ lag(k) is the running coverage max)
    val byDoc = Window.partitionBy($"doc_id").orderBy($"k")
    val runs = dups
      .withColumn("newrun",
        when(lag($"k", 1).over(byDoc).isNull
          || $"k" > lag($"k", 1).over(byDoc) + SubW, 1L).otherwise(0L))
      .withColumn("run", sum($"newrun").over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"doc_id", $"run")
      .agg((max($"k") - min($"k") + SubW).as("mass"))
    val perDoc = dups.groupBy($"doc_id").agg(count(lit(1)).as("ndw"))
      .join(runs.groupBy($"doc_id").agg(sum($"mass").as("dup_mass")), "doc_id")
    docs.join(perDoc, Seq("doc_id"), "left")
      .select($"doc_id", $"n".as("n_tokens"),
        greatest($"n" - (SubW - 1), lit(0)).cast("int").as("n_windows"),
        coalesce($"ndw", lit(0L)).as("n_dup_windows"),
        coalesce($"dup_mass", lit(0L)).as("dup_token_mass"),
        round(coalesce($"dup_mass", lit(0L)).cast("double")
          / $"n".cast("double"), 6).as("dup_ratio"))
      .orderBy($"doc_id")
  }

  /** Doubling levels for [[substringLongestMatch]]: 8..64 tokens (the
    * corpus's docs are ≤ ~100 tokens; at web scale add levels — each
    * costs O(1) per position). */
  private val SdLevels = Seq(8, 16, 32, 64)

  /** Longest duplicated substring per document at power-of-2
    * resolution — the suffix-array dedup readout (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better": a
    * substring duplicated ANYWHERE in the corpus marks a span for
    * excision; the interesting statistic is how LONG the longest such
    * span is) re-expressed Spark-first as a FINGERPRINT PYRAMID: the
    * suffix-array prefix-doubling trick in hash space. Level-2L
    * fingerprints combine two level-L fingerprints
    * (md5(fp_L[k] ‖ fp_L[k+L])) — O(1) per position per level instead
    * of hashing O(L)-token windows, built entirely INSIDE one per-doc
    * projection (zero shuffles); equal pyramid fps ⇔ equal token
    * spans (modulo md5 collisions — the same fp-equivalence contract
    * as every winnowing op, identical in both engines by identical
    * recursion). The only corpus-cardinality shuffle is ONE
    * (lvl, fp)-keyed count + its join back (AQE reuses the exchange);
    * no window text ever rides a shuffle.
    *
    * Output per document: n_tokens, l_max (largest level with any
    * position whose span also occurs at another position corpus-wide,
    * 0 if none — intra-doc repeats count, matching dedupSubstring),
    * n_dup_at_lmax (duplicated positions at that level).
    */
  def substringLongestMatch(spark: SparkSession, dir: String): DataFrame =
    substringLongestMatchOf(Tables.documentsScaled(spark, dir))

  /** Core on any (doc_id, text) frame — factored so specs can plant
    * shared spans of known length and assert the level readout. */
  private[graft] def substringLongestMatchOf(d: DataFrame): DataFrame = {
    val spark = d.sparkSession
    import spark.implicits._
    val docs = d
      .select($"doc_id", tokens($"text").as("t"))
      .select($"doc_id", size($"t").as("n"), $"t")
    val base = docs.withColumn("f8",
      when($"n" >= 8, expr(
        "transform(sequence(0, n - 8), k -> md5(array_join(slice(t, k + 1, 8), ' ')))"))
        .otherwise(expr("CAST(array() AS array<string>)")))
    val pyr = SdLevels.drop(1).foldLeft(base) { (d, l) =>
      val h = l / 2
      d.withColumn(s"f$l",
        when($"n" >= l, expr(
          s"transform(sequence(0, n - $l), k -> " +
            s"md5(concat(element_at(f$h, k + 1), element_at(f$h, k + ${h + 1}))))"))
          .otherwise(expr("CAST(array() AS array<string>)")))
    }
    val entries = pyr.select($"doc_id",
        explode(concat(SdLevels.map(l =>
          expr(s"transform(f$l, x -> struct(CAST($l AS INT) AS lvl, x AS fp))")): _*))
          .as("e"))
      .select($"doc_id", $"e.lvl".as("lvl"), $"e.fp".as("fp"))
    val cnt = entries.groupBy($"lvl", $"fp").agg(count(lit(1)).as("c"))
    val dup = entries.join(cnt, Seq("lvl", "fp")).filter($"c" >= 2)
      .groupBy($"doc_id", $"lvl").agg(count(lit(1)).as("ndup"))
    val best = dup.groupBy($"doc_id")
      .agg(max(struct($"lvl", $"ndup")).as("b"))
    docs.select($"doc_id", $"n")
      .join(best, Seq("doc_id"), "left")
      .select($"doc_id", $"n".cast("int").as("n_tokens"),
        coalesce($"b.lvl", lit(0)).as("l_max"),
        coalesce($"b.ndup", lit(0L)).as("n_dup_at_lmax"))
      .orderBy($"doc_id")
  }

  /** Oracle: the pyramid recursion replayed verbatim in DuckDB list
    * comprehensions (level-2L fps from level-L fps, never re-hashing
    * token slices beyond the base), then the same count/argmax. */
  val substringLongestMatchSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    s"""WITH t AS (
      |  SELECT doc_id, $toks AS toks,
      |    CAST(len($toks) AS BIGINT) AS n FROM documents),
      |p8 AS (SELECT doc_id, n,
      |  list_transform(range(0, CAST(n AS INT) - 7),
      |    k -> md5(array_to_string(toks[k + 1 : k + 8], ' '))) AS f8 FROM t),
      |p16 AS (SELECT *, list_transform(range(0, CAST(n AS INT) - 15),
      |  k -> md5(f8[k + 1] || f8[k + 9])) AS f16 FROM p8),
      |p32 AS (SELECT *, list_transform(range(0, CAST(n AS INT) - 31),
      |  k -> md5(f16[k + 1] || f16[k + 17])) AS f32 FROM p16),
      |p64 AS (SELECT *, list_transform(range(0, CAST(n AS INT) - 63),
      |  k -> md5(f32[k + 1] || f32[k + 33])) AS f64 FROM p32),
      |e AS (
      |  SELECT doc_id, 8 AS lvl, f8[CAST(k AS INT) + 1] AS fp
      |  FROM p64, unnest(range(0, len(f8))) r(k)
      |  UNION ALL
      |  SELECT doc_id, 16, f16[CAST(k AS INT) + 1]
      |  FROM p64, unnest(range(0, len(f16))) r(k)
      |  UNION ALL
      |  SELECT doc_id, 32, f32[CAST(k AS INT) + 1]
      |  FROM p64, unnest(range(0, len(f32))) r(k)
      |  UNION ALL
      |  SELECT doc_id, 64, f64[CAST(k AS INT) + 1]
      |  FROM p64, unnest(range(0, len(f64))) r(k)),
      |c AS (SELECT lvl, fp, count(*) AS c FROM e GROUP BY 1, 2),
      |d AS (
      |  SELECT e.doc_id, e.lvl, CAST(count(*) AS BIGINT) AS ndup
      |  FROM e JOIN c ON c.lvl = e.lvl AND c.fp = e.fp AND c.c >= 2
      |  GROUP BY 1, 2),
      |b AS (SELECT doc_id, lvl, ndup,
      |  row_number() OVER (PARTITION BY doc_id ORDER BY lvl DESC) AS rk FROM d)
      |SELECT t.doc_id, CAST(t.n AS INT) AS n_tokens,
      |  CAST(coalesce(b.lvl, 0) AS INT) AS l_max,
      |  coalesce(b.ndup, 0) AS n_dup_at_lmax
      |FROM t LEFT JOIN (SELECT * FROM b WHERE rk = 1) b ON b.doc_id = t.doc_id
      |ORDER BY t.doc_id""".stripMargin
  }

  val dedupSubstringSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    s"""WITH t AS (
      |  SELECT doc_id, $toks AS toks, len($toks) AS n FROM documents),
      |wins AS (
      |  SELECT doc_id, n, CAST(k AS INT) AS k,
      |    md5(array_to_string(toks[k + 1 : k + $SubW], ' ')) AS fp,
      |    doc_id * 16384 + k AS pos_key
      |  FROM t, unnest(range(0, n - ${SubW - 1})) r(k)
      |  WHERE n >= $SubW),
      |kp AS (SELECT fp, min(pos_key) AS keep_key FROM wins GROUP BY fp),
      |dup AS (
      |  SELECT wins.doc_id, k FROM wins JOIN kp ON wins.fp = kp.fp
      |  WHERE pos_key > keep_key),
      |fl AS (
      |  SELECT doc_id, k,
      |    CASE WHEN lag(k) OVER (PARTITION BY doc_id ORDER BY k) IS NULL
      |      OR k > lag(k) OVER (PARTITION BY doc_id ORDER BY k) + $SubW
      |      THEN 1 ELSE 0 END AS newrun
      |  FROM dup),
      |rn AS (
      |  SELECT doc_id, k,
      |    sum(newrun) OVER (PARTITION BY doc_id ORDER BY k
      |      ROWS UNBOUNDED PRECEDING) AS run
      |  FROM fl),
      |runs AS (
      |  SELECT doc_id, run, max(k) - min(k) + $SubW AS mass
      |  FROM rn GROUP BY doc_id, run),
      |pd AS (
      |  SELECT d.doc_id, count(*) AS ndw, m.dup_mass
      |  FROM dup d JOIN (SELECT doc_id, sum(mass) AS dup_mass
      |                   FROM runs GROUP BY doc_id) m USING (doc_id)
      |  GROUP BY d.doc_id, m.dup_mass)
      |SELECT t.doc_id, CAST(t.n AS INT) AS n_tokens,
      |  CAST(greatest(t.n - ${SubW - 1}, 0) AS INT) AS n_windows,
      |  CAST(coalesce(pd.ndw, 0) AS BIGINT) AS n_dup_windows,
      |  CAST(coalesce(pd.dup_mass, 0) AS BIGINT) AS dup_token_mass,
      |  round(CAST(coalesce(pd.dup_mass, 0) AS DOUBLE) / CAST(t.n AS DOUBLE), 6)
      |    AS dup_ratio
      |FROM t LEFT JOIN pd USING (doc_id)
      |ORDER BY t.doc_id""".stripMargin
  }

  /** The substring family's SHIP step ([[spanExcise]]'s stride-1
    * sibling): rewrite every document with its duplicated SUBSTRING
    * runs excised — [[dedupSubstring]]'s corpus-global duplicate
    * windows become token intervals [k+1, k+8], merged per document
    * (overlap/adjacent coalesce, the spanExcise window), kept tokens
    * rebuilt into `clean_text`. Because the intervals ARE
    * dedupSubstring's merged runs, the conservation invariant is
    * cross-operator: tokens_removed here equals that report's
    * dup_token_mass per document (FiltersSpec pins it), and
    * n_tokens_clean + tokens_removed = n_tokens.
    *
    * Scale: inherits dedupSubstring's ids-only shuffles and
    * spanExcise's one-pass rebuild join (interval side is (doc_id,
    * int-pair array) rows for affected docs only — AQE broadcasts
    * while it fits; the corpus never leaves its scan). */
  def substringExcise(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documentsScaled(spark, dir)
      .select($"doc_id", tokens($"text").as("t"))
      .withColumn("n", size($"t"))
    val wins = docs.filter($"n" >= SubW)
      .select($"doc_id", posexplode(expr(
        s"transform(sequence(0, size(t) - $SubW)," +
          s" k -> array_join(slice(t, k + 1, $SubW), ' '))")).as(Seq("k", "w")))
      .select($"doc_id", $"k", md5($"w").as("fp"),
        ($"doc_id" * 16384 + $"k").as("pos_key"))
    val keepers = wins.groupBy($"fp").agg(min($"pos_key").as("keep_key"))
    val dupIv = wins.join(keepers, "fp")
      .filter($"pos_key" > $"keep_key")
      .select($"doc_id", ($"k" + 1).as("s"), ($"k" + SubW).as("e"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"s", $"e")
    val merged = dupIv
      .withColumn("maxe", max($"e").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
      .withColumn("ng", when($"maxe".isNull || $"s" > $"maxe" + 1, 1L).otherwise(0L))
      .withColumn("grp", sum($"ng").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy($"doc_id", $"grp")
      .agg(min($"s").as("s"), max($"e").as("e"))
    val perDoc = merged.groupBy($"doc_id")
      .agg(collect_list(struct($"s", $"e")).as("ivs0"),
        count(lit(1)).cast("int").as("n_excised"))
    docs.join(perDoc, Seq("doc_id"), "left")
      .withColumn("ivs", coalesce($"ivs0", expr("cast(array() as array<struct<s:int,e:int>>)")))
      .withColumn("kept", filter($"t", (tok, i0) =>
        !exists($"ivs", iv => i0 + 1 >= iv("s") && i0 + 1 <= iv("e"))))
      .select($"doc_id",
        $"n".as("n_tokens"),
        coalesce($"n_excised", lit(0)).as("n_runs_excised"),
        ($"n" - size($"kept")).cast("long").as("tokens_removed"),
        size($"kept").cast("long").as("n_tokens_clean"),
        array_join($"kept", " ").as("clean_text"))
      .orderBy($"doc_id")
  }

  val substringExciseSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    s"""WITH tk AS (
      |  SELECT doc_id, $toks AS t, len($toks) AS n FROM documents),
      |wins AS (
      |  SELECT doc_id, CAST(k AS INT) AS k,
      |    md5(array_to_string(t[k + 1 : k + $SubW], ' ')) AS fp,
      |    doc_id * 16384 + k AS pos_key
      |  FROM tk, unnest(range(0, n - ${SubW - 1})) r(k)
      |  WHERE n >= $SubW),
      |kp AS (SELECT fp, min(pos_key) AS keep_key FROM wins GROUP BY fp),
      |iv AS (
      |  SELECT wins.doc_id, k + 1 AS s, k + $SubW AS e
      |  FROM wins JOIN kp ON wins.fp = kp.fp
      |  WHERE pos_key > keep_key),
      |ord AS (
      |  SELECT doc_id, s, e,
      |    max(e) OVER (PARTITION BY doc_id ORDER BY s, e
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe
      |  FROM iv),
      |gi AS (
      |  SELECT doc_id, s, e,
      |    sum(CASE WHEN maxe IS NULL OR s > maxe + 1 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY s, e
      |        ROWS UNBOUNDED PRECEDING) AS grp
      |  FROM ord),
      |merged AS (
      |  SELECT doc_id, grp, min(s) AS s, max(e) AS e FROM gi GROUP BY doc_id, grp),
      |perdoc AS (SELECT doc_id, count(*) AS n_excised FROM merged GROUP BY doc_id),
      |kept AS (
      |  SELECT tk.doc_id, i, t[i] AS tok
      |  FROM tk, unnest(range(1, n + 1)) r(i)
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM merged m
      |    WHERE m.doc_id = tk.doc_id AND i >= m.s AND i <= m.e)),
      |ka AS (
      |  SELECT doc_id, count(*) AS n_clean,
      |    string_agg(tok, ' ' ORDER BY i) AS ctext
      |  FROM kept GROUP BY doc_id)
      |SELECT tk.doc_id, CAST(tk.n AS INT) AS n_tokens,
      |  CAST(coalesce(p.n_excised, 0) AS INT) AS n_runs_excised,
      |  CAST(tk.n - coalesce(ka.n_clean, 0) AS BIGINT) AS tokens_removed,
      |  CAST(coalesce(ka.n_clean, 0) AS BIGINT) AS n_tokens_clean,
      |  coalesce(ka.ctext, '') AS clean_text
      |FROM tk LEFT JOIN perdoc p USING (doc_id) LEFT JOIN ka USING (doc_id)
      |ORDER BY tk.doc_id""".stripMargin
  }

  val spanDedupSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    s"""WITH t AS (
      |  SELECT doc_id, $toks AS toks, len($toks) AS n FROM documents),
      |sp AS (
      |  SELECT doc_id, n, CAST(k AS INT) AS k,
      |    md5(array_to_string(toks[k * $SpanW + 1 : k * $SpanW + $SpanW], ' ')) AS fp,
      |    least($SpanW, n - k * $SpanW) AS span_len,
      |    doc_id * 16384 + k AS pos_key
      |  FROM t, unnest(range(0, CAST(ceil(n / ${SpanW}.0) AS INT))) r(k)),
      |kp AS (SELECT fp, min(pos_key) AS keep_key FROM sp GROUP BY fp)
      |SELECT sp.doc_id, CAST(max(sp.n) AS INT) AS n_tokens,
      |  CAST(count(*) AS INT) AS n_spans,
      |  CAST(sum(CASE WHEN sp.pos_key > kp.keep_key THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_dup_spans,
      |  CAST(sum(CASE WHEN sp.pos_key > kp.keep_key THEN sp.span_len ELSE 0 END)
      |    AS BIGINT) AS tokens_lost,
      |  round(CAST(sum(CASE WHEN sp.pos_key > kp.keep_key THEN sp.span_len ELSE 0 END)
      |      AS DOUBLE) / CAST(max(sp.n) AS DOUBLE), 6) AS dup_ratio
      |FROM sp JOIN kp ON sp.fp = kp.fp
      |GROUP BY sp.doc_id ORDER BY sp.doc_id""".stripMargin
  }
}
