package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Statistical text-model operators for corpus curation: n-gram
  * language-model scoring (the perplexity-style quality signal CCNet /
  * Gopher pipelines threshold on) and batched BM25 retrieval (many
  * topical slices pulled in one corpus pass).
  *
  * Both follow the explode → aggregate → hash-join shape: model counts
  * are corpus-level aggregates that join back to per-document terms on
  * the term key, so every stage is linear with map-side partial
  * aggregation and the plans survive a 100 TB corpus. Float policy:
  * per-term scores are quantized (`round(_, 9)`) and summed as exact
  * decimals in a FIXED combination order, so cross-engine results are
  * bit-identical — never a float `sum` over an unordered group.
  */
object TextModel {

  /** Non-empty whitespace-separated tokens (same convention as
    * [[TextAnalysis]]). */
  private def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  /** Bigram language model scored over its own training corpus:
    * p(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V)  (add-one smoothing, V =
    * corpus vocabulary). Each document reports its bigram count, mean
    * log-probability, and bits-per-token — the fluency score used to
    * filter gibberish from training data.
    *
    * Scale shape: bigrams form via one doc_id-keyed window (posexplode +
    * lead — no per-doc lambda loops); the model tables c2/c1 are global
    * aggregates where c1 derives from c2 (no second pass over the raw
    * bigrams); scoring joins per-doc DISTINCT bigrams (with
    * multiplicity) to the model on the bigram key. Per-bigram log-probs
    * are quantized to 9dp and summed as decimals scaled by integer
    * multiplicity, so the per-doc mean is exact in any summation order.
    * Documents with <2 tokens have no bigrams and are excluded.
    */
  def ngramLmScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    // consecutive bigrams formed MAP-SIDE by zipping the token array
    // with its own tail (slice/arrays_zip are codegen'd, no lambda) —
    // the posexplode + lead() window formulation shuffles and sorts
    // every token on doc_id first; this fuses bigram formation into
    // the scan and the first shuffle is the (doc, bigram) aggregate
    val bg = docs
      .select($"doc_id", tokens($"text").as("t"))
      .filter(size($"t") >= 2)
      .select($"doc_id", explode(arrays_zip(
        slice($"t", lit(1), size($"t") - 1),
        slice($"t", lit(2), size($"t") - 1))).as("p"))
      .select($"doc_id", $"p".getField("0").as("w1"), $"p".getField("1").as("w2"))
    // per-doc distinct bigrams with multiplicity — the score join then
    // carries one row per distinct (doc, bigram), not per occurrence;
    // the GLOBAL model tables both derive from this aggregate, whose
    // identical exchange subtrees collapse to ReusedExchange in the
    // one-action plan (an explicit persist was MEASURED SLOWER at
    // sf0.1 — 1.2s → 1.9s — cache-write cost without recompute saved)
    val dbg = bg.groupBy($"doc_id", $"w1", $"w2").agg(count(lit(1)).as("m"))
    val c2 = dbg.groupBy($"w1", $"w2").agg(sum($"m").as("c2"))
    val c1 = c2.groupBy($"w1").agg(sum($"c2").as("c1"))
    val vocab = docs.select(explode(tokens($"text")).as("tok"))
      .agg(countDistinct($"tok").as("v"))
    val lp9 = round(log(($"c2" + 1).cast("double") / ($"c1" + $"v").cast("double")), 9)
      .cast("decimal(18,9)")
    val ln2 = 0.6931471805599453
    dbg.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy($"doc_id")
      .agg(sum($"m").as("n_bigrams"),
        sum($"m".cast("decimal(10,0)") * lp9).as("sum_lp"))
      .select($"doc_id", $"n_bigrams",
        round($"sum_lp".cast("double") / $"n_bigrams".cast("double"), 6).as("avg_logp"),
        round(-($"sum_lp".cast("double") / $"n_bigrams".cast("double")) / lit(ln2), 6)
          .as("bits_per_token"))
      .orderBy($"doc_id")
  }

  val ngramLmScoreSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |v AS (SELECT count(DISTINCT w) AS v FROM (SELECT unnest(t) AS w FROM toks)),
      |bg AS (
      |  SELECT doc_id, g[1] AS w1, g[2] AS w2
      |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> [t[i], t[i+1]])) AS g
      |        FROM toks WHERE len(t) >= 2)),
      |dbg AS (SELECT doc_id, w1, w2, count(*) AS m FROM bg GROUP BY doc_id, w1, w2),
      |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
      |c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1),
      |s AS (
      |  SELECT d.doc_id, d.m,
      |    CAST(round(ln(CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + v.v AS DOUBLE)), 9)
      |      AS DECIMAL(18,9)) AS lp
      |  FROM dbg d
      |  JOIN c2 ON d.w1 = c2.w1 AND d.w2 = c2.w2
      |  JOIN c1 ON d.w1 = c1.w1
      |  CROSS JOIN v)
      |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
      |  round(CAST(sum(CAST(m AS DECIMAL(10,0)) * lp) AS DOUBLE)
      |    / CAST(sum(m) AS DOUBLE), 6) AS avg_logp,
      |  round(-(CAST(sum(CAST(m AS DECIMAL(10,0)) * lp) AS DOUBLE)
      |    / CAST(sum(m) AS DOUBLE)) / 0.6931471805599453, 6) AS bits_per_token
      |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Corpus-level top-50 bigrams by frequency — the vocabulary/collocation
    * profile run before choosing tokenizer merges or stop-lists. Bigrams
    * form on one doc_id-keyed window shuffle (posexplode + lead), counts
    * partial-aggregate on the gram key, and the global top-50 runs as
    * TakeOrderedAndProject — each partition keeps 50 rows, the driver
    * merges 50×partitions — so the full distinct-gram table (billions of
    * rows on a web corpus) never feeds a single-partition sort; the rank
    * window then touches only the 50 survivors.
    */
  def topNgrams(spark: SparkSession, dir: String, topK: Int = 50): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos")
    val counts = Tables.documents(spark, dir)
      .select($"doc_id", posexplode(tokens($"text")).as(Seq("pos", "tok")))
      .withColumn("nxt", lead($"tok", 1).over(w))
      .filter($"nxt".isNotNull)
      .groupBy(concat_ws(" ", $"tok", $"nxt").as("bigram"))
      .agg(count(lit(1)).as("n"))
    counts
      .orderBy($"n".desc, $"bigram").limit(topK)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"n".desc, $"bigram")))
      .select($"rk", $"bigram", $"n")
      .orderBy($"rk")
  }

  val topNgramsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |bg AS (
      |  SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
      |  FROM toks WHERE len(t) >= 2),
      |c AS (SELECT bigram, count(*) AS n FROM bg GROUP BY bigram)
      |SELECT rk, bigram, n FROM (
      |  SELECT bigram, n, row_number() OVER (ORDER BY n DESC, bigram) AS rk FROM c)
      |WHERE rk <= 50 ORDER BY rk""".stripMargin

  /** PMI collocations — pointwise mutual information over bigrams with
    * support ≥ 5 (raw counts rank "of the", PMI ranks genuinely bound
    * pairs; the collocation signal behind tokenizer-merge and phrase
    * mining choices). All inputs are exact integer counts; the PMI is
    * ONE double expression — (c12·U²)/(T·c1·c2) then ln — but JVM
    * Math.log and DuckDB's libm ln are each only 1-ulp-accurate, so
    * ranking raw ln doubles could flip a tie or a 6dp rounding edge
    * between engines. Like [[zipfFit]], the ln is quantized to integer
    * micro-units (round(ln·10⁵) as BIGINT — Spark round ↔ DuckDB round
    * is the validated pair) and BOTH the ranking and the emitted value
    * derive from that integer, so order and output are engine-exact.
    * Support filtering bounds the ranked table; the unigram joins are
    * gram-keyed hash joins.
    */
  def pmiCollocations(spark: SparkSession, dir: String, topK: Int = 50): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos")
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", posexplode(tokens($"text")).as(Seq("pos", "tok")))
    val uni = toks.groupBy($"tok").agg(count(lit(1)).as("c"))
    val bg = toks
      .withColumn("nxt", lead($"tok", 1).over(w))
      .filter($"nxt".isNotNull)
      .groupBy($"tok".as("w1"), $"nxt".as("w2"))
      .agg(count(lit(1)).as("c12"))
      .filter($"c12" >= 5)
    val totals = uni.agg(sum($"c").as("u_tot")).crossJoin(
      toks.withColumn("nxt", lead($"tok", 1).over(w)).filter($"nxt".isNotNull)
        .agg(count(lit(1)).as("t_tot")))
    val pmiMicro = round(log(
      ($"c12".cast("double") * $"u_tot".cast("double") * $"u_tot".cast("double"))
        / ($"t_tot".cast("double") * $"c1".cast("double") * $"c2".cast("double")))
      * 100000d, 0).cast("long")
    val scored = bg
      .join(uni.select($"tok".as("w1"), $"c".as("c1")), "w1")
      .join(uni.select($"tok".as("w2"), $"c".as("c2")), "w2")
      .crossJoin(broadcast(totals))
      .withColumn("pmi_u", pmiMicro)
      .orderBy($"pmi_u".desc, $"w1", $"w2").limit(topK)
    scored
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"pmi_u".desc, $"w1", $"w2")))
      .select($"rk", concat_ws(" ", $"w1", $"w2").as("bigram"), $"c12",
        ($"pmi_u".cast("double") / 100000d).as("pmi"))
      .orderBy($"rk")
  }

  val pmiCollocationsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |uni AS (
      |  SELECT tok, count(*) AS c FROM (SELECT unnest(t) AS tok FROM toks)
      |  GROUP BY tok),
      |bg AS (
      |  SELECT w1, w2, count(*) AS c12 FROM (
      |    SELECT t[i] AS w1, t[i+1] AS w2
      |    FROM toks, unnest(range(1, len(t))) AS r(i) WHERE len(t) >= 2)
      |  GROUP BY w1, w2 HAVING count(*) >= 5),
      |tot AS (
      |  SELECT CAST((SELECT sum(c) FROM uni) AS BIGINT) AS u_tot,
      |         CAST((SELECT sum(c12) FROM (SELECT w1, w2, count(*) AS c12 FROM (
      |            SELECT t[i] AS w1, t[i+1] AS w2
      |            FROM toks, unnest(range(1, len(t))) AS r(i) WHERE len(t) >= 2)
      |          GROUP BY w1, w2)) AS BIGINT) AS t_tot),
      |scored AS (
      |  SELECT bg.w1, bg.w2, bg.c12,
      |    CAST(round(ln((CAST(bg.c12 AS DOUBLE) * CAST(u_tot AS DOUBLE) * CAST(u_tot AS DOUBLE))
      |      / (CAST(t_tot AS DOUBLE) * CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)))
      |      * 100000, 0) AS BIGINT) AS pmi_u
      |  FROM bg JOIN uni u1 ON u1.tok = bg.w1
      |          JOIN uni u2 ON u2.tok = bg.w2
      |          CROSS JOIN tot),
      |top AS (SELECT * FROM scored ORDER BY pmi_u DESC, w1, w2 LIMIT 50)
      |SELECT CAST(row_number() OVER (ORDER BY pmi_u DESC, w1, w2) AS INT) AS rk,
      |  w1 || ' ' || w2 AS bigram, c12, CAST(pmi_u AS DOUBLE) / 100000 AS pmi
      |FROM top ORDER BY rk""".stripMargin

  /** The fixed query batch for [[bm25Multi]]: (query_id, ordered terms).
    * Term order is part of the contract — scores add per-term components
    * in slot order, keeping the sum bit-stable. */
  val multiQueries: Seq[(String, Seq[String])] = Seq(
    "q_spark"  -> Seq("spark", "query", "window"),
    "q_stream" -> Seq("data", "stream", "join"),
    "q_sort"   -> Seq("hash", "merge", "sort"))

  /** Batched BM25: several queries ranked in ONE pass over the corpus
    * (k1=1.2, b=0.75, Robertson/Lucene idf — identical scoring to
    * [[TextAnalysis.bm25Search]]). The postings table is built once,
    * filtered to the union of all query terms BELOW the tf aggregate,
    * then fanned out to queries by a broadcast join on the term — the
    * corpus is scanned once no matter how many queries ride the batch,
    * which is what makes curation slicing affordable at 100 TB. Per-doc
    * scores pivot each query's terms into fixed slots and add them in
    * slot order; top-10 per query via a partitioned rank, so the global
    * sort is WindowGroupLimit-pruned.
    */
  def bm25Multi(spark: SparkSession, dir: String,
                k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    import spark.implicits._
    val allTerms = multiQueries.flatMap(_._2).distinct
    val qterms = multiQueries
      .flatMap { case (q, ts) => ts.zipWithIndex.map { case (t, i) => (q, i + 1, t) } }
      .toDF("query_id", "slot", "w")
    val sized = Tables.documents(spark, dir)
      .select($"doc_id", tokens($"text").as("toks"))
      .select($"doc_id", $"toks", size($"toks").cast("long").as("dl"))
    val stats = sized.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
    val tf = sized.select($"doc_id", $"dl", explode($"toks").as("w"))
      .filter($"w".isin(allTerms: _*))
      .groupBy($"doc_id", $"dl", $"w").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"w").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), "w")
      .join(broadcast(qterms), "w")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", $"sum_dl".cast("double") / $"n_docs".cast("double"))
      .withColumn("idf", log(($"n_docs" - $"df" + 0.5) / ($"df" + 0.5) + 1.0))
      .withColumn("s", $"idf" * ($"tf" * lit(k1 + 1)) /
        ($"tf" + lit(k1) * (lit(1 - b) + lit(b) * $"dl".cast("double") / $"avgdl")))
    val slots = Seq(1, 2, 3).map(i => max(when($"slot" === i, $"s")).as(s"s$i"))
    val grouped = scored.groupBy($"query_id", $"doc_id").agg(slots.head, slots.tail: _*)
    val score = Seq(1, 2, 3).map(i => coalesce(col(s"s$i"), lit(0.0))).reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy(score.desc, $"doc_id")
    grouped
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= topK)
      .select($"query_id", $"rk", $"doc_id", round(score, 6).as("score"))
      .orderBy($"query_id", $"rk")
  }

  val bm25MultiSql: String = {
    val allTerms = multiQueries.flatMap(_._2).distinct
      .map(t => s"'$t'").mkString(", ")
    val values = multiQueries
      .flatMap { case (q, ts) => ts.zipWithIndex.map { case (t, i) => s"('$q', ${i + 1}, '$t')" } }
      .mkString(", ")
    s"""WITH sized AS (
      |  SELECT doc_id,
      |    len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS dl,
      |    list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
      |  FROM documents),
      |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM sized),
      |tf AS (
      |  SELECT doc_id, dl, w, count(*) AS tf
      |  FROM (SELECT doc_id, dl, unnest(t) AS w FROM sized)
      |  WHERE w IN ($allTerms) GROUP BY doc_id, dl, w),
      |dfq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
      |q AS (SELECT * FROM (VALUES $values) AS q(query_id, slot, w)),
      |s AS (
      |  SELECT q.query_id, q.slot, tf.doc_id,
      |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
      |      * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
      |        / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))) AS sc
      |  FROM tf JOIN dfq ON tf.w = dfq.w JOIN q ON tf.w = q.w CROSS JOIN stats),
      |per AS (
      |  SELECT query_id, doc_id,
      |    max(sc) FILTER (slot = 1) AS s1,
      |    max(sc) FILTER (slot = 2) AS s2,
      |    max(sc) FILTER (slot = 3) AS s3
      |  FROM s GROUP BY query_id, doc_id)
      |SELECT query_id, rk, doc_id, round(raw, 6) AS score FROM (
      |  SELECT query_id, doc_id,
      |    coalesce(s1, 0) + coalesce(s2, 0) + coalesce(s3, 0) AS raw,
      |    row_number() OVER (PARTITION BY query_id ORDER BY
      |      coalesce(s1, 0) + coalesce(s2, 0) + coalesce(s3, 0) DESC, doc_id) AS rk
      |  FROM per) ranked
      |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin
  }

  /** Adjacent character-pair counts, top 50 — the first merge-candidate
    * table of BPE tokenizer training. Pure map (sequence → substring
    * pairs) into a pair-key partial aggregate; the global top-k is
    * TakeOrderedAndProject, so the full pair table (bounded by |byte
    * alphabet|² anyway) never feeds a single-partition sort. The only
    * shuffle is the pair-key aggregate — the exact shape a 100 TB BPE
    * trainer iterates.
    */
  def bpePairCounts(spark: SparkSession, dir: String, topK: Int = 50): DataFrame = {
    import spark.implicits._
    val dfp = Tables.documents(spark, dir)
      .filter(length($"text") >= 2) // sequence(1, 0) would DESCEND
      .select($"text", explode(sequence(lit(1), length($"text") - 1)).as("i"))
      .select(expr("substring(text, i, 2)").as("pair"))
      .groupBy($"pair").agg(count(lit(1)).as("n"))
    dfp.orderBy($"n".desc, $"pair").limit(topK)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"n".desc, $"pair")))
      .select($"rk", $"pair", $"n")
      .orderBy($"rk")
  }

  val bpePairCountsSql: String =
    """WITH pairs AS (
      |  SELECT text[i:i+1] AS pair
      |  FROM documents, unnest(range(1, length(text))) AS t(i)),
      |counts AS (SELECT pair, count(*) AS n FROM pairs GROUP BY pair),
      |top AS (SELECT pair, n FROM counts ORDER BY n DESC, pair LIMIT 50)
      |SELECT CAST(row_number() OVER (ORDER BY n DESC, pair) AS INT) AS rk, pair, n
      |FROM top ORDER BY rk""".stripMargin

  private val BpeMerges = 8

  /** Iterative BPE tokenizer TRAINING — the k-merge loop that turns
    * [[bpePairCounts]]' one-round candidate table into an actual merge
    * list. Classic word-frequency formulation (the shape every
    * distributed BPE trainer uses): the corpus collapses once into
    * (word, count) — pair statistics within words times word frequency
    * are exact, and all per-round work is |distinct words|-cardinality,
    * not corpus-cardinality. Each round: adjacent-symbol pair counts
    * (weighted by word count) → the single most frequent pair (ties
    * broken lexicographically) → apply the merge left-to-right to every
    * word's symbol sequence. Left-to-right semantics for a run of equal
    * symbols (L == R) merge at even run offsets only — implemented with
    * deterministic index arithmetic (a position starts a merge iff its
    * preceding same-symbol run length is even), identically in the
    * oracle, so no engine-specific regex/replace semantics leak in.
    * Output: the k=8 merge rules in training order with their
    * selection-time counts — deterministic, the artifact a tokenizer
    * budget decision consumes.
    *
    * Scale shape: mirrors the graph loops' iteration-state doctrine —
    * the word table is persisted per round via eager localCheckpoint
    * (8 rounds of nested higher-order functions would otherwise stack
    * into one unoptimizable mega-plan), releasing the previous round's
    * blocks once the next materializes. Driver traffic is ONE
    * (pair, count) row per round — O(model), the IVF-centroid pattern.
    * The pair aggregate shuffles only (symbol, symbol, long) rows.
    */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame =
    bpeTrainCore(spark, dir)._1

  /** The trained state: (merge list, final word table). The word table
    * IS the tokenizer — after k merges each word's symbol sequence is
    * its BPE tokenization — which [[bpeTokenize]] joins back to the
    * corpus.
    */
  private def bpeTrainCore(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    // merge-apply: new symbol array after applying (l, r) -> l+r
    // left-to-right. st(i) marks merge starts; a position following a
    // start is consumed; everything else passes through.
    def mergeApply(syms: Column, l: String, r: String): Column = {
      val n = size(syms)
      // 1-based position of the last non-l symbol at-or-before each
      // index; pre(i) = i-1 - max(nonL[1..i-1]) = length of the
      // immediately-preceding run of l's
      val nonL = transform(syms, (x, idx) => when(x =!= l, idx + 1).otherwise(0))
      val st = transform(syms, (x, idx) => {
        val i = idx + 1
        when(i < n && x === lit(l) && element_at(syms, i + 1) === lit(r),
          lit(l != r) ||
            ((i - 1 - coalesce(array_max(slice(nonL, lit(1), i - 1)), lit(0))) % 2 === 0))
          .otherwise(lit(false))
      })
      filter(
        transform(syms, (x, idx) => {
          val i = idx + 1
          when(element_at(st, i), lit(l + r))
            .when(i > lit(1) && element_at(st, i - 1), lit(null).cast("string"))
            .otherwise(x)
        }),
        x => x.isNotNull)
    }
    var words = Tables.documents(spark, dir)
      .select(explode(tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
      .select($"w", $"cnt", filter(split($"w", ""), c => c =!= "").as("syms"))
      .localCheckpoint(true)
    var prevRdd: org.apache.spark.rdd.RDD[_] = null
    val merges = scala.collection.mutable.ListBuffer[(Int, String, String, String, Long)]()
    var rk = 1
    // a tiny corpus can run dry before k merges — the oracle's replay
    // stops identically (an empty top-pair CTE empties every later
    // round via its cross join), so both sides emit the same prefix
    while (rk <= BpeMerges && {
      val top = words
        .filter(size($"syms") >= 2)
        .select($"cnt", explode(transform(sequence(lit(1), size($"syms") - 1),
          i => struct(element_at($"syms", i).as("l"), element_at($"syms", i + 1).as("r"))))
          .as("p"))
        .groupBy($"p.l", $"p.r").agg(sum($"cnt").as("n"))
        .orderBy($"n".desc, $"l", $"r")
        .limit(1).collect()
      top.nonEmpty && {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        val next = words.select($"w", $"cnt", mergeApply($"syms", l, r).as("syms"))
          .localCheckpoint(true)
        if (prevRdd != null) prevRdd.unpersist(blocking = false)
        prevRdd = words.queryExecution.analyzed.collectFirst {
          case lrdd: org.apache.spark.sql.execution.LogicalRDD => lrdd.rdd
        }.orNull
        words = next
        merges += ((rk, l, r, l + r, n))
        true
      }
    }) rk += 1
    (merges.toSeq.toDF("rk", "lhs", "rhs", "merged", "n").orderBy($"rk"), words)
  }

  /** Apply the trained tokenizer to the corpus: per-document BPE token
    * counts and the chars-per-token compression ratio — the number a
    * tokenizer budget decision actually reads (how much sequence length
    * the k merges buy on THIS corpus). The trained word table maps each
    * distinct word to its post-merge symbol count; the corpus joins to
    * it on the word key — a vocabulary-sized build side AQE broadcasts,
    * so tokenization is one scan + one map-side join at any corpus
    * size. All ratios are exact-int divisions rounded for display.
    */
  def bpeTokenize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = bpeTrainCore(spark, dir)._2
    val wlen = words.select($"w", size($"syms").cast("long").as("n_syms"))
    Tables.documents(spark, dir)
      .select($"doc_id", explode(tokens($"text")).as("w"))
      .join(wlen, "w")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(length($"w").cast("long")).as("n_chars"),
        sum($"n_syms").as("n_bpe_tokens"))
      .select($"doc_id", $"n_words", $"n_chars", $"n_bpe_tokens",
        round($"n_chars".cast("double") / $"n_bpe_tokens".cast("double"), 6)
          .as("chars_per_token"))
      .orderBy($"doc_id")
  }

  /** Tokenizer FERTILITY by language — the per-language cost of a
    * shared tokenizer (tokens emitted per word, and chars per token):
    * the standard multilingual-tokenizer bias readout. A BPE vocabulary
    * trained on a mixed corpus learns the dominant language's merges,
    * so under-represented languages fragment into more tokens per word
    * — they pay more sequence length for the same text, which skews
    * both training cost and effective context. This runs the SAME
    * trained word table as [[bpeTokenize]] but aggregates per lang:
    * n_docs·words·chars·bpe-token masses, fertility = tokens/word,
    * compression = chars/token.
    *
    * Scale: identical shape to bpeTokenize (vocabulary-sized build
    * side broadcast into one corpus scan), with a |langs|-row output
    * aggregate instead of per-doc. */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = bpeTrainCore(spark, dir)._2
    val wlen = words.select($"w", size($"syms").cast("long").as("n_syms"))
    Tables.documents(spark, dir)
      .select($"doc_id", $"lang", explode(tokens($"text")).as("w"))
      .join(wlen, "w")
      .groupBy($"lang")
      .agg(countDistinct($"doc_id").as("n_docs"),
        count(lit(1)).as("n_words"),
        sum(length($"w").cast("long")).as("n_chars"),
        sum($"n_syms").as("n_bpe_tokens"))
      .select($"lang", $"n_docs", $"n_words", $"n_chars", $"n_bpe_tokens",
        round($"n_bpe_tokens".cast("double") / $"n_words".cast("double"), 6)
          .as("fertility"),
        round($"n_chars".cast("double") / $"n_bpe_tokens".cast("double"), 6)
          .as("chars_per_token"))
      .orderBy($"lang")
  }

  val tokenizerFertilitySql: String =
    bpeTrainChainSql +
      s""",
         |wl AS (SELECT w, CAST(len(syms) AS BIGINT) AS n_syms FROM wd$BpeMerges),
         |dw AS (
         |  SELECT doc_id, lang,
         |    unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS w
         |  FROM documents)
         |SELECT lang,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(length(dw.w)) AS BIGINT) AS n_chars,
         |  CAST(sum(wl.n_syms) AS BIGINT) AS n_bpe_tokens,
         |  round(CAST(sum(wl.n_syms) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         |    AS fertility,
         |  round(CAST(sum(length(dw.w)) AS DOUBLE)
         |    / CAST(sum(wl.n_syms) AS DOUBLE), 6) AS chars_per_token
         |FROM dw JOIN wl ON dw.w = wl.w
         |GROUP BY lang ORDER BY lang""".stripMargin

  /** Replay: the training chain's final word table joined back to the
    * per-document word explode.
    */
  val bpeTokenizeSql: String =
    bpeTrainChainSql +
      s""",
         |wl AS (SELECT w, CAST(len(syms) AS BIGINT) AS n_syms FROM wd$BpeMerges),
         |dw AS (
         |  SELECT doc_id,
         |    unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS w
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(length(dw.w)) AS BIGINT) AS n_chars,
         |  CAST(sum(wl.n_syms) AS BIGINT) AS n_bpe_tokens,
         |  round(CAST(sum(length(dw.w)) AS DOUBLE)
         |    / CAST(sum(wl.n_syms) AS DOUBLE), 6) AS chars_per_token
         |FROM dw JOIN wl ON dw.w = wl.w
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Unrolled 8-round replay of the training loop: per round, a pair
    * count CTE, a LIMIT-1 top pair, a merge-start flag table (same
    * index arithmetic as the Spark side), and the rewritten word table.
    */
  /** The shared CTE chain through the final word table `wd8` (no
    * trailing SELECT) — [[bpeTrainSql]] appends the merge-list union,
    * [[bpeTokenizeSql]] the corpus join.
    */
  private lazy val bpeTrainChainSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    val rounds = (0 until BpeMerges).map { i =>
      s""",
         |pc$i AS (
         |  SELECT syms[i] AS lhs, syms[i + 1] AS rhs, CAST(sum(cnt) AS BIGINT) AS n
         |  FROM wd$i, unnest(range(1, len(syms))) r(i)
         |  GROUP BY 1, 2),
         |top$i AS (SELECT lhs, rhs, n FROM pc$i ORDER BY n DESC, lhs, rhs LIMIT 1),
         |wa$i AS (
         |  SELECT w, cnt, syms, lhs, rhs,
         |    list_transform(range(1, len(syms) + 1), p ->
         |      CASE WHEN syms[p] <> lhs THEN p ELSE 0 END) AS nonl
         |  FROM wd$i, top$i),
         |ws$i AS (
         |  SELECT w, cnt, syms, lhs, rhs,
         |    list_transform(range(1, len(syms) + 1), i ->
         |      CASE WHEN i < len(syms) AND syms[i] = lhs AND syms[i + 1] = rhs
         |        THEN (lhs <> rhs OR
         |          ((i - 1 - coalesce(list_max(nonl[1:i - 1]), 0)) % 2 = 0))
         |        ELSE FALSE END) AS st
         |  FROM wa$i),
         |wd${i + 1} AS (
         |  SELECT w, cnt,
         |    list_filter(
         |      list_transform(range(1, len(syms) + 1), i ->
         |        CASE WHEN st[i] THEN lhs || rhs
         |             WHEN i > 1 AND st[i - 1] THEN NULL
         |             ELSE syms[i] END),
         |      x -> x IS NOT NULL) AS syms
         |  FROM ws$i)""".stripMargin
    }.mkString
    s"""WITH wf AS (
       |  SELECT tok AS w, count(*) AS cnt
       |  FROM (SELECT unnest($toks) AS tok FROM documents)
       |  GROUP BY tok),
       |wd0 AS (
       |  SELECT w, cnt,
       |    list_transform(range(1, length(w) + 1), i -> w[i]) AS syms
       |  FROM wf)$rounds""".stripMargin
  }

  val bpeTrainSql: String = {
    val out = (0 until BpeMerges).map { i =>
      s"SELECT ${i + 1} AS rk, lhs, rhs, lhs || rhs AS merged, n FROM top$i"
    }.mkString("", "\nUNION ALL\n", "")
    bpeTrainChainSql + "\n" + out + "\nORDER BY rk"
  }

  /** Per-document n-gram NOVELTY against everything ingested before it
    * (doc_id = ingestion order): the fraction of a doc's distinct
    * bigrams whose first corpus appearance is the doc itself. Low
    * novelty ⇒ the doc is mostly re-treading earlier content — the
    * incremental-dedup signal for append-only corpus growth (a cheap
    * streaming-order complement to pairwise near-dup search).
    *
    * Scale shape: bigrams form in one doc_id-keyed window pass (shared
    * shape with [[ngramLmScore]]); first-seen is a gram-keyed min
    * aggregate of the SAME distinct-gram table (no second raw pass);
    * the verdict join is gram-keyed hash join of id/count rows only.
    * novel_frac is exact-int ÷ exact-int — one correctly-rounded IEEE
    * division, bit-identical in any engine, no rounding needed.
    */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // map-side bigram formation (the ngramLmScore zip rewrite): no
    // token-level window shuffle; the first exchange is the distinct
    val dbg = Tables.documents(spark, dir)
      .select($"doc_id", tokens($"text").as("t"))
      .filter(size($"t") >= 2)
      .select($"doc_id", explode(arrays_zip(
        slice($"t", lit(1), size($"t") - 1),
        slice($"t", lit(2), size($"t") - 1))).as("p"))
      .select($"doc_id", $"p".getField("0").as("w1"), $"p".getField("1").as("w2"))
      .distinct()
    val firstSeen = dbg.groupBy($"w1", $"w2").agg(min($"doc_id").as("first_doc"))
    dbg.join(firstSeen, Seq("w1", "w2"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L)).as("n_novel"))
      .select($"doc_id", $"n_grams", $"n_novel",
        ($"n_novel".cast("double") / $"n_grams".cast("double")).as("novel_frac"))
      .orderBy($"doc_id")
  }

  val ngramNoveltySql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |bg AS (
      |  SELECT DISTINCT doc_id, t[i] AS w1, t[i+1] AS w2
      |  FROM toks, unnest(range(1, len(t))) AS r(i)),
      |fs AS (SELECT w1, w2, min(doc_id) AS first_doc FROM bg GROUP BY w1, w2)
      |SELECT bg.doc_id, count(*) AS n_grams,
      |  CAST(sum(CASE WHEN fs.first_doc = bg.doc_id THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_novel,
      |  CAST(sum(CASE WHEN fs.first_doc = bg.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS novel_frac
      |FROM bg JOIN fs ON bg.w1 = fs.w1 AND bg.w2 = fs.w2
      |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin

  /** Zipf-law fit over the corpus term-frequency distribution: OLS of
    * ln(freq) on ln(rank) for the top-500 terms — slope ≈ −s is the
    * Zipf exponent, a one-number corpus-health signal (natural text
    * sits near s≈1; templated/boilerplate corpora deviate hard).
    *
    * Scale shape: term counts are one partial-agg shuffle; the rank
    * table is TakeOrdered-bounded to 500 rows BEFORE the window rank,
    * so the fit never sorts the full vocabulary. Cross-engine
    * exactness: ln values are quantized to integer micro-units
    * (round(ln·10⁵)) — a 1-ulp libm disagreement flips a micro-unit
    * with probability ~10⁻¹⁰ — summed exactly as integers, and the
    * closed-form slope/intercept/r² combine the five sums in identical
    * IEEE double order in both engines (the [[Profile.trendFit]]
    * doctrine).
    */
  /** Token-distribution DRIFT between the training split and the
    * held-out split (doc_id % 97 — the same bench split
    * `decontaminate` uses): per-token KL(P_train‖Q_held) contribution
    * p·ln(p/q) under add-one smoothing over the joint vocabulary, top
    * 50 tokens. The distribution-shift report a mixture rebalance or
    * contamination investigation starts from.
    *
    * Engine-exactness: p = a/b and q = c/d are ratios of exact integer
    * counts with CONSTANT denominators (b = N_train+V, d = N_held+V),
    * so ranking by p·ln(p/q) equals ranking by the INTEGER
    * a · round(ln(ad/bc)·10⁵) — counts ride the shuffle, the ln is
    * micro-unit-quantized ([[zipfFit]] doctrine), and the tie-break is
    * the token itself. The emitted contribution derives from that same
    * integer (one conversion, two divisions, fixed order). One token
    * groupBy shuffle + a broadcast scalar; output is 50 rows at any
    * corpus scale.
    */
  def tokenKlDrift(spark: SparkSession, dir: String, topK: Int = 50): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", explode(tokens($"text")).as("tok"))
      .withColumn("held", pmod($"doc_id", lit(97)) === 0)
    val counts = toks.groupBy($"tok").agg(
      sum(when(!$"held", 1L).otherwise(0L)).as("c_train"),
      sum(when($"held", 1L).otherwise(0L)).as("c_held"))
    val totals = counts.agg(
      sum($"c_train").as("n_train"), sum($"c_held").as("n_held"),
      count(lit(1)).as("v"))
    val scored = counts.crossJoin(broadcast(totals))
      .withColumn("ln_u", round(log(
        (($"c_train" + 1) * ($"n_held" + $"v")).cast("double")
          / (($"n_train" + $"v") * ($"c_held" + 1)).cast("double"))
        * 100000d, 0).cast("long"))
      .withColumn("rank_key", ($"c_train" + 1) * $"ln_u")
      .orderBy($"rank_key".desc, $"tok").limit(topK)
    scored
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"rank_key".desc, $"tok")))
      .select($"rk", $"tok", $"c_train", $"c_held",
        round($"rank_key".cast("double") / ($"n_train" + $"v").cast("double")
          / 100000d, 9).as("kl_contrib"))
      .orderBy($"rk")
  }

  val tokenKlDriftSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    s"""WITH t AS (
      |  SELECT doc_id % 97 = 0 AS held, unnest($toks) AS tok FROM documents),
      |c AS (
      |  SELECT tok,
      |    CAST(sum(CASE WHEN held THEN 0 ELSE 1 END) AS BIGINT) AS c_train,
      |    CAST(sum(CASE WHEN held THEN 1 ELSE 0 END) AS BIGINT) AS c_held
      |  FROM t GROUP BY tok),
      |tot AS (
      |  SELECT CAST(sum(c_train) AS BIGINT) AS n_train,
      |         CAST(sum(c_held) AS BIGINT) AS n_held,
      |         CAST(count(*) AS BIGINT) AS v FROM c),
      |s AS (
      |  SELECT tok, c_train, c_held,
      |    (c_train + 1) * CAST(round(ln(
      |      CAST((c_train + 1) * (n_held + v) AS DOUBLE)
      |        / CAST((n_train + v) * (c_held + 1) AS DOUBLE)) * 100000, 0) AS BIGINT)
      |      AS rank_key,
      |    n_train + v AS b
      |  FROM c CROSS JOIN tot),
      |top AS (SELECT * FROM s ORDER BY rank_key DESC, tok LIMIT 50)
      |SELECT CAST(row_number() OVER (ORDER BY rank_key DESC, tok) AS INT) AS rk,
      |  tok, c_train, c_held,
      |  round(CAST(rank_key AS DOUBLE) / CAST(b AS DOUBLE) / 100000, 9) AS kl_contrib
      |FROM top ORDER BY rk""".stripMargin
  }

  /** Per-language distinguishing tokens — Monroe-style log-odds with an
    * add-one Dirichlet prior: for each language, which tokens are
    * over-represented vs the REST of the corpus. The mixture-balance
    * diagnostic behind "what is this source actually full of" during
    * corpus curation (raw counts rank stopwords; log-odds ranks what is
    * distinctive). Support ≥ 10 occurrences in-language keeps the
    * high-variance rare tail out of the ranking.
    *
    * Plan: one token-keyed exchange builds per-(lang, tok) counts; the
    * per-token corpus counts reduce FROM those partials (second keyed
    * agg, no re-scan), per-lang totals and the (V, N) scalars are
    * model-sized broadcasts, and the per-lang top-k is a rank window
    * with map-side group limits. Corpus text never rides a shuffle —
    * only (lang, tok, count) rows.
    *
    * Engine-exactness: all four odds components are exact integers;
    * delta = ln of ONE exact integer-ratio double, quantized to
    * micro-units (round(ln·10⁵) BIGINT — the [[zipfFit]]/[[pmiCollocations]]
    * pattern), so ranking and output are bit-identical cross-engine.
    */
  def tokenLogodds(spark: SparkSession, dir: String, topK: Int = 10,
      minSupport: Int = 10): DataFrame = {
    import spark.implicits._
    // (lang, tok, count) is vocab-cardinality — far below the corpus —
    // and feeds three aggregates; persisted so the corpus tokenization
    // pass runs once, not three times
    val lt = Tables.documents(spark, dir)
      .select($"lang", explode(tokens($"text")).as("tok"))
      .groupBy($"lang", $"tok").agg(count(lit(1)).as("y_lw"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tokTot = lt.groupBy($"tok").agg(sum($"y_lw").as("y_w"))
    val langTot = lt.groupBy($"lang").agg(sum($"y_lw").as("n_l"))
    val totals = tokTot.agg(sum($"y_w").as("n"), count(lit(1)).as("v"))
    val num1 = $"y_lw" + 1L
    val den1 = $"n_l" + $"v" - $"y_lw" - 1L
    val num2 = $"y_w" - $"y_lw" + 1L
    val den2 = $"n" - $"n_l" + $"v" - ($"y_w" - $"y_lw") - 1L
    val scored = lt
      .join(tokTot, "tok")
      .join(langTot, "lang")
      .crossJoin(broadcast(totals))
      .withColumn("delta_micro",
        round(log((num1 * den2).cast("double") / (den1 * num2).cast("double"))
          * 100000d, 0).cast("long"))
      .filter($"y_lw" >= minSupport)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"delta_micro".desc, $"tok")
    Release.grid(
      scored.withColumn("rk", row_number().over(w))
        .filter($"rk" <= topK)
        .select($"lang", $"rk", $"tok", $"y_lw", $"delta_micro",
          round($"delta_micro".cast("double") / 100000d, 5).as("log_odds"))
        .orderBy($"lang", $"rk"),
      lt) // |langs|·topK rows
  }

  val tokenLogoddsSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    s"""WITH t AS (SELECT lang, unnest($toks) AS tok FROM documents),
      |lt AS (
      |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS y_lw
      |  FROM t GROUP BY lang, tok),
      |tt AS (SELECT tok, CAST(sum(y_lw) AS BIGINT) AS y_w FROM lt GROUP BY tok),
      |ngl AS (SELECT lang, CAST(sum(y_lw) AS BIGINT) AS n_l FROM lt GROUP BY lang),
      |tot AS (
      |  SELECT CAST(sum(y_w) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v FROM tt),
      |s AS (
      |  SELECT lt.lang, lt.tok, y_lw,
      |    CAST(round(ln(
      |      CAST((y_lw + 1) * (n - n_l + v - (y_w - y_lw) - 1) AS DOUBLE)
      |        / CAST((n_l + v - y_lw - 1) * (y_w - y_lw + 1) AS DOUBLE))
      |      * 100000, 0) AS BIGINT) AS delta_micro
      |  FROM lt JOIN tt ON lt.tok = tt.tok
      |          JOIN ngl ON lt.lang = ngl.lang
      |          CROSS JOIN tot
      |  WHERE y_lw >= 10)
      |SELECT lang, rk, tok, y_lw, delta_micro,
      |  round(CAST(delta_micro AS DOUBLE) / 100000, 5) AS log_odds
      |FROM (
      |  SELECT lang, tok, y_lw, delta_micro,
      |    CAST(row_number() OVER (PARTITION BY lang
      |      ORDER BY delta_micro DESC, tok) AS INT) AS rk
      |  FROM s)
      |WHERE rk <= 10 ORDER BY lang, rk""".stripMargin
  }

  def zipfFit(spark: SparkSession, dir: String, topR: Int = 500): DataFrame = {
    import spark.implicits._
    val tf = Tables.documents(spark, dir)
      .select(explode(tokens($"text")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"tok").limit(topR)
    val ranked = tf.withColumn("rk", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy($"n".desc, $"tok")))
      .select(round(log($"rk".cast("double")) * 100000d, 0).cast("long").as("x"),
        round(log($"n".cast("double")) * 100000d, 0).cast("long").as("y"))
    val sums = ranked.agg(
      count(lit(1)).as("m"),
      sum($"x").as("sx"), sum($"y").as("sy"),
      sum($"x" * $"y").as("sxy"),
      sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"))
    val m = $"m".cast("double")
    val (sx, sy, sxy, sxx, syy) =
      ($"sx".cast("double"), $"sy".cast("double"), $"sxy".cast("double"),
        $"sxx".cast("double"), $"syy".cast("double"))
    val covN = m * sxy - sx * sy     // ×10¹⁰ scale cancels in slope/r²
    val varX = m * sxx - sx * sx
    val varY = m * syy - sy * sy
    sums.select($"m".as("n_terms"),
      round(covN / varX, 6).as("slope"),
      round((sy - (covN / varX) * sx) / m / lit(100000d), 6).as("intercept"),
      round(covN * covN / (varX * varY), 6).as("r2"))
  }

  val zipfFitSql: String =
    """WITH tf AS (
      |  SELECT tok, count(*) AS n FROM (
      |    SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok
      |    FROM documents)
      |  GROUP BY tok ORDER BY n DESC, tok LIMIT 500),
      |rk AS (
      |  SELECT CAST(round(ln(CAST(row_number() OVER (ORDER BY n DESC, tok) AS DOUBLE))
      |              * 100000, 0) AS BIGINT) AS x,
      |         CAST(round(ln(CAST(n AS DOUBLE)) * 100000, 0) AS BIGINT) AS y
      |  FROM tf),
      |s AS (
      |  SELECT count(*) AS m,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM rk)
      |SELECT m AS n_terms,
      |  round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
      |    AS slope,
      |  round((CAST(sy AS DOUBLE)
      |      - ((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |         / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
      |        * CAST(sx AS DOUBLE)) / CAST(m AS DOUBLE) / 100000, 6) AS intercept,
      |  round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      * (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / ((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
      |    AS r2
      |FROM s""".stripMargin

  /** Vocabulary coverage curve — what share of all token OCCURRENCES
    * the top-K most frequent types cover, for the K ladder a tokenizer
    * budget decision reads off ("how big must the vocab be to cover
    * 95% of the stream"). Emits one row per K with the covered mass,
    * total mass, share, and the full type count.
    *
    * Scale: the corpus collapses to the type-frequency table on one
    * gram-keyed partial agg (map-side combine — the explode never
    * re-shuffles raw tokens); the rank runs over the TYPE table only.
    * The global row_number window is single-partition over the vocab —
    * fine for natural-language vocabularies (≤ tens of millions of
    * types); for an unbounded key domain the documented path is the
    * two-level grid rank used by the ntile family.
    */
  def tokenCoverage(spark: SparkSession, dir: String,
                    ks: Seq[Int] = Seq(100, 1000, 10000)): DataFrame = {
    import spark.implicits._
    val freq = Tables.documents(spark, dir)
      .select(explode(tokens($"text")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"n".desc, $"tok")
    val ranked = freq.withColumn("rk", row_number().over(w))
    val tot = freq.agg(sum($"n").as("total_tokens"),
      count(lit(1)).as("vocab_size"))
    // ONE pass over the ranked vocab: every K rung is a conditional
    // sum in the same aggregate, then the 1-row result unpivots to the
    // ladder (the previous shape re-scanned the vocab once per K)
    val covs = ks.map(k => sum(when($"rk" <= k, $"n").otherwise(0L)).as(s"c$k"))
    val ladder = ranked.agg(covs.head, covs.tail: _*)
      .select(explode(array(ks.map(k =>
        struct(lit(k).as("k"), col(s"c$k").as("covered"))): _*)).as("s"))
      .select($"s.k".as("k"), $"s.covered".as("covered"))
    ladder.crossJoin(broadcast(tot))
      .select($"k", $"covered".cast("long").as("covered"),
        $"total_tokens".cast("long").as("total_tokens"),
        round($"covered".cast("double") / $"total_tokens".cast("double"), 6)
          .as("share"),
        $"vocab_size".cast("long").as("vocab_size"))
      .orderBy($"k")
  }

  val tokenCoverageSql: String =
    """WITH toks AS (
      |  SELECT unnest(list_filter(string_split_regex(text, '\s+'),
      |    x -> x <> '')) AS tok
      |  FROM documents),
      |f AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY tok),
      |r AS (SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rk FROM f),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS total_tokens,
      |  CAST(count(*) AS BIGINT) AS vocab_size FROM f),
      |ladder AS (
      |  SELECT 100 AS k, CAST(sum(n) AS BIGINT) AS covered FROM r WHERE rk <= 100
      |  UNION ALL
      |  SELECT 1000, CAST(sum(n) AS BIGINT) FROM r WHERE rk <= 1000
      |  UNION ALL
      |  SELECT 10000, CAST(sum(n) AS BIGINT) FROM r WHERE rk <= 10000)
      |SELECT k, covered, total_tokens,
      |  round(CAST(covered AS DOUBLE) / CAST(total_tokens AS DOUBLE), 6) AS share,
      |  vocab_size
      |FROM ladder CROSS JOIN t ORDER BY k""".stripMargin

  // ------------------------------------------------------------------
  // vocab_growth — Heaps-law vocabulary growth at ingestion checkpoints
  // ------------------------------------------------------------------

  private val GrowthCheckpoints = 10

  /** Vocabulary growth per source at 10 ingestion checkpoints: cutting
    * the corpus at doc_id < k·(max_id+1)/10, each (source, k) cell
    * reports cumulative docs, token mass, distinct vocabulary, and the
    * marginal new-vocab-per-token rate since the previous checkpoint —
    * the Heaps-law saturation curve that answers "is this source still
    * contributing new language, or just more of the same?" (the
    * diversity complement to `ngram_novelty`'s per-doc score).
    *
    * Shape: NO running windows over docs — each token's contribution
    * to every checkpoint is determined by its FIRST document
    * (min doc_id per (source, token), one vocab-cardinality
    * aggregate), so cumulative vocab is a grid join: first-occurrence
    * table × broadcast 10-row checkpoint grid, then a (source, k)
    * aggregate. Docs/token mass come from a doc-cardinality table ×
    * the same grid. Both sides scale linearly (×10 constant); the
    * only corpus-row pass is the token explode feeding the
    * first-occurrence aggregate. The marginal-rate lag runs on the
    * |sources|×10 result grid.
    */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val mx = docs.agg((max($"doc_id") + 1).as("m"))
    val grid = spark.range(1, GrowthCheckpoints + 1).toDF("k")
      .crossJoin(mx)
      .select($"k".cast("int").as("k"),
        (($"k" * $"m" - ($"k" * $"m") % GrowthCheckpoints)
          / GrowthCheckpoints).cast("long").as("cut"))
    val dt = docs.select($"source", $"doc_id",
      size(tokens($"text")).cast("long").as("n_tokens"))
    val fv = docs.select($"source", explode(tokens($"text")).as("tok"), $"doc_id")
      .groupBy($"source", $"tok").agg(min($"doc_id").as("first_doc"))
    val mass = dt.crossJoin(broadcast(grid)).filter($"doc_id" < $"cut")
      .groupBy($"source", $"k", $"cut")
      .agg(count(lit(1)).as("cum_docs"), sum($"n_tokens").as("cum_tokens"))
    val vocab = fv.crossJoin(broadcast(grid)).filter($"first_doc" < $"cut")
      .groupBy($"source", $"k").agg(count(lit(1)).as("cum_vocab"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"k")
    val dv = $"cum_vocab" - coalesce(lag($"cum_vocab", 1).over(w), lit(0L))
    val dtk = $"cum_tokens" - coalesce(lag($"cum_tokens", 1).over(w), lit(0L))
    mass.join(vocab, Seq("source", "k"))
      .withColumn("rate_micro",
        when(dtk > 0,
          ((dv * 1000000L - (dv * 1000000L) % dtk) / dtk).cast("long"))
          .otherwise(lit(0L)))
      .select($"source", $"k", $"cut", $"cum_docs", $"cum_tokens",
        $"cum_vocab", $"rate_micro")
      .orderBy($"source", $"k")
  }

  val vocabGrowthSql: String =
    s"""WITH mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
      |grid AS (
      |  SELECT CAST(k AS INT) AS k,
      |    (k * m - (k * m) % $GrowthCheckpoints) // $GrowthCheckpoints AS cut
      |  FROM (SELECT unnest(range(1, ${GrowthCheckpoints + 1})) AS k) CROSS JOIN mx),
      |dt AS (
      |  SELECT source, doc_id,
      |    CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
      |      AS BIGINT) AS n_tokens
      |  FROM documents),
      |fv AS (
      |  SELECT source, tok, min(doc_id) AS first_doc FROM (
      |    SELECT source, doc_id,
      |      unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS tok
      |    FROM documents) GROUP BY 1, 2),
      |mass AS (
      |  SELECT source, k, cut, CAST(count(*) AS BIGINT) AS cum_docs,
      |    CAST(sum(n_tokens) AS BIGINT) AS cum_tokens
      |  FROM dt CROSS JOIN grid WHERE doc_id < cut GROUP BY 1, 2, 3),
      |voc AS (
      |  SELECT source, k, CAST(count(*) AS BIGINT) AS cum_vocab
      |  FROM fv CROSS JOIN grid WHERE first_doc < cut GROUP BY 1, 2),
      |j AS (
      |  SELECT m.source, m.k, m.cut, m.cum_docs, m.cum_tokens, v.cum_vocab,
      |    m.cum_tokens - COALESCE(lag(m.cum_tokens) OVER (
      |      PARTITION BY m.source ORDER BY m.k), 0) AS dtk,
      |    v.cum_vocab - COALESCE(lag(v.cum_vocab) OVER (
      |      PARTITION BY m.source ORDER BY m.k), 0) AS dv
      |  FROM mass m JOIN voc v ON v.source = m.source AND v.k = m.k)
      |SELECT source, k, CAST(cut AS BIGINT) AS cut, cum_docs, cum_tokens, cum_vocab,
      |  CASE WHEN dtk > 0
      |    THEN (dv * 1000000 - (dv * 1000000) % dtk) // dtk ELSE 0 END AS rate_micro
      |FROM j ORDER BY source, k""".stripMargin

  // ------------------------------------------------------------------
  // source_jsd_matrix — pairwise Jensen–Shannon divergence of sources
  // ------------------------------------------------------------------

  private val Ln2Micro = 693147L // round(ln(2)·1e6) — shared constant

  /** Pairwise Jensen–Shannon divergence (Lin 1991) between the token
    * distributions of every source pair — the symmetric, bounded
    * [0, ln 2] comparability matrix read before merging or reweighting
    * sources (token_kl_drift's two-corpus KL, generalized to all
    * pairs). Missing-token mass is handled EXACTLY: a token present
    * only in source A contributes p·ln 2, so the off-support total is
    * (Σp_A − shared Σp_A)·ln 2 — no per-token outer join needed.
    *
    * Exactness: per-source probabilities are nano-integers
    * (n·10⁹ // tot, HUGEINT products), the shared-token log ratio
    * rides the micro idiom on doubles built from identical integers,
    * ln 2 is the shared literal 693147 (no libm call to diverge), and
    * every contribution is an exact long before the single display
    * division. A probability that floors to 0 (a source past 10⁹
    * tokens) is guarded out of the log in BOTH engines — its exact
    * contribution is 0·ln(·) = 0 either way, and DuckDB would
    * otherwise raise on CAST(-inf AS BIGINT). Scale: one token pass →
    * (source, tok) grid; the pair join is (vocab × |S|²/2) grid work
    * aggregated map-side; output is the |S|² matrix. Cache contract:
    * the prob table is persisted EAGERLY before the four-way fan-out
    * (sp aggregate + both self-join sides + assembly) — lazy persist
    * lets concurrently-scheduled stages each rebuild the
    * explode→groupBy chain — and, because the result is |S|² rows at
    * ANY corpus scale, the matrix is materialized here so the cache
    * can be released instead of leaking into the caller's executors.
    */
  def sourceJsdMatrix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.documents(spark, dir)
      .select($"source", explode(tokens($"text")).as("tok"))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("n"))
    val tots = counts.groupBy($"source").agg(sum($"n").as("tot"))
    val probs = counts.join(broadcast(tots), "source")
      .select($"source", $"tok",
        expr("CAST((CAST(n AS DECIMAL(38,0)) * 1000000000 - " +
          "((CAST(n AS DECIMAL(38,0)) * 1000000000) % tot)) / tot AS BIGINT)")
          .as("p"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    probs.count() // populate ONCE before the fan-out reads it
    val sp = probs.groupBy($"source").agg(sum($"p").as("sp"))
    val shared = probs.as("a").join(probs.as("b"),
        $"a.tok" === $"b.tok" && $"a.source" < $"b.source")
      .select($"a.source".as("src_a"), $"b.source".as("src_b"),
        $"a.p".as("pa"), $"b.p".as("pb"))
      .withColumn("la", when($"pa" > 0L && $"pb" > 0L,
        round(log(lit(2.0) * $"pa".cast("double")
          / ($"pa" + $"pb").cast("double")) * 1e6, 0).cast("long"))
        .otherwise(lit(0L)))
      .withColumn("lb", when($"pa" > 0L && $"pb" > 0L,
        round(log(lit(2.0) * $"pb".cast("double")
          / ($"pa" + $"pb").cast("double")) * 1e6, 0).cast("long"))
        .otherwise(lit(0L)))
      .groupBy($"src_a", $"src_b")
      .agg(count(lit(1)).as("shared_tokens"),
        sum($"pa").as("shpa"), sum($"pb").as("shpb"),
        sum(expr("(pa * la - ((pa * la) % 1000000 + 1000000) % 1000000) div 1000000")
          + expr("(pb * lb - ((pb * lb) % 1000000 + 1000000) % 1000000) div 1000000"))
          .as("sh_sum"))
    val out = shared
      .join(broadcast(sp.select($"source".as("src_a"), $"sp".as("spa"))), "src_a")
      .join(broadcast(sp.select($"source".as("src_b"), $"sp".as("spb"))), "src_b")
      .select($"src_a", $"src_b", $"shared_tokens",
        round(($"sh_sum"
          + expr(s"(spa - shpa) * $Ln2Micro div 1000000")
          + expr(s"(spb - shpb) * $Ln2Micro div 1000000")).cast("double")
          / 2e9, 6).as("jsd_nats"))
      .orderBy($"src_a", $"src_b")
    val rows = out.collect().toSeq
    probs.unpersist()
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), out.schema)
  }

  val sourceJsdMatrixSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    s"""WITH t AS (SELECT source, unnest($toks) AS tok FROM documents),
      |counts AS (
      |  SELECT source, tok, CAST(count(*) AS BIGINT) AS n
      |  FROM t GROUP BY source, tok),
      |tots AS (SELECT source, CAST(sum(n) AS BIGINT) AS tot
      |         FROM counts GROUP BY source),
      |probs AS (
      |  SELECT c.source, c.tok,
      |    CAST(CAST(c.n AS HUGEINT) * 1000000000 // t.tot AS BIGINT) AS p
      |  FROM counts c JOIN tots t USING (source)),
      |sp AS (SELECT source, CAST(sum(p) AS BIGINT) AS sp
      |       FROM probs GROUP BY source),
      |pairs AS (
      |  SELECT a.source AS src_a, b.source AS src_b, a.p AS pa, b.p AS pb,
      |    CASE WHEN a.p > 0 AND b.p > 0 THEN
      |      CAST(round(ln(2.0 * CAST(a.p AS DOUBLE)
      |        / CAST(a.p + b.p AS DOUBLE)) * 1e6, 0) AS BIGINT)
      |    ELSE 0 END AS la,
      |    CASE WHEN a.p > 0 AND b.p > 0 THEN
      |      CAST(round(ln(2.0 * CAST(b.p AS DOUBLE)
      |        / CAST(a.p + b.p AS DOUBLE)) * 1e6, 0) AS BIGINT)
      |    ELSE 0 END AS lb
      |  FROM probs a JOIN probs b ON a.tok = b.tok AND a.source < b.source),
      |shared AS (
      |  SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS shared_tokens,
      |    CAST(sum(pa) AS BIGINT) AS shpa, CAST(sum(pb) AS BIGINT) AS shpb,
      |    CAST(sum((pa * la - ((pa * la) % 1000000 + 1000000) % 1000000)
      |        // 1000000
      |      + (pb * lb - ((pb * lb) % 1000000 + 1000000) % 1000000)
      |        // 1000000) AS BIGINT) AS sh_sum
      |  FROM pairs GROUP BY src_a, src_b)
      |SELECT src_a, src_b, shared_tokens,
      |  round(CAST(sh_sum
      |    + (sa.sp - shpa) * 693147 // 1000000
      |    + (sb.sp - shpb) * 693147 // 1000000 AS DOUBLE) / 2e9, 6) AS jsd_nats
      |FROM shared
      |JOIN sp sa ON sa.source = shared.src_a
      |JOIN sp sb ON sb.source = shared.src_b
      |ORDER BY src_a, src_b""".stripMargin
  }

  // ------------------------------------------------------------------
  // token_burstiness — Church–Gale burstiness of the top vocabulary
  // ------------------------------------------------------------------

  /** Token burstiness (Church & Gale 1995): for the 50 most frequent
    * tokens, the variance-to-mean ratio of their PER-DOCUMENT counts —
    * the "does this word cluster in few documents or spread evenly"
    * statistic that separates topical content words (bursty, VMR ≫ 1)
    * from function words (Poisson-like, VMR ≈ 1), read when choosing
    * stopword lists or tf saturation parameters.
    *
    * Exactness: per-(token, doc) counts are integers, so per-token
    * Σc/Σc² are exact longs over the n_docs population (documents
    * without the token contribute exact zeros via the document total
    * from a 1-row broadcast); mean/VMR are one fixed double tree
    * rounded to 6. Scale: one token explode → (tok, doc) partial agg →
    * token-grid agg; the top-50 cut is a TakeOrdered on the
    * vocabulary grid, never a corpus sort.
    */
  // ------------------------------------------------------------------
  // ngram_entropy — per-source unigram + bigram-conditional entropy
  // ------------------------------------------------------------------

  /** Per-source unigram entropy H(T) and bigram conditional entropy
    * H(T₂|T₁) in nats (Cover & Thomas ch. 2) — the corpus-health pair
    * read before LM training: low H(T) flags degenerate vocabularies,
    * a small H(T)−H(T₂|T₁) gap flags token streams with no sequential
    * structure (shuffled or boilerplate text), and sources are
    * comparable because both numbers are distribution-, not
    * volume-, scaled.
    *
    * Exactness: the unigram term rides the markov_stationary idiom —
    * nano-integer probabilities (n·10⁹ // N, HUGEINT products),
    * −ln·10⁶ micro-rounded per cell, (p·L)//10⁶ exact-long partial
    * sums, zero-nano cells skipped in BOTH engines. The conditional
    * term needs no probability floor at all: H(V|U) = (Σ c·L(c/cu))/C
    * with c, cu, C exact counts and one micro-ln per (u,v) cell, so
    * the only doubles are the per-cell ln and the single display
    * division. Scale: one token explode → (source, tok) grid, one
    * in-array bigram transform → (source, u, v) grid (vocab² cells);
    * everything after is grid joins broadcast by AQE.
    */
  def ngramEntropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"source", tokens($"text").as("t"))
    val uc = docs.select($"source", explode($"t").as("tok"))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("n"))
    val tots = uc.groupBy($"source")
      .agg(sum($"n").as("n_tokens"), count(lit(1)).as("vocab"))
    val h1 = uc.join(broadcast(tots), "source")
      .select($"source",
        expr("CAST((CAST(n AS DECIMAL(38,0)) * 1000000000 - " +
          "((CAST(n AS DECIMAL(38,0)) * 1000000000) % n_tokens)) / n_tokens AS BIGINT)")
          .as("pn"))
      .filter($"pn" > 0L)
      .select($"source",
        expr("(pn * CAST(round(-ln(CAST(pn AS DOUBLE) / 1e9) * 1e6, 0) AS BIGINT))" +
          " div 1000000").as("ci"))
      .groupBy($"source").agg(sum($"ci").as("s1"))
    val bgc = docs.filter(size($"t") >= 2)
      .select($"source", explode(expr(
        "transform(sequence(1, size(t) - 1)," +
          " i -> struct(element_at(t, i) AS u, element_at(t, i + 1) AS v))"))
        .as("b"))
      .groupBy($"source", $"b.u".as("u"), $"b.v".as("v"))
      .agg(count(lit(1)).as("c"))
    val cu = bgc.groupBy($"source", $"u").agg(sum($"c").as("cu"))
    val cb = bgc.groupBy($"source").agg(sum($"c").as("n_bigrams"))
    val h2 = bgc.join(cu, Seq("source", "u"))
      .select($"source", ($"c" * round(-log($"c".cast("double")
        / $"cu".cast("double")) * 1e6, 0).cast("long")).as("ci"))
      .groupBy($"source").agg(sum($"ci").as("s2"))
    tots.join(h1, "source").join(broadcast(cb), "source").join(h2, "source")
      .select($"source", $"n_tokens", $"vocab", $"n_bigrams",
        round($"s1".cast("double") / 1e9, 6).as("h_unigram"),
        round($"s2".cast("double") / $"n_bigrams" / 1e6, 6).as("h_bigram_cond"))
      .orderBy($"source")
  }

  val ngramEntropySql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    s"""WITH t AS (SELECT source, $toks AS t FROM documents),
      |uni AS (SELECT source, unnest(t) AS tok FROM t),
      |uc AS (
      |  SELECT source, tok, CAST(count(*) AS BIGINT) AS n
      |  FROM uni GROUP BY 1, 2),
      |tots AS (
      |  SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
      |    CAST(count(*) AS BIGINT) AS vocab
      |  FROM uc GROUP BY 1),
      |p1 AS (
      |  SELECT u.source,
      |    CAST(CAST(u.n AS HUGEINT) * 1000000000 // t.n_tokens AS BIGINT) AS pn
      |  FROM uc u JOIN tots t USING (source)),
      |h1 AS (
      |  SELECT source, CAST(sum((pn * CAST(round(-ln(CAST(pn AS DOUBLE) / 1e9)
      |      * 1e6, 0) AS BIGINT)) // 1000000) AS BIGINT) AS s1
      |  FROM p1 WHERE pn > 0 GROUP BY 1),
      |bg AS (
      |  SELECT source,
      |    unnest([{'u': t[i], 'v': t[i + 1]} for i in range(1, len(t))]) AS b
      |  FROM t WHERE len(t) >= 2),
      |bgc AS (
      |  SELECT source, b.u AS u, b.v AS v, CAST(count(*) AS BIGINT) AS c
      |  FROM bg GROUP BY 1, 2, 3),
      |cu AS (SELECT source, u, CAST(sum(c) AS BIGINT) AS cu
      |       FROM bgc GROUP BY 1, 2),
      |cb AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_bigrams
      |       FROM bgc GROUP BY 1),
      |h2 AS (
      |  SELECT b.source, CAST(sum(b.c * CAST(round(-ln(CAST(b.c AS DOUBLE)
      |      / CAST(k.cu AS DOUBLE)) * 1e6, 0) AS BIGINT)) AS BIGINT) AS s2
      |  FROM bgc b JOIN cu k ON k.source = b.source AND k.u = b.u GROUP BY 1)
      |SELECT t.source, t.n_tokens, t.vocab, cb.n_bigrams,
      |  round(CAST(h1.s1 AS DOUBLE) / 1e9, 6) AS h_unigram,
      |  round(CAST(h2.s2 AS DOUBLE) / cb.n_bigrams / 1e6, 6) AS h_bigram_cond
      |FROM tots t JOIN h1 USING (source) JOIN cb USING (source)
      |  JOIN h2 USING (source)
      |ORDER BY source""".stripMargin
  }

  // interpolated into the oracle SQL so a non-default topK cannot
  // silently diverge from the oracle
  private val BurstTopK = 50

  def tokenBurstiness(spark: SparkSession, dir: String,
                      topK: Int = BurstTopK): DataFrame = {
    import spark.implicits._
    val perDoc = Tables.documents(spark, dir)
      .select($"doc_id", explode(tokens($"text")).as("tok"))
      .groupBy($"tok", $"doc_id").agg(count(lit(1)).as("c"))
    val perTok = perDoc.groupBy($"tok")
      .agg(count(lit(1)).as("docs_with"), sum($"c").as("sc"),
        sum($"c" * $"c").as("scc"))
    val nDocs = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    perTok.crossJoin(broadcast(nDocs))
      // moments over ALL documents: absent docs contribute zero to
      // both Σc and Σc², so only the denominator changes
      .select($"tok", $"docs_with", $"sc".as("occurrences"), $"n_docs",
        round($"sc".cast("double") / $"n_docs", 6).as("mean_per_doc"),
        round((($"scc".cast("double")
          - $"sc".cast("double") * $"sc".cast("double") / $"n_docs")
          / ($"n_docs" - 1L))
          / ($"sc".cast("double") / $"n_docs"), 6).as("vmr"))
      .orderBy($"occurrences".desc, $"tok")
      .limit(topK)
  }

  val tokenBurstinessSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    s"""WITH t AS (SELECT doc_id, unnest($toks) AS tok FROM documents),
      |pd AS (
      |  SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS c
      |  FROM t GROUP BY tok, doc_id),
      |pt AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS docs_with,
      |    CAST(sum(c) AS BIGINT) AS sc, CAST(sum(c * c) AS BIGINT) AS scc
      |  FROM pd GROUP BY tok),
      |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
      |SELECT tok, docs_with, sc AS occurrences, n_docs,
      |  round(CAST(sc AS DOUBLE) / n_docs, 6) AS mean_per_doc,
      |  round(((CAST(scc AS DOUBLE)
      |    - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n_docs)
      |    / (n_docs - 1))
      |    / (CAST(sc AS DOUBLE) / n_docs), 6) AS vmr
      |FROM pt CROSS JOIN nd
      |ORDER BY occurrences DESC, tok LIMIT $BurstTopK""".stripMargin
  }

  // ------------------------------------------------------------------
  // lexical_diversity — TTR / hapax / Herdan's C per source
  // ------------------------------------------------------------------

  /** Per-source lexical-diversity profile: type count, token mass,
    * type-token ratio, hapax-legomena share (types occurring exactly
    * once — the leading edge of vocabulary novelty), and Herdan's C
    * (ln V / ln N — the log-log Heaps exponent at the corpus point,
    * the size-robust diversity number TTR famously is not). The
    * point-in-time complement to [[vocabGrowth]]'s checkpoint curve:
    * growth says "is the source still adding words", this says "how
    * repetitive is what it already added" — the dull-template-farm
    * detector in a source-quality review.
    *
    * Exactness: counts are exact integers; the ratios use the micro
    * DIV convention; Herdan's C divides the two MICRO-QUANTIZED lns
    * (the pmi idiom) as integers, so no cross-libm double ratio ever
    * reaches the output.
    *
    * Scale: one token explode into a (source, token)-keyed partial
    * agg (the vocabulary table — the same backbone every tf-idf/
    * vocab op rides), then a |sources|-row rollup. Nothing downstream
    * of the first agg is corpus-cardinality.
    */
  def lexicalDiversity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val tf = docs.select($"source", explode(tokens($"text")).as("tok"))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("n"))
    val per = tf.groupBy($"source").agg(
      count(lit(1)).as("types"),
      sum($"n").as("tokens"),
      sum(when($"n" === 1, 1L).otherwise(0L)).as("hapax"))
    val nd = docs.groupBy($"source").agg(count(lit(1)).as("n_docs"))
    per.join(nd, "source")
      .select($"source", $"n_docs", $"tokens", $"types", $"hapax",
        expr("types * 1000000 DIV tokens").as("ttr_micro"),
        expr("hapax * 1000000 DIV types").as("hapax_micro"),
        (round(log($"types".cast("double")) * 1e6, 0).cast("long") * 1000000L)
          .as("ln_types_micro_sq"))
      .withColumn("herdan_micro",
        expr("ln_types_micro_sq DIV CAST(round(ln(CAST(tokens AS DOUBLE)) " +
          "* 1e6, 0) AS BIGINT)"))
      .drop("ln_types_micro_sq")
      .orderBy($"source")
  }

  val lexicalDiversitySql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    s"""WITH tf AS (
      |  SELECT source, tok, CAST(count(*) AS BIGINT) AS n FROM (
      |    SELECT source, unnest($toks) AS tok FROM documents)
      |  GROUP BY 1, 2),
      |per AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS types,
      |    CAST(sum(n) AS BIGINT) AS tokens,
      |    CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
      |  FROM tf GROUP BY 1),
      |nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      |       FROM documents GROUP BY 1)
      |SELECT per.source, n_docs, tokens, types, hapax,
      |  types * 1000000 // tokens AS ttr_micro,
      |  hapax * 1000000 // types AS hapax_micro,
      |  (CAST(round(ln(CAST(types AS DOUBLE)) * 1e6, 0) AS BIGINT) * 1000000)
      |    // CAST(round(ln(CAST(tokens AS DOUBLE)) * 1e6, 0) AS BIGINT)
      |    AS herdan_micro
      |FROM per JOIN nd ON nd.source = per.source
      |ORDER BY per.source""".stripMargin
  }

  // ------------------------------------------------------------------
  // feature_hash_audit — hashing-trick collision profile
  // ------------------------------------------------------------------

  private val FhBuckets = 4096L // 2^12 feature buckets

  /** Hashing-trick collision audit (Weinberger et al. 2009): the
    * 3-gram shingle feature space (the open-vocabulary unit hashed
    * featurizers actually hash — raw tokens on this corpus's closed
    * ~31-word vocabulary would be collision-free by construction) is
    * hashed into 2¹² feature buckets (md5 — the portable-hash
    * discipline) and the LOAD HISTOGRAM is reported — for each load L
    * (distinct shingle types per bucket), how many buckets carry L
    * types and how much occurrence mass they hold, plus each row's
    * micro share of the total. The "how much signal does feature
    * hashing destroy at this width" evidence a pipeline needs before
    * replacing a vocabulary with a fixed-width hashed featurizer:
    * mass sitting in high-load buckets is mass whose features are
    * conflated.
    *
    * Exactness: bucket routing is md5 hex mod m; loads, bucket
    * counts, and mass are exact integers; the share is the micro DIV.
    *
    * Scale: one (shingle)-keyed vocabulary aggregate (the
    * decontaminate gram backbone), one ≤ m-row bucket aggregate, one
    * ≤ |loads|-row histogram — strictly decreasing cardinality,
    * nothing after the first agg is corpus-sized, and the sketch's
    * merge-anywhere property means the bucket agg map-side combines.
    */
  def featureHashAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vocab = Tables.documents(spark, dir)
      .select(tokens($"text").as("t"))
      .filter(size($"t") >= 3)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 2), " +
          "i -> array_join(slice(t, i, 3), ' '))")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("n"))
    val buckets = vocab
      .groupBy((conv(substring(md5(concat(lit("fh:"), $"tok")), 1, 8), 16, 10)
        .cast("long") % lit(FhBuckets)).as("bucket"))
      .agg(count(lit(1)).as("load"), sum($"n").as("mass"))
    val tot = vocab.agg(sum($"n").as("total_mass"))
    buckets.groupBy($"load")
      .agg(count(lit(1)).as("n_buckets"), sum($"mass").as("mass"))
      .crossJoin(broadcast(tot))
      .select($"load", $"n_buckets", ($"load" * $"n_buckets").as("types"),
        $"mass", expr("mass * 1000000 DIV total_mass").as("mass_share_micro"))
      .orderBy($"load")
  }

  val featureHashAuditSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    s"""WITH t AS (SELECT $toks AS t FROM documents),
      |vocab AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS n FROM (
      |    SELECT unnest([array_to_string(t[i:i+2], ' ')
      |                   for i in range(1, len(t) - 1)]) AS tok
      |    FROM t WHERE len(t) >= 3)
      |  GROUP BY 1),
      |b AS (
      |  SELECT CAST(('0x' || substr(md5('fh:' || tok), 1, 8)) AS BIGINT)
      |      % $FhBuckets AS bucket,
      |    CAST(count(*) AS BIGINT) AS load, CAST(sum(n) AS BIGINT) AS mass
      |  FROM vocab GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total_mass FROM vocab)
      |SELECT load, CAST(count(*) AS BIGINT) AS n_buckets,
      |  load * CAST(count(*) AS BIGINT) AS types,
      |  CAST(sum(mass) AS BIGINT) AS mass,
      |  CAST(sum(mass) AS BIGINT) * 1000000 // total_mass AS mass_share_micro
      |FROM b CROSS JOIN tot
      |GROUP BY load, total_mass ORDER BY load""".stripMargin
  }

  // ------------------------------------------------------------------
  // ctfidf_terms — class-based TF-IDF characteristic terms per source
  // ------------------------------------------------------------------

  private val CtfTopK = 5

  /** c-TF-IDF (class-based TF-IDF — the BERTopic topic-labeling
    * score, Grootendorst 2022): treat each SOURCE as one class
    * document, score term t for class c as tf(t,c) · ln(1 + A/gtf(t))
    * with A the average class token mass and gtf the term's corpus
    * frequency — the "which words make this source THIS source"
    * labeler that plain tf-idf (document-granular) can't answer.
    * Top-5 terms per source.
    *
    * Exactness: tf/gtf/A are exact integers (A floor-divided once);
    * the ln is micro-quantized (the pmi idiom) so score = tfc ·
    * ln_micro is an exact integer product; rank ties break on term.
    *
    * Scale: one (source, token) partial agg (the vocabulary backbone)
    * feeds both the per-class tf and (re-aggregated) the corpus gtf;
    * the rank window is partitioned by source and WindowGroupLimit
    * prunes to k per class before the output sort.
    */
  def ctfidfTerms(spark: SparkSession, dir: String, topK: Int = CtfTopK): DataFrame = {
    import spark.implicits._
    val tf = Tables.documents(spark, dir)
      .select($"source", explode(tokens($"text")).as("tok"))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("tfc"))
    val gtf = tf.groupBy($"tok").agg(sum($"tfc").as("gtf"))
    val aRow = tf.agg(sum($"tfc").as("tt"),
      count_distinct($"source").as("ns"))
      .select(expr("tt DIV ns").as("a"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"score_micro".desc, $"tok")
    tf.join(gtf, "tok").crossJoin(broadcast(aRow))
      .withColumn("ln_micro",
        round(log(lit(1.0) + $"a".cast("double") / $"gtf".cast("double")) * 1e6, 0)
          .cast("long"))
      .withColumn("score_micro", $"tfc" * $"ln_micro")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= topK)
      .select($"source", $"rk", $"tok", $"tfc", $"gtf", $"score_micro")
      .orderBy($"source", $"rk")
  }

  val ctfidfTermsSql: String = {
    val toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    s"""WITH tf AS (
      |  SELECT source, tok, CAST(count(*) AS BIGINT) AS tfc FROM (
      |    SELECT source, unnest($toks) AS tok FROM documents)
      |  GROUP BY 1, 2),
      |gtf AS (SELECT tok, CAST(sum(tfc) AS BIGINT) AS gtf FROM tf GROUP BY 1),
      |aa AS (SELECT CAST(sum(tfc) AS BIGINT)
      |         // CAST(count(DISTINCT source) AS BIGINT) AS a FROM tf),
      |sc AS (
      |  SELECT tf.source, tf.tok, tf.tfc, gtf.gtf,
      |    tf.tfc * CAST(round(ln(1.0 + CAST(a AS DOUBLE)
      |      / CAST(gtf.gtf AS DOUBLE)) * 1e6, 0) AS BIGINT) AS score_micro
      |  FROM tf JOIN gtf ON gtf.tok = tf.tok CROSS JOIN aa),
      |rk AS (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY source
      |    ORDER BY score_micro DESC, tok) AS INT) AS rk
      |  FROM sc)
      |SELECT source, rk, tok, tfc, gtf, score_micro
      |FROM rk WHERE rk <= $CtfTopK
      |ORDER BY source, rk""".stripMargin
  }
}
