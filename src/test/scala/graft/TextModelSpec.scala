package graft

import org.apache.spark.sql.functions._
import graft.operators.{TextAnalysis, TextModel}

class TextModelSpec extends SparkSpec {

  test("bpe_pair_counts: total pair mass equals sum of (len-1) and top pair is real") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf)
    val full = docs.filter(length($"text") >= 2)
      .select($"text", explode(sequence(lit(1), length($"text") - 1)).as("i"))
      .select(expr("substring(text, i, 2)").as("pair"))
    val mass = full.count()
    val expected = docs.agg(sum(greatest(length($"text") - 1, lit(0))))
      .head().getLong(0)
    assert(mass === expected, "every adjacent pair counted exactly once")
    val top = graft.operators.TextModel.bpePairCounts(spark, sf).head()
    assert(top.getAs[Int]("rk") === 1)
    val direct = full.groupBy($"pair").count()
      .orderBy($"count".desc, $"pair").head()
    assert(top.getAs[String]("pair") === direct.getString(0))
    assert(top.getAs[Long]("n") === direct.getLong(1))
  }

  test("bpe_train: hand-computed merges on a planted corpus, incl. equal-symbol runs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    // word frequencies: "aaaa" x6, "ab" x4, "ba" x1.
    // round 1 pair counts: (a,a) = 3*6 = 18 (overlapping adjacencies),
    //   (a,b) = 4, (b,a) = 1 -> merge (a,a); left-to-right on "aaaa"
    //   merges at run offsets 0 and 2 -> [aa, aa]
    // round 2: (aa,aa) = 6, (a,b) = 4, (b,a) = 1 -> merge (aa,aa)
    // round 3: "aaaa" is a single symbol; (a,b) = 4 wins over (b,a) = 1
    val words = Seq.fill(6)("aaaa") ++ Seq.fill(4)("ab") ++ Seq("ba")
    Seq((0L, words.mkString(" "))).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextModel.bpeTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got(0) == ((1, "a", "a", "aa", 18L)),
      s"round 1 must merge the overlap-counted (a,a): ${got(0)}")
    assert(got(1) == ((2, "aa", "aa", "aaaa", 6L)),
      s"round 2 must see [aa, aa] from even-offset run merging: ${got(1)}")
    assert(got(2) == ((3, "a", "b", "ab", 4L)),
      s"round 3 falls through to (a,b): ${got(2)}")
    // odd-length run: "aaa" merges to [aa, a] (offset 0 only), so after
    // round 1 the leftover single 'a' still pairs with a following 'b'
    val dir2 = java.nio.file.Files.createTempDirectory("bpe2").toString
    Seq((0L, (Seq.fill(5)("aaab") ++ Seq.fill(2)("cd")).mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val got2 = TextModel.bpeTrain(spark, dir2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(got2(0) == ((1, "a", "a", 10L)), s"${got2(0)}") // 2 overlapping per word
    assert(got2(1) == ((2, "aa", "a", 5L)) || got2(1) == ((2, "a", "b", 5L)),
      s"round 2 count must reflect [aa, a, b] decomposition: ${got2(1)}")
  }

  test("bpe_tokenize: merged words compress; counts bounded by chars and words") {
    import spark.implicits._
    val t = TextModel.bpeTokenize(spark, sf).cache()
    // hard bounds: a word is >= 1 symbol, a symbol covers >= 1 char
    assert(t.filter($"n_bpe_tokens" > $"n_chars" || $"n_bpe_tokens" < $"n_words")
      .count() === 0)
    // 8 merges on this corpus must actually compress below char-level
    val tot = t.agg(sum($"n_chars"), sum($"n_bpe_tokens")).first()
    assert(tot.getLong(1) < tot.getLong(0),
      s"BPE tokens ${tot.getLong(1)} must be fewer than chars ${tot.getLong(0)}")
    t.unpersist()
  }

  test("mixture_waterfill hits the budget exactly (up to floor slack)") {
    import spark.implicits._
    val plan = graft.operators.Sampling.mixtureWaterfill(spark, sf).collect()
    val total = plan.map(_.getAs[Long]("src_tokens")).sum
    val planned = plan.map(_.getAs[Long]("planned_tokens")).sum
    val budget = 0.5 * total
    assert(math.abs(planned - budget) <= plan.length + 1,
      s"planned $planned vs budget $budget")
    // capped sources all sit at one water level; whole sources are below it
    val (whole, capped) = plan.partition(_.getAs[Double]("keep_rate") == 1.0)
    if (capped.nonEmpty) {
      val levels = capped.map(r =>
        r.getAs[Double]("keep_rate") * r.getAs[Long]("src_tokens")).toSeq
      assert(levels.max - levels.min <= math.max(2.0, 1e-4 * levels.max),
        s"capped sources must share the water level: $levels")
      val maxWhole = if (whole.isEmpty) 0L else whole.map(_.getAs[Long]("src_tokens")).max
      assert(maxWhole <= levels.min + 1)
    }
  }

  test("mixture_plan: rates cap at 1.0 and planned tokens never exceed source or budget math") {
    import spark.implicits._
    val plan = graft.operators.Sampling.mixturePlan(spark, sf).collect()
    assert(plan.nonEmpty)
    plan.foreach { r =>
      val rate = r.getAs[Double]("keep_rate")
      assert(rate > 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("planned_tokens") <= r.getAs[Long]("src_tokens"))
    }
    val planned = plan.map(_.getAs[Long]("planned_tokens")).sum.toDouble
    val total = plan.map(_.getAs[Long]("src_tokens")).sum.toDouble
    // equal-share water level with caps: realized budget is ≤ target and
    // within one source-share of it on this corpus
    assert(planned <= 0.5 * total + plan.length)
    assert(planned >= 0.4 * total, s"planned $planned of $total")
  }
  import spark.implicits._

  test("ngram_lm_score: a repetitive doc is far more predictable than a varied one") {
    val dir = java.nio.file.Files.createTempDirectory("lm").toString
    Seq(
      (0L, ("ab cd " * 40).trim),                      // one bigram, maximally predictable
      (1L, (1 to 80).map(i => s"w$i").mkString(" "))   // every bigram unique
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val r = TextModel.ngramLmScore(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(3))).toMap
    assert(r(0L)._1 == 79 && r(1L)._1 == 79, "n_bigrams = n_tokens - 1")
    assert(r(0L)._2 < r(1L)._2 - 2.0,
      s"repeated doc should score way fewer bits/token: ${r(0L)._2} vs ${r(1L)._2}")
  }

  test("bm25_multi q_spark agrees with single-query bm25_search rank for rank") {
    val single = TextAnalysis.bm25Search(spark, sf, topK = 10).collect()
      .map(r => (r.getInt(1), r.getLong(0), r.getDouble(2)))
    val multi = TextModel.bm25Multi(spark, sf).collect()
      .filter(_.getString(0) == "q_spark")
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(multi.length == 10)
    assert(single.sameElements(multi),
      s"batched scoring must reproduce the single-query ranking:\n${single.toSeq}\n${multi.toSeq}")
  }

  test("ngram_novelty: first doc is all-novel and novel mass sums to the distinct gram count") {
    val nov = graft.operators.TextModel.ngramNovelty(spark, sf).cache()
    val first = nov.orderBy($"doc_id").first()
    assert(first.getDouble(3) == 1.0, "the earliest doc can only contain first-seen grams")
    // every distinct corpus bigram is novel exactly once — at its first doc
    val novelMass = nov.agg(sum($"n_novel")).first().getLong(0)
    val docs = graft.sources.Tables.documents(spark, sf)
    val distinctGrams = docs
      .select($"doc_id", posexplode(filter(split($"text", "\\s+"), t => t =!= ""))
        .as(Seq("pos", "tok")))
      .withColumn("nxt", lead($"tok", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"doc_id").orderBy($"pos")))
      .filter($"nxt".isNotNull)
      .select($"tok", $"nxt").distinct().count()
    assert(novelMass == distinctGrams, s"novel mass $novelMass != distinct grams $distinctGrams")
  }

  test("crossval_folds partitions all docs into 5 roughly equal stable folds") {
    val f = graft.operators.Sampling.crossvalFolds(spark, sf).collect()
    assert(f.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3, 4))
    val total = f.map(_.getLong(1)).sum
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(total == nDocs)
    // 256-bucket split: each fold ~20%; allow binomial noise at small sf
    f.foreach(r => assert(r.getLong(1) > nDocs / 10 && r.getLong(1) < nDocs * 3 / 10,
      s"fold ${r.getInt(0)} has ${r.getLong(1)} of $nDocs docs"))
  }

  test("bm25_multi ranks every query and never crosses query boundaries") {
    val rows = TextModel.bm25Multi(spark, sf).collect()
    val byQ = rows.groupBy(_.getString(0))
    assert(byQ.keySet == TextModel.multiQueries.map(_._1).toSet)
    for ((q, rs) <- byQ) {
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length), s"$q ranks contiguous")
      val scores = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, s"$q scores descend")
    }
  }

  test("vocab_growth: monotone curves, final checkpoint equals direct totals") {
    import org.apache.spark.sql.functions._
    val out = TextModel.vocabGrowth(spark, sf).collect()
    val bySrc = out.groupBy(_.getString(0))
    for ((src, rows) <- bySrc) {
      val ordered = rows.sortBy(_.getInt(1))
      for (c <- Seq(3, 4, 5)) { // cum_docs, cum_tokens, cum_vocab
        val vals = ordered.map(_.getLong(c))
        assert(vals.zip(vals.tail).forall { case (a, b) => a <= b },
          s"$src col $c not monotone: ${vals.mkString(",")}")
      }
      ordered.foreach(r => assert(r.getLong(6) >= 0 && r.getLong(6) <= 1000000L,
        "marginal new-vocab rate is a fraction of new tokens"))
    }
    // the k=10 cut is max(doc_id)+1: the curve must END at direct totals
    val docs = graft.sources.Tables.documents(spark, sf)
    val direct = docs
      .select($"source", $"doc_id",
        filter(split($"text", "\\s+"), t => t =!= "").as("toks"))
      .select($"source", $"doc_id", size($"toks").cast("long").as("n"), $"toks")
      .groupBy($"source")
      .agg(count(lit(1)).as("d"), sum($"n").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val vocabDirect = docs
      .select($"source", explode(filter(split($"text", "\\s+"), t => t =!= "")).as("tok"))
      .groupBy($"source").agg(countDistinct($"tok").as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, rows) <- bySrc) {
      val fin = rows.maxBy(_.getInt(1))
      assert(fin.getLong(3) === direct(src)._1, s"$src final cum_docs")
      assert(fin.getLong(4) === direct(src)._2, s"$src final cum_tokens")
      assert(fin.getLong(5) === vocabDirect(src), s"$src final cum_vocab")
    }
  }

  test("tokenizer_fertility: per-lang masses reconcile with per-doc bpe_tokenize") {
    val byLang = TextModel.tokenizerFertility(spark, sf).collect()
    val perDoc = TextModel.bpeTokenize(spark, sf).collect()
    // same trained word table ⇒ identical corpus-wide token masses
    assert(byLang.map(_.getAs[Long]("n_bpe_tokens")).sum ===
      perDoc.map(_.getAs[Long]("n_bpe_tokens")).sum)
    assert(byLang.map(_.getAs[Long]("n_words")).sum ===
      perDoc.map(_.getAs[Long]("n_words")).sum)
    assert(byLang.map(_.getAs[Long]("n_docs")).sum === perDoc.length)
    byLang.foreach { r =>
      assert(r.getAs[Double]("fertility") >= 1.0,
        s"${r.getAs[String]("lang")}: a word is at least one BPE token")
      assert(r.getAs[Double]("chars_per_token") >= 1.0)
    }
  }
}
