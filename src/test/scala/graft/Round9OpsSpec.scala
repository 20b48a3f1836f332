package graft

import org.apache.spark.sql.functions._

/** Driver-side exact replays for the round-9 additions. Each test
  * recomputes the operator's answer brute-force from the raw parquet
  * (collect at sf0.001) and compares against the distributed result.
  */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  private def toks(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  private def r6(x: Double): Double = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("ngram_entropy: brute-force unigram + conditional entropy replay") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), toks(r.getString(1))))
    val out = graft.operators.TextModel.ngramEntropy(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val sources = docs.map(_._1).distinct.sorted
    assert(out.keySet === sources.toSet)
    for (src <- sources) {
      val ts = docs.filter(_._1 == src).map(_._2)
      val uni = ts.flatten.groupBy(identity).map { case (_, g) => g.length.toLong }
      val nTok = uni.sum
      // unigram H via the nano/micro idiom
      val s1 = uni.map { n =>
        val pn = (BigInt(n) * BigInt(1000000000L) / nTok).toLong
        if (pn > 0)
          Math.floorDiv(pn * math.round(-math.log(pn.toDouble / 1e9) * 1e6), 1000000L)
        else 0L
      }.sum
      // bigram conditional H from exact counts
      val bg = ts.filter(_.length >= 2)
        .flatMap(t => t.sliding(2).map(p => (p(0), p(1))))
      val bgc = bg.groupBy(identity).map { case (k, g) => (k, g.length.toLong) }
      val cu = bgc.groupBy(_._1._1).map { case (u, g) => (u, g.values.sum) }
      val cTot = bgc.values.sum
      val s2 = bgc.map { case ((u, _), c) =>
        c * math.round(-math.log(c.toDouble / cu(u).toDouble) * 1e6)
      }.sum
      val row = out(src)
      assert(row.getAs[Long]("n_tokens") === nTok)
      assert(row.getAs[Long]("vocab") === uni.size.toLong)
      assert(row.getAs[Long]("n_bigrams") === cTot)
      assert(row.getAs[Double]("h_unigram") === r6(s1.toDouble / 1e9))
      assert(row.getAs[Double]("h_bigram_cond") === r6(s2.toDouble / cTot / 1e6))
      // information-theory sanity: conditioning cannot raise entropy
      assert(row.getAs[Double]("h_bigram_cond") <=
        row.getAs[Double]("h_unigram") + 1e-6)
    }
  }

  test("text_compressibility: brute-force 4-gram distinct-ratio replay") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), toks(r.getString(1))))
      .filter(_._2.length >= 4)
    val out = graft.operators.TextAnalysis.textCompressibility(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((src, group) <- docs.groupBy(_._1)) {
      val per = group.map { case (_, t) =>
        val grams = t.sliding(4).map(_.mkString(" ")).toArray
        (grams.length.toLong, grams.distinct.length.toLong)
      }
      val row = out(src)
      assert(row.getAs[Long]("n_docs") === per.length.toLong)
      assert(row.getAs[Long]("grams_total") === per.map(_._1).sum)
      assert(row.getAs[Long]("grams_distinct") === per.map(_._2).sum)
      assert(row.getAs[Long]("repetitive_docs") ===
        per.count { case (g, d) => d * 2 < g }.toLong)
      assert(row.getAs[Double]("compress_proxy") ===
        r6(per.map(_._2).sum.toDouble / per.map(_._1).sum))
    }
  }

  test("lexicon_screen: brute-force blocklist hit replay") {
    val lex = Set("slow", "dup", "merge")
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), toks(r.getString(1))))
    val out = graft.operators.TextAnalysis.lexiconScreen(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((src, group) <- docs.groupBy(_._1)) {
      val hits = group.map(_._2.count(lex.contains).toLong)
      val row = out(src)
      assert(row.getAs[Long]("n_docs") === group.length.toLong)
      assert(row.getAs[Long]("tokens_total") === group.map(_._2.length.toLong).sum)
      assert(row.getAs[Long]("hit_tokens") === hits.sum)
      assert(row.getAs[Long]("docs_flagged") === hits.count(_ > 0).toLong)
      assert(row.getAs[Long]("max_doc_hits") === hits.max)
    }
  }

  test("winnowing_fingerprint: brute-force winnow replay and guarantee") {
    val k = 8; val w = 4; val cap = 20; val minShared = 5
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.length >= k + w - 1)
    def hash32(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val fpSets = docs.map { case (id, text) =>
      val hs = (0 to text.length - k).map(i => hash32(text.substring(i, i + k)))
      id -> hs.sliding(w).map(_.min).toSet
    }.toMap
    val dfCount = fpSets.values.flatten.groupBy(identity)
      .map { case (fp, g) => (fp, g.size) }
    val kept = fpSets.map { case (id, s) =>
      id -> s.filter(fp => dfCount(fp) <= cap)
    }
    val ids = kept.keys.toSeq.sorted
    val expected = (for {
      ai <- ids.indices; bi <- ai + 1 until ids.length
      i = ids(ai); j = ids(bi)
      shared = (kept(i) & kept(j)).size
      if shared >= minShared
    } yield ((i, j), (shared.toLong,
      r6(shared.toDouble / math.min(kept(i).size, kept(j).size))))).toMap
    val got = graft.operators.Dedup.winnowingFingerprint(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(got === expected)
    assert(expected.nonEmpty, "fixture must exercise the pair report")
    // winnowing guarantee on a planted clone: identical text of length
    // >= k+w-1 shares every fingerprint, so sim = 1.0 for exact dups
    val exact = docs.groupBy(_._2).values.filter(_.length >= 2)
    for (g <- exact.take(3); pair <- g.map(_._1).sorted.combinations(2)) {
      val (a, b) = (pair(0), pair(1))
      if (kept(a).size >= minShared)
        assert(got.contains((a, b)),
          s"exact-duplicate pair ($a,$b) missing from the winnowing report")
    }
  }
}
