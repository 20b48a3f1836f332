package graft

import org.apache.spark.sql.functions._
import graft.operators.{PqIndex, Similarity}

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = sources.Tables.embeddings(spark, sf)
    .filter($"vec_id" >= 8)
    .select($"vec_id".as("n_id"), $"embedding".as("n_vec"))

  test("codes are M entries in [0, K) and deterministic across runs") {
    val books = PqIndex.trainCodebooks(corpus, "n_id", "n_vec")
    val books2 = PqIndex.trainCodebooks(corpus, "n_id", "n_vec")
    assert(books.flatten.map(_.toSeq).toSeq == books2.flatten.map(_.toSeq).toSeq,
      "training must be run-stable")
    val coded = PqIndex.encode(corpus, "n_vec", books)
      .select($"n_id", $"__codes").collect()
    assert(coded.forall(_.getSeq[Int](1).size == PqIndex.M))
    assert(coded.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < PqIndex.K)))
  }

  test("encode stays inside whole-stage codegen (no 64 KB fallback)") {
    val books = PqIndex.trainCodebooks(corpus, "n_id", "n_vec")
    val df = PqIndex.encode(corpus, "n_vec", books).select($"n_id", $"__codes")
    df.collect() // force AQE-final plan with materialized codegen stages
    val plan = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\)".r.findFirstIn(plan).isDefined,
      s"encode fell out of whole-stage codegen:\n$plan")
    assert(plan.contains("pq_encode"), s"native kernel missing from plan:\n$plan")
  }

  test("ADC distance tracks true squared L2 (bounded mean relative error)") {
    val books = PqIndex.trainCodebooks(corpus, "n_id", "n_vec")
    val coded = PqIndex.encode(corpus, "n_vec", books)
      .select($"n_id", $"n_vec", $"__codes").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getSeq[Int](2).toArray))
    val queries = sources.Tables.embeddings(spark, sf).filter($"vec_id" < 8)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def l2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val relErrs = for ((_, q) <- queries; (_, v, codes) <- coded.take(100)) yield {
      val adc = (0 until PqIndex.M).map { s =>
        val c = books(s)(codes(s))
        val qs = q.slice(s * PqIndex.SubDim, (s + 1) * PqIndex.SubDim)
        qs.zip(c).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
      }.sum
      math.abs(adc - l2(q, v)) / l2(q, v)
    }
    val mre = relErrs.sum / relErrs.length
    info(f"ADC mean relative error = $mre%.3f")
    assert(mre < 0.35, f"quantization distortion too high: $mre%.3f")
  }

  test("ann_ivf_pq prunes to nprobe clusters and still finds neighbors") {
    val ivfpq = graft.operators.PqIndex.annIvfPq(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val e = sources.Tables.embeddings(spark, sf)
    val q = e.filter($"vec_id" < 8).select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val exact = corpus.crossJoin(broadcast(q))
      .withColumn("d", aggregate(zip_with($"q_vec", $"n_vec",
        (a, b) => (a - b) * (a - b)), lit(0.0d), (acc, x) => acc + x))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"q_id").orderBy($"d".asc, $"n_id")))
      .filter($"rk" <= 5).select($"q_id", $"n_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (qid, want) =>
      ivfpq.getOrElse(qid, Set.empty).intersect(want).size.toDouble / want.size
    }
    val recall = recalls.sum / recalls.size
    info(f"IVF-PQ recall@5 = $recall%.2f at nprobe 3/8 (isotropic data: "
      + "probe fraction is the ceiling)")
    assert(recall >= 0.25, f"recall $recall%.2f under the floor")
    assert(ivfpq.values.forall(_.size == 5), "top-5 per query")
  }

  test("re-rank telemetry: true neighbors sit inside the ADC shortlist budget") {
    // the shortlistFactor=8 contract: ADC ranks are approximate, so the
    // exact re-rank only works if the TRUE top-5 mostly appear within
    // the top 5*8=40 ADC candidates. Measure where true neighbors land.
    val books = PqIndex.trainCodebooks(corpus, "n_id", "n_vec")
    val coded = PqIndex.encode(corpus, "n_vec", books)
      .select($"n_id", $"n_vec", $"__codes").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getSeq[Int](2).toArray))
    val queries = sources.Tables.embeddings(spark, sf).filter($"vec_id" < 8)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def l2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    def adc(q: Array[Float], codes: Array[Int]): Double =
      (0 until PqIndex.M).map { s =>
        val c = books(s)(codes(s))
        val qs = q.slice(s * PqIndex.SubDim, (s + 1) * PqIndex.SubDim)
        qs.zip(c).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
      }.sum
    val adcRanksOfTrue = queries.flatMap { case (_, q) =>
      val byAdc = coded.map { case (id, _, codes) => (id, adc(q, codes)) }
        .sortBy { case (id, d) => (d, id) }.map(_._1).zipWithIndex.toMap
      val trueTop = coded.map { case (id, v, _) => (id, l2(q, v)) }
        .sortBy { case (id, d) => (d, id) }.take(5).map(_._1)
      trueTop.map(byAdc)
    }
    val within = adcRanksOfTrue.count(_ < 40).toDouble / adcRanksOfTrue.length
    val worst = adcRanksOfTrue.max
    info(f"true-top-5 ADC ranks: ${within * 100}%.0f%% within budget 40, worst rank $worst")
    assert(within >= 0.7,
      f"shortlist budget too small: only ${within * 100}%.0f%% of true neighbors inside")
  }

  test("re-rank dial curve: recall@5 rises with shortlist depth and saturates") {
    // the production tuning question: how deep must the ADC shortlist
    // be before the exact re-rank recovers the true neighbors? Measure
    // recall@5 at shortlist factors 1..16 and assert the dial behaves:
    // monotone non-decreasing, and the deep end beats the shallow end.
    val books = PqIndex.trainCodebooks(corpus, "n_id", "n_vec")
    val coded = PqIndex.encode(corpus, "n_vec", books)
      .select($"n_id", $"n_vec", $"__codes").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getSeq[Int](2).toArray))
    val queries = sources.Tables.embeddings(spark, sf).filter($"vec_id" < 8)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def l2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    def adc(q: Array[Float], codes: Array[Int]): Double =
      (0 until PqIndex.M).map { s =>
        val c = books(s)(codes(s))
        val qs = q.slice(s * PqIndex.SubDim, (s + 1) * PqIndex.SubDim)
        qs.zip(c).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
      }.sum
    val factors = Seq(1, 2, 4, 8, 16, 32)
    val recalls = factors.map { f =>
      val rs = queries.map { case (_, q) =>
        val shortlist = coded.map { case (id, _, codes) => (id, adc(q, codes)) }
          .sortBy { case (id, d) => (d, id) }.take(5 * f).map(_._1).toSet
        val trueTop = coded.map { case (id, v, _) => (id, l2(q, v)) }
          .sortBy { case (id, d) => (d, id) }.take(5).map(_._1)
        val reranked = coded.filter(c => shortlist(c._1))
          .map { case (id, v, _) => (id, l2(q, v)) }
          .sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
        trueTop.count(reranked).toDouble / 5
      }
      rs.sum / rs.length
    }
    info("recall@5 by shortlist factor: " +
      factors.zip(recalls).map { case (f, r) => f"$f->$r%.2f" }.mkString(", "))
    recalls.sliding(2).foreach { case Seq(a, b) =>
      assert(b + 1e-9 >= a, s"recall must not fall as the shortlist deepens: $recalls")
    }
    assert(recalls.last > recalls.head,
      s"deep shortlist should beat ADC-order alone: $recalls")
    assert(recalls.last >= 0.9, s"factor-32 re-rank recall too low: ${recalls.last}")
  }

  test("ann_pq recall@5 vs exact L2 at ~50x compression") {
    val pq = PqIndex.annPq(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    // exact L2 top-5 per query via the brute-force scan
    val e = sources.Tables.embeddings(spark, sf)
    val q = e.filter($"vec_id" < 8).select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val exact = corpus.crossJoin(broadcast(q))
      .withColumn("d", aggregate(zip_with($"q_vec", $"n_vec",
        (a, b) => (a - b) * (a - b)), lit(0.0d), (acc, x) => acc + x))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"q_id").orderBy($"d".asc, $"n_id")))
      .filter($"rk" <= 5).select($"q_id", $"n_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (qid, want) =>
      pq.getOrElse(qid, Set.empty).intersect(want).size.toDouble / want.size
    }
    val recall = recalls.sum / recalls.size
    val n = corpus.count().toDouble
    info(f"PQ recall@5 = $recall%.2f over $n%.0f vectors")
    assert(recall >= 0.6, f"recall $recall%.2f under the floor")
    assert(recall > 25.0 / n, "must beat random top-5 by a wide margin")
  }
}
