package graft

import graft.operators.{Embeddings, Graph}
import org.apache.spark.sql.functions._

/** Exactness and invariant checks for embedding_rp and hits_scores. */
class RpHitsSpec extends SparkSpec {
  import spark.implicits._

  test("embedding_rp: projection matches a driver-side integer recompute exactly") {
    val rp = Embeddings.embeddingRp(spark, sf)
    val one = rp.filter($"vec_id" === 7).orderBy($"rp_dim").collect()
    assert(one.length === 16)
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .filter($"vec_id" === 7).select($"embedding").first()
      .getSeq[Float](0)
    for (j <- 0 until 16) {
      val expected = (0 until 64).map { i =>
        val q = math.round(emb(i).toDouble * 1000000d)
        val sign = if (((i.toLong * 1103515245L + j.toLong * 12345L + 987654321L)
          / 65536L) % 2 == 0) 1L else -1L
        q * sign
      }.sum
      assert(one(j).getLong(2) === expected, s"dim $j mismatch")
    }
    // signs are hash-balanced: no projected dim may be a near-copy of the
    // raw L1 mass (all-+1 signs would correlate every dim perfectly)
    val signCounts = (0 until 16).map { j =>
      (0 until 64).count { i =>
        ((i.toLong * 1103515245L + j.toLong * 12345L + 987654321L) / 65536L) % 2 == 0
      }
    }
    assert(signCounts.forall(c => c >= 20 && c <= 44),
      s"sign matrix unbalanced: $signCounts")
  }

  test("embedding_rp: native kernel is bit-identical to the composable HOF fold") {
    val hof = org.apache.spark.sql.functions.expr(
      """transform(sequence(0, 15), j ->
        |  aggregate(sequence(0, 63), cast(0 as bigint), (acc, i) ->
        |    acc + cast(round(cast(embedding[i] as double) * 1000000, 0) as bigint)
        |      * (case when ((cast(i as bigint) * 1103515245
        |           + cast(j as bigint) * 12345 + 987654321) div 65536) % 2 = 0
        |         then 1 else -1 end)))""".stripMargin)
    val diff = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id",
        graft.functions.VectorFunctions.rp_project($"embedding", 16).as("k"),
        hof.as("h"))
      .filter($"k" =!= $"h")
      .count()
    assert(diff === 0, "kernel and HOF projections diverged")
  }

  test("hits_scores: normalized fixpoint invariants") {
    val h = Graph.hitsScores(spark, sf).cache()
    assert(h.count() === 100)
    // the last normalization pins the max authority to exactly 10^6
    assert(h.agg(max($"auth_u")).first().getLong(0) === 1000000L)
    assert(h.filter($"auth_u" <= 0 || $"auth_u" > 1000000L).count() === 0)
    // authority must follow buyer breadth: the top-10 parts each need
    // more distinct buyers than the bottom-10 of the reported 100
    val edges = graft.sources.Tables.orders(spark, sf)
      .join(graft.sources.Tables.lineitem(spark, sf),
        $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("c"), $"l_partkey".as("p")).distinct()
      .groupBy($"p").agg(countDistinct($"c").as("buyers"))
    val joined = h.join(edges, h("part_id") === edges("p"))
      .orderBy($"auth_u".desc).select($"buyers").collect().map(_.getLong(0))
    val top = joined.take(10).sum.toDouble / 10
    val bottom = joined.takeRight(10).sum.toDouble / 10
    assert(top > bottom,
      s"top-10 authority parts average $top buyers vs bottom-10 $bottom")
    h.unpersist()
  }
}
