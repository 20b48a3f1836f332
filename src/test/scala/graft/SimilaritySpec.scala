package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native vec_dot is bit-identical to the fold form") {
    import graft.operators.Dedup
    val e = sources.Tables.embeddings(spark, sf).limit(50)
    val a = e.select($"vec_id".as("i"), $"embedding".as("ea"))
    val b = e.select($"vec_id".as("j"), $"embedding".as("eb"))
    val diffs = a.crossJoin(b)
      .select(Dedup.dot($"ea", $"eb").as("native"), Dedup.dotFold($"ea", $"eb").as("fold"))
      .filter($"native" =!= $"fold")
    assert(diffs.count() == 0)
  }

  test("brute-force ANN returns k ranked neighbors per query") {
    val res = Similarity.annBruteforce(spark, sf)
    val perQuery = res.groupBy($"q_id").count().collect()
    assert(perQuery.forall(_.getLong(1) == 5))
    // ranks are 1..5 with descending similarity
    val bad = res.as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).values.exists { rows =>
        val sorted = rows.sortBy(_._2)
        sorted.map(_._4).sliding(2).exists(p => p.length == 2 && p(0) < p(1))
      }
    assert(!bad, "similarity not non-increasing with rank")
  }

  test("LSH ANN recall vs brute force") {
    val bf = Similarity.annBruteforce(spark, sf)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.annLsh(spark, sf)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    // bucketing trades recall for a bucket-local search; it must still
    // find a meaningful share of the true top-k
    val recall = if (bf.isEmpty) 1.0 else bf.intersect(lsh).size.toDouble / bf.size
    info(s"LSH recall = $recall (${lsh.size} candidates)")
    assert(recall >= 0.2, s"recall $recall too low")
  }

  test("embedding_centroids matches a direct per-dimension average") {
    val e = sources.Tables.embeddings(spark, sf)
    val direct = e.collect()
      .map(r => r.getInt(2) -> r.getSeq[Float](1))
      .groupBy(_._1)
      .map { case (label, vs) =>
        label -> (0 until 64).map(d => vs.map(_._2(d).toDouble).sum / vs.size)
      }
    val got = graft.operators.Embeddings.embeddingCentroids(spark, sf).collect()
    assert(got.length == direct.size * 64)
    for (row <- got) {
      val want = direct(row.getInt(0))(row.getInt(1))
      assert(math.abs(row.getDouble(3) - want) < 1e-5,
        s"label ${row.getInt(0)} dim ${row.getInt(1)}: ${row.getDouble(3)} vs $want")
    }
  }
}
