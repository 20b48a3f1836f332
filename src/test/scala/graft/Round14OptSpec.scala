package graft

import org.apache.spark.sql.functions._
import graft.functions.AggFunctions
import graft.operators.{Similarity, Training}

/** Equivalence pins for the round-14 optimizations: every rewritten
  * internal is checked bit-for-bit against the formulation it replaced
  * (the same discipline as PairPackSpec / WinnowKernelSpec in r13).
  */
class Round14OptSpec extends SparkSpec {
  import spark.implicits._

  test("weighted_mode == two-level sum+argmax formulation, incl. ties and partial merges") {
    // deterministic pseudo-random votes with deliberate tie mass:
    // weights drawn from a tiny set so several labels per group often
    // reach the same total — the tie-break path must match exactly
    val rows = (0 until 5000).map { i =>
      val g = i % 97
      val lbl = (i * 31 + 7) % 11
      val w = ((i * 17 + 3) % 4) + 1
      (g.toLong, lbl.toLong, w.toLong)
    }
    // 16 partitions on 4 cores forces real partial-buffer merges
    val df = spark.createDataFrame(rows).toDF("g", "lbl", "w").repartition(16)
    val fused = df.groupBy($"g")
      .agg(AggFunctions.weighted_mode($"lbl", $"w").as("lbl"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val twoLevel = df.groupBy($"g", $"lbl").agg(sum($"w").as("votes"))
      .groupBy($"g")
      .agg(max(struct($"votes", (-$"lbl").as("neg"))).as("best"))
      .select($"g", (-$"best.neg").as("lbl"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fused === twoLevel)
    assert(fused.size === 97)
  }

  test("cappedLshPairs == explode + (tbl,bucket) self-join + distinct, on an adversarial pile-up") {
    // 300 distinct vectors with one shared sign pattern: every LSH
    // table piles all of them into a single bucket, so the cap and the
    // C(cap,2) enumeration are both exercised at their bound
    val u = Array.tabulate(64)(d => 0.01f * (d + 1))
    val reps = (1L to 300L).map(i => (i, u.map(_ * i))).toDF("vec_id", "embedding")
    val fused = Similarity.cappedLshPairs(reps, "t:", 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = Similarity.cappedLshIndex(reps, "t:", 64)
    val joined = idx.as("a")
      .join(idx.as("b"),
        $"a.tbl" === $"b.tbl" && $"a.bucket" === $"b.bucket" &&
          $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id", $"b.vec_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fused === joined)
    assert(fused.nonEmpty && fused.forall { case (i, j) => i < j })
  }

  test("cappedLshPairs == self-join formulation on the real sf embeddings") {
    val reps = spark.read.parquet(s"$sf/embeddings.parquet")
      .groupBy($"embedding").agg(min($"vec_id").as("vec_id"))
      .select($"vec_id", $"embedding")
    val fused = Similarity.cappedLshPairs(reps, "ln:", 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = Similarity.cappedLshIndex(reps, "ln:", 64)
    val joined = idx.as("a")
      .join(idx.as("b"),
        $"a.tbl" === $"b.tbl" && $"a.bucket" === $"b.bucket" &&
          $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id", $"b.vec_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fused === joined)
  }

  test("lloydCentroids column-per-dim update == posexplode/(cluster,dim) reference") {
    val quant = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id",
        transform($"embedding",
          x => round(x.cast("double") * 1000000d, 0).cast("long")).as("vq"))
      .persist()
    val now = Training.lloydCentroids(quant, 4, 3)
    // the pre-r14 formulation, replayed verbatim
    var cent: Array[Array[Long]] = quant.orderBy($"vec_id").limit(4)
      .select($"vq").collect().map(_.getSeq[Long](0).toArray)
    for (_ <- 1 to 3) {
      val sums = Training.assign(quant, cent)
        .select($"cluster", posexplode($"vq").as(Seq("dim", "v")))
        .groupBy($"cluster", $"dim")
        .agg(sum($"v").as("s"), count(lit(1)).as("n"))
        .collect()
      val upd = sums.map(r => (r.getInt(0), r.getInt(1)) ->
        java.lang.Math.floorDiv(r.getLong(2), r.getLong(3))).toMap
      cent = cent.zipWithIndex.map { case (cv, j) =>
        Array.tabulate(cv.length)(d => upd.getOrElse((j, d), cv(d)))
      }
    }
    quant.unpersist()
    assert(now.length === cent.length)
    now.zip(cent).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }
}
