package graft

import org.apache.spark.sql.functions._
/** Pins the r13 native winnow_fps kernel bit-identical to the
  * relational winnowing shape it replaced (posexplode(sequence) +
  * md5/conv gram hashes + trailing-ROWS window min + distinct) — the
  * optimization must not move a single fingerprint.
  */
class WinnowKernelSpec extends SparkSpec {

  private val K = 8
  private val W = 4

  /** The pre-r13 relational formulation, verbatim. */
  private def relationalFps(docs: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    val w4 = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos").rowsBetween(-(W - 1), 0)
    docs
      .filter(length($"text") >= K + W - 1)
      .select($"doc_id", $"text",
        explode(sequence(lit(1), length($"text") - (K - 1))).as("pos"))
      .select($"doc_id", $"pos",
        expr(s"CAST(conv(substr(md5(substring(text, pos, $K)), 1, 8), 16, 10)" +
          " AS BIGINT)").as("h"))
      .withColumn("fp", min($"h").over(w4))
      .filter($"pos" >= W)
      .select($"doc_id", $"fp").distinct()
  }

  private def kernelFps(docs: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    docs
      .filter(length($"text") >= K + W - 1)
      .select($"doc_id",
        explode(graft.functions.StringFunctions.winnow_fps($"text", K, W)).as("fp"))
  }

  test("winnow_fps kernel == relational gram/window/distinct shape on the corpus") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text"))
    val a = kernelFps(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = relationalFps(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a.nonEmpty)
    assert(a === b)
  }

  test("winnow_fps edge cases: short text, multi-byte chars, repeated runs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcdefghij"),            // len 10 < k+w-1: relational filter drops it
      (2L, "abcdefghijk"),           // len 11: exactly one complete window
      (3L, "aaaaaaaaaaaaaaaaaaaa"),  // single repeated gram: one distinct fp
      (4L, "héllo wörld ünïcode — multi-byte codepoints keep gram boundaries"),
      (5L, "the quick brown fox jumps over the lazy dog the quick brown fox")
    ).toDF("doc_id", "text")
    val a = kernelFps(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = relationalFps(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
    assert(!a.exists(_._1 == 1L))
    assert(a.count(_._1 == 3L) == 1)
  }
}
