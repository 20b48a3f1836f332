package graft

import org.apache.spark.sql.functions._

/** Pins the r13 sign_buckets kernel bit-identical to the broadcast
  * plane-join + two-aggregate shape it replaced in semdedup_paragraph.
  */
class SignBucketsSpec extends SparkSpec {
  import spark.implicits._

  test("sign_buckets kernel == broadcast plane join over the sf0.01 paragraphs") {
    val (paras, comp, planes) = graft.operators.Dedup.sppState(spark, "/root/testdata/sf0.01")
    try {
      // the pre-r13 join/aggregate shape, verbatim
      val joinShape = comp.join(broadcast(planes), "dim")
        .groupBy($"pid", $"tbl", $"bit")
        .agg(sum($"cnt" * $"p").as("s"))
        .groupBy($"pid", $"tbl")
        .agg(sum(when($"s" >= 0, expr("shiftleft(cast(1 as bigint), bit)"))
          .otherwise(0L)).as("bucket"))
      val kernelShape = graft.operators.Dedup.sppBucketsOf(comp)
      val a = kernelShape.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val b = joinShape.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(a.nonEmpty)
      assert(a === b)
    } finally { paras.unpersist(); comp.unpersist() }
  }
}
