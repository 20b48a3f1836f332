package graft

import org.apache.spark.sql.functions._
import graft.sinks.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("range clustering yields disjoint per-file key ranges and loses no rows") {
    val out = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val events = spark.read.parquet(s"$sf/events.parquet")
    Layout.writeClustered(events, $"user_id", numFiles = 8, out)

    val ranges = Layout.fileRanges(spark, out, "user_id")
      .orderBy($"min_key").collect()
    assert(ranges.length == 8, s"expected 8 files, got ${ranges.length}")
    assert(ranges.map(_.getLong(3)).sum == events.count())
    // the pruning contract: file N's max < file N+1's min (disjoint)
    ranges.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) < b.getLong(1) || a.getLong(2) <= b.getLong(1),
        s"overlap: ${a.getLong(1)}-${a.getLong(2)} vs ${b.getLong(1)}-${b.getLong(2)}")
      assert(a.getLong(2) <= b.getLong(1), "ranges must not interleave")
    }
    // a selective key predicate must only touch the owning file(s)
    val probe = ranges(3).getLong(1) // some key owned by file 3
    val files = spark.read.parquet(out).filter($"user_id" === probe)
      .select(input_file_name()).distinct().count()
    assert(files <= 2, s"point lookup touched $files files") // boundary key may span 2
  }
}
