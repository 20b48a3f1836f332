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

  test("z-order clustering localizes BOTH dimensions' footer stats") {
    val out = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val events = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("vbucket", floor($"value").cast("long"))
    Layout.writeZOrdered(events, $"user_id", $"vbucket", numFiles = 16, out)

    // pruning model = what parquet does: a file survives a point
    // predicate iff the probe falls inside its [min,max] for that column
    def containing(keyName: String, probes: Seq[Long]): Double = {
      val ranges = Layout.fileRanges(spark, out, keyName)
        .select($"min_key", $"max_key").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      probes.map(p => ranges.count { case (lo, hi) => lo <= p && p <= hi }).sum
        .toDouble / probes.length
    }
    val nFiles = Layout.fileRanges(spark, out, "user_id").count().toDouble
    assert(nFiles == 16.0)
    val uProbes = Seq(5L, 37L, 61L, 88L, 110L)
    val vProbes = Seq(10L, 55L, 95L, 140L, 180L)
    val uAvg = containing("user_id", uProbes)
    val vAvg = containing("vbucket", vProbes)
    info(f"avg files containing probe: user_id $uAvg%.1f, vbucket $vAvg%.1f of $nFiles")
    // both dimensions must prune: a point predicate on either dim keeps
    // well under half the files (1-dim clustering keeps ALL files for
    // the second dim)
    assert(uAvg <= nFiles / 2, s"user_id dim does not prune: $uAvg")
    assert(vAvg <= nFiles / 2, s"vbucket dim does not prune: $vAvg")
  }

  test("3-dim z-order: every dimension prunes; range layout prunes only its own key") {
    // sf0.01: enough rows per file that a file's FOREIGN-dim footer
    // range reflects the layout, not small-sample luck
    // normalized load: `ts_ns` is a long under every driver-side
    // encoding of events.ts (ns-long / TIMESTAMP_NTZ / TIMESTAMP)
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.01")
      .withColumn("vbucket", floor($"value" / 8).cast("long"))
      .withColumn("hbucket", expr("(ts_ns div 3600000000000) % 24").cast("long"))
    val zDir = java.nio.file.Files.createTempDirectory("graft_z3").toString
    val rDir = java.nio.file.Files.createTempDirectory("graft_r3").toString
    val nFiles = 32
    Layout.writeZOrdered3(events, $"user_id", $"vbucket", $"hbucket", nFiles, zDir)
    Layout.writeClustered(events, $"user_id", nFiles, rDir)

    // pruning model = parquet footer stats: a file survives a point
    // predicate iff the probe is inside its [min,max] for that column
    def containing(path: String, keyName: String, probes: Seq[Long]): Double = {
      val ranges = Layout.fileRanges(spark, path, keyName)
        .select($"min_key", $"max_key").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      probes.map(p => ranges.count { case (lo, hi) => lo <= p && p <= hi }).sum
        .toDouble / probes.length
    }
    val uProbes = Seq(5L, 37L, 61L, 88L, 140L)
    val vProbes = Seq(2L, 11L, 24L, 37L, 51L)
    val hProbes = Seq(1L, 5L, 11L, 17L, 23L)
    val z = Seq(containing(zDir, "user_id", uProbes),
      containing(zDir, "vbucket", vProbes),
      containing(zDir, "hbucket", hProbes))
    val r = Seq(containing(rDir, "user_id", uProbes),
      containing(rDir, "vbucket", vProbes),
      containing(rDir, "hbucket", hProbes))
    info(f"z-order avg files/probe: u=${z(0)}%.1f v=${z(1)}%.1f h=${z(2)}%.1f of $nFiles")
    info(f"range   avg files/probe: u=${r(0)}%.1f v=${r(1)}%.1f h=${r(2)}%.1f of $nFiles")
    // z-order: every dimension prunes below half the files
    z.zip(Seq("user_id", "vbucket", "hbucket")).foreach { case (avg, d) =>
      assert(avg <= nFiles / 2.0, s"z-order $d does not prune: $avg")
    }
    // range layout: its own key prunes hard, the other dims keep ~all
    // files — the comparative point of multi-dim clustering
    assert(r(0) <= nFiles / 8.0, s"range layout should nail its own key: ${r(0)}")
    // foreign dims keep most files under range layout (not all: rare
    // extreme buckets are absent from some files' footers by chance)
    assert(r(1) >= nFiles * 0.6 && r(2) >= nFiles * 0.6,
      s"range layout unexpectedly pruned foreign dims: v=${r(1)} h=${r(2)}")
    // and z-order must beat range on the foreign dimensions
    assert(z(1) < r(1) && z(2) < r(2), "z-order did not beat range on foreign dims")
  }
}
