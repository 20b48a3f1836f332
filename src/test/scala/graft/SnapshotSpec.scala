package graft

import org.apache.spark.sql.functions._
import graft.cdc.Cdc
import graft.sinks.SnapshotTable

/** Snapshot-table format semantics: append-only commits, version
  * isolation (time travel), and compaction that preserves state while
  * keeping older versions readable.
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val route = Cdc.TableRoute(Seq("key"), "offset")

  private def batch(rows: (Long, String, Double, Long)*) =
    rows.toDF("key", "op", "value", "offset")

  test("commits are isolated versions; time travel reads past state") {
    val root = tmp("graft_snap_tt")
    SnapshotTable.commit(batch((1L, "c", 10.0, 1L), (2L, "c", 20.0, 2L)), root, "offset")
    SnapshotTable.commit(batch((1L, "u", 11.0, 3L), (2L, "d", 0.0, 4L)), root, "offset")
    assert(SnapshotTable.latestVersion(root).contains(2))

    val v1 = SnapshotTable.readSnapshot(spark, root, route, Some(1))
      .select($"key", $"value").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(v1 == Map(1L -> 10.0, 2L -> 20.0))

    val v2 = SnapshotTable.readSnapshot(spark, root, route, Some(2))
      .select($"key", $"value").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(v2 == Map(1L -> 11.0)) // key 2 deleted; key 1 updated
  }

  test("compaction rewrites data files but preserves state and history") {
    val root = tmp("graft_snap_cp")
    SnapshotTable.commit(batch((1L, "c", 1.0, 1L), (2L, "c", 2.0, 2L), (3L, "c", 3.0, 3L)), root, "offset")
    SnapshotTable.commit(batch((1L, "u", 1.5, 4L), (3L, "d", 0.0, 5L)), root, "offset")
    val cv = SnapshotTable.compact(spark, root, route, targetFiles = 1)
    assert(cv == 3)

    // compacted state == pre-compaction state (modulo the audit column,
    // which restarts from the compacted base)
    val before = SnapshotTable.readSnapshot(spark, root, route, Some(2))
      .select($"key", $"value").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val after = SnapshotTable.readSnapshot(spark, root, route, Some(3))
      .select($"key", $"value").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(after == before)
    // compacted manifest lists strictly fewer files
    assert(SnapshotTable.readChangelog(spark, root, Some(3)).inputFiles.length <
      SnapshotTable.readChangelog(spark, root, Some(2)).inputFiles.length)
    // history survives compaction
    assert(SnapshotTable.readSnapshot(spark, root, route, Some(1)).count() == 3)

    // commits continue on top of the compacted base
    SnapshotTable.commit(batch((2L, "u", 2.5, 6L), (4L, "c", 4.0, 7L)), root, "offset")
    val v4 = SnapshotTable.readSnapshot(spark, root, route, Some(4))
      .select($"key", $"value").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(v4 == Map(1L -> 1.5, 2L -> 2.5, 4L -> 4.0))
  }
}
