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

  test("expire_snapshots drops old versions and only unreferenced files") {
    val root = tmp("graft_snap_exp")
    SnapshotTable.commit(batch((1L, "c", 1.0, 1L)), root, "offset")
    SnapshotTable.commit(batch((2L, "c", 2.0, 2L)), root, "offset")
    SnapshotTable.commit(batch((1L, "u", 1.1, 3L)), root, "offset")
    val (expired, deleted) = SnapshotTable.expireSnapshots(spark, root, keepLast = 2)
    assert(expired == Seq(1))
    // v1's files are all still referenced by the append-chain manifests
    // of v2/v3 — reference counting must delete NOTHING here
    assert(deleted.isEmpty)
    // the expired version is gone; survivors read exactly as before
    intercept[Exception] { SnapshotTable.readSnapshot(spark, root, route, Some(1)).collect() }
    val v3 = SnapshotTable.readSnapshot(spark, root, route, Some(3))
      .select($"key", $"value").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(v3 == Map(1L -> 1.1, 2L -> 2.0))

    // compact (files no longer shared), then expiring must delete the
    // pre-compaction files that only dead manifests referenced
    SnapshotTable.compact(spark, root, route)
    val (expired2, deleted2) = SnapshotTable.expireSnapshots(spark, root, keepLast = 1)
    assert(expired2.nonEmpty && deleted2.nonEmpty)
    val cur = SnapshotTable.readSnapshot(spark, root, route)
      .select($"key", $"value").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(cur == Map(1L -> 1.1, 2L -> 2.0))
  }

  test("key erasure scrubs every version, current and time-traveled") {
    val root = tmp("graft_snap_erase")
    SnapshotTable.commit(batch((1L, "c", 1.0, 1L), (2L, "c", 2.0, 2L)), root, "offset")
    SnapshotTable.commit(batch((1L, "u", 9.9, 3L), (3L, "c", 3.0, 4L)), root, "offset")
    val deleted = SnapshotTable.eraseKeys(spark, root, "key", Seq(1L))
    (1 to 2).foreach { v =>
      val snap = SnapshotTable.readSnapshot(spark, root, route, Some(v))
      assert(snap.filter($"key" === 1L).count() == 0, s"key 1 must be gone from v$v")
      val log = SnapshotTable.readChangelog(spark, root, Some(v))
      assert(log.filter($"key" === 1L).count() == 0, s"no v$v changelog trace of key 1")
    }
    // untouched keys keep their full history semantics
    val v2 = SnapshotTable.readSnapshot(spark, root, route, Some(2))
      .select($"key", $"value").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(v2 == Map(2L -> 2.0, 3L -> 3.0))
    assert(SnapshotTable.readSnapshot(spark, root, route, Some(1))
      .select($"key").collect().map(_.getLong(0)).toSet == Set(2L))
    // erased bytes are physically gone, not just unlinked from manifests
    assert(deleted.nonEmpty, "erasure must report deleted originals")
    deleted.foreach { f =>
      assert(!new java.io.File(s"$root/$f").exists(), s"original $f still on disk")
    }
    // a later forget request re-runs cleanly over the erased layout
    val deleted2 = SnapshotTable.eraseKeys(spark, root, "key", Seq(2L))
    assert(deleted2.nonEmpty)
    deleted2.foreach { f =>
      assert(!new java.io.File(s"$root/$f").exists(), s"gen-1 file $f still on disk")
    }
    (1 to 2).foreach { v =>
      val keysLeft = SnapshotTable.readChangelog(spark, root, Some(v))
        .select($"key").collect().map(_.getLong(0)).toSet
      assert(!keysLeft.contains(1L) && !keysLeft.contains(2L),
        s"v$v still contains erased keys: $keysLeft")
    }
    assert(SnapshotTable.readSnapshot(spark, root, route, Some(2))
      .select($"key").collect().map(_.getLong(0)).toSet == Set(3L))
  }
}
