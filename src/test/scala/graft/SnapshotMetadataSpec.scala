package graft

import graft.cdc.Cdc
import graft.sinks.SnapshotTable
import org.apache.spark.sql.functions.lit

/** docs/SNAPSHOT_LAYOUT.md's lifecycle invariants: the externalized
  * metadata (version-hint + manifest lists) stays schema-stable and
  * consistent with the operational manifests across every mutating
  * operation — commit, compaction, erasure, expiry.
  */
class SnapshotMetadataSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val route = Cdc.TableRoute(Seq("key"), "offset")

  private def batch(rows: (Long, String, Double, Long)*) =
    rows.toDF("key", "op", "value", "offset")

  private def readHint(root: String): Int =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/metadata/version-hint.text"))).trim.toInt

  private val ExpectedFields =
    Set("format_version", "table_format", "version", "op", "max_offset", "manifests")

  /** Assert every lifecycle invariant for the table's current state. */
  private def assertInvariants(root: String, expectLive: Seq[Int]): Unit = {
    val live = new java.io.File(s"$root/snapshots").listFiles()
      .map(_.getName).filter(_.matches("v\\d+\\.json"))
      .map(_.stripPrefix("v").stripSuffix(".json").toInt).sorted.toSeq
    assert(live == expectLive, s"live versions $live != expected $expectLive")
    assert(readHint(root) == live.max, "version-hint must track the latest version")
    // expired versions keep no manifest list; live versions keep exactly one
    val lists = new java.io.File(s"$root/metadata").listFiles()
      .map(_.getName).filter(_.startsWith("manifest-list-v"))
      .map(_.stripPrefix("manifest-list-v").stripSuffix(".json").toInt).sorted.toSeq
    assert(lists == live, s"manifest lists $lists != live versions $live")
    live.foreach { v =>
      val df = spark.read.json(s"$root/metadata/manifest-list-v$v.json")
      assert(df.columns.toSet == ExpectedFields,
        s"v$v external schema drifted: ${df.columns.sorted.toSeq}")
      val row = df.first()
      assert(row.getAs[Long]("format_version") == 1L)
      assert(row.getAs[String]("table_format") == "graft-snapshot-v1")
      assert(row.getAs[Long]("version") == v.toLong)
      assert(Set("append", "compact").contains(row.getAs[String]("op")))
      val manifests = row.getSeq[org.apache.spark.sql.Row](
        row.fieldIndex("manifests"))
      assert(manifests.nonEmpty, s"v$v lists no data files")
      manifests.foreach { m =>
        val f = new java.io.File(s"$root/${m.getAs[String]("path")}")
        assert(f.isFile, s"v$v lists missing file ${m.getAs[String]("path")}")
        assert(f.length() == m.getAs[Long]("length"),
          s"v$v length drift for ${m.getAs[String]("path")}")
      }
    }
    assertTableMetadata(root, live)
  }

  /** Invariants 5-6: the latest Iceberg-vocabulary table-metadata
    * revision agrees with the live state and every referenced file
    * exists.
    */
  private def assertTableMetadata(root: String, live: Seq[Int]): Unit = {
    val revs = new java.io.File(s"$root/metadata").listFiles()
      .map(_.getName).filter(_.matches("v\\d+\\.metadata\\.json"))
      .map(_.stripPrefix("v").stripSuffix(".metadata.json").toInt).sorted.toSeq
    assert(revs.nonEmpty, "no table-metadata revision written")
    assert(revs.size <= 10, s"metadata revisions unbounded: $revs")
    val md = spark.read.json(s"$root/metadata/v${revs.max}.metadata.json").first()
    assert(md.getAs[Long]("format-version") == 1L)
    assert(md.getAs[String]("table-format") == "graft-snapshot-v1")
    assert(md.getAs[String]("location") == root)
    assert(md.getAs[Long]("current-snapshot-id") == live.max.toLong,
      "current-snapshot-id must track the hint")
    val snaps = md.getSeq[org.apache.spark.sql.Row](md.fieldIndex("snapshots"))
    assert(snaps.map(_.getAs[Long]("snapshot-id")).sorted == live.map(_.toLong),
      "snapshots must enumerate exactly the live versions")
    snaps.sortBy(_.getAs[Long]("snapshot-id")).zip(-1L +: live.dropRight(1).map(_.toLong))
      .foreach { case (s, parent) =>
        val got = Option(s.getAs[java.lang.Long]("parent-snapshot-id"))
          .map(_.toLong).getOrElse(-1L)
        assert(got == parent, s"broken parent chain at ${s.getAs[Long]("snapshot-id")}")
        val ml = new java.io.File(s"$root/${s.getAs[String]("manifest-list")}")
        assert(ml.isFile, s"missing ${s.getAs[String]("manifest-list")}")
      }
    val schemas = md.getSeq[org.apache.spark.sql.Row](md.fieldIndex("schemas"))
    assert(schemas.exists(_.getAs[Long]("schema-id") == md.getAs[Long]("current-schema-id")))
    schemas.foreach { s =>
      assert(new java.io.File(s"$root/${s.getAs[String]("schema-file")}").isFile)
    }
  }

  test("externalized metadata holds its schema across the full lifecycle") {
    val root = tmp("graft_snap_meta")
    SnapshotTable.commit(batch((1L, "c", 1.0, 1L), (2L, "c", 2.0, 2L)), root, "offset")
    assertInvariants(root, Seq(1))

    SnapshotTable.commit(batch((1L, "u", 9.9, 3L), (3L, "c", 3.0, 4L)), root, "offset")
    assertInvariants(root, Seq(1, 2))

    SnapshotTable.compact(spark, root, route)
    assertInvariants(root, Seq(1, 2, 3))

    SnapshotTable.eraseKeys(spark, root, "key", Seq(2L))
    assertInvariants(root, Seq(1, 2, 3))

    SnapshotTable.expireSnapshots(spark, root, keepLast = 2)
    assertInvariants(root, Seq(2, 3))

    // the externalized view alone reproduces the engine's current state:
    // read the hinted version's listed files, apply keyed latest-wins
    val hinted = readHint(root)
    val files = spark.read.json(s"$root/metadata/manifest-list-v$hinted.json")
      .selectExpr("explode(manifests.path) AS p")
      .collect().map(r => s"$root/${r.getString(0)}")
    val external = spark.read.parquet(files: _*)
    val engine = SnapshotTable.readChangelog(spark, root, Some(hinted))
    assert(external.count() == engine.count())
    assert(external.select($"key").except(engine.select($"key")).isEmpty)
  }

  test("schema registry advances only when a commit's schema differs") {
    val root = tmp("graft_snap_schema")
    SnapshotTable.commit(batch((1L, "c", 1.0, 1L)), root, "offset")
    SnapshotTable.commit(batch((2L, "c", 2.0, 2L)), root, "offset")
    def currentSchemaId: Long =
      spark.read.json(new java.io.File(s"$root/metadata").listFiles()
          .filter(_.getName.matches("v\\d+\\.metadata\\.json"))
          .maxBy(_.getName.stripPrefix("v").stripSuffix(".metadata.json").toInt)
          .getPath)
        .first().getAs[Long]("current-schema-id")
    assert(currentSchemaId == 0L, "same schema must not allocate a new id")
    // widened schema: one extra column → schema-id 1
    SnapshotTable.commit(
      batch((3L, "c", 3.0, 3L)).withColumn("tag", lit("x")), root, "offset")
    assert(currentSchemaId == 1L, "schema change must advance the id")
    val reg = new java.io.File(s"$root/metadata").listFiles()
      .map(_.getName).count(_.matches("schema-\\d+\\.json"))
    assert(reg == 2, s"expected 2 registered schemas, got $reg")
    // revert-then-expire (invariant 5): commit schema A again — the
    // content-addressed registry resolves it back to id 0 — then run a
    // data-preserving revision (expiry). current-schema-id must stay 0
    // (the schema the latest COMMIT wrote), not jump to the highest
    // registered id.
    SnapshotTable.commit(batch((4L, "c", 4.0, 4L)), root, "offset")
    assert(currentSchemaId == 0L, "revert must content-address back to id 0")
    SnapshotTable.expireSnapshots(spark, root, keepLast = 2)
    assert(currentSchemaId == 0L,
      "expiry must carry forward the latest commit's schema id, not max(registry)")
  }
}
