package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.Cdc

/** Versioned snapshot table over parquet — a native re-expression of the
  * table-format features the reference delegates to Iceberg
  * (/root/reference/kafka/config/connect-iceberg-sink.json: per-table
  * keyed upsert sink; no Iceberg jars ship in this environment).
  *
  * Design (merge-on-read, the scale-honest shape):
  *   - every commit APPENDS immutable changelog parquet files under
  *     `data/` and writes a new JSON manifest under `snapshots/` listing
  *     ALL files live in that version (parent's plus its own) — commits
  *     never rewrite data;
  *   - reading version N = scan exactly the files its manifest lists,
  *     then apply the table's keyed latest-wins materialization
  *     (`Cdc.materialize`) — the same one code path as batch + streaming;
  *   - time travel = pick an older manifest; nothing is ever deleted by
  *     a commit;
  *   - `compact` folds the changelog into a compacted base and commits
  *     it as a NEW version whose manifest lists only the compacted files
  *     (Iceberg's rewrite-data-files): older versions still time-travel.
  *
  * Manifests carry no wall-clock fields — versioning is ordinal and the
  * watermark is the changelog's own max offset, so snapshot history is
  * deterministic and reproducible.
  */
object SnapshotTable {

  private def fs(path: String) = new java.io.File(path)

  private def listSnapshots(root: String): Seq[Int] = {
    val d = fs(s"$root/snapshots")
    if (!d.exists()) Seq.empty
    else d.listFiles().map(_.getName)
      .collect { case s if s.matches("v\\d+\\.json") => s.stripPrefix("v").stripSuffix(".json").toInt }
      .toSeq.sorted
  }

  def latestVersion(root: String): Option[Int] = listSnapshots(root).lastOption

  private def readManifest(spark: SparkSession, root: String, version: Int): (Seq[String], String) = {
    val df = spark.read.json(s"$root/snapshots/v$version.json")
    val row = df.select(col("files"), col("op")).first()
    (row.getSeq[String](0), row.getString(1))
  }

  private def writeManifest(root: String, version: Int, files: Seq[String],
                            op: String, maxOffset: Long,
                            schema: org.apache.spark.sql.types.StructType = null): Unit = {
    fs(s"$root/snapshots").mkdirs()
    val json = s"""{"version":$version,"op":"$op","max_offset":$maxOffset,""" +
      s""""files":[${files.map(f => "\"" + f + "\"").mkString(",")}]}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/snapshots/v$version.json"), json.getBytes)
    writeMetadata(root, version, files, op, maxOffset)
    writeTableMetadata(root, Option(schema))
  }

  /** EXTERNALIZED metadata (docs/SNAPSHOT_LAYOUT.md) — the offline-tool
    * surface, following Iceberg's HadoopCatalog conventions:
    * `metadata/version-hint.text` holds the current version number and
    * `metadata/manifest-list-v{N}.json` one self-describing document per
    * live version with a FIXED field set (format_version, table_format,
    * version, op, max_offset, manifests[{path,length}]). Every commit /
    * compaction / erasure rewrite funnels through [[writeManifest]], so
    * the external view can never drift from the operational manifests;
    * [[expireSnapshots]] retires the expired versions' lists and
    * refreshes the hint. Full Iceberg binary interop is out of scope
    * in-sandbox; the layout gives catalogs and offline tooling a stable
    * contract to enumerate snapshots and their data files.
    */
  private def writeMetadata(root: String, version: Int, files: Seq[String],
                            op: String, maxOffset: Long): Unit = {
    fs(s"$root/metadata").mkdirs()
    val manifests = files.map { f =>
      s"""{"path":"$f","length":${fs(s"$root/$f").length()}}"""
    }
    val json = s"""{"format_version":1,"table_format":"graft-snapshot-v1",""" +
      s""""version":$version,"op":"$op","max_offset":$maxOffset,""" +
      s""""manifests":[${manifests.mkString(",")}]}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/metadata/manifest-list-v$version.json"),
      json.getBytes)
    refreshVersionHint(root)
  }

  /** Iceberg-vocabulary TABLE METADATA (`metadata/v{R}.metadata.json`,
    * one revision per mutating operation, HadoopTableOperations
    * naming): the single document an Iceberg-literate catalog reads to
    * enumerate the table — `format-version`, a deterministic
    * `table-uuid`, `schemas` with `schema-id` (content-addressed
    * registry in Spark's public schema-JSON form under
    * `metadata/schema-{id}.json`; the id advances only when a commit's
    * schema actually differs — the schema-evolution trail),
    * `current-schema-id`, `current-snapshot-id`, `snapshots` (each with
    * `snapshot-id`, `parent-snapshot-id`, `sequence-number` and its
    * `manifest-list` path), and the ordered `snapshot-log`. No
    * wall-clock fields anywhere (Iceberg's timestamp-ms becomes the
    * monotonic snapshot id): metadata history is reproducible
    * byte-for-byte. Revisions are capped at the last 10, like
    * Iceberg's previous-versions-max. Full Avro manifest encoding
    * stays out of scope (no Iceberg jars in-sandbox); the vocabulary
    * and file topology are what offline tools key on.
    */
  private def writeTableMetadata(
      root: String, schema: Option[org.apache.spark.sql.types.StructType]): Unit = {
    fs(s"$root/metadata").mkdirs()
    val metaFiles = Option(fs(s"$root/metadata").listFiles()).getOrElse(Array.empty)
    // content-addressed schema registry
    val schemas = metaFiles.filter(_.getName.matches("schema-\\d+\\.json"))
      .map(f => (f.getName.stripPrefix("schema-").stripSuffix(".json").toInt,
        new String(java.nio.file.Files.readAllBytes(f.toPath))))
      .sortBy(_._1).toSeq
    // schema=None (expiry and other data-preserving revisions) must
    // CARRY FORWARD the previous revision's current-schema-id, not
    // reach for the highest registered id: after a schema revert
    // (commit A → B → A, where A content-addresses to id 0) the
    // registry holds {0, 1} but the latest commit wrote schema 0, and
    // invariant 5 says current-schema-id resolves to THAT schema.
    val prevCurrentSchemaId = metaFiles.map(_.getName)
      .collect { case n if n.matches("v\\d+\\.metadata\\.json") =>
        n.stripPrefix("v").stripSuffix(".metadata.json").toInt }.sorted.lastOption
      .flatMap { r =>
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$root/metadata/v$r.metadata.json")))
        "\"current-schema-id\":(-?\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toInt)
      }
    val currentSchemaId = schema match {
      case None => prevCurrentSchemaId.getOrElse(schemas.lastOption.map(_._1).getOrElse(-1))
      case Some(st) =>
        val js = st.json
        schemas.find(_._2 == js).map(_._1).getOrElse {
          val id = schemas.lastOption.map(_._1 + 1).getOrElse(0)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$root/metadata/schema-$id.json"), js.getBytes)
          id
        }
    }
    val schemaIds = (schemas.map(_._1) ++ Seq(currentSchemaId).filter(_ >= 0)).distinct.sorted
    val live = listSnapshots(root)
    val snaps = live.zip(-1 +: live.dropRight(1)).map { case (v, parent) =>
      val p = if (parent < 0) "null" else parent.toString
      s"""{"snapshot-id":$v,"parent-snapshot-id":$p,"sequence-number":$v,""" +
        s""""manifest-list":"metadata/manifest-list-v$v.json"}"""
    }
    val log = live.map(v => s"""{"snapshot-id":$v}""")
    val uuid = java.util.UUID.nameUUIDFromBytes(root.getBytes).toString
    val current = live.lastOption.map(_.toString).getOrElse("null")
    val json =
      s"""{"format-version":1,"table-format":"graft-snapshot-v1",""" +
        s""""table-uuid":"$uuid","location":"$root",""" +
        s""""current-schema-id":$currentSchemaId,""" +
        s""""schemas":[${schemaIds.map(i =>
          s"""{"schema-id":$i,"schema-file":"metadata/schema-$i.json"}""").mkString(",")}],""" +
        s""""current-snapshot-id":$current,""" +
        s""""snapshots":[${snaps.mkString(",")}],""" +
        s""""snapshot-log":[${log.mkString(",")}]}"""
    val revs = metaFiles.map(_.getName)
      .collect { case n if n.matches("v\\d+\\.metadata\\.json") =>
        n.stripPrefix("v").stripSuffix(".metadata.json").toInt }.sorted
    val rev = revs.lastOption.getOrElse(0) + 1
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/metadata/v$rev.metadata.json"), json.getBytes)
    revs.dropRight(9).foreach(r => fs(s"$root/metadata/v$r.metadata.json").delete())
  }

  private def refreshVersionHint(root: String): Unit =
    listSnapshots(root).lastOption.foreach { hint =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$root/metadata/version-hint.text"),
        hint.toString.getBytes)
    }

  /** Append a changelog batch as a new snapshot version. Returns the
    * committed version number.
    */
  def commit(batch: DataFrame, root: String, orderCol: String): Int = {
    val spark = batch.sparkSession
    val version = latestVersion(root).getOrElse(0) + 1
    val dataDir = s"data/v$version"
    batch.write.mode("error").parquet(s"$root/$dataDir")
    val newFiles = fs(s"$root/$dataDir").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => s"$dataDir/${f.getName}").toSeq.sorted
    val parentFiles = latestVersion(root).filter(_ < version) match {
      case _ => if (version == 1) Seq.empty[String]
                else readManifest(spark, root, version - 1)._1
    }
    val maxOffset = batch.agg(max(col(orderCol))).first() match {
      case r if r.isNullAt(0) => -1L
      case r => r.getLong(0)
    }
    writeManifest(root, version, parentFiles ++ newFiles, "append", maxOffset,
      batch.schema)
    version
  }

  /** Read a snapshot as the CURRENT STATE at that version: scan the
    * manifest's files, apply keyed latest-wins (merge-on-read).
    */
  def readSnapshot(spark: SparkSession, root: String, route: Cdc.TableRoute,
                   version: Option[Int] = None): DataFrame = {
    val v = version.orElse(latestVersion(root))
      .getOrElse(throw new IllegalArgumentException(s"no snapshots under $root"))
    val (files, _) = readManifest(spark, root, v)
    val log = spark.read.parquet(files.map(f => s"$root/$f"): _*)
    Cdc.materialize(log, route)
  }

  /** Raw changelog of a version (no materialization). */
  def readChangelog(spark: SparkSession, root: String, version: Option[Int] = None): DataFrame = {
    val v = version.orElse(latestVersion(root))
      .getOrElse(throw new IllegalArgumentException(s"no snapshots under $root"))
    val (files, _) = readManifest(spark, root, v)
    spark.read.parquet(files.map(f => s"$root/$f"): _*)
  }

  /** Iceberg-style rewrite-data-files: fold the live changelog into a
    * compacted current-state base and commit it as a new version (whose
    * manifest lists ONLY the compacted files). Readers of the new
    * version skip the log replay; older versions still time-travel.
    */
  def compact(spark: SparkSession, root: String, route: Cdc.TableRoute,
              targetFiles: Int = 4): Int = {
    val version = latestVersion(root)
      .getOrElse(throw new IllegalArgumentException(s"no snapshots under $root")) + 1
    val state = readSnapshot(spark, root, route)
    val dataDir = s"data/v$version"
    // compacted base rows are terminal states; re-tag as upserts (and
    // drop the audit column so the base schema matches the changelog) so
    // a later materialize over [base ++ newer changelog] stays correct
    val base = state.drop("n_changes").withColumn("op", lit("u"))
    base.coalesce(targetFiles)
      .write.mode("error").parquet(s"$root/$dataDir")
    val files = fs(s"$root/$dataDir").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => s"$dataDir/${f.getName}").toSeq.sorted
    val maxOffset = state.agg(max(col(route.orderCol))).first() match {
      case r if r.isNullAt(0) => -1L
      case r => r.getLong(0)
    }
    writeManifest(root, version, files, "compact", maxOffset, base.schema)
    version
  }

  /** Iceberg's expire_snapshots: drop manifests older than
    * `keepLast` versions and delete data files no surviving manifest
    * references. Time travel to an expired version fails; surviving
    * versions are untouched. Returns (expired versions, deleted files).
    *
    * Deletion is manifest-driven (reference counting over file lists),
    * so a file shared by surviving versions — the normal case for
    * append-chain manifests — is never touched. O(|manifests| ×
    * |files|) driver work on id strings, no data scan.
    */
  def expireSnapshots(spark: SparkSession, root: String,
                      keepLast: Int): (Seq[Int], Seq[String]) = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val all = listSnapshots(root)
    val (expired, kept) = all.splitAt(math.max(0, all.size - keepLast))
    if (expired.isEmpty) return (Seq.empty, Seq.empty)
    val keptFiles = kept.flatMap(v => readManifest(spark, root, v)._1).toSet
    val deadFiles = expired.flatMap(v => readManifest(spark, root, v)._1)
      .distinct.filterNot(keptFiles)
    deadFiles.foreach(f => fs(s"$root/$f").delete())
    expired.foreach { v =>
      fs(s"$root/snapshots/v$v.json").delete()
      fs(s"$root/metadata/manifest-list-v$v.json").delete()
    }
    refreshVersionHint(root)
    writeTableMetadata(root, None) // expiry is a metadata revision too
    (expired, deadFiles)
  }

  /** Key erasure across the table's full history (right-to-be-forgotten
    * for a keyed table): every surviving snapshot version is rewritten
    * without the erased keys' rows, its manifest repointed, and the
    * now-unreferenced original data files PHYSICALLY DELETED (the same
    * reference counting [[expireSnapshots]] uses) — after erasure no
    * version, current or time-traveled, can reproduce the keys, and the
    * bytes are gone from disk, not merely unlinked from manifests.
    * Each invocation writes to a fresh `data/v{v}_erased{n}` directory,
    * so a later forget request re-runs cleanly (an in-place overwrite
    * would read and write the same path and fail partway). Returns the
    * deleted original files. At scale the win comes from key-clustered
    * layouts ([[Layout]]) where pruning touches only the files whose
    * min/max key range covers the erased keys.
    */
  def eraseKeys(spark: SparkSession, root: String, keyCol: String,
                keys: Seq[Long], orderCol: String = "offset"): Seq[String] = {
    val versions = listSnapshots(root)
    val before = versions.flatMap(v => readManifest(spark, root, v)._1).distinct
    versions.foreach { v =>
      val (files, op) = readManifest(spark, root, v)
      val log = spark.read.parquet(files.map(f => s"$root/$f"): _*)
      val scrubbed = log.filter(!col(keyCol).isin(keys: _*))
      val dataDir = Iterator.from(0).map(n => s"data/v${v}_erased$n")
        .find(d => !fs(s"$root/$d").exists()).get
      scrubbed.write.mode("error").parquet(s"$root/$dataDir")
      val newFiles = fs(s"$root/$dataDir").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(f => s"$dataDir/${f.getName}")
        .toSeq.sorted
      val maxOffset = scrubbed.agg(max(col(orderCol))).first() match {
        case r if r.isNullAt(0) => -1L
        case r => r.getLong(0)
      }
      writeManifest(root, v, newFiles, op, maxOffset, scrubbed.schema)
    }
    // reference-count originals against the rewritten manifests and
    // delete what nothing references any more; sweep emptied data dirs
    // (write markers included) so no scrubbed bytes linger
    val live = versions.flatMap(v => readManifest(spark, root, v)._1).toSet
    val dead = before.filterNot(live)
    dead.foreach(f => fs(s"$root/$f").delete())
    dead.map(_.split("/").init.mkString("/")).distinct.foreach { d =>
      val dir = fs(s"$root/$d")
      if (dir.exists() && !dir.listFiles().exists(_.getName.endsWith(".parquet"))) {
        dir.listFiles().foreach(_.delete())
        dir.delete()
      }
    }
    dead
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Driver-visible time-travel query: build a two-version snapshot
    * table from the events changelog (offsets < 5000, then the rest),
    * read BOTH versions' materialized states, and return them tagged by
    * version — v1 must reflect only the first commit even though v2
    * exists (the time-travel guarantee), which the oracle reproduces
    * with offset-bounded latest-wins CTEs.
    */
  def snapshotTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val root = tmp("graft_snap")
    val log = Cdc.changelog(spark, dir).select($"key", $"op", $"value", $"offset")
    val route = Cdc.TableRoute(Seq("key"), "offset")
    commit(log.filter($"offset" < 5000), root, "offset")
    commit(log.filter($"offset" >= 5000), root, "offset")
    val versions = Seq(1, 2).map { v =>
      readSnapshot(spark, root, route, Some(v)).withColumn("version", lit(v))
    }
    versions.reduce(_.unionByName(_))
      .select($"version", $"key".as("user_id"), $"value".as("current_value"),
        $"op".as("last_op"), $"offset".as("last_offset"), $"n_changes")
      .orderBy($"version", $"user_id")
  }

  val snapshotTimeTravelSql: String =
    """WITH c AS (
      |  SELECT user_id,
      |    CASE event_type WHEN 'signup' THEN 'c' WHEN 'purchase' THEN 'u'
      |      WHEN 'error' THEN 'd' ELSE 'r' END AS op,
      |    value, event_id AS ofs
      |  FROM events),
      |v1 AS (
      |  SELECT user_id, value, op, ofs, n_changes FROM (
      |    SELECT c.*, row_number() OVER (PARTITION BY user_id ORDER BY ofs DESC) AS rn,
      |      count(*) OVER (PARTITION BY user_id) AS n_changes
      |    FROM c WHERE ofs < 5000) t
      |  WHERE rn = 1 AND op <> 'd'),
      |v2 AS (
      |  SELECT user_id, value, op, ofs, n_changes FROM (
      |    SELECT c.*, row_number() OVER (PARTITION BY user_id ORDER BY ofs DESC) AS rn,
      |      count(*) OVER (PARTITION BY user_id) AS n_changes
      |    FROM c) t
      |  WHERE rn = 1 AND op <> 'd')
      |SELECT * FROM (
      |  SELECT 1 AS version, user_id, value AS current_value, op AS last_op,
      |    ofs AS last_offset, n_changes FROM v1
      |  UNION ALL
      |  SELECT 2 AS version, user_id, value AS current_value, op AS last_op,
      |    ofs AS last_offset, n_changes FROM v2) u
      |ORDER BY version, user_id""".stripMargin
}
