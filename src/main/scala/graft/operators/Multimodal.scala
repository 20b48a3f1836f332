package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Multimodal-column plumbing: opaque binary payloads with typed
  * metadata, batch feature extraction over partitions.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake — but every Spark-side piece a real
  * pipeline needs is genuine and tested: the binary column, the metadata
  * struct schema, partition-parallel batch decode via `mapPartitions`
  * (the JVM analogue of `mapInPandas` batch shape: one iterator in, one
  * iterator out, amortized per-batch setup), and the typed feature
  * schema out.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", IntegerType),
    StructField("feature_sum", LongType),
    StructField("feature_mean", DoubleType),
    StructField("feature_max", IntegerType)))

  /** Synthesize an opaque binary payload + metadata per document —
    * stands in for real image/audio bytes ingested from object storage.
    */
  def withMedia(docs: DataFrame): DataFrame = {
    val fmt = element_at(array(lit("png"), lit("jpeg"), lit("wav")),
      (col("doc_id") % 3 + 1).cast("int"))
    docs
      .withColumn("media_format", fmt)
      .withColumn("media_meta", struct(
        (col("doc_id") % 64 + 16).cast("int").as("width"),
        (col("doc_id") % 48 + 16).cast("int").as("height")))
      .withColumn("media_bytes",
        encode(concat(lit("MEDIA:"), col("media_format"), lit(":"), col("text")), "UTF-8"))
  }

  /** STUB decoder: a real deployment would decode image/audio bytes here
    * (the libs are absent in this container). Deterministic fake:
    * byte-level statistics of the payload. The mapPartitions batch shape
    * (iterator→iterator, per-partition setup amortized) is the real,
    * scale-relevant part.
    */
  def decodeStub(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("doc_id", "media_format", "media_meta.width", "media_meta.height", "media_bytes")
      .mapPartitions { rows =>
        // per-partition setup happens once (in a real decoder: codec init)
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("media_bytes")
          var sum = 0L; var max = 0
          var i = 0
          while (i < bytes.length) {
            val v = bytes(i) & 0xFF
            sum += v; if (v > max) max = v
            i += 1
          }
          Row(r.getAs[Long]("doc_id"), r.getAs[String]("media_format"),
            r.getAs[Int]("width"), r.getAs[Int]("height"), bytes.length, sum,
            if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length, max)
        }
      }(enc)
  }

  /** Resize planning: fit each media item into a target box preserving
    * aspect ratio. The geometry is real (what a mapInPandas PIL/ffmpeg
    * stage would apply); the pixel work stays behind the decode stub.
    */
  def resizePlan(media: DataFrame, maxW: Int = 64, maxH: Int = 64): DataFrame = {
    val w = col("media_meta.width").cast("double")
    val h = col("media_meta.height").cast("double")
    val scale = least(lit(maxW) / w, lit(maxH) / h, lit(1.0))
    media.withColumn("resize_w", floor(w * scale).cast("int"))
      .withColumn("resize_h", floor(h * scale).cast("int"))
  }

  /** Frame sampling for video-like payloads: every `stride`-th frame
    * index with its timestamp — posexplode plumbing, one output row per
    * sampled frame, ready for a per-frame decode stage.
    */
  def frameSample(media: DataFrame, fps: Double = 25.0, stride: Int = 5): DataFrame = {
    val nFrames = (col("doc_id") % 30 + 1).cast("int")
    media
      .withColumn("frame_idx",
        explode(sequence(lit(0), nFrames - 1, lit(stride))))
      .withColumn("frame_ts_ms",
        (col("frame_idx").cast("double") / fps * 1000).cast("long"))
      .select(col("doc_id"), col("media_format"), col("frame_idx"), col("frame_ts_ms"))
  }

  private val AudioWin = 256
  private val AudioStride = 128

  val audioWindowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("win_idx", IntegerType),
    StructField("win_start", IntegerType),
    StructField("win_bytes", IntegerType),
    StructField("energy", LongType),
    StructField("peak", IntegerType)))

  /** Audio-style FRAMED feature extraction over the binary payloads:
    * slide 256-byte windows with stride 128 across each wav payload
    * (the frame loop every audio featurizer runs — here over the stub
    * bytes, since no codec ships in this container), emit per-window
    * energy/peak. The scale-relevant parts are real: a bounded explode
    * of window indices (the docChunks integer arithmetic), BINARY
    * slicing pushed into the row (`substring` over BinaryType — no
    * per-window payload copies ride a shuffle), and the batch
    * iterator→iterator decode shape of [[decodeStub]]. Byte stats over
    * ASCII payloads are exact integer arithmetic, so the whole path
    * replays in SQL.
    */
  def multimodalAudioWindows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = withMedia(Tables.documents(spark, dir))
      .filter($"media_format" === "wav")
      .select($"doc_id", $"media_bytes", length($"media_bytes").as("n"))
      .withColumn("nwin", lit(1) +
        ((greatest(lit(0), $"n" - AudioWin) + lit(AudioStride - 1)) / lit(AudioStride))
          .cast("int"))
    val windows = media
      .withColumn("win_idx", explode(sequence(lit(0), $"nwin" - 1)))
      .select($"doc_id", $"win_idx",
        ($"win_idx" * AudioStride + 1).as("win_start"),
        expr(s"substring(media_bytes, win_idx * $AudioStride + 1, $AudioWin)")
          .as("win_payload"))
    val enc = org.apache.spark.sql.Encoders.row(audioWindowSchema)
    windows.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("win_payload")
        var sum = 0L; var max = 0
        var i = 0
        while (i < bytes.length) {
          val v = bytes(i) & 0xFF
          sum += v; if (v > max) max = v
          i += 1
        }
        Row(r.getAs[Long]("doc_id"), r.getAs[Int]("win_idx"),
          r.getAs[Int]("win_start"), bytes.length, sum, max)
      }
    }(enc).orderBy($"doc_id", $"win_idx")
  }

  val multimodalAudioWindowsSql: String =
    """WITH p AS (
      |  SELECT doc_id, 'MEDIA:wav:' || text AS s
      |  FROM documents WHERE ['png','jpeg','wav'][CAST(doc_id % 3 + 1 AS INT)] = 'wav'),
      |n AS (
      |  SELECT doc_id, s, length(s) AS n,
      |    1 + (greatest(0, length(s) - 256) + 127) // 128 AS nwin
      |  FROM p),
      |w AS (
      |  SELECT doc_id, CAST(i AS INT) AS win_idx,
      |    CAST(i * 128 + 1 AS INT) AS win_start,
      |    substring(s, CAST(i * 128 + 1 AS INT), 256) AS wp
      |  FROM n, unnest(range(0, nwin)) AS r(i))
      |SELECT doc_id, win_idx, win_start,
      |  CAST(length(wp) AS INT) AS win_bytes,
      |  CAST(list_reduce(list_transform(split(wp, ''), c -> CAST(unicode(c) AS BIGINT)),
      |    (a, b) -> a + b) AS BIGINT) AS energy,
      |  CAST(list_max(list_transform(split(wp, ''), c -> unicode(c))) AS INT) AS peak
      |FROM w ORDER BY doc_id, win_idx""".stripMargin

  /** End-to-end multimodal pass: synthesize payloads, batch-"decode",
    * aggregate per format. Oracle-checked: the stub's byte statistics
    * are deterministic integer arithmetic over ASCII payloads, so the
    * whole path — synthesis, mapPartitions decode, aggregate — is
    * reproducible in SQL. The format mean is computed from the exact
    * integer (sum, count) pairs, never by averaging per-doc doubles
    * (which would be partial-aggregation-order-dependent).
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = withMedia(Tables.documents(spark, dir))
    decodeStub(spark, media)
      .groupBy($"media_format")
      .agg(count(lit(1)).as("n_docs"),
        round(sum($"feature_sum").cast("double") / sum($"n_bytes").cast("double"), 6)
          .as("avg_byte_mean"),
        max($"feature_max").cast("long").as("max_byte"),
        sum($"n_bytes").cast("long").as("total_bytes"))
      .orderBy($"media_format")
  }

  /** Resize + frame-sampling PLAN surfaced end-to-end: for every video
    * frame a decode stage would touch, the target geometry and timestamp
    * — i.e. the whole pre-decode planning path ([[withMedia]] metadata →
    * [[resizePlan]] box fit → [[frameSample]] stride explode) as one
    * driver-visible query. Pure per-row maps plus one bounded explode
    * (≤ ceil(30/stride) rows/doc); the only shuffle is the output sort.
    * All geometry is exact: integer metadata, one least()-of-ratios
    * double op chain mirrored verbatim in SQL, ts = idx·40 ms exact.
    */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = resizePlan(withMedia(Tables.documents(spark, dir)))
    frameSample(media.select($"doc_id", $"media_format", $"media_meta",
        $"resize_w", $"resize_h"))
      .join(media.select($"doc_id", $"resize_w", $"resize_h"), Seq("doc_id"))
      .select($"doc_id", $"media_format", $"frame_idx", $"frame_ts_ms",
        $"resize_w", $"resize_h")
      .orderBy($"doc_id", $"frame_idx")
  }

  val multimodalFramesSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    ['png','jpeg','wav'][CAST(doc_id % 3 + 1 AS INT)] AS media_format,
      |    CAST(doc_id % 64 + 16 AS INT) AS w, CAST(doc_id % 48 + 16 AS INT) AS h,
      |    CAST(doc_id % 30 + 1 AS INT) AS n_frames
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, media_format, n_frames,
      |    CAST(floor(CAST(w AS DOUBLE)
      |      * least(64 / CAST(w AS DOUBLE), 64 / CAST(h AS DOUBLE), 1.0)) AS INT) AS resize_w,
      |    CAST(floor(CAST(h AS DOUBLE)
      |      * least(64 / CAST(w AS DOUBLE), 64 / CAST(h AS DOUBLE), 1.0)) AS INT) AS resize_h
      |  FROM m)
      |SELECT doc_id, media_format, CAST(f.i AS INT) AS frame_idx,
      |  CAST(floor(CAST(f.i AS DOUBLE) / 25.0 * 1000) AS BIGINT) AS frame_ts_ms,
      |  resize_w, resize_h
      |FROM r, unnest(range(0, n_frames, 5)) AS f(i)
      |ORDER BY doc_id, frame_idx""".stripMargin

  val multimodalMetaSql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    ['png','jpeg','wav'][CAST(doc_id % 3 + 1 AS INT)] AS media_format,
      |    'MEDIA:' || ['png','jpeg','wav'][CAST(doc_id % 3 + 1 AS INT)] || ':' || text AS s
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, media_format, length(s) AS n_bytes,
      |    list_reduce(list_transform(split(s, ''), c -> CAST(unicode(c) AS BIGINT)),
      |      (a, b) -> a + b) AS fsum,
      |    list_max(list_transform(split(s, ''), c -> unicode(c))) AS fmax
      |  FROM p)
      |SELECT media_format, count(*) AS n_docs,
      |  round(CAST(sum(fsum) AS DOUBLE) / CAST(sum(n_bytes) AS DOUBLE), 6) AS avg_byte_mean,
      |  CAST(max(fmax) AS BIGINT) AS max_byte,
      |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes
      |FROM f GROUP BY media_format ORDER BY media_format""".stripMargin
}
