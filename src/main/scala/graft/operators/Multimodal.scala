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

  // ------------------------------------------------------------------
  // multimodal_ahash_dedup — average-hash near-dup over binary payloads
  // ------------------------------------------------------------------

  private val AhashBits = 64
  private val AhashBands = 4 // 4 × 16-bit segments, hamming ≤ 3 pigeonholes
  private val HamMax = 3

  val ahashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_format", StringType),
    StructField("n_bytes", IntegerType),
    StructField("b0", IntegerType), StructField("b1", IntegerType),
    StructField("b2", IntegerType), StructField("b3", IntegerType)))

  /** 64-bit AVERAGE HASH of each payload's DECODED content, emitted as
    * 4 × 16-bit band ints: the stub decode strips the container header
    * (`MEDIA:fmt:` — a real decoder discards container framing the
    * same way, which is what makes perceptual hashing robust to
    * re-encodes), then the content byte range splits into 64 equal
    * blocks (boundaries ⌊b·n/64⌋) and bit b is set iff that block's
    * byte mean exceeds the global mean (integer cross-multiply — no
    * division). This is exactly the aHash fingerprint algorithm with
    * pixels stubbed by content bytes per the [[decodeStub]] contract;
    * the banding/dedup plumbing around it is the real, scale-relevant
    * part. Runs as the same batch iterator→iterator byte kernel as
    * [[decodeStub]].
    */
  private def ahashSigs(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(ahashSchema)
    media.select("doc_id", "media_format", "media_bytes")
      .mapPartitions { rows =>
        rows.map { r =>
          val raw = r.getAs[Array[Byte]]("media_bytes")
          // stub decode: skip the 'MEDIA:' + fmt + ':' container header
          val skip = 7 + r.getAs[String]("media_format").length
          val bytes = java.util.Arrays.copyOfRange(raw, skip, raw.length)
          val n = bytes.length
          var total = 0L
          var i = 0
          while (i < n) { total += bytes(i) & 0xFF; i += 1 }
          val bands = new Array[Int](AhashBands)
          var b = 0
          while (b < AhashBits) {
            val s = b * n / AhashBits
            val e = (b + 1) * n / AhashBits
            var bs = 0L
            var j = s
            while (j < e) { bs += bytes(j) & 0xFF; j += 1 }
            // block mean > global mean ⇔ bs·n > total·len (exact ints)
            if (bs * n > total * (e - s))
              bands(b / 16) |= 1 << (b % 16)
            b += 1
          }
          Row(r.getAs[Long]("doc_id"), r.getAs[String]("media_format"),
            n, bands(0), bands(1), bands(2), bands(3))
        }
      }(enc)
  }

  /** Near-duplicate media by perceptual-hash banding — the multimodal
    * analog of [[Dedup.dedupSimhash]] (same pigeonhole: hamming ≤ 3
    * over 64 bits ⇒ at least one of 4 16-bit bands equal): candidate
    * pairs from band-equality buckets (skew-capped at 256 like the
    * simhash segments — a degenerate all-alike corpus can't go
    * quadratic), exact hamming over the 4 band xors settles each pair.
    * Catches the same asset re-encoded under a different container
    * (here: the same text payload under a different format prefix
    * shifts every block boundary slightly — a few bits flip, the pair
    * survives at distance ≤ 3), which byte-exact hashing misses.
    *
    * Scale: signatures are 4 ints/doc; buckets/pairs carry ids and
    * band ints only — the payload never leaves its scan. One
    * signature pass, one banded self-join, one distinct. */
  def multimodalAhashDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // plant the two failure modes the operator exists to catch, so the
    // detection paths run at every SF (the dq_report planted-corruption
    // convention): the smallest doc RE-ENCODED under a rotated format
    // (decoded content identical ⇒ hamming 0) and the second-smallest
    // with a one-byte content edit (near, not equal ⇒ 0 < hamming ≤ 3)
    val base = Tables.documents(spark, dir).select($"doc_id", $"text")
    val reenc = base.orderBy($"doc_id").limit(1)
      .select(($"doc_id" + 1000000000L).as("doc_id"), $"text")
    val edited = base.orderBy($"doc_id").limit(2).offset(1)
      .select(($"doc_id" + 2000000000L).as("doc_id"),
        concat(lit("X"), substring($"text", 2, 1 << 24)).as("text"))
    val sigs = ahashSigs(withMedia(base.unionByName(reenc).unionByName(edited)))
      .select($"doc_id", $"media_format", $"b0", $"b1", $"b2", $"b3",
        explode(array((0 until AhashBands).map { s =>
          struct(lit(s).as("seg"), col(s"b$s").as("seg_val"))
        }: _*)).as("sk"))
      .select($"doc_id", $"media_format", $"b0", $"b1", $"b2", $"b3",
        $"sk.seg".as("seg"), $"sk.seg_val".as("seg_val"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val capped = sigs
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"seg", $"seg_val")))
      .filter($"bucket_n" <= 256)
    val ham = (0 until AhashBands)
      .map(s => bit_count(col(s"a.b$s").bitwiseXOR(col(s"b.b$s"))))
      .reduce(_ + _)
    Release.checkpointed(
      capped.as("a")
        .join(capped.as("b"),
          $"a.seg" === $"b.seg" && $"a.seg_val" === $"b.seg_val"
            && $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("i"), $"b.doc_id".as("j"),
          $"a.media_format".as("format_i"), $"b.media_format".as("format_j"),
          ham.cast("int").as("hamming"))
        .distinct()
        .filter($"hamming" <= HamMax)
        .orderBy($"i", $"j"),
      sigs) // pair-mass output
  }

  val multimodalAhashDedupSql: String =
    """WITH base AS (SELECT doc_id, text FROM documents),
      |pl AS (
      |  SELECT doc_id + 1000000000 AS doc_id, text
      |  FROM base ORDER BY doc_id LIMIT 1),
      |pe AS (
      |  SELECT doc_id + 2000000000 AS doc_id, 'X' || substr(text, 2) AS text
      |  FROM base ORDER BY doc_id LIMIT 1 OFFSET 1),
      |p AS (
      |  SELECT doc_id,
      |    ['png','jpeg','wav'][CAST(doc_id % 3 + 1 AS INT)] AS fmt,
      |    text AS s
      |  FROM (SELECT * FROM base
      |        UNION ALL SELECT * FROM pl
      |        UNION ALL SELECT * FROM pe)),
      |codes AS (
      |  SELECT doc_id, fmt, length(s) AS n,
      |    list_transform(split(s, ''), c -> CAST(unicode(c) AS BIGINT)) AS cs
      |  FROM p),
      |tot AS (
      |  SELECT doc_id, fmt, n, cs,
      |    list_reduce(cs, (a, b) -> a + b) AS total
      |  FROM codes),
      |bits AS (
      |  SELECT doc_id, fmt,
      |    list_transform(range(0, 64), b ->
      |      CASE WHEN (CASE WHEN ((b + 1) * n) // 64 > (b * n) // 64
      |          THEN list_reduce(
      |            cs[(b * n) // 64 + 1 : ((b + 1) * n) // 64], (a, c) -> a + c)
      |          ELSE 0 END)
      |          * n > total * (((b + 1) * n) // 64 - (b * n) // 64)
      |        THEN 1 ELSE 0 END) AS bv
      |  FROM tot),
      |bands AS (
      |  SELECT doc_id, fmt,
      |    CAST(list_reduce(list_transform(range(0, 16),
      |      i -> bv[CAST(i AS INT) + 1] << CAST(i AS INT)), (a, b) -> a + b) AS INT) AS b0,
      |    CAST(list_reduce(list_transform(range(0, 16),
      |      i -> bv[CAST(i AS INT) + 17] << CAST(i AS INT)), (a, b) -> a + b) AS INT) AS b1,
      |    CAST(list_reduce(list_transform(range(0, 16),
      |      i -> bv[CAST(i AS INT) + 33] << CAST(i AS INT)), (a, b) -> a + b) AS INT) AS b2,
      |    CAST(list_reduce(list_transform(range(0, 16),
      |      i -> bv[CAST(i AS INT) + 49] << CAST(i AS INT)), (a, b) -> a + b) AS INT) AS b3
      |  FROM bits),
      |segs AS (
      |  SELECT doc_id, fmt, b0, b1, b2, b3, s.seg,
      |    CASE s.seg WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS seg_val
      |  FROM bands, (SELECT unnest(range(0, 4)) AS seg) s),
      |capped AS (
      |  SELECT * FROM (
      |    SELECT *, count(*) OVER (PARTITION BY seg, seg_val) AS bucket_n
      |    FROM segs)
      |  WHERE bucket_n <= 256),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
      |    a.fmt AS format_i, b.fmt AS format_j,
      |    CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
      |      + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS INT)
      |      AS hamming
      |  FROM capped a JOIN capped b
      |    ON a.seg = b.seg AND a.seg_val = b.seg_val AND a.doc_id < b.doc_id)
      |SELECT i, j, format_i, format_j, hamming
      |FROM pairs WHERE hamming <= 3 ORDER BY i, j""".stripMargin
}
