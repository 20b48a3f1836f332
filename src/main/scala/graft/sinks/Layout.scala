package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout rewrite for scan pruning: range-cluster a table on a key
  * so every output file owns a DISJOINT key interval. Parquet footers
  * then carry tight min/max stats per file/row-group, and any selective
  * predicate on the key prunes all but the owning files at planning
  * time — the single cheapest lever for 100 TB scan cost (an
  * OPTIMIZE ... ZORDER-lite for one dimension).
  *
  * `repartitionByRange` samples the key to build balanced boundaries
  * (skew-resistant), `sortWithinPartitions` orders rows inside each
  * file so row-group stats are tight too.
  */
object Layout {

  def writeClustered(df: DataFrame, key: Column, numFiles: Int,
                     path: String): Unit =
    df.repartitionByRange(numFiles, key)
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)

  /** Per-file key ranges of a clustered table — the pruning contract:
    * ranges must be pairwise disjoint.
    */
  def fileRanges(spark: SparkSession, path: String,
                 keyName: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyName)).as("min_key"), max(col(keyName)).as("max_key"),
        count(lit(1)).as("n_rows"))

  /** Spread the low 32 bits of a long into the even bit positions
    * (the classic magic-mask dilation — 5 shift/mask rounds, pure
    * codegen'd integer ops).
    */
  private def dilate(c: Column): Column = {
    def round(v: Column, sh: Int, mask: Long): Column =
      v.bitwiseOR(shiftleft(v, sh)).bitwiseAND(lit(mask))
    val m = c.bitwiseAND(lit(0xFFFFFFFFL))
    val a = round(m, 16, 0x0000FFFF0000FFFFL)
    val b = round(a, 8, 0x00FF00FF00FF00FFL)
    val d = round(b, 4, 0x0F0F0F0F0F0F0F0FL)
    val e = round(d, 2, 0x3333333333333333L)
    round(e, 1, 0x5555555555555555L)
  }

  /** Morton (Z-order) curve value of two non-negative integer keys:
    * bit-interleaved so range-clustering on it localizes BOTH
    * dimensions — each file owns a tile of the (x, y) grid, and a
    * selective predicate on either dimension prunes most files. This
    * is the one-expression core of OPTIMIZE ... ZORDER BY (x, y).
    */
  def zValue(x: Column, y: Column): Column =
    dilate(x.cast("long")).bitwiseOR(shiftleft(dilate(y.cast("long")), 1))

  /** Z-order clustered rewrite on two keys. */
  def writeZOrdered(df: DataFrame, kx: Column, ky: Column, numFiles: Int,
                    path: String): Unit = {
    val withZ = df.withColumn("__z", zValue(kx, ky))
    withZ.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Spread the low 21 bits of a long to every third bit position
    * (3-way dilation for a 3-dimensional Morton curve; 63 of 64 bits
    * used). Same magic-mask construction as [[dilate]].
    */
  private def dilate3(c: Column): Column = {
    def round(v: Column, sh: Int, mask: Long): Column =
      v.bitwiseOR(shiftleft(v, sh)).bitwiseAND(lit(mask))
    val m = c.bitwiseAND(lit(0x1FFFFFL))
    val a = round(m, 32, 0x1F00000000FFFFL)
    val b = round(a, 16, 0x1F0000FF0000FFL)
    val d = round(b, 8, 0x100F00F00F00F00FL)
    val e = round(d, 4, 0x10C30C30C30C30C3L)
    round(e, 2, 0x1249249249249249L)
  }

  /** Morton value of THREE non-negative integer keys — each file of a
    * range-clustering on it owns a cube of the (x, y, z) grid, so a
    * selective predicate on ANY of the three dimensions prunes files
    * (the multi-dimension OPTIMIZE ... ZORDER BY shape; a 1-dim range
    * layout prunes only its own key and keeps every file for the other
    * two).
    */
  def zValue3(x: Column, y: Column, z: Column): Column =
    dilate3(x.cast("long"))
      .bitwiseOR(shiftleft(dilate3(y.cast("long")), 1))
      .bitwiseOR(shiftleft(dilate3(z.cast("long")), 2))

  /** Z-order clustered rewrite on three keys, QUANTILE-NORMALIZED: raw
    * keys with unequal bit-widths break Morton tiling (the widest key's
    * high bits dominate the curve, so the narrow dimensions stop
    * pruning — measured: a 5-bit hour column kept 21/32 files next to
    * an 8-bit user column). Each key is first mapped to its ~64-bucket
    * sample-quantile rank (the approxQuantile boundaries are
    * model-sized driver state, same doctrine as IVF centroids), so the
    * three dilated inputs are uniform 6-bit values and every dimension
    * gets an equal share of the curve — which is exactly what
    * OPTIMIZE ... ZORDER BY implementations do before interleaving.
    */
  def writeZOrdered3(df: DataFrame, kx: Column, ky: Column, kz: Column,
                     numFiles: Int, path: String): Unit = {
    val named = df
      .withColumn("__kx", kx.cast("double"))
      .withColumn("__ky", ky.cast("double"))
      .withColumn("__kz", kz.cast("double"))
    val probs = (1 to 63).map(_ / 64.0).toArray
    def bucket(c: Column, bounds: Array[Double]): Column =
      bounds.distinct.foldLeft(lit(0)) { (acc, b) =>
        acc + when(c >= b, 1).otherwise(0)
      }.cast("long")
    val Seq(bx, by, bz) = Seq("__kx", "__ky", "__kz")
      .map(c => named.stat.approxQuantile(c, probs, 0.001))
    val withZ = named.withColumn("__z",
      zValue3(bucket(col("__kx"), bx), bucket(col("__ky"), by),
        bucket(col("__kz"), bz)))
    withZ.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__kx", "__ky", "__kz")
      .write.mode("overwrite").parquet(path)
  }
}
