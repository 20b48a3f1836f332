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
}
