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
}
