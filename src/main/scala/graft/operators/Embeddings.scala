package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Embedding-table analytics: the vector-column aggregations a curation
  * pipeline runs over billions of embeddings (class prototypes, and —
  * see [[PqIndex]] — compressed-code search).
  */
object Embeddings {

  /** Per-label mean vector ("class prototypes"): posexplode each
    * embedding to (label, dim, component) and aggregate — the dimension
    * axis rides the SAME shuffle as the label key (one exchange keyed
    * (label, dim), map-side partial sums), which is how a prototype per
    * class stays one linear pass at any corpus size. Components are
    * 7dp-quantized and decimal-summed so the mean is exact in any
    * summation order; float32→double is lossless.
    */
  def embeddingCentroids(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"label", posexplode($"embedding").as(Seq("dim", "v")))
      .groupBy($"label", $"dim")
      .agg(count(lit(1)).as("n"),
        sum(round($"v".cast("double"), 7).cast("decimal(18,7)")).as("s"))
      .select($"label", $"dim", $"n",
        round($"s".cast("double") / $"n".cast("double"), 6).as("centroid"))
      .orderBy($"label", $"dim")
  }

  val embeddingCentroidsSql: String =
    """WITH comp AS (
      |  SELECT label, CAST(i AS INT) AS dim, embedding[i + 1] AS v
      |  FROM embeddings
      |  CROSS JOIN (SELECT unnest(range(0, 64)) AS i))
      |SELECT label, dim, count(*) AS n,
      |  round(CAST(sum(CAST(round(CAST(v AS DOUBLE), 7) AS DECIMAL(18,7))) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE), 6) AS centroid
      |FROM comp GROUP BY label, dim ORDER BY label, dim""".stripMargin
}
