package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Referential-integrity-preserving scale-up of a testdata directory:
  * replicates every fact table K times with per-table key strides so
  * foreign keys stay consistent (replica i's orders reference replica
  * i's customers, etc.). Fixed-cardinality dims (region, nation) copy
  * unchanged — exactly TPC-H's scaling rule. Text/vector payloads
  * replicate verbatim: clones are EXACT duplicates, which makes the
  * dedup/ANN workloads legitimately ~K× heavier (duplicate groups of
  * size K are what a scaled web corpus looks like to those operators).
  *
  * Purpose: the sf1 scale probe — BENCH at 10× rows to measure each
  * headline query's scaling exponent instead of arguing it from plan
  * shape. Usage: runMain graft.ScaleUp <srcDir> <outDir> [k]
  *
  * The events table is read and written RAW (no ts normalization):
  * whatever encoding the source carries is what the clone carries, and
  * readers go through Tables.events / eventStream as always.
  *
  * MUTATE mode (4th arg "mutate"): verbatim clones let the exact-
  * duplicate representative collapse absorb most of the near-dup
  * family's true sf1 work (the r7 probe's honesty gap) — so each
  * replica i>0 gets its text perturbed (append a per-replica tag
  * token; n_chars updated to stay length-consistent) and one
  * embedding component bumped by an exactly-representable +0.25f.
  * Clone groups then survive as NEAR duplicates (one-token /
  * one-component deltas), which is the workload MinHash / containment
  * / kNN actually face on a scaled web corpus.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val k = if (args.length > 2) args(2).toInt else 10
    val mutate = args.length > 3 && args(3) == "mutate"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(cpus.toInt).appName("graft-scaleup").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def load(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def stride(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).first().getLong(0) + 1L

    val custS = stride(load("customer"), "c_custkey")
    val suppS = stride(load("supplier"), "s_suppkey")
    val partS = stride(load("part"), "p_partkey")
    val orderS = stride(load("orders"), "o_orderkey")
    val docS = stride(load("documents"), "doc_id")
    val vecS = stride(load("embeddings"), "vec_id")
    val eventS = stride(load("events"), "event_id")
    val userS = stride(load("events"), "user_id")

    /** K offset replicas: cross join with the replica index, shift the
      * named key columns by stride·i, keep everything else verbatim.
      */
    def replicateKeep(df: DataFrame, shifts: (String, Long)*): DataFrame = {
      val rep = spark.range(k).select($"id".as("__rep"))
      shifts.foldLeft(df.crossJoin(rep)) { case (d, (c, s)) =>
        d.withColumn(c, col(c) + $"__rep" * s)
      }
    }
    def replicate(df: DataFrame, shifts: (String, Long)*): DataFrame =
      replicateKeep(df, shifts: _*).drop("__rep")

    /** mutate-mode documents: replica 0 verbatim; replica i appends the
      * tag token " xq<i>" so every clone pair is a one-token near-dup
      * (Jaccard just under 1 for realistic doc lengths) instead of an
      * exact dup; n_chars recomputed so dq_report's length-consistency
      * contract still holds on the probe corpus. */
    def mutateDocs(df: DataFrame): DataFrame =
      df.withColumn("text",
          when($"__rep" > 0, concat($"text", lit(" xq"), $"__rep"))
            .otherwise($"text"))
        .withColumn("n_chars", length($"text").cast("long"))
        .drop("__rep")

    /** mutate-mode embeddings: replica i>0 bumps component
      * (i−1) mod dim by +0.25f (exactly representable — the perturbed
      * corpus stays bit-deterministic), so clone groups are near- but
      * not exact-duplicate vectors. */
    def mutateVecs(df: DataFrame): DataFrame =
      df.withColumn("embedding",
          when($"__rep" > 0,
            transform($"embedding", (v, i) =>
              when(i === pmod($"__rep" - 1, size($"embedding")).cast("int"),
                v + lit(0.25f)).otherwise(v)))
            .otherwise($"embedding"))
        .drop("__rep")

    val tables: Seq[(String, DataFrame)] = Seq(
      "region" -> load("region"),
      "nation" -> load("nation"),
      "customer" -> replicate(load("customer"), "c_custkey" -> custS),
      "supplier" -> replicate(load("supplier"), "s_suppkey" -> suppS),
      "part" -> replicate(load("part"), "p_partkey" -> partS),
      "orders" -> replicate(load("orders"),
        "o_orderkey" -> orderS, "o_custkey" -> custS),
      "lineitem" -> replicate(load("lineitem"),
        "l_orderkey" -> orderS, "l_partkey" -> partS, "l_suppkey" -> suppS),
      "events" -> replicate(load("events"),
        "event_id" -> eventS, "user_id" -> userS),
      "documents" -> {
        val rep = replicateKeep(load("documents"), "doc_id" -> docS)
        if (mutate) mutateDocs(rep) else rep.drop("__rep")
      },
      "embeddings" -> {
        val rep = replicateKeep(load("embeddings"), "vec_id" -> vecS)
        if (mutate) mutateVecs(rep) else rep.drop("__rep")
      })
    // Fact tables must be written SPLIT: the replicate cross join
    // inherits the source's (single-file) partitioning, and a
    // one-file-per-table layout caps every scan at one task — the
    // first sf1 probe measured text_quality 13.9x instead of ~5x
    // purely from this artifact. 32 files per fact table mirrors the
    // layout a real generator produces at this scale.
    tables.foreach { case (t, df) =>
      val parts = if (t == "region" || t == "nation") 1 else 32
      df.repartition(parts).write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"SCALEUP $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }
    spark.stop()
  }
}
