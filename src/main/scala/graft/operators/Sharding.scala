package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Output-shard planning — the ship step at the END of a curation
  * pipeline: assign every document to one of S output shards such that
  * shards carry near-equal token mass (training jobs read shards in
  * parallel; the slowest shard gates the epoch). Deterministic
  * serpentine LPT: rank documents by token count descending and deal
  * ranks boustrophedon (0..S−1, S−1..0, repeat) — the classic
  * "sorted greedy" balance guarantee (max shard ≤ avg + one max doc)
  * with zero state and a pure closed-form assignment both engines
  * replay bit-identically.
  *
  * Scale: token counts come out of the one corpus scan as (doc_id,
  * n_tokens) pairs — the TEXT never rides the sort. The global
  * row_number is one range-exchange sort of 16-byte rows (10⁹ docs ≈
  * 16 GB spread over the cluster — trivial); at extreme scale the
  * documented two-level grid-rank path (rfm_segments convention)
  * applies unchanged. The physical shard write would then be
  * `.repartition(S, $"shard")` + partitionBy — co-located by
  * construction, no second shuffle.
  *
  * Reference anchor: the reference POC stops at ingest
  * (consumer.py:68-81); this is training-pipeline surface the brief
  * layers on top.
  */
object Sharding {

  val NumShards = 8

  /** Per-document shard assignment: doc_id, n_tokens, shard. */
  def shardPlan(spark: SparkSession, dir: String, shards: Int = NumShards): DataFrame = {
    import spark.implicits._
    val toks = filter(split($"text", "\\s+"), t => t =!= "")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"n_tokens".desc, $"doc_id")
    val pos = (row_number().over(w) - 1) % (2 * shards)
    Tables.documents(spark, dir)
      .select($"doc_id", size(toks).cast("long").as("n_tokens"))
      .withColumn("shard",
        when(pos < shards, pos).otherwise(lit(2 * shards - 1) - pos)
          .cast("int"))
      .orderBy($"doc_id")
  }

  val shardPlanSql: String =
    s"""WITH d AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
      |      AS BIGINT) AS n_tokens
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, n_tokens,
      |    (row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1)
      |      % ${2 * NumShards} AS pos
      |  FROM d)
      |SELECT doc_id, n_tokens,
      |  CAST(CASE WHEN pos < $NumShards THEN pos
      |       ELSE ${2 * NumShards - 1} - pos END AS INT) AS shard
      |FROM r ORDER BY doc_id""".stripMargin

  /** Per-shard balance sheet over [[shardPlan]]: docs, token mass, the
    * micro-unit share of total, and the shard's deviation from perfect
    * balance in micro-units of the ideal share (the number a pipeline
    * alarms on). S rows; the only work beyond the plan is one S-row
    * aggregate. */
  def shardBalance(spark: SparkSession, dir: String, shards: Int = NumShards): DataFrame = {
    import spark.implicits._
    val per = shardPlan(spark, dir, shards)
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("tokens"))
    val tot = per.agg(sum($"tokens").as("total_tokens"))
    per.crossJoin(broadcast(tot))
      .select($"shard", $"n_docs", $"tokens",
        ((($"tokens" * 1000000L) - (($"tokens" * 1000000L) % $"total_tokens"))
          / $"total_tokens").cast("long").as("share_micro"),
        // deviation vs the ideal share 1/S, in micro-units (signed;
        // dividend ≥ 0 so % ≡ pmod and truncation = floor in both
        // engines — long-safe to ~10¹² tokens/shard at S=8)
        (((($"tokens" * lit(shards.toLong) * 1000000L)
          - (($"tokens" * lit(shards.toLong) * 1000000L) % $"total_tokens"))
          / $"total_tokens").cast("long") - 1000000L).as("dev_micro"))
      .orderBy($"shard")
  }

  val shardBalanceSql: String =
    s"""WITH d AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
      |      AS BIGINT) AS n_tokens
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, n_tokens,
      |    (row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1)
      |      % ${2 * NumShards} AS pos
      |  FROM d),
      |a AS (
      |  SELECT doc_id, n_tokens,
      |    CASE WHEN pos < $NumShards THEN pos
      |         ELSE ${2 * NumShards - 1} - pos END AS shard
      |  FROM r),
      |per AS (
      |  SELECT shard, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tokens
      |  FROM a GROUP BY shard),
      |t AS (SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens FROM per)
      |SELECT CAST(shard AS INT) AS shard, n_docs, tokens,
      |  (tokens * 1000000 - (tokens * 1000000) % total_tokens) // total_tokens
      |    AS share_micro,
      |  (tokens * $NumShards * 1000000
      |    - (tokens * $NumShards * 1000000) % total_tokens) // total_tokens
      |    - 1000000 AS dev_micro
      |FROM per CROSS JOIN t ORDER BY shard""".stripMargin
}
