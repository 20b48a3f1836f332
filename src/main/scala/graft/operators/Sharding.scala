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

  // ------------------------------------------------------------------
  // shard_mix_audit — did the shuffle actually mix the sources?
  // ------------------------------------------------------------------

  private val MixShards = 16
  private val Ln2Micro = 693147L

  /** Source-mix audit of a sharded corpus: per md5-hash shard, the
    * Jensen–Shannon divergence between the shard's source distribution
    * and the GLOBAL one — the "did my shuffle actually mix" check run
    * after `global_shuffle`/`shard_plan` before training reads shards
    * sequentially (a shard whose JSD spikes feeds the model a source
    * burst; hash sharding should keep every shard's JSD near 0). The
    * per-shard twin of [[graft.operators.TextModel.sourceJsdMatrix]]'s
    * pairwise matrix.
    *
    * Exactness: the source_jsd_matrix integer idiom — nano-integer
    * probabilities per side, micro-ln log ratios over identical
    * integer-built doubles, the shared 693147 ln 2 literal for
    * one-sided mass (a source absent from a shard contributes q·ln 2
    * exactly); all sums exact longs, one display division. Scale: ONE
    * (shard, source) count aggregate; the JSD runs on the
    * |shards|×|sources| grid with the global side broadcast.
    */
  def shardMixAudit(spark: SparkSession, dir: String,
                    shards: Int = MixShards): DataFrame = {
    import spark.implicits._
    val assigned = Tables.documents(spark, dir)
      .select($"source", expr(
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)" +
          s" AS BIGINT) % $shards").as("shard"))
    val cells = assigned.groupBy($"shard", $"source")
      .agg(count(lit(1)).as("n"))
    val shardTot = cells.groupBy($"shard").agg(sum($"n").as("ns"))
    val global = cells.groupBy($"source").agg(sum($"n").as("ng"))
    val tot = global.agg(sum($"ng").as("nt"))
    // full shard×source grid so absent sources contribute their q·ln2
    val grid = shardTot.crossJoin(
        broadcast(global.crossJoin(tot)
          .select($"source",
            expr("CAST((CAST(ng AS DECIMAL(38,0)) * 1000000000 - " +
              "((CAST(ng AS DECIMAL(38,0)) * 1000000000) % nt)) / nt AS BIGINT)")
              .as("q"))))
      .join(cells, Seq("shard", "source"), "left")
      .select($"shard", $"ns", $"q",
        expr("CAST((CAST(coalesce(n, 0) AS DECIMAL(38,0)) * 1000000000 - " +
          "((CAST(coalesce(n, 0) AS DECIMAL(38,0)) * 1000000000) % ns)) / ns" +
          " AS BIGINT)").as("p"))
    grid
      .withColumn("la", when($"p" > 0L,
        round(log(lit(2.0) * $"p".cast("double")
          / ($"p" + $"q").cast("double")) * 1e6, 0).cast("long"))
        .otherwise(lit(0L)))
      .withColumn("lb", when($"p" > 0L && $"q" > 0L,
        round(log(lit(2.0) * $"q".cast("double")
          / ($"p" + $"q").cast("double")) * 1e6, 0).cast("long"))
        .when($"p" === 0L, lit(Ln2Micro)).otherwise(lit(0L)))
      .groupBy($"shard")
      .agg(max($"ns").as("n_docs"),
        sum(expr("(p * la - ((p * la) % 1000000 + 1000000) % 1000000) div 1000000")
          + expr("(q * lb - ((q * lb) % 1000000 + 1000000) % 1000000) div 1000000"))
          .as("s"))
      .select($"shard", $"n_docs",
        round($"s".cast("double") / 2e9, 6).as("jsd_nats"))
      .orderBy($"shard")
  }

  val shardMixAuditSql: String =
    s"""WITH a AS (
      |  SELECT source,
      |    list_reduce(list_transform(
      |      split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), ''),
      |      c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)),
      |      (x, c) -> x * 16 + c) % $MixShards AS shard
      |  FROM documents),
      |cells AS (
      |  SELECT shard, source, CAST(count(*) AS BIGINT) AS n
      |  FROM a GROUP BY 1, 2),
      |st AS (SELECT shard, CAST(sum(n) AS BIGINT) AS ns FROM cells GROUP BY 1),
      |g AS (SELECT source, CAST(sum(n) AS BIGINT) AS ng FROM cells GROUP BY 1),
      |t AS (SELECT CAST(sum(ng) AS BIGINT) AS nt FROM g),
      |grid AS (
      |  SELECT s.shard, s.ns,
      |    CAST(CAST(g.ng AS HUGEINT) * 1000000000 // t.nt AS BIGINT) AS q,
      |    CAST(CAST(coalesce(c.n, 0) AS HUGEINT) * 1000000000 // s.ns AS BIGINT)
      |      AS p
      |  FROM st s CROSS JOIN g CROSS JOIN t
      |  LEFT JOIN cells c ON c.shard = s.shard AND c.source = g.source),
      |terms AS (
      |  SELECT shard, ns, p, q,
      |    CASE WHEN p > 0 THEN CAST(round(ln(2.0 * CAST(p AS DOUBLE)
      |      / CAST(p + q AS DOUBLE)) * 1e6, 0) AS BIGINT) ELSE 0 END AS la,
      |    CASE WHEN p > 0 AND q > 0 THEN CAST(round(ln(2.0 * CAST(q AS DOUBLE)
      |      / CAST(p + q AS DOUBLE)) * 1e6, 0) AS BIGINT)
      |      WHEN p = 0 THEN $Ln2Micro ELSE 0 END AS lb
      |  FROM grid)
      |SELECT shard, max(ns) AS n_docs,
      |  round(CAST(sum((p * la - ((p * la) % 1000000 + 1000000) % 1000000)
      |      // 1000000
      |    + (q * lb - ((q * lb) % 1000000 + 1000000) % 1000000) // 1000000)
      |    AS DOUBLE) / 2e9, 6) AS jsd_nats
      |FROM terms GROUP BY shard
      |ORDER BY shard""".stripMargin
}
