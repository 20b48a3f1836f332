package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Relational.dsum

/** Explicit bloom runtime-filter join — the pattern behind Spark's own
  * `InjectRuntimeFilter`, surfaced as an operator for plans where the
  * optimizer cannot infer it (filter thresholds, pre-computed dim
  * subsets, cross-query reuse of a built filter).
  *
  * Shape: a selective dimension predicate produces a small "hot" key
  * set; a bloom filter of those keys prunes the FACT scan map-side
  * (no shuffle, no false negatives) before the exact join settles the
  * false positives. The fact rows that never had a partner are dropped
  * at the scan instead of riding the join shuffle — at 100 TB with a
  * 1%-selective dimension predicate that is a ~99% shuffle-byte cut on
  * the fact side.
  *
  * Scale honesty on the driver collect: `might_contain` needs a
  * CONSTANT bloom, so the bitmap is collected and embedded as a binary
  * literal. The bitmap is sized from the MEASURED hot-key count but
  * hard-capped (items cap ⇒ bits cap ⇒ the collect is O(1), never
  * O(dimension)); past the cap the false-positive rate degrades
  * gracefully and the exact join remains the sole correctness
  * authority. Same doctrine as the dedup band-index bloom.
  */
object RuntimeFilter {

  /** Items cap for the embedded bloom (~1 MiB of bits at the default
    * FPP) — bounds driver traffic regardless of dimension scale.
    */
  val MaxBloomItems: Long = 1L << 20

  def bloomPruneJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hot = Tables.customer(spark, dir)
      .filter($"c_acctbal" > 9000.0)
      .select($"c_custkey", $"c_mktsegment")
    val nHot = math.max(hot.count(), 1L)
    val bloomBytes = hot
      .agg(graft.functions.BloomFunctions
        .bloom_agg($"c_custkey", math.min(nHot, MaxBloomItems)).as("bf"))
      .first().getAs[Array[Byte]]("bf")
    Tables.orders(spark, dir)
      .filter(graft.functions.BloomFunctions
        .bloom_might_contain(lit(bloomBytes), $"o_custkey"))
      .join(hot, $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("revenue"))
      .orderBy($"c_mktsegment")
  }

  /** The bloom is correctness-invisible (exact join settles it), so the
    * oracle is the plain selective join.
    */
  val bloomPruneJoinSql: String =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE c_acctbal > 9000
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ------------------------------------------------------------------
  // bloom_fp_audit — measured vs theoretical bloom false-positive rate
  // ------------------------------------------------------------------

  private val BloomBits = 65536 // m
  private val BloomHashes = 3 // k
  private val BloomProbes = 5000L

  /** Bloom-filter false-positive audit (Bloom 1970): build an
    * m = 65536-bit, k = 3 filter over the customer keys with
    * md5-derived bit positions, probe it with 5000 GUARANTEED
    * non-members (keys beyond max), and report the measured FP rate
    * next to the standard (1 − e^(−kn/m))^k estimate. The calibration
    * check behind [[bloomPruneJoin]]: before trusting a bloom
    * runtime filter's selectivity on a 100 TB probe side, measure the
    * filter's actual FP rate at the build side's cardinality — an
    * overloaded filter silently degrades pruning to a no-op.
    *
    * Exactness: bit positions are md5 hex (portable-hash discipline),
    * the bit set / probe semi-match / FP count are exact integers, and
    * the theory value is one fixed double tree (exp is 1-ulp in both
    * libms; the cube is written x·x·x, never pow). Hash-replayable.
    *
    * Scale: keys collapse in one distinct; the bit table is ≤ m rows
    * BY CONSTRUCTION regardless of corpus size; probes are a generated
    * 5000-row range. The probe-vs-bits join is (probes×k) against the
    * ≤ m-row bit set — model-sized both sides.
    */
  def bloomFpAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def bit(j: org.apache.spark.sql.Column, key: org.apache.spark.sql.Column) =
      (conv(substring(md5(concat(lit("bf"), j.cast("string"), lit(":"),
        key.cast("string"))), 1, 4), 16, 10).cast("long") % BloomBits).as("bit")
    val keys = Tables.customer(spark, dir).select($"c_custkey".as("k")).distinct()
    val js = spark.range(0, BloomHashes).select($"id".cast("int").as("j"))
    val bits = keys.crossJoin(broadcast(js))
      .select($"j", bit($"j", $"k")).distinct()
    val mx = keys.agg(max($"k")).first().getLong(0)
    val probes = spark.range(1, BloomProbes + 1)
      .select(($"id" + mx).as("p"))
    val hits = probes.crossJoin(broadcast(js))
      .select($"p", $"j", bit($"j", $"p"))
      .join(bits, Seq("j", "bit"), "left_semi")
      .groupBy($"p").agg(count(lit(1)).as("nhit"))
      .filter($"nhit" === BloomHashes)
      .agg(count(lit(1)).as("false_positives"))
    val nK = keys.agg(count(lit(1)).as("n_keys"))
    val nB = bits.agg(count(lit(1)).as("bits_set"))
    broadcast(nK).crossJoin(broadcast(nB)).crossJoin(broadcast(hits))
      .select($"n_keys", $"bits_set", lit(BloomProbes).as("n_probes"),
        $"false_positives",
        round($"false_positives".cast("double") / lit(BloomProbes.toDouble), 6)
          .as("fp_rate"),
        round({
          val p = lit(1.0) - exp((lit(-BloomHashes.toDouble) * $"n_keys".cast("double"))
            / lit(BloomBits.toDouble))
          p * p * p
        }, 6).as("fp_theory"))
  }

  val bloomFpAuditSql: String = {
    def b(j: Int, col: String): String = {
      val m = s"md5('bf$j:' || CAST($col AS VARCHAR))"
      s"""((instr('0123456789abcdef', substr($m, 1, 1)) * 4096
         | + instr('0123456789abcdef', substr($m, 2, 1)) * 256
         | + instr('0123456789abcdef', substr($m, 3, 1)) * 16
         | + instr('0123456789abcdef', substr($m, 4, 1)) - 4369) % $BloomBits)""".stripMargin
    }
    def caseOf(col: String): String =
      s"""CASE d.d WHEN 0 THEN ${b(0, col)} WHEN 1 THEN ${b(1, col)}
         |  ELSE ${b(2, col)} END""".stripMargin
    s"""WITH keys AS (SELECT DISTINCT c_custkey AS k FROM customer),
      |bits AS (
      |  SELECT DISTINCT d.d AS j, ${caseOf("k")} AS bit
      |  FROM keys CROSS JOIN (SELECT unnest(range(0, $BloomHashes)) AS d) d),
      |mx AS (SELECT max(k) AS mk FROM keys),
      |probes AS (
      |  SELECT mk + CAST(r AS BIGINT) AS p
      |  FROM mx, (SELECT unnest(range(1, ${BloomProbes + 1})) AS r)),
      |ph AS (
      |  SELECT p, d.d AS j, ${caseOf("p")} AS bit
      |  FROM probes CROSS JOIN (SELECT unnest(range(0, $BloomHashes)) AS d) d),
      |hits AS (
      |  SELECT ph.p, count(*) AS nhit
      |  FROM ph JOIN bits bt ON bt.j = ph.j AND bt.bit = ph.bit
      |  GROUP BY 1),
      |agg AS (
      |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM keys) AS n_keys,
      |    (SELECT CAST(count(*) AS BIGINT) FROM bits) AS bits_set,
      |    CAST($BloomProbes AS BIGINT) AS n_probes,
      |    (SELECT CAST(count(*) AS BIGINT) FROM hits
      |     WHERE nhit = $BloomHashes) AS false_positives)
      |SELECT n_keys, bits_set, n_probes, false_positives,
      |  round(CAST(false_positives AS DOUBLE) / ${BloomProbes.toDouble}, 6) AS fp_rate,
      |  round((1 - exp((-${BloomHashes.toDouble} * CAST(n_keys AS DOUBLE)) / ${BloomBits.toDouble}))
      |    * (1 - exp((-${BloomHashes.toDouble} * CAST(n_keys AS DOUBLE)) / ${BloomBits.toDouble}))
      |    * (1 - exp((-${BloomHashes.toDouble} * CAST(n_keys AS DOUBLE)) / ${BloomBits.toDouble})), 6)
      |    AS fp_theory
      |FROM agg""".stripMargin
  }
}
