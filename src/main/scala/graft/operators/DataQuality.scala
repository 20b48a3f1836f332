package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Declarative data-quality gate: referential integrity, uniqueness,
  * null, and range checks across the warehouse tables, emitted as one
  * violations report — the admission check a pipeline runs on every new
  * data drop before it joins the corpus.
  *
  * Scale: each check is either a single-pass aggregate over its table
  * (null/range/uniqueness — map-side partials, one number out) or an
  * anti-join against a dimension key set (FK checks — the dimension key
  * column broadcasts when it fits, and the anti-join output is COUNTED,
  * never materialized). All checks over the same table share its scan;
  * the report is |checks| rows at any input size.
  */
object DataQuality {

  def dqReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // plant one corrupt order (dup key, dangling custkey, non-positive
    // price) so the report's counting paths are exercised — the clean
    // testdata would otherwise make every check trivially zero
    val orders = Tables.orders(spark, dir).unionByName(
      Tables.orders(spark, dir).orderBy($"o_orderkey").limit(1)
        .select($"o_orderkey", lit(99999999L).as("o_custkey"),
          $"o_orderstatus", lit(-1.0).as("o_totalprice"),
          $"o_orderdate", $"o_orderpriority"))
    val lineitem = Tables.lineitem(spark, dir)
    val customer = Tables.customer(spark, dir)
    val events = Tables.events(spark, dir)
    val documents = Tables.documents(spark, dir)

    def one(name: String, violations: DataFrame): DataFrame =
      violations.select(lit(name).as("check"),
        coalesce(first($"v"), lit(0L)).cast("long").as("violations"))

    // single-pass aggregate checks (shared scan per table)
    val ordersAgg = orders.agg(
      sum(when($"o_totalprice" <= 0, 1L).otherwise(0L)).as("price_nonpos"),
      sum(when($"o_custkey".isNull, 1L).otherwise(0L)).as("custkey_null"),
      (count(lit(1)) - countDistinct($"o_orderkey")).as("orderkey_dup"))
    val lineitemAgg = lineitem.agg(
      sum(when($"l_quantity" < 1 || $"l_quantity" > 50, 1L).otherwise(0L)).as("qty_range"),
      sum(when($"l_shipdate".isNull, 1L).otherwise(0L)).as("shipdate_null"))
    val eventsAgg = events.agg(
      sum(when($"ts".isNull, 1L).otherwise(0L)).as("ts_null"),
      (count(lit(1)) - countDistinct($"event_id")).as("event_id_dup"))
    val docsAgg = documents.agg(
      sum(when(length($"text") === 0 || $"text".isNull, 1L).otherwise(0L)).as("text_empty"),
      sum(when($"n_chars" =!= length($"text"), 1L).otherwise(0L)).as("nchars_drift"))

    // FK checks: count of fact rows whose key misses the dimension
    val custKeys = customer.select($"c_custkey").distinct()
    val orderKeys = orders.select($"o_orderkey").distinct()
    // custKeys is customer-cardinality (scales with SF) — AQE sizes the join.
    val fkOrdersCust = orders.join(custKeys,
        $"o_custkey" === $"c_custkey", "left_anti")
      .agg(count(lit(1)).as("v"))
    val fkLineOrders = lineitem.join(orderKeys,
        $"l_orderkey" === $"o_orderkey", "left_anti")
      .agg(count(lit(1)).as("v"))

    // each table's agg emits ALL its check rows from ONE reference
    // (explode of (check, violations) structs) — a union of separate
    // per-check selects re-plans and RE-SCANS the table once per
    // branch, which the sf1 probe measured as ~4 redundant fact scans
    def rows(agg: DataFrame, checks: (String, String)*): DataFrame =
      agg.select(explode(array(checks.map { case (name, c) =>
        struct(lit(name).as("check"), col(c).cast("long").as("violations"))
      }: _*)).as("r")).select($"r.check", $"r.violations")

    one("fk_lineitem_orderkey", fkLineOrders)
      .unionByName(one("fk_orders_custkey", fkOrdersCust))
      .unionByName(rows(ordersAgg,
        "orders_orderkey_unique" -> "orderkey_dup",
        "orders_custkey_notnull" -> "custkey_null",
        "orders_totalprice_positive" -> "price_nonpos"))
      .unionByName(rows(lineitemAgg,
        "lineitem_quantity_range" -> "qty_range",
        "lineitem_shipdate_notnull" -> "shipdate_null"))
      .unionByName(rows(eventsAgg,
        "events_ts_notnull" -> "ts_null",
        "events_event_id_unique" -> "event_id_dup"))
      .unionByName(rows(docsAgg,
        "documents_text_nonempty" -> "text_empty",
        "documents_nchars_consistent" -> "nchars_drift"))
      .withColumn("pass", ($"violations" === 0L).cast("boolean"))
      .orderBy($"check")
  }

  val dqReportSql: String =
    """WITH orders_x AS (
      |  SELECT * FROM orders
      |  UNION ALL
      |  (SELECT o_orderkey, 99999999 AS o_custkey, o_orderstatus,
      |     -1.0 AS o_totalprice, o_orderdate, o_orderpriority
      |   FROM orders ORDER BY o_orderkey LIMIT 1)),
      |checks AS (
      |  SELECT 'fk_lineitem_orderkey' AS "check", (
      |    SELECT count(*) FROM lineitem l
      |    WHERE NOT EXISTS (SELECT 1 FROM orders_x o WHERE o.o_orderkey = l.l_orderkey)
      |  ) AS violations
      |  UNION ALL SELECT 'fk_orders_custkey', (
      |    SELECT count(*) FROM orders_x o
      |    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |  UNION ALL SELECT 'orders_orderkey_unique',
      |    (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders_x)
      |  UNION ALL SELECT 'orders_custkey_notnull',
      |    (SELECT count(*) FILTER (WHERE o_custkey IS NULL) FROM orders_x)
      |  UNION ALL SELECT 'orders_totalprice_positive',
      |    (SELECT count(*) FILTER (WHERE o_totalprice <= 0) FROM orders_x)
      |  UNION ALL SELECT 'lineitem_quantity_range',
      |    (SELECT count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) FROM lineitem)
      |  UNION ALL SELECT 'lineitem_shipdate_notnull',
      |    (SELECT count(*) FILTER (WHERE l_shipdate IS NULL) FROM lineitem)
      |  UNION ALL SELECT 'events_ts_notnull',
      |    (SELECT count(*) FILTER (WHERE ts IS NULL) FROM events)
      |  UNION ALL SELECT 'events_event_id_unique',
      |    (SELECT count(*) - count(DISTINCT event_id) FROM events)
      |  UNION ALL SELECT 'documents_text_nonempty',
      |    (SELECT count(*) FILTER (WHERE text IS NULL OR length(text) = 0) FROM documents)
      |  UNION ALL SELECT 'documents_nchars_consistent',
      |    (SELECT count(*) FILTER (WHERE n_chars <> length(text)) FROM documents))
      |SELECT "check", CAST(violations AS BIGINT) AS violations,
      |  violations = 0 AS pass
      |FROM checks ORDER BY "check"""".stripMargin

  /** Benford first-digit audit on order totals — the classic fraud /
    * synthetic-data smoke test: does the leading significant digit of
    * a money column follow log10(1+1/d)? Emits the observed count,
    * expected fraction, and chi-square contribution per digit (the
    * total chi² is the column sum; a per-digit breakdown localizes
    * WHICH digits deviate, which a single statistic can't).
    *
    * Engine-exactness: the leading digit comes from integer-cents
    * string formatting (cast(round(price·100) as bigint) → first char
    * — no log10/floor boundary rounding at powers of ten); expected
    * fractions are shared 9dp literals; each chi² term is one
    * fixed-order double expression over exact integers, rounded 6dp.
    *
    * Scale: one 9-bucket map-side partial agg over the orders scan —
    * the report is 9 rows at any input size, nothing else shuffles.
    */
  def benfordTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // log10(1 + 1/d) to 9dp, shared verbatim with the oracle; digits
    // outside 1-9 (a '-' sign or '0' leading char from pathological
    // inputs) get an explicit 0.0 in BOTH engines — the oracle's CASE
    // now carries a WHEN 9 branch plus ELSE 0.0 to match this fold's
    // otherwise-0.0 default, instead of silently folding strays into
    // the digit-9 fraction
    val p = Seq(0.301029996d, 0.176091259d, 0.124938737d, 0.096910013d,
      0.079181246d, 0.066946790d, 0.057991947d, 0.051152522d, 0.045757491d)
    val pExpr = p.zipWithIndex.foldLeft(lit(0.0d)) { case (acc, (f, i)) =>
      when($"digit" === (i + 1), lit(f)).otherwise(acc)
    }
    val counts = Tables.orders(spark, dir)
      .select(substring(round($"o_totalprice" * 100, 0).cast("long")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("observed"))
    val tot = counts.agg(sum($"observed").as("n"))
    counts.crossJoin(broadcast(tot))
      .withColumn("expected_frac", pExpr)
      .select($"digit", $"observed", $"n".cast("long").as("n"),
        $"expected_frac",
        round(($"observed".cast("double") - $"n".cast("double") * $"expected_frac")
          * ($"observed".cast("double") - $"n".cast("double") * $"expected_frac")
          / ($"n".cast("double") * $"expected_frac"), 6).as("chi2_term"))
      .orderBy($"digit")
  }

  val benfordTestSql: String =
    """WITH d AS (
      |  SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
      |    AS VARCHAR), 1, 1) AS INT) AS digit
      |  FROM orders),
      |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS observed FROM d GROUP BY digit),
      |t AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM c),
      |e AS (
      |  SELECT digit, observed, n,
      |    CASE digit WHEN 1 THEN 0.301029996 WHEN 2 THEN 0.176091259
      |      WHEN 3 THEN 0.124938737 WHEN 4 THEN 0.096910013
      |      WHEN 5 THEN 0.079181246 WHEN 6 THEN 0.066946790
      |      WHEN 7 THEN 0.057991947 WHEN 8 THEN 0.051152522
      |      WHEN 9 THEN 0.045757491
      |      ELSE 0.0 END AS expected_frac
      |  FROM c CROSS JOIN t)
      |SELECT digit, observed, n, expected_frac,
      |  round((CAST(observed AS DOUBLE) - CAST(n AS DOUBLE) * expected_frac)
      |    * (CAST(observed AS DOUBLE) - CAST(n AS DOUBLE) * expected_frac)
      |    / (CAST(n AS DOUBLE) * expected_frac), 6) AS chi2_term
      |FROM e ORDER BY digit""".stripMargin

  /** Dimension-coverage audit — the inverse of [[dqReport]]'s orphan
    * FK checks: for each dimension → fact relationship, how much of
    * the dimension is actually REFERENCED (dead customers, never-
    * ordered parts, idle suppliers). Dead dimension mass is a storage
    * and broadcast-size tax at 100 TB, and a sudden coverage drop is
    * the classic symptom of a broken upstream join key.
    *
    * Scale: each relationship is one distinct-key projection of the
    * fact scan (map-side partial distinct on the key column — the fact
    * table collapses to key cardinality before its exchange) left-anti
    * joined into a dimension-cardinality count. Four independent
    * relationships, four reduced joins; the report is 4 rows.
    */
  def fkCoverage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def cover(rel: String, dim: DataFrame, dimKey: String,
              fact: DataFrame, factKey: String): DataFrame = {
      val refKeys = fact.select(col(factKey).as("k")).distinct()
      val total = dim.agg(count(lit(1)).as("dim_rows"))
      val dead = dim.join(refKeys, col(dimKey) === $"k", "left_anti")
        .agg(count(lit(1)).as("v"))
      total.crossJoin(dead)
        .select(lit(rel).as("relationship"),
          $"dim_rows".cast("long").as("dim_rows"),
          coalesce($"v", lit(0L)).cast("long").as("unreferenced"),
          round(($"dim_rows" - coalesce($"v", lit(0L))).cast("double")
            / $"dim_rows".cast("double"), 6).as("coverage"))
    }
    cover("customer->orders", Tables.customer(spark, dir), "c_custkey",
        Tables.orders(spark, dir), "o_custkey")
      .unionByName(cover("part->lineitem", Tables.part(spark, dir), "p_partkey",
        Tables.lineitem(spark, dir), "l_partkey"))
      .unionByName(cover("supplier->lineitem", Tables.supplier(spark, dir),
        "s_suppkey", Tables.lineitem(spark, dir), "l_suppkey"))
      .unionByName(cover("orders->lineitem", Tables.orders(spark, dir),
        "o_orderkey", Tables.lineitem(spark, dir), "l_orderkey"))
      .orderBy($"relationship")
  }

  val fkCoverageSql: String =
    """WITH rels AS (
      |  SELECT 'customer->orders' AS relationship,
      |    (SELECT count(*) FROM customer) AS dim_rows,
      |    (SELECT count(*) FROM customer c WHERE NOT EXISTS
      |      (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))
      |      AS unreferenced
      |  UNION ALL SELECT 'part->lineitem',
      |    (SELECT count(*) FROM part),
      |    (SELECT count(*) FROM part p WHERE NOT EXISTS
      |      (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey))
      |  UNION ALL SELECT 'supplier->lineitem',
      |    (SELECT count(*) FROM supplier),
      |    (SELECT count(*) FROM supplier s WHERE NOT EXISTS
      |      (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey))
      |  UNION ALL SELECT 'orders->lineitem',
      |    (SELECT count(*) FROM orders),
      |    (SELECT count(*) FROM orders o WHERE NOT EXISTS
      |      (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)))
      |SELECT relationship, CAST(dim_rows AS BIGINT) AS dim_rows,
      |  CAST(unreferenced AS BIGINT) AS unreferenced,
      |  round(CAST(dim_rows - unreferenced AS DOUBLE)
      |    / CAST(dim_rows AS DOUBLE), 6) AS coverage
      |FROM rels ORDER BY relationship""".stripMargin

  // ------------------------------------------------------------------
  // k_anonymity — re-identification audit over quasi-identifiers
  // ------------------------------------------------------------------

  /** Minimum class size before a row counts as protected. Standard
    * privacy-audit convention (HIPAA-style small-cell suppression uses
    * 10-20; k=10 is the common reporting floor). */
  private val KThreshold = 10L

  /** k-anonymity / l-diversity audit of the customer table before it
    * may be released or joined into training data: rows sharing a
    * quasi-identifier tuple (nation, market segment — the attributes an
    * adversary can link from public context) form an equivalence class;
    * k-anonymity is the SMALLEST class size, and per-class l-diversity
    * counts distinct sensitive values (account balance in $1000 bands)
    * — a class can be large yet still leak if every member shares one
    * sensitive value. One row per class: size, l, the k<10 risk flag,
    * plus the corpus-level readout (global k, share of rows in risky
    * classes) carried on every row so the report is self-contained.
    *
    * Exactness: counts and the micro-unit risk share are integers;
    * balance bands are pmod floor division on exact cents (both
    * engines' `%` has C semantics, so the shared (x−pmod)/d formula is
    * identical — the Training.fdiv convention).
    *
    * Scale: one customer scan → QI-keyed partial aggregate whose
    * output is GRID-cardinality (|nations|·|segments| ≤ 125 classes,
    * bounded by the attribute domains, not rows); the global stats
    * re-aggregate the class table and broadcast back. The sensitive
    * dimension rides the same pass as a distinct-count on band — no
    * second scan, no corpus-cardinality shuffle (the groupBy exchange
    * carries pre-combined class partials). */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = round($"c_acctbal" * 100, 0).cast("long")
    val band = ((cents - ((cents % 100000L + 100000L) % 100000L)) / 100000L)
      .cast("long")
    val classes = Tables.customer(spark, dir)
      .groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("class_size"),
        countDistinct(band).as("l_diversity"))
    val global = classes.agg(
      min($"class_size").as("k_anonymity"),
      sum($"class_size").as("total_rows"),
      sum(when($"class_size" < KThreshold, $"class_size").otherwise(0L))
        .as("risky_rows"))
    classes.crossJoin(broadcast(global))
      .select($"c_nationkey", $"c_mktsegment",
        $"class_size", $"l_diversity".cast("int").as("l_diversity"),
        ($"class_size" < KThreshold).as("is_risky"),
        $"k_anonymity",
        (($"risky_rows" * 1000000L - (($"risky_rows" * 1000000L % $"total_rows"
          + $"total_rows") % $"total_rows")) / $"total_rows").cast("long")
          .as("risky_share_micro"))
      .orderBy($"c_nationkey", $"c_mktsegment")
  }

  val kAnonymitySql: String =
    """WITH classes AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(count(*) AS BIGINT) AS class_size,
      |    CAST(count(DISTINCT
      |      CAST((b - ((b % 100000 + 100000) % 100000)) / 100000 AS BIGINT))
      |      AS INT) AS l_diversity
      |  FROM (SELECT *, CAST(round(c_acctbal * 100, 0) AS BIGINT) AS b
      |        FROM customer)
      |  GROUP BY c_nationkey, c_mktsegment),
      |g AS (
      |  SELECT min(class_size) AS k_anonymity,
      |    sum(class_size) AS total_rows,
      |    sum(CASE WHEN class_size < 10 THEN class_size ELSE 0 END) AS risky_rows
      |  FROM classes)
      |SELECT c_nationkey, c_mktsegment, class_size, l_diversity,
      |  class_size < 10 AS is_risky,
      |  CAST(k_anonymity AS BIGINT) AS k_anonymity,
      |  CAST((risky_rows * 1000000 - ((risky_rows * 1000000 % total_rows
      |    + total_rows) % total_rows)) / total_rows AS BIGINT)
      |    AS risky_share_micro
      |FROM classes CROSS JOIN g
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin

  // ------------------------------------------------------------------
  // dp_release — ε-DP noisy counts with deterministic seeded noise
  // ------------------------------------------------------------------

  /** Differentially-private release of the [[kAnonymity]] class counts
    * (the Laplace mechanism, ε = 1, sensitivity 1 for counting
    * queries) — the privacy-preserving aggregate a pipeline publishes
    * when even suppressed small cells leak. The twist that makes it
    * oracle-checkable AND reproducible across engines: the Laplace
    * draw is DETERMINISTIC, seeded by the class key — first 12 md5
    * hex chars → integer h < 16¹², u = (h+0.5)/16¹² (exact: a 48-bit
    * integer over a power of two, both representable in doubles), then
    * the inverse CDF noise = −sign(u−½)·ln(1−2|u−½|)/ε. Deterministic
    * seeding is standard practice for replayable DP pipelines (the
    * seed must be secret in production — documented, not a secrecy
    * claim here). The ln argument is an exact dyadic rational, and the
    * ln output is micro-quantized (the pmi idiom), so the released
    * micro counts are exact integers in both engines.
    *
    * Scale: the QI aggregate is the only corpus pass
    * (grid-cardinality out); noise is a per-row codegen'd map on the
    * class table. */
  def dpRelease(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val classes = Tables.customer(spark, dir)
      .groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("true_count"))
    val h = conv(substring(md5(concat($"c_nationkey".cast("string"),
      lit(":"), $"c_mktsegment")), 1, 12), 16, 10).cast("long")
    val u = (h.cast("double") + 0.5) / lit(4096.0 * 4096 * 4096 * 4096)
    val a = lit(1.0) - lit(2.0) * abs(u - lit(0.5)) // exact dyadic
    val lnMicro = round(log(a) * 1e6, 0).cast("long")
    val noiseMicro = when(u >= 0.5, -lnMicro).otherwise(lnMicro)
    classes
      .withColumn("noise_micro", noiseMicro)
      .select($"c_nationkey", $"c_mktsegment",
        $"true_count",
        $"noise_micro",
        ($"true_count" * 1000000L + $"noise_micro").as("released_micro"),
        round(($"true_count" * 1000000L + $"noise_micro").cast("double") / 1e6, 6)
          .as("released"),
        lit(1.0).as("epsilon"))
      .orderBy($"c_nationkey", $"c_mktsegment")
  }

  val dpReleaseSql: String =
    """WITH classes AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(count(*) AS BIGINT) AS true_count
      |  FROM customer GROUP BY c_nationkey, c_mktsegment),
      |seeded AS (
      |  SELECT *,
      |    list_reduce(list_transform(
      |      split(substr(md5(CAST(c_nationkey AS VARCHAR) || ':' || c_mktsegment), 1, 12), ''),
      |      c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)),
      |      (a, c) -> a * 16 + c) AS h
      |  FROM classes),
      |noise AS (
      |  SELECT *,
      |    (CAST(h AS DOUBLE) + 0.5) / 281474976710656.0 AS u,
      |    CAST(round(ln(1.0 - 2.0 * abs(u - 0.5)) * 1e6, 0) AS BIGINT) AS ln_micro,
      |    CASE WHEN u >= 0.5 THEN -ln_micro ELSE ln_micro END AS noise_micro
      |  FROM seeded)
      |SELECT c_nationkey, c_mktsegment, true_count, noise_micro,
      |  true_count * 1000000 + noise_micro AS released_micro,
      |  round(CAST(true_count * 1000000 + noise_micro AS DOUBLE) / 1e6, 6) AS released,
      |  1.0 AS epsilon
      |FROM noise ORDER BY c_nationkey, c_mktsegment""".stripMargin

  // ------------------------------------------------------------------
  // dp_topk — ε-DP top-k selection via the one-shot Gumbel mechanism
  // ------------------------------------------------------------------

  private val DpTopK = 10

  /** ε-DP top-k category selection over part-brand frequencies by the
    * ONE-SHOT GUMBEL trick (Durfee & Rogers 2019): adding independent
    * Gumbel(2k/ε) noise to every utility and taking the k largest is
    * exactly k sequential exponential-mechanism draws — one pass, no
    * iterative re-weighting. The selection twin of [[dpRelease]]
    * (which privatizes COUNTS; this privatizes WHICH items are
    * reported — the "top brands / top domains we may publish" query).
    * The audit ships each winner's true rank, so the utility loss of
    * the mechanism (rank inversions) is visible, not theoretical.
    *
    * Exactness: the Gumbel draw is deterministic and replayable — a
    * 48-bit md5 uniform (the [[dpRelease]] seeding discipline,
    * documented as needing a secret seed in production), the
    * −ln(−ln u) tree quantized ONCE to the micro grid, and an integer
    * score sum; ranking ties break on brand.
    *
    * Scale: one grid-cardinality aggregate over part (|brands| rows),
    * then per-row codegen'd noise and a ≤ |brands| sort. Nothing
    * beyond the first agg is corpus-cardinality.
    */
  def dpTopk(spark: SparkSession, dir: String, k: Int = DpTopK,
             epsilon: Double = 1.0): DataFrame = {
    import spark.implicits._
    val scale = 2.0 * k / epsilon
    val counts = Tables.part(spark, dir)
      .groupBy($"p_brand").agg(count(lit(1)).as("true_count"))
    val h = conv(substring(md5(concat(lit("dpk:"), $"p_brand")), 1, 12), 16, 10)
      .cast("long")
    val u = (h.cast("double") + 0.5) / lit(4096.0 * 4096 * 4096 * 4096)
    val noiseMicro = round(-log(-log(u)) * lit(scale) * 1e6, 0).cast("long")
    val wTrue = org.apache.spark.sql.expressions.Window
      .orderBy($"true_count".desc, $"p_brand")
    val wNoisy = org.apache.spark.sql.expressions.Window
      .orderBy($"score_micro".desc, $"p_brand")
    counts
      .withColumn("true_rank", row_number().over(wTrue))
      .withColumn("noise_micro", noiseMicro)
      .withColumn("score_micro", $"true_count" * 1000000L + $"noise_micro")
      .withColumn("rank", row_number().over(wNoisy))
      .filter($"rank" <= k)
      .select($"rank", $"p_brand", $"true_count", $"true_rank",
        $"noise_micro", $"score_micro", lit(epsilon).as("epsilon"))
      .orderBy($"rank")
  }

  val dpTopkSql: String =
    s"""WITH counts AS (
      |  SELECT p_brand, CAST(count(*) AS BIGINT) AS true_count
      |  FROM part GROUP BY 1),
      |seeded AS (
      |  SELECT *,
      |    CAST(('0x' || substr(md5('dpk:' || p_brand), 1, 12)) AS BIGINT) AS h,
      |    row_number() OVER (ORDER BY true_count DESC, p_brand) AS true_rank
      |  FROM counts),
      |noise AS (
      |  SELECT *,
      |    CAST(round(-ln(-ln((CAST(h AS DOUBLE) + 0.5) / 281474976710656.0))
      |      * 20.0 * 1e6, 0) AS BIGINT) AS noise_micro
      |  FROM seeded),
      |scored AS (
      |  SELECT *, true_count * 1000000 + noise_micro AS score_micro
      |  FROM noise)
      |SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, p_brand)
      |    AS INT) AS rank,
      |  p_brand, true_count, CAST(true_rank AS INT) AS true_rank,
      |  noise_micro, score_micro, 1.0 AS epsilon
      |FROM scored
      |QUALIFY rank <= $DpTopK
      |ORDER BY rank""".stripMargin
}
