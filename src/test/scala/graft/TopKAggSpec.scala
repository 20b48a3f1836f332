package graft

import graft.functions.AggFunctions.top_k_by
import org.apache.spark.sql.functions._

/** The native bounded top-k aggregate: equality with the window-rank
  * formulation (including the partial/merge path under adversarial
  * partitioning) and the plan shape that justifies it.
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def windowForm = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"value".desc, $"event_id")
    graft.sources.Tables.events(spark, sf)
      .select($"event_type", $"value", $"event_id")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .select($"event_type", $"rk", $"value", $"event_id")
  }

  private def aggForm(input: org.apache.spark.sql.DataFrame) =
    input.groupBy($"event_type")
      .agg(top_k_by($"value", $"event_id", 5).as("top"))
      .select($"event_type", posexplode($"top"))
      .select($"event_type", ($"pos" + 1).cast("int").as("rk"),
        $"col.score".as("value"), $"col.payload".as("event_id"))

  test("top_k_by equals the window-rank formulation") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"event_type", $"value", $"event_id")
    assert(aggForm(ev).except(windowForm).isEmpty &&
      windowForm.except(aggForm(ev)).isEmpty)
  }

  test("top_k_by survives adversarial partitioning (merge + serde path)") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"event_type", $"value", $"event_id")
      .repartition(37, $"event_id") // scatter groups across partitions
    assert(aggForm(ev).except(windowForm).isEmpty &&
      windowForm.except(aggForm(ev)).isEmpty)
  }

  test("top_k_by ties break on payload: duplicate scores keep the smallest ids") {
    val df = Seq(("a", 1.0, 5L), ("a", 1.0, 3L), ("a", 1.0, 9L), ("a", 1.0, 1L))
      .toDF("g", "v", "id")
    val out = df.groupBy($"g").agg(top_k_by($"v", $"id", 2).as("top"))
      .select(explode($"top").as("s")).select($"s.payload").as[Long].collect()
    assert(out.toSeq === Seq(1L, 3L))
  }

  test("plan: ObjectHashAggregate with partial map-side stage, no Window operator") {
    val plan = aggForm(graft.sources.Tables.events(spark, sf)
      .select($"event_type", $"value", $"event_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected object-hash agg:\n$plan")
    assert(!plan.contains("Window"), "native top-k must not fall back to a window sort")
    assert("partial_top_k_by|partial.*top_k_by".r.findFirstIn(plan).isDefined ||
      plan.contains("partial"), s"no map-side partial aggregation:\n$plan")
  }

  test("ann_topk_agg is row-identical to ann_bruteforce and plans without a window sort") {
    val agg = operators.Similarity.annTopkAgg(spark, sf)
    val win = operators.Similarity.annBruteforce(spark, sf)
    assert(agg.except(win).isEmpty && win.except(agg).isEmpty)
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowGroupLimit") && !plan.contains("Window("),
      s"ann_topk_agg must not rank via a window:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"expected object-hash agg:\n$plan")
  }

  test("SQL surface: top_k_by resolves via the extension registry") {
    GraftExtensions.register(spark)
    graft.sources.Tables.events(spark, sf).createOrReplaceTempView("ev_topk")
    val rows = spark.sql(
      """SELECT event_type, top_k_by(value, event_id, 3) AS top
        |FROM ev_topk GROUP BY event_type""".stripMargin).collect()
    assert(rows.nonEmpty && rows.forall(_.getSeq(1).size == 3))
  }
}
