package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  test("csv sink/source round-trip preserves rows and values") {
    val out = tmp("graft_csv")
    val src = sources.Tables.customer(spark, sf)
    src.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true").schema(src.schema).csv(out)
    assert(back.count() == src.count())
    val a = src.agg(sum($"c_acctbal".cast("decimal(18,4)"))).first().getDecimal(0)
    val b = back.agg(sum($"c_acctbal".cast("decimal(18,4)"))).first().getDecimal(0)
    assert(a == b)
  }

  test("json sink/source round-trip preserves rows and values") {
    val out = tmp("graft_json")
    val src = sources.Tables.orders(spark, sf)
    src.write.mode("overwrite").json(out)
    val back = spark.read.schema(src.schema).json(out)
    assert(back.count() == src.count())
    val a = src.agg(max($"o_totalprice")).first().getDouble(0)
    val b = back.agg(max($"o_totalprice")).first().getDouble(0)
    assert(a == b)
  }

  test("salted join is row-identical to the plain join") {
    val userOrders = sources.Tables.orders(spark, sf)
      .groupBy($"o_custkey".as("user_id")).agg(count(lit(1)).as("n_orders"))
    val plain = sources.Tables.events(spark, sf)
      .join(userOrders, "user_id")
      .select($"user_id", $"event_id", $"n_orders")
    val salted = Skew.saltedJoin(sources.Tables.events(spark, sf), $"event_id",
        userOrders, "user_id", 8)
      .select($"user_id", $"event_id", $"n_orders")
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("salted sum equals plain aggregation") {
    val plain = sources.Tables.events(spark, sf)
      .groupBy($"event_type").agg(sum($"value".cast("decimal(18,4)")).as("t"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val salted = Skew.saltedSum(sources.Tables.events(spark, sf),
        "event_type", $"event_id", $"value".cast("decimal(18,4)"), 16)
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(plain == salted)
  }
}
