package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("every registered query runs and has stable column names") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.columns.forall(c => !c.contains("(")),
        s"$name has unaliased computed column: ${df.columns.mkString(",")}")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("q1 aggregates match a hand check") {
    import spark.implicits._
    val li = sources.Tables.lineitem(spark, sf)
      .filter($"l_shipdate" <= lit("1998-09-02"))
    val expected = li.groupBy($"l_returnflag", $"l_linestatus").count().count()
    assert(operators.Relational.q1PricingSummary(spark, sf).count() == expected)
    val total = operators.Relational.q1PricingSummary(spark, sf)
      .agg(sum($"count_order")).first().getLong(0)
    assert(total == li.count())
  }

  test("entry() smoke: >0 rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}
