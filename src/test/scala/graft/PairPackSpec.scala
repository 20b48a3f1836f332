package graft

import org.apache.spark.sql.functions._

/** Pins the r13 pair_pack kernel bit-identical to the posexplode +
  * slice pair generator it replaced in Graph.coPairCounts.
  */
class PairPackSpec extends SparkSpec {
  import spark.implicits._

  private def oldPairs(sets: org.apache.spark.sql.DataFrame) =
    sets.select(posexplode($"arr").as(Seq("i", "pa")), $"arr")
      .select($"pa", explode(expr("slice(arr, i + 2, size(arr))")).as("pb"))
      .groupBy($"pa", $"pb").agg(count(lit(1)).as("n_orders"))

  private def newPairs(sets: org.apache.spark.sql.DataFrame) =
    sets.select(explode(graft.functions.HashFunctions.pair_pack($"arr")).as("pp"))
      .groupBy($"pp").agg(count(lit(1)).as("n_orders"))
      .select(shiftright($"pp", 32).as("pa"),
        $"pp".bitwiseAND(lit(0xFFFFFFFFL)).as("pb"), $"n_orders")

  test("pair_pack == posexplode/slice pair generation over lineitem baskets") {
    val sets = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
      .groupBy($"ok").agg(sort_array(collect_set($"pk")).as("arr"))
    val a = newPairs(sets).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = oldPairs(sets).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a.nonEmpty)
    assert(a === b)
  }

  test("pair_pack edge cases: empty, singleton, and ordering") {
    val sets = Seq(
      (1L, Seq.empty[Long]),
      (2L, Seq(5L)),
      (3L, Seq(1L, 2L, 3L)),
      (4L, Seq(0L, 2147483647L))
    ).toDF("ok", "arr")
    val rows = newPairs(sets).orderBy($"pa", $"pb").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq((0L, 2147483647L, 1L),
      (1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  private def oldTriples(sets: org.apache.spark.sql.DataFrame) =
    sets.select(posexplode($"arr").as(Seq("i", "pa")), $"arr")
      .select($"pa", expr("slice(arr, i + 2, size(arr))").as("rest"))
      .select($"pa", posexplode($"rest").as(Seq("j", "pb")), $"rest")
      .select($"pa", $"pb", explode(expr("slice(rest, j + 2, size(rest))")).as("pc"))
      .groupBy($"pa", $"pb", $"pc").agg(count(lit(1)).as("n3"))

  private def newTriples(sets: org.apache.spark.sql.DataFrame) =
    sets.select(explode(graft.functions.HashFunctions.triple_pack($"arr")).as("t"))
      .groupBy($"t.pp".as("pp"), $"t.pc".as("pc")).agg(count(lit(1)).as("n3"))
      .select(shiftright($"pp", 32).as("pa"),
        $"pp".bitwiseAND(lit(0xFFFFFFFFL)).as("pb"), $"pc", $"n3")

  test("triple_pack == chained posexplode/slice triple generation over baskets") {
    val sets = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
      .groupBy($"ok").agg(sort_array(collect_set($"pk")).as("arr"))
    val a = newTriples(sets).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val b = oldTriples(sets).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(a.nonEmpty)
    assert(a === b)
  }

  test("triple_pack edge cases: short arrays and ordering") {
    val sets = Seq(
      (1L, Seq.empty[Long]),
      (2L, Seq(5L)),
      (3L, Seq(5L, 6L)),
      (4L, Seq(1L, 2L, 3L, 4L))
    ).toDF("ok", "arr")
    val rows = newTriples(sets).orderBy($"pa", $"pb", $"pc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("pair_pack rejects ids outside [0, 2^31)") {
    val bad = Seq((1L, Seq(1L, 4294967296L))).toDF("ok", "arr")
    val e = intercept[org.apache.spark.SparkException] {
      bad.select(explode(graft.functions.HashFunctions.pair_pack($"arr"))).collect()
    }
    assert(e.getMessage != null)
  }
}
