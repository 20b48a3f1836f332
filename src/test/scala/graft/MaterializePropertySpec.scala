package graft

import org.apache.spark.sql.functions._
import graft.cdc.Cdc

/** Randomized semantic check: the distributed latest-wins materializer
  * must equal a trivially-correct sequential fold of the changelog, for
  * many random op/key/offset interleavings (seeded — failures
  * reproduce). This pins the semantics against partitioning, AQE, and
  * window-implementation changes in a way single fixtures can't.
  */
class MaterializePropertySpec extends SparkSpec {
  import spark.implicits._

  private def referenceFold(rows: Seq[(Long, String, Double, Long)]): Map[Long, (Double, String, Long)] =
    rows.sortBy(_._4).foldLeft(Map.empty[Long, (Double, String, Long)]) {
      case (state, (k, op, v, ofs)) =>
        if (op == "d") state - k else state + (k -> ((v, op, ofs)))
    }

  test("materialize equals a sequential fold for 40 random changelogs") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 40) {
      val nKeys = 1 + rnd.nextInt(8)
      val nRows = 1 + rnd.nextInt(60)
      val ops = Array("c", "u", "d", "r")
      val rows = (0 until nRows).map { i =>
        (rnd.nextInt(nKeys).toLong, ops(rnd.nextInt(4)),
          math.rint(rnd.nextDouble() * 1000) / 100, i.toLong)
      }
      val got = Cdc.materialize(
          rows.toDF("key", "op", "value", "offset"),
          Cdc.TableRoute(Seq("key"), "offset"))
        .select($"key", $"value", $"op", $"offset")
        .collect()
        .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2), r.getLong(3))))
        .toMap
      val want = referenceFold(rows)
      assert(got == want,
        s"trial $trial (keys=$nKeys rows=$nRows): got=$got want=$want rows=$rows")
    }
  }

  test("materialize is insensitive to input partitioning and order") {
    val rnd = new scala.util.Random(42L)
    val opArr = Array("c", "u", "d")
    val rows = (0 until 200).map { i =>
      (rnd.nextInt(10).toLong, opArr(rnd.nextInt(3)),
        math.rint(rnd.nextDouble() * 1000) / 100, i.toLong)
    }
    def run(df: org.apache.spark.sql.DataFrame) =
      Cdc.materialize(df, Cdc.TableRoute(Seq("key"), "offset"))
        .select($"key", $"value", $"offset").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val base = rows.toDF("key", "op", "value", "offset")
    val a = run(base)
    val b = run(base.orderBy($"value"))            // scrambled order
    val c = run(base.repartition(17, $"value"))    // scrambled partitioning
    assert(a == b && a == c)
  }
}
