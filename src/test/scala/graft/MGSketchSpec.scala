package graft

import graft.functions.AggFunctions.space_saving
import graft.functions.MGBuffer
import org.apache.spark.sql.functions._

/** Misra–Gries sketch: retention/estimate guarantees and the exactness
  * of the two-pass heavy-hitter composition built on it.
  */
class MGSketchSpec extends SparkSpec {
  import spark.implicits._

  test("MG guarantee: every estimate within n/m of truth; frequent items retained") {
    val m = 64
    val ev = graft.sources.Tables.events(spark, sf).select($"user_id").cache()
    val n = ev.count()
    val sketch = ev.agg(space_saving($"user_id", m).as("sk"))
      .select(explode($"sk").as("c"))
      .select($"c.item".as("user_id"), $"c.est".as("est"))
    val exact = ev.groupBy($"user_id").agg(count(lit(1)).as("true_n"))
    val joined = sketch.join(exact, "user_id").cache()
    // est ≤ true and est ≥ true − n/m for every retained item
    assert(joined.filter($"est" > $"true_n").count() === 0, "MG never overestimates")
    assert(joined.filter($"est" < $"true_n" - lit(n / m)).count() === 0,
      s"estimate fell below true − n/m")
    // any item with true frequency > n/m must be present in the sketch
    val mustHave = exact.filter($"true_n" > lit(n / m))
    assert(mustHave.join(sketch, Seq("user_id"), "left_anti").count() === 0,
      "an item above the n/m frequency bound was evicted")
    joined.unpersist(); ev.unpersist()
  }

  test("sketch is merge-safe: guarantees hold under adversarial partitioning") {
    val m = 64
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"user_id", $"event_id").repartition(41, $"event_id").cache()
    val n = ev.count()
    val sketch = ev.agg(space_saving($"user_id", m).as("sk"))
      .select(explode($"sk").as("c"))
      .select($"c.item".as("user_id"), $"c.est".as("est"))
    val exact = ev.groupBy($"user_id").agg(count(lit(1)).as("true_n"))
    val mustHave = exact.filter($"true_n" > lit(n / m))
    assert(mustHave.join(sketch, Seq("user_id"), "left_anti").count() === 0)
    assert(sketch.join(exact, "user_id").filter($"est" > $"true_n").count() === 0)
    ev.unpersist()
  }

  test("two-pass heavy_hitters_sketch is EXACTLY the full-groupBy result") {
    val a = graft.operators.Profile.heavyHittersSketch(spark, sf)
    val b = graft.operators.Profile.heavyHitters(spark, sf)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("buffer merge matches a single-stream build within MG bounds") {
    val items = (1L to 500L).flatMap(i => Seq.fill((i % 7 + 1).toInt)(i))
    val (l, r) = items.splitAt(items.length / 2)
    val single = new MGBuffer(32)
    items.foreach(single.add(_))
    val a = new MGBuffer(32); l.foreach(a.add(_))
    val b = new MGBuffer(32); r.foreach(b.add(_))
    a.merge(b)
    // both summaries must obey the same deterministic size cap
    assert(a.counts.size <= 32 && single.counts.size <= 32)
  }
}
