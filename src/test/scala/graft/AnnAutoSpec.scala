package graft

import graft.operators.AnnExact

/** Bounds for the cost-based PQ shortlist chooser (oracle-exact since
  * r9): dial monotonicity, chosen-factor minimality, and the recall
  * target actually met on this corpus.
  */
class AnnAutoSpec extends SparkSpec {
  import spark.implicits._

  test("ann_pq_auto: dial is monotone, chosen factor is the minimal one meeting target") {
    val rep = AnnExact.annPqAuto(spark, sf).orderBy($"factor").collect()
    assert(rep.length === 6)
    val recalls = rep.map(_.getDouble(2))
    recalls.sliding(2).foreach { case Array(a, b) =>
      assert(b + 1e-9 >= a, s"recall fell as the shortlist deepened: ${recalls.toSeq}")
    }
    val chosenRows = rep.filter(_.getBoolean(4))
    assert(chosenRows.length === 1, "exactly one factor must be chosen")
    val chosen = chosenRows.head.getInt(0)
    val chosenRecall = chosenRows.head.getDouble(2)
    // on this corpus the deep end of the dial saturates ≥ 0.9, so the
    // chooser must have found a meeting factor — and a minimal one
    assert(chosenRecall >= 0.9, s"chosen factor $chosen recall $chosenRecall")
    rep.filter(_.getInt(0) < chosen).foreach { r =>
      assert(r.getDouble(2) < 0.9,
        s"factor ${r.getInt(0)} already met the target — chosen $chosen not minimal")
    }
    // cost column is the contract: shortlist_rows = topK · factor
    rep.foreach(r => assert(r.getInt(3) === 5 * r.getInt(0)))
  }
}
