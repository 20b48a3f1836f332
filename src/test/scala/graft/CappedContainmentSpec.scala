package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** dedup_containment_capped: the df-cap + normalized-exact pre-pass
  * mitigations actually do what they claim on a fixture with a PLANTED
  * boilerplate cluster — the adversarial input for the uncapped
  * operator (one corpus-common shingle whose posting list would ship
  * the whole cluster to one reducer).
  */
class CappedContainmentSpec extends SparkSpec {
  import spark.implicits._

  private val boiler =
    "terms of service apply contact support for billing questions today"
  private val cap = 16

  /** 80 boilerplate-sharing docs (shared shingles df=80 >> cap), one
    * planted containment pair on rare shingles, and a 5-doc
    * exact-norm cluster (same text modulo case/punctuation).
    */
  private lazy val docs = (
    (0 until 80).map(i =>
      (i.toLong, s"$boiler distinct tail alpha$i beta$i gamma$i delta$i epsilon$i zeta$i")) ++
    Seq(
      (9001L, "orchid nebula quartz falcon ember willow cascade prism vertex harbor"),
      (9002L, "orchid nebula quartz falcon ember willow cascade prism vertex harbor " +
        "meadow juniper sable onyx crater lagoon")) ++
    (0 until 5).map(i =>
      (9100L + i.toLong,
        if (i == 0) "unique norm cluster body with stable words"
        else s"Unique NORM cluster body with stable words${"!" * i}"))
  ).toDF("doc_id", "text")

  test("exact-norm pre-pass collapses the planted cluster to its min doc_id") {
    val reps = Dedup.normReps(docs)
    val normIds = reps.filter($"doc_id" >= 9100L).select($"doc_id")
      .as[Long].collect().sorted
    assert(normIds.toSeq === Seq(9100L),
      s"expected only the min-id representative, got ${normIds.toSeq}")
    // nothing else was collapsed
    assert(reps.count() === docs.count() - 4)
  }

  test("df cap bounds every posting list the candidate join sees") {
    val sh = Dedup.normReps(docs)
      .select($"doc_id", array_distinct(
        graft.functions.HashFunctions.shingle_hash3(
          graft.functions.HashFunctions.token_hash32($"text"))).as("shs"))
      .select($"doc_id", $"shs", size($"shs").as("n"))
    // the boilerplate shingles really are corpus-common in this fixture
    // (df = 80 > cap): the cap has something to cut
    val rawMax = sh.select(explode($"shs").as("h"))
      .groupBy($"h").count().agg(max($"count")).as[Long].first()
    assert(rawMax > cap, s"fixture not adversarial: max df $rawMax <= cap $cap")
    val capped = Dedup.cappedShingleTable(sh, cap)
    val postMax = capped.groupBy($"h").count().agg(max($"count")).as[Long].first()
    assert(postMax <= cap,
      s"capped table leaked a posting list of $postMax > cap $cap")
  }

  test("planted rare-shingle containment pair survives the cap") {
    val out = Dedup.dedupContainmentCappedOf(docs, tau = 0.8, dfCap = cap)
      .select($"i", $"j").as[(Long, Long)].collect().toSet
    assert(out.contains((9001L, 9002L)),
      s"planted contained pair lost: $out")
    // directed: the larger doc is NOT contained in the smaller one at tau=0.8
    assert(!out.contains((9002L, 9001L)))
    // no intra-boilerplate pairs: their only shared shingles are
    // corpus-common, which is exactly the declared recall cut
    assert(!out.exists { case (i, j) => i < 80 && j < 80 },
      s"boilerplate-only pairs should be cut by the cap: $out")
  }
}
