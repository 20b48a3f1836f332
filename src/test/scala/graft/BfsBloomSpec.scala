package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** The bloom-compressed BFS must equal plain frontier BFS exactly, and
  * the bloom must actually drop re-discovered nodes map-side (the
  * whole point — a filter that never fires verifies nothing).
  */
class BfsBloomSpec extends SparkSpec {
  import spark.implicits._

  test("graph_bfs_bloom: bit-identical to graph_bfs; visited prune fires") {
    val plain = Graph.graphBfs(spark, sf).collect().map(r => (r.getLong(0), r.getInt(1)))
    val bloom = Graph.graphBfsBloom(spark, sf).collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(bloom.toSeq === plain.toSeq,
      "bloom pruning changed the BFS result — false negatives are impossible, so this is a bug")
    // prune effectiveness: the hop-2 expansion walks hop-1 nodes'
    // edges, and on an undirected graph every hop-1 node has a back
    // edge to its seed — rebuild the hop-2 candidate set and show the
    // visited overlap the bloom gets to short-circuit is non-trivial
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
    val pairs = li.as("a").join(li.as("b"), $"a.ok" === $"b.ok" && $"a.pk" < $"b.pk")
      .groupBy($"a.pk".as("pa"), $"b.pk".as("pb"))
      .agg(count(lit(1)).as("c")).filter($"c" >= 2).select($"pa", $"pb")
    val edges = pairs.select($"pa".as("src"), $"pb".as("dst"))
      .union(pairs.select($"pb".as("src"), $"pa".as("dst")))
    val visited01 = plain.filter(_._2 <= 1).map(_._1).toSet
    val frontier1 = spark.createDataset(plain.filter(_._2 == 1).map(_._1).toSeq)
      .toDF("node")
    val hop2Cands = frontier1.join(edges, frontier1("node") === edges("src"))
      .select($"dst").distinct().collect().map(_.getLong(0))
    val rediscovered = hop2Cands.count(visited01.contains)
    assert(rediscovered > 0,
      "no visited overlap in the hop-2 expansion — the prune is vacuous on this graph")
  }
}
