package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away " * 5
  private val nearDup = base.replace("lazy", "sleepy")   // one token differs per repeat
  private val unrelated = "completely different content about spark query engines " * 5

  private def docsDf = Seq(
    (0L, base), (1L, base),          // exact dup pair
    (2L, nearDup),                   // near dup of 0/1
    (3L, unrelated)
  ).toDF("doc_id", "text")

  test("exact dedup finds the planted duplicate") {
    val d = docsDf.groupBy(md5($"text").as("fp"))
      .agg(min($"doc_id").as("keep"), count(lit(1)).as("n"))
      .filter($"n" > 1).collect()
    assert(d.length == 1 && d(0).getLong(1) == 0L && d(0).getLong(2) == 2L)
  }

  test("native minhash_sig is bit-identical to the composable form") {
    val both = docsDf
      .select($"doc_id", Dedup.tokenHashes32($"text").as("th"))
      .select($"doc_id", $"th", Dedup.shingleHashesFrom($"th").as("hs"))
      .select($"doc_id",
        graft.functions.HashFunctions.minhash_sig($"hs").as("native"),
        Dedup.minhashSignature($"hs").as("composable"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"doc ${r.getLong(0)} differs")
    }
  }

  test("native shingle_hash3 is bit-identical to the composable form") {
    val both = docsDf
      .select($"doc_id", Dedup.tokenHashes32($"text").as("th"))
      .select($"doc_id",
        graft.functions.HashFunctions.shingle_hash3($"th").as("native"),
        Dedup.shingleHashesFrom($"th").as("composable"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"doc ${r.getLong(0)} differs")
    }
    // short-text path (<3 tokens)
    val shortDoc = Seq((9L, "one two")).toDF("doc_id", "text")
      .select($"doc_id", Dedup.tokenHashes32($"text").as("th"))
      .select(graft.functions.HashFunctions.shingle_hash3($"th").as("native"),
        Dedup.shingleHashesFrom($"th").as("composable"))
      .first()
    assert(shortDoc.getSeq[Long](0) == shortDoc.getSeq[Long](1))
  }

  test("native simhash64 is bit-identical to the composable form") {
    val both = docsDf
      .select($"doc_id", Dedup.tokenHashes($"text").as("hs"))
      .select($"doc_id",
        graft.functions.HashFunctions.simhash64($"hs").as("native"),
        Dedup.simhashSignature($"hs").as("composable"))
      .collect()
    both.foreach { r => assert(r.getLong(1) == r.getLong(2)) }
  }

  test("native token_hash32/63 are bit-identical to the composable folds") {
    val edge = Seq((7L, "  leading and   multiple  spaces\ttab\nnewline "),
      (8L, "single"), (9L, "")).toDF("doc_id", "text")
    val both = docsDf.union(edge)
      .select($"doc_id",
        graft.functions.HashFunctions.token_hash32($"text").as("n32"),
        Dedup.tokenHashes32($"text").as("c32"),
        graft.functions.HashFunctions.token_hash63($"text").as("n63"),
        Dedup.tokenHashes63($"text").as("c63"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"token_hash32 differs for doc ${r.getLong(0)}")
      assert(r.getSeq[Long](3) == r.getSeq[Long](4), s"token_hash63 differs for doc ${r.getLong(0)}")
    }
  }

  test("native band_buckets matches a driver-side fold of the signature") {
    val rows = docsDf
      .select($"doc_id", graft.functions.HashFunctions.minhash_sig(
        graft.functions.HashFunctions.shingle_hash3(
          graft.functions.HashFunctions.token_hash32($"text"))).as("sig"))
      .select($"doc_id", $"sig", graft.functions.HashFunctions.band_buckets($"sig").as("bk"))
      .collect()
    rows.foreach { r =>
      val sig = r.getSeq[Long](1)
      val bk = r.getSeq[Long](2)
      assert(bk.length == 16)
      (0 until 16).foreach { b =>
        val expect = (0 until 4).foldLeft(b + 11L) { (acc, k) =>
          (acc * 33L + sig(b * 4 + k)) & 0xFFFFFFFFL
        }
        assert(bk(b) == expect, s"band $b of doc ${r.getLong(0)}")
      }
    }
  }

  test("native sig_agree matches the zip count") {
    val rows = docsDf
      .select($"doc_id", graft.functions.HashFunctions.minhash_sig(
        graft.functions.HashFunctions.shingle_hash3(
          graft.functions.HashFunctions.token_hash32($"text"))).as("sig"))
    val pairs = rows.as("a").crossJoin(rows.as("b"))
      .select($"a.sig".as("sa"), $"b.sig".as("sb"),
        graft.functions.HashFunctions.sig_agree($"a.sig", $"b.sig").as("agree"))
      .collect()
    pairs.foreach { r =>
      val sa = r.getSeq[Long](0); val sb = r.getSeq[Long](1)
      assert(r.getInt(2) == sa.zip(sb).count { case (x, y) => x == y })
    }
  }

  test("minhash signatures: near-dups agree, unrelated don't") {
    val sigs = docsDf
      .select($"doc_id", Dedup.tokenHashes32($"text").as("th"))
      .select($"doc_id", $"th", Dedup.shingleHashesFrom($"th").as("hs"))
      .select($"doc_id", graft.functions.HashFunctions.minhash_sig($"hs").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def agree(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    assert(agree(sigs(0L), sigs(1L)) == 1.0)          // identical text
    assert(agree(sigs(0L), sigs(2L)) > 0.3)           // near dup
    assert(agree(sigs(0L), sigs(3L)) < 0.2)           // unrelated
  }

  test("simhash: hamming(near dups) << hamming(unrelated)") {
    val sigs = docsDf
      .select($"doc_id", Dedup.tokenHashes($"text").as("hs"))
      .select($"doc_id", Dedup.simhashSignature($"hs").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0L), sigs(1L)) == 0)
    assert(ham(sigs(0L), sigs(2L)) < ham(sigs(0L), sigs(3L)))
  }

  test("minhash LSH pipeline runs on real documents and only emits i<j pairs") {
    val pairs = Dedup.dedupMinhash(spark, sf)
    assert(pairs.filter($"i" >= $"j").count() == 0)
  }

  test("prefix-filtered jaccard join is exact vs brute-force all-pairs") {
    val full = Dedup.dedupJaccardFull(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // brute force over the same shingle arithmetic
    val sh = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", array_distinct(
        graft.functions.HashFunctions.shingle_hash3(
          graft.functions.HashFunctions.token_hash32($"text"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
    val brute = (for {
      (i, si) <- sh; (j, sj) <- sh if i < j
      c = (si & sj).size
      jac = c.toDouble / (si.size + sj.size - c)
      if jac >= 0.5
    } yield (i, j) -> jac).toMap
    assert(full.keySet == brute.keySet,
      s"missing=${brute.keySet -- full.keySet} extra=${full.keySet -- brute.keySet}")
    brute.foreach { case (k, v) =>
      assert(math.abs(full(k) - math.rint(v * 1e6) / 1e6) < 1e-9, s"pair $k")
    }
  }

  test("incremental minhash: old-only pairs ∪ incremental pairs = full pairs") {
    import graft.operators.Dedup
    val full = Dedup.dedupMinhash(spark, sf).select($"i", $"j").cache()
    val incr = Dedup.dedupMinhashIncr(spark, sf).select($"i", $"j").cache()
    val cut = graft.sources.Tables.documents(spark, sf)
      .agg(expr("max(doc_id) div 2")).first().getLong(0)
    val oldOnly = full.filter($"j" <= cut)
    val union = oldOnly.unionByName(incr)
    assert(union.exceptAll(full).count() == 0 && full.exceptAll(union).count() == 0,
      "incremental + old-only must reconstruct the full pair set exactly")
    // and the incremental set touches only the batch
    assert(incr.filter($"j" <= cut).count() == 0)
  }

  test("duplicate clustering is transitive with min-id canonical election") {
    val dir = java.nio.file.Files.createTempDirectory("cc").toString
    val a = ("alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu nu xi omicron pi ") * 4
    Seq(
      (10L, a),                               // chain: 10~11 (identical)
      (11L, a),
      (12L, a.replace("theta", "sigma")),     // 12 near-dups 10/11 -> one cluster
      (20L, "totally different content here about engines " * 8),
      (21L, "totally different content here about engines " * 8), // pair cluster
      (30L, (1 to 80).map(i => s"u$i").mkString(" "))             // unpaired: absent
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = Dedup.dedupClusters(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq == Seq(
      (10L, 10L, true), (11L, 10L, false), (12L, 10L, false),
      (20L, 20L, true), (21L, 20L, false)))
  }

  test("containment catches doc-in-doc duplication that Jaccard misses") {
    val dir = java.nio.file.Files.createTempDirectory("containment").toString
    val inner = (1 to 40).map(i => s"w$i").mkString(" ")      // 40 tokens
    val wrapper = (100 to 260).map(i => s"x$i").mkString(" ") // 161 tokens
    Seq(
      (1L, inner),                       // the contained doc
      (2L, s"$wrapper $inner"),          // container: inner quoted verbatim
      (3L, (300 to 400).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val cont = Dedup.dedupContainment(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // 1 is contained in 2 at full containment...
    assert(cont.exists { case (i, j, c) => i == 1L && j == 2L && c >= 0.9 },
      s"missed the planted containment: ${cont.toSeq}")
    // ...but NOT the reverse (2's shingles are mostly outside 1)
    assert(!cont.exists { case (i, j, _) => i == 2L && j == 1L })
    // and symmetric Jaccard structurally misses the pair:
    // J ≤ |A|/|B| ≈ 40/200 < 0.5
    val jac = Dedup.dedupJaccardFull(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!jac.contains((1L, 2L)), "fixture must be a Jaccard-invisible pair")
  }

  test("keep list: full-corpus coverage, canonical-only keeps, dropped docs point at a kept doc") {
    val keep = Dedup.dedupKeepList(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(keep.length.toLong == nDocs, "one decision per corpus doc")
    val dropped = keep.filterNot(_._3)
    assert(dropped.nonEmpty, "fixture must exercise real drops")
    val keptIds = keep.filter(_._3).map(_._1).toSet
    // every dropped doc's cluster_id names a KEPT doc (its canonical)
    dropped.foreach { case (id, cid, _) =>
      assert(keptIds.contains(cid), s"doc $id dropped toward non-kept $cid")
      assert(cid < id, "canonical must be the cluster min")
    }
    // unclustered docs keep themselves under their own id
    val clustered = Dedup.dedupClusters(spark, sf)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    keep.filterNot(k => clustered.contains(k._1)).foreach { case (id, cid, kp) =>
      assert(kp && cid == id, s"unclustered doc $id must keep itself")
    }
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val p = Dedup.dedupEmbedding(spark, sf)
    assert(p.filter($"cos_sim" < 0.3).count() == 0)
    assert(p.filter($"i" >= $"j").count() == 0)
  }

  test("er_clusters: every evidence pair's endpoints share a cluster (transitive OR)") {
    val clusters = Dedup.erClusters(spark, sf)
      .select($"doc_id", $"cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val evidence = Dedup.dedupJaro(spark, sf).select($"i", $"j")
      .unionByName(Dedup.dedupEditDistance(spark, sf).select($"i", $"j"))
      .distinct().collect()
    assert(evidence.nonEmpty)
    evidence.foreach { r =>
      val (i, j) = (r.getLong(0), r.getLong(1))
      assert(clusters(i) === clusters(j), s"pair ($i,$j) split across clusters")
    }
    // every cluster id is its own member's min
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(cid === members.keys.min)
    }
  }

  test("dup_size_histogram: conserves the corpus and sees the planted redelivery") {
    val h = graft.operators.Dedup.dupSizeHistogram(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val corpus = graft.sources.Tables.documents(spark, sf).count()
    assert(h.map(_._3).sum === corpus + 20, "histogram must cover every ingested doc")
    assert(h.exists(b => b._1 >= 2 && b._2 > 0),
      "redelivered docs must form size>=2 clusters")
  }

  test("dedup_url: every canonical group collapses multiple raw variants") {
    import org.apache.spark.sql.functions.col
    val u = graft.operators.Dedup.dedupUrl(spark, sf).cache()
    assert(u.count() === 7, "7 planted resources")
    assert(u.filter(col("n_variants") < 2).count() === 0,
      "each resource is planted in >=2 raw shapes — collapsing must be real")
    assert(u.filter(col("canonical_url").rlike("^https?://|[?#]|/$")).count() === 0,
      "canonical form must be scheme-, query-, fragment-, and slash-free")
    u.unpersist()
  }

  test("dedup_paragraph: planted shared boilerplate is flagged, unique text is not") {
    val dir = java.nio.file.Files.createTempDirectory("paradedup").toString
    // a 32-token boilerplate line shared by docs 0/1/2 (newline-delimited
    // paragraphs), plus per-doc unique lines longer than one block
    val boiler = (1 to 32).map(i => s"boiler$i").mkString(" ")
    def uniq(d: Int) = (1 to 40).map(i => s"u${d}x$i").mkString(" ")
    Seq(
      (0L, boiler + "\n" + uniq(0)),
      (1L, uniq(1) + "\n" + boiler),
      (2L, boiler),                  // boilerplate-only doc
      (3L, uniq(3))                  // clean doc
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Dedup.dedupParagraph(spark, dir).collect()
      .map(x => x.getLong(0) ->
        (x.getInt(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    // doc 0 owns the first boilerplate occurrence: nothing excised there;
    // its unique 40-token line splits into 2 blocks (32 + 8)
    assert(r(0L) == ((3, 0L, 72L, 0L)), s"doc0: ${r(0L)}")
    // docs 1 and 2 carry later copies: exactly the 32-token paragraph flagged
    assert(r(1L) == ((3, 1L, 72L, 32L)), s"doc1: ${r(1L)}")
    assert(r(2L) == ((1, 1L, 32L, 32L)), s"doc2: ${r(2L)}")
    // the clean doc is untouched
    assert(r(3L) == ((2, 0L, 40L, 0L)), s"doc3: ${r(3L)}")
    // non-vacuity on the real corpus: exact-duplicate documents must
    // surface as duplicated paragraphs
    val mass = Dedup.dedupParagraph(spark, sf)
      .agg(sum(col("n_dup_paras"))).first().getLong(0)
    assert(mass > 0, "no duplicated paragraphs found on the corpus — vacuous")

    // the excise twin rewrites the same fixture: later boilerplate
    // copies vanish whole, unique lines survive verbatim
    val ex = Dedup.paragraphExcise(spark, dir).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(ex(0L).getAs[String]("clean_text") == boiler + "\n" + uniq(0),
      "first boilerplate occurrence must survive")
    assert(ex(1L).getAs[String]("clean_text") == uniq(1),
      "doc1 must lose its boilerplate copy and keep its unique line")
    assert(ex(2L).getAs[String]("clean_text") == "",
      "a boilerplate-only doc excises to empty")
    assert(ex(3L).getAs[String]("clean_text") == uniq(3), "clean doc untouched")
    // conservation on every doc: kept + removed = paragraph token mass
    ex.values.foreach { r =>
      val toks = r.getAs[String]("clean_text").split("\\s+").count(_.nonEmpty)
      assert(toks == r.getAs[Long]("n_tokens_clean"),
        s"clean_text token count must equal n_tokens_clean for doc ${r.getLong(0)}")
    }
  }
}
