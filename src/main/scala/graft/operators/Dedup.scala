package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: every near-dup method is candidate-generation via
  * linear blocking (LSH bands / simhash segments / shared tokens)
  * followed by exact verification on candidate pairs only — never an
  * O(n²) cross join. At 100 TB the explode→groupBy bucket join is the
  * only shuffle, keyed on bucket id; oversized buckets (degenerate
  * shingles) are capped to keep skew bounded.
  */
object Dedup {

  /** Exact dedup: hash-groupBy on the raw text. Emits one row per
    * duplicated content cluster with the winning (min) doc_id.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy(md5($"text").as("content_fp"))
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .filter($"n_copies" > 1)
      .orderBy($"keep_id")
  }

  val dedupExactSql: String =
    """SELECT md5(text) AS content_fp, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY md5(text) HAVING count(*) > 1 ORDER BY keep_id""".stripMargin

  /** Exact word-set Jaccard near-dup pairs (the verification primitive the
    * probabilistic methods approximate). Token explode → self-join on
    * token → intersection counts → |A∪B| by inclusion-exclusion. Verified
    * against the same computation in DuckDB. Restricted to one source
    * shard: all-pairs token joins are quadratic in cluster size, which is
    * exactly why minhash/simhash below exist for the full corpus.
    */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).filter($"source" === "src0")
    val words = docs.select($"doc_id",
        explode(array_distinct(filter(split($"text", "\\s+"), t => t =!= ""))).as("w"))
    val sizes = words.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = words.as("a")
      .join(words.as("b"), $"a.w" === $"b.w" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("i"), $"b.doc_id".as("j"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select($"doc_id".as("i"), $"n".as("na")), "i")
      .join(sizes.select($"doc_id".as("j"), $"n".as("nb")), "j")
      .withColumn("jaccard", $"c".cast("double") / ($"na" + $"nb" - $"c").cast("double"))
      .filter($"jaccard" >= 0.5)
      .select($"i", $"j", round($"jaccard", 6).as("jaccard"))
      .orderBy($"i", $"j")
  }

  val dedupNgramJaccardSql: String =
    """WITH words AS (
      |  SELECT doc_id, unnest(list_distinct(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS w
      |  FROM documents WHERE source = 'src0'),
      |sizes AS (SELECT doc_id, count(*) AS n FROM words GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
      |  FROM words a JOIN words b ON a.w = b.w AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT i, j, round(CAST(c AS DOUBLE) / CAST(na + nb - c AS DOUBLE), 6) AS jaccard
      |FROM (SELECT inter.*, sa.n AS na, sb.n AS nb
      |      FROM inter JOIN sizes sa ON inter.i = sa.doc_id
      |      JOIN sizes sb ON inter.j = sb.doc_id) t
      |WHERE CAST(c AS DOUBLE) / CAST(na + nb - c AS DOUBLE) >= 0.5
      |ORDER BY i, j""".stripMargin

  // ---- MinHash + LSH ----------------------------------------------------

  val NumHashes = 64
  val NumBands = 16
  val RowsPerBand: Int = NumHashes / NumBands

  /** Word 3-gram shingles of a text column. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = filter(split(text, "\\s+"), t => t =!= "")
    val count = size(toks)
    when(count < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), count - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
  }

  /** 64-hash MinHash signature from a shingle array. One xxhash64 per
    * shingle, then 64 cheap affine permutations (h*A+B with wrapping
    * arithmetic) — the standard single-hash minhash family. Pure
    * codegen'd expressions, no UDF.
    */
  /** 32-bit masked token hashes (one xxhash64 per token). */
  def tokenHashes32(text: Column): Column =
    transform(filter(split(text, "\\s+"), t => t =!= ""),
      t => xxhash64(t).bitwiseAND(lit(0xFFFFFFFFL)))

  /** Shingle hashes from a MATERIALIZED token-hash column: combine n
    * consecutive token hashes with masked affine mixing (no string
    * concatenation, ANSI-safe, all products < 2^63).
    *
    * `th` must be a bound attribute, not an expression: element_at on an
    * inline expression re-evaluates the whole array per lookup, turning
    * this O(n) pass quadratic.
    */
  def shingleHashesFrom(th: Column, n: Int = 3): Column = {
    val count = size(th)
    val combine = (i: Column) => (0 until n).map { k =>
      (element_at(th, i + lit(k + 1)) * lit(31L * (k + 1)))
        .bitwiseAND(lit(0xFFFFFFFFL))
    }.reduce((a, b) => (a * lit(33L) + b).bitwiseAND(lit(0xFFFFFFFFL)))
    when(count < n, array(aggregate(th, lit(7L),
        (acc, h) => (acc * lit(33L) + h).bitwiseAND(lit(0xFFFFFFFFL)))))
      .otherwise(transform(sequence(lit(0), count - n), combine))
  }

  /** MinHash signature from a (pre-materialized) shingle-hash array.
    * IMPORTANT for performance: pass a plain column reference, not an
    * expression — this subtree is instantiated 64×, and Catalyst does
    * not CSE duplicated higher-order-function subtrees (they evaluate
    * interpreted, once per permutation). `dedupMinhash` materializes the
    * hash array in its own projection first.
    */
  def minhashSignature(shingleHashCol: Column): Column =
    transform(sequence(lit(0), lit(NumHashes - 1)), i => {
      val a = (i * lit(2654435761L) + lit(1))
        .bitwiseAND(lit(0x3FFFFFFFL)).bitwiseOR(lit(1L))
      val b = (i * lit(0x9E3779B9L)).bitwiseAND(lit(0xFFFFFFFFL))
      array_min(transform(shingleHashCol, h => (h * a + b).bitwiseAND(lit(0xFFFFFFFFL))))
    })

  /** MinHash-LSH near-dup candidate pairs, exact-verified by signature
    * agreement ratio. Linear: explode 16 band keys per doc, groupBy
    * band bucket, pair within bucket, dedup. Buckets larger than 64 docs
    * are dropped (degenerate content — at web scale these would be
    * boilerplate clusters handled by exact dedup first).
    */
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Each projection keeps the expensive alias referenced twice
    // (passthrough + use) so CollapseProject cannot inline it back into
    // the next stage — each array is computed once per row, not once per
    // downstream lambda iteration.
    // native codegen'd shingle + signature loops (bit-identical to the
    // composable forms — spec-verified); tokenization is the only
    // remaining higher-order expression
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", tokenHashes32($"text").as("th"))
      .select($"doc_id",
        graft.functions.HashFunctions.minhash_sig(
          graft.functions.HashFunctions.shingle_hash3($"th")).as("sig"))
    val bands = docs.select($"doc_id", $"sig",
        explode(array((0 until NumBands).map { b =>
          struct(lit(b).as("band"),
            xxhash64(concat_ws("_", lit(b), slice($"sig", b * RowsPerBand + 1, RowsPerBand)))
              .as("bucket"))
        }: _*)).as("bk"))
      .select($"doc_id", $"sig", $"bk.band".as("band"), $"bk.bucket".as("bucket"))
    val capped = bands
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"band", $"bucket")))
      .filter($"bucket_n" <= 64)
    val pairs = capped.as("a")
      .join(capped.as("b"),
        $"a.band" === $"b.band" && $"a.bucket" === $"b.bucket" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("i"), $"b.doc_id".as("j"), $"a.sig".as("sig_i"), $"b.sig".as("sig_j"))
      .distinct()
    pairs
      .withColumn("est_jaccard",
        size(filter(zip_with($"sig_i", $"sig_j", (x, y) => x === y), b => b))
          .cast("double") / NumHashes)
      .filter($"est_jaccard" >= 0.5)
      .select($"i", $"j", round($"est_jaccard", 6).as("est_jaccard"))
      .orderBy($"i", $"j")
  }

  // ---- SimHash ----------------------------------------------------------

  /** 64-bit SimHash from token hashes: per bit, majority vote of token
    * hash bits; candidates via 4×16-bit segment pigeonhole (hamming ≤ 3
    * guarantees one equal segment), verified with bit_count(xor).
    */
  /** Token-hash array for simhash — materialize as its own column before
    * passing to simhashSignature (same CSE caveat as minhash).
    */
  def tokenHashes(text: Column): Column =
    transform(array_distinct(filter(split(text, "\\s+"), t => t =!= "")),
      t => xxhash64(t))

  def simhashSignature(hs: Column): Column = {
    // 64 unrolled per-bit majority votes (shift amounts must be literals)
    val bitCols = (0 until 64).map { b =>
      val vote = aggregate(hs, lit(0L), (acc, h) =>
        acc + when(shiftright(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce(_.bitwiseOR(_))
  }

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", tokenHashes($"text").as("hs"))
      .select($"doc_id", graft.functions.HashFunctions.simhash64($"hs").as("sig"))
    val segs = docs.select($"doc_id", $"sig",
        explode(array((0 until 4).map { s =>
          struct(lit(s).as("seg"),
            shiftright($"sig", s * 16).bitwiseAND(0xFFFFL).as("seg_val"))
        }: _*)).as("sk"))
      .select($"doc_id", $"sig", $"sk.seg".as("seg"), $"sk.seg_val".as("seg_val"))
    val capped = segs
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"seg", $"seg_val")))
      .filter($"bucket_n" <= 256)
    capped.as("a")
      .join(capped.as("b"),
        $"a.seg" === $"b.seg" && $"a.seg_val" === $"b.seg_val" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("i"), $"b.doc_id".as("j"),
        bit_count($"a.sig".bitwiseXOR($"b.sig")).as("hamming"))
      .distinct()
      .filter($"hamming" <= 3)
      .orderBy($"i", $"j")
  }

  // ---- Embedding near-dup ----------------------------------------------

  /** Cosine similarity between two float-array columns, computed as a
    * sequential left-to-right fold (same order as a scalar loop, so the
    * result is reproducible and matches the DuckDB oracle bit-for-bit).
    */
  /** Codegen'd primitive-loop dot product (graft.functions.DotProduct).
    * Bit-identical to the fold form `aggregate(zip_with(...))` — same
    * left-to-right double accumulation — but runs inside whole-stage
    * codegen instead of an interpreted lambda frame per element.
    */
  def dot(x: Column, y: Column): Column =
    graft.functions.VectorFunctions.vec_dot(x, y)

  /** The composable fold form, kept for the bit-equality spec. */
  def dotFold(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm — precompute per vector (one pass per row) so the per-pair
    * cosine is a single dot product, not three.
    */
  def norm(x: Column): Column = sqrt(dot(x, x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / norm(a) / norm(b)

  /** cosine with pre-computed norms (the per-pair hot path). */
  def cosinePre(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / normA / normB

  /** Embedding-cosine near-dup pairs above a cosine threshold on a bounded slice (the
    * all-pairs verification primitive; the scale path is ann_lsh's
    * bucketed variant in Similarity).
    */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir).filter($"vec_id" < 500)
    val a = e.select($"vec_id".as("i"), $"embedding".as("ea"), $"label".as("la"),
      norm($"embedding").as("na"))
    val b = e.select($"vec_id".as("j"), $"embedding".as("eb"), $"label".as("lb"),
      norm($"embedding").as("nb"))
    a.join(b, $"i" < $"j" && $"la" === $"lb")  // label blocking
      .withColumn("cos", cosinePre($"ea", $"eb", $"na", $"nb"))
      .filter($"cos" >= 0.3)
      .select($"i", $"j", round($"cos", 6).as("cos_sim"))
      .orderBy($"i", $"j")
  }

  val dedupEmbeddingSql: String =
    """SELECT a.vec_id AS i, b.vec_id AS j,
      |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
      |FROM (SELECT * FROM embeddings WHERE vec_id < 500) a
      |JOIN (SELECT * FROM embeddings WHERE vec_id < 500) b
      |  ON a.vec_id < b.vec_id AND a.label = b.label
      |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.3
      |ORDER BY i, j""".stripMargin
}
