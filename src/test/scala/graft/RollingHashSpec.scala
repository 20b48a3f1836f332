package graft

import org.apache.spark.sql.functions._

/** Exactness checks for the native rolling_hash kernel. */
class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private val hof = expr(
    """aggregate(transform(split(text, ''), ch -> cast(ascii(ch) as bigint)),
      |  cast(0 as bigint), (acc, code) -> (acc * 31 + code) % 1000000007)""".stripMargin)

  test("rolling_hash: kernel is bit-identical to the HOF fold on corpus text") {
    val diff = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id",
        graft.functions.StringFunctions.rolling_hash($"text").as("k"), hof.as("h"))
      .filter($"k" =!= $"h")
      .count()
    assert(diff === 0, "kernel and HOF rolling hashes diverged")
  }

  test("rolling_hash: edge cases — empty string, single char, hand-check") {
    val df = Seq("", "a", "ab").toDF("text")
      .select(graft.functions.StringFunctions.rolling_hash($"text").as("h"))
    val got = df.collect().map(_.getLong(0)).toSeq
    // "" folds to 0 (HOF: one ascii('')=0 step — same); "a" = 97;
    // "ab" = 97*31 + 98 = 3105
    assert(got === Seq(0L, 97L, 3105L))
  }

  test("rolling_hash: registered on the SQL surface") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT rolling_hash('ab') AS h").first().getLong(0)
    assert(r === 3105L)
  }
}
