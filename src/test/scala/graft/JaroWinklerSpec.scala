package graft

import graft.functions.{JaroWinklerImpl, StringFunctions}
import org.apache.spark.sql.functions._

/** Jaro–Winkler: literature reference values (bit-exact, matching
  * DuckDB's implementation), codegen path, and the blocked pair op.
  */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  test("reference values are bit-exact") {
    assert(JaroWinklerImpl.jaroWinkler("martha", "marhta") === 0.9611111111111111)
    assert(JaroWinklerImpl.jaroWinkler("dixon", "dicksonx") === 0.8133333333333332)
    assert(JaroWinklerImpl.jaroWinkler("jellyfish", "smellyfish") === 0.8962962962962964)
    assert(JaroWinklerImpl.jaroWinkler("dwayne", "duane") === 0.8400000000000001)
    assert(JaroWinklerImpl.jaroWinkler("abc", "abc") === 1.0)
    assert(JaroWinklerImpl.jaroWinkler("abc", "xyz") === 0.0)
    assert(JaroWinklerImpl.jaroWinkler("", "abc") === 0.0)
  }

  test("expression matches the impl through the codegen path") {
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"), ("abc", "xyz"))
      .toDF("a", "b")
      .select(StringFunctions.jaro_winkler($"a", $"b").as("jw"))
    assert(df.as[Double].collect().toSeq ===
      Seq(0.9611111111111111, 0.8133333333333332, 0.0))
  }

  test("dedup_jaro finds the same planted near-dup families as edit distance") {
    val jaro = operators.Dedup.dedupJaro(spark, sf).select($"i", $"j")
    val edit = operators.Dedup.dedupEditDistance(spark, sf).select($"i", $"j")
    assert(jaro.count() > 0)
    // character-level mutations this corpus plants score high on both
    // metrics: the pair sets must overlap substantially
    val overlap = jaro.intersect(edit).count()
    assert(overlap >= jaro.count() / 2, s"only $overlap overlapping pairs")
  }

  test("SQL surface: jaro_winkler resolves via the extension registry") {
    GraftExtensions.register(spark)
    val v = spark.sql("SELECT jaro_winkler('martha', 'marhta')").head().getDouble(0)
    assert(v === 0.9611111111111111)
  }
}
