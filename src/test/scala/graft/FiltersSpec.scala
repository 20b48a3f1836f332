package graft

import graft.operators.Filters
import org.apache.spark.sql.functions._

/** Semantic checks for the rule-filter family (gopher_rules, span_dedup)
  * beyond the DuckDB hash gate: non-vacuity of every rule, flag/keep
  * consistency, and span-dedup conservation invariants.
  */
class FiltersSpec extends SparkSpec {
  import spark.implicits._

  test("gopher_rules: every rule has both a pass and a fail population, keep = AND of flags") {
    val r = Filters.gopherRules(spark, sf).cache()
    val n = r.count()
    assert(n === graft.sources.Tables.documents(spark, sf).count(),
      "one verdict per document")
    for (flag <- Seq("r_len", "r_mwl", "r_stop", "r_rep")) {
      val fails = r.filter(!col(flag)).count()
      assert(fails > 0, s"$flag never fails — the rule is vacuous on this corpus")
      assert(fails < n, s"$flag always fails — the bound is mis-centered")
    }
    assert(r.filter($"keep" =!= ($"r_len" && $"r_mwl" && $"r_stop" && $"r_rep"))
      .count() === 0, "keep must be the conjunction of the four rule flags")
    // flags restate the reported statistics (spot-check the integer
    // cross-multiplied mean-word-length band against the ratio column,
    // away from the rounding boundary)
    assert(r.filter($"mean_word_len" > 4.31 && $"mean_word_len" < 4.74 && !$"r_mwl")
      .count() === 0, "r_mwl must pass strictly inside the band")
    r.unpersist()
  }

  test("token_stats kernel is bit-identical to the composable HOF chains") {
    val stopArr = array(Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
      .map(lit): _*)
    val toks = filter(split($"text", "\\s+"), t => t =!= "")
    val hof = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", toks.as("toks"),
        graft.functions.StringFunctions.token_stats($"text",
          Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")).as("ts"))
      .select($"ts",
        size($"toks").cast("long").as("n"),
        aggregate(transform($"toks", t => length(t).cast("long")),
          lit(0L), (a, x) => a + x).as("sum_len"),
        size(filter($"toks", t => array_contains(stopArr, t))).cast("long").as("n_stop"),
        size(array_distinct($"toks")).cast("long").as("n_uniq"),
        array_max(transform(array_distinct($"toks"),
          x => size(filter($"toks", t => t === x)))).cast("long").as("top_cnt"))
    val diff = hof.filter(
      $"ts.n_tokens" =!= $"n" || $"ts.sum_len" =!= $"sum_len" ||
        $"ts.n_stop" =!= $"n_stop" || $"ts.n_uniq" =!= $"n_uniq" ||
        $"ts.top_cnt" =!= $"top_cnt").count()
    assert(diff === 0, "token_stats kernel diverged from the HOF chains")
  }

  test("span_dedup: conservation — global span count balances keepers + duplicates") {
    val d = Filters.spanDedup(spark, sf).cache()
    // spans per doc = ceil(n_tokens / 8), and losses never exceed the doc
    assert(d.filter($"n_spans" =!= ceil($"n_tokens" / 8.0).cast("int"))
      .count() === 0, "disjoint 8-token windows must tile the document")
    assert(d.filter($"n_dup_spans" > $"n_spans" || $"tokens_lost" > $"n_tokens")
      .count() === 0)
    // the corpus-wide identity: total spans - duplicate spans = distinct fingerprints
    val totals = d.agg(sum($"n_spans").as("spans"), sum($"n_dup_spans").as("dups"))
      .first()
    val distinctFps = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", filter(split($"text", "\\s+"), t => t =!= "").as("toks"))
      .select(explode(expr(
        "transform(sequence(0, cast(ceil(size(toks) / 8.0) as int) - 1)," +
          " k -> array_join(slice(toks, k * 8 + 1, 8), ' '))")).as("span"))
      .select(md5($"span")).distinct().count()
    assert(totals.getLong(0) - totals.getLong(1) === distinctFps,
      "every non-duplicate span must be a distinct fingerprint's keeper")
    // dedup must actually fire on this corpus (non-vacuity at any SF)
    assert(totals.getLong(1) > 0, "no duplicate spans found — operator is vacuous")
    d.unpersist()
  }

  test("span_excise: token-mass conservation and rebuild fidelity") {
    val ex = Filters.spanExcise(spark, sf).cache()
    // conservation: kept + removed = original token mass, per document
    assert(ex.filter($"n_tokens_clean" + $"tokens_removed" =!= $"n_tokens")
      .count() === 0, "excision must conserve token mass")
    // the rebuilt text's token count is the reported clean count
    assert(ex.filter(size(filter(split($"clean_text", "\\s+"), t => t =!= ""))
      =!= $"n_tokens_clean".cast("int")).count() === 0,
      "clean_text must contain exactly n_tokens_clean tokens")
    // untouched documents round-trip to the whitespace-normalized original
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id",
        array_join(filter(split($"text", "\\s+"), t => t =!= ""), " ").as("norm"))
    val untouched = ex.filter($"n_spans_excised" === 0)
      .join(docs, "doc_id")
    assert(untouched.filter($"clean_text" =!= $"norm").count() === 0,
      "documents with no excised spans must round-trip unchanged")
    // excision must bite: every span_dedup duplicate token is removed,
    // so corpus-wide removed mass >= span_dedup's tokens_lost total
    // (contamination intervals can only add to it)
    val removed = ex.agg(sum($"tokens_removed")).first().getLong(0)
    val lost = Filters.spanDedup(spark, sf).agg(sum($"tokens_lost")).first().getLong(0)
    assert(lost > 0 && removed >= lost,
      s"excised mass $removed must cover span_dedup's duplicate mass $lost")
    ex.unpersist()
  }

  test("substring_excise: conservation, rebuild fidelity, and cross-op mass equality") {
    val ex = Filters.substringExcise(spark, sf).cache()
    // conservation: kept + removed = original token mass, per doc
    assert(ex.filter($"n_tokens_clean" + $"tokens_removed" =!= $"n_tokens")
      .count() === 0)
    // rebuild fidelity: clean_text re-tokenizes to exactly n_tokens_clean
    val bad = ex.withColumn("rt",
      size(filter(split($"clean_text", "\\s+"), t => t =!= "")))
      .filter(when($"clean_text" === "", lit(0)).otherwise($"rt")
        =!= $"n_tokens_clean")
    assert(bad.count() === 0)
    // the excised intervals ARE dedup_substring's merged runs, so the
    // removed mass equals that report's dup_token_mass document-wise
    val report = graft.operators.Filters.dedupSubstring(spark, sf)
      .select($"doc_id", $"dup_token_mass").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    ex.select($"doc_id", $"tokens_removed").collect().foreach { r =>
      assert(r.getLong(1) === report(r.getLong(0)), s"doc ${r.getLong(0)}")
    }
    ex.unpersist()
  }
}
