package graft

import graft.functions.TextFunctions
import graft.functions.expressions.GraftFunctions

/** graft_shingles (codegen) must produce exactly the arrays the pure-
  * builtin higher-order spelling produces — that equivalence keeps the
  * DuckDB dedup oracles valid after the codegen upgrade.
  */
class TextFunctionsSpec extends SparkSpec {

  test("graft_shingles == higher-order transform spelling, all edge cases") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val docs = Seq(
      "a b c d e",
      "one two three",
      "two words",
      "single",
      "",
      "  padded   whitespace  run  "
    ).toDF("text")
    for (n <- Seq(2, 3, 5)) {
      val out = docs
        .select(TextFunctions.tokens($"text").as("toks"))
        .select(
          TextFunctions.wordShingles($"toks", n).as("fast"),
          TextFunctions.wordShinglesHof($"toks", n).as("ref"))
        .collect()
      out.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n")
      }
    }
  }

  test("shingle content is the expected n-grams") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val out = Seq("the quick brown fox").toDF("text")
      .select(TextFunctions.wordShingles(TextFunctions.tokens($"text"), 3).as("sh"))
      .collect().head.getSeq[String](0)
    assert(out == Seq("the quick brown", "quick brown fox"))
  }
}
