package graft

import org.apache.spark.sql.types._

import graft.sources.Tables

/** Pins the driver-fixture schemas the query pack is written against
  * (FIXTURES.md / TESTDATA.md). The testdata is regenerated between
  * rounds and CAN change shape — round 5 lost 40 queries and the whole
  * bench artifact to a silent `events.ts` re-encoding (ns → µs). This
  * spec makes the next drift fail HERE, by name, instead of as dozens of
  * scattered AnalysisExceptions: on failure, diff the parquet schema,
  * then fix the adapting loader in [[Tables]] (events already adapts per
  * encoding) and re-run the pack.
  */
class FixtureContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def fields(name: String): Map[String, DataType] =
    Tables.table(spark, dir, name).schema.fields
      .map(f => f.name -> f.dataType).toMap

  test("events: loader-normalized schema is what the pack expects") {
    // through the adapting door — ts must come out TimestampType whatever
    // the file encoding is
    val got = Tables.events(spark, dir).schema.fields
      .map(f => f.name -> f.dataType).toMap
    assert(got == Map(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType),
      s"events drifted: $got — adapt Tables.events, then re-verify the pack")
  }

  test("documents / embeddings: columns and types the text+ANN packs bind to") {
    val docs = fields("documents")
    assert(docs("doc_id") == LongType && docs("text") == StringType &&
      docs("lang") == StringType && docs("source") == StringType &&
      docs.contains("n_chars"), s"documents drifted: $docs")
    val emb = fields("embeddings")
    assert(emb("vec_id") == LongType &&
      emb("embedding") == ArrayType(FloatType, containsNull = true) &&
      emb.contains("label"), s"embeddings drifted: $emb")
  }

  test("star schema: join keys and measures the TPC-ish pack binds to") {
    val li = fields("lineitem")
    for (c <- Seq("l_orderkey", "l_partkey", "l_suppkey"))
      assert(li(c) == LongType, s"lineitem.$c drifted: ${li(c)}")
    for (c <- Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      assert(li(c) == DoubleType, s"lineitem.$c drifted: ${li(c)}")
    assert(fields("orders")("o_orderkey") == LongType)
    assert(fields("customer")("c_custkey") == LongType)
    assert(fields("nation")("n_nationkey") == IntegerType)
  }
}
