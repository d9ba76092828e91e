package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.functions.expressions.GraftFunctions

/** The native graft_dot expression must agree BITWISE with the pure-builtin
  * higher-order spelling (both are sequential index-order double folds) —
  * that equivalence is what keeps the DuckDB oracles valid after the
  * codegen upgrade.
  */
class VectorFunctionsSpec extends SparkSpec {

  test("graft_dot == higher-order fold, bitwise, including codegen path") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    val vecs = Seq.tabulate(100)(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat()), Array.fill(64)(rnd.nextFloat())))
    val df = vecs.toDF("id", "a", "b")
    val out = df.select(
      VectorFunctions.dot($"a", $"b").as("fast"),
      VectorFunctions.hofDot($"a", $"b").as("ref")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_dot null and length laws") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0))),
      (None, Some(Array(1.0))),
      (Some(Array(1.0, 2.0, 9.0)), Some(Array(2.0, 3.0))) // length mismatch: min-length prefix
    ).toDF("a", "b")
    val out = df.select(expr("graft_dot(a, b)").as("d")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 8.0)
  }

  test("lshBucket is deterministic and within plane range") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val df = Seq.tabulate(50)(i => (i, Array.fill(64)(rnd.nextFloat() - 0.5f))).toDF("id", "v")
    val buckets = df.select(VectorFunctions.lshBucket($"v", 6, 64).as("b")).collect().map(_.getInt(0))
    assert(buckets.forall(b => b >= 0 && b < 64))
    val again = df.select(VectorFunctions.lshBucket($"v", 6, 64).as("b")).collect().map(_.getInt(0))
    assert(buckets.sameElements(again))
  }
}
