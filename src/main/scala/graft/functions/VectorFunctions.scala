package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector expression builders (north-star similarity surface).
  *
  * All arithmetic is a LEFT FOLD over the array in index order with double
  * accumulation (`zip_with` + `aggregate`), which makes results bitwise
  * reproducible and lets the DuckDB oracle (`list_dot_product` over
  * `DOUBLE[]`, also a sequential fold) agree to the last ulp.
  *
  * Scale notes: higher-order functions don't whole-stage-codegen, but they
  * evaluate per-row with zero shuffle and no UDF boundary; for a 100 TB
  * run the hot path would be promoted to a custom Catalyst Expression with
  * `doGenCode` over primitive float arrays — semantics identical, so the
  * oracle stays valid. The wide ops (top-k per query, bucket joins) live in
  * [[graft.queries.SimilarityQueries]].
  */
object VectorFunctions {

  /** Dot product in double precision, index order — the codegen'd native
    * expression [[graft.functions.expressions.DotProductD]]. Callers must
    * have run `GraftFunctions.register(spark)` (idempotent) first.
    */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a.cast("array<double>"), b.cast("array<double>"))

  /** The pure-builtin spelling of [[dot]] (higher-order functions, no custom
    * expression). Kept as the semantic reference: the spec asserts both
    * produce bitwise-identical sums.
    */
  def hofDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Signed random-hyperplane sketch bucket (LSH for cosine): bit p is the
    * sign of `<v, s_p>` where `s_p` is a deterministic ±1 vector. Buckets
    * collide for directionally-close vectors; near-neighbor search then
    * probes only the query's bucket.
    *
    * The planes are pseudo-Hadamard: `s_p[d] = +1 if bit p of d is 0 else
    * -1` — fully deterministic and embeddable as a literal in oracle SQL.
    */
  def hyperplaneSigns(plane: Int, dim: Int): Seq[Double] =
    (0 until dim).map(d => if (((d >> plane) & 1) == 0) 1.0 else -1.0)

  def lshBucket(v: Column, planes: Int, dim: Int): Column =
    (0 until planes).map { p =>
      val s = typedLit(hyperplaneSigns(p, dim))
      when(dot(v, s) >= 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
}
