package graft.functions.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two `array<double>` columns.
  *
  * The similarity-search surface (SURVEY.md north-star; cosine top-k /
  * LSH probing in [[graft.queries.SimilarityQueries]]) evaluates a dot
  * product per candidate PAIR — the one expression in the engine that runs
  * O(pairs × dim) times. The `zip_with`+`aggregate` higher-order spelling
  * allocates a lambda frame per element and never enters whole-stage
  * codegen; this expression is a tight primitive loop that does, which is
  * the difference between interpreted seconds at sf0.1 and hours at 100 TB.
  *
  * Semantics are IDENTICAL to the higher-order spelling and to DuckDB's
  * `list_dot_product` over `DOUBLE[]`: a sequential index-order sum in
  * double precision — so the DuckDB oracle stays bit-true.
  *
  * Null law: null if either array is null; null ELEMENTS contribute 0
  * (embeddings are non-null throughout the fixtures; the law only needs to
  * be deterministic).
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $sum += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** Session registration for graft's native expressions. Idempotent —
  * `registerFunction` overwrites. Spark-first extension point (c) from the
  * design brief: a Catalyst Expression, not a UDF.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductD].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProductD(children.head, children(1)))
    // Bloom-filter pair for semi-join pre-pruning (the runtime-filter
    // primitive Spark itself uses for shuffle pruning, exposed as a
    // first-class surface): graft_bloom_agg(xxhash64(k)[, est_items])
    // builds a mergeable filter, graft_bloom_contains(bf, xxhash64(k))
    // probes it. Catalyst-native (no UDF) — the aggregate is
    // TypedImperative with partial merge, the probe codegens.
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
        case Seq(c, n) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n)
        case _ => throw new IllegalArgumentException(
          "graft_bloom_agg(hash64[, est_items]) takes 1 or 2 arguments")
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_bloom_contains"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_token_entropy"),
      new ExpressionInfo(classOf[TokenEntropyExpr].getName, "graft_token_entropy"),
      (children: Seq[Expression]) => TokenEntropyExpr(children.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_top_token_share"),
      new ExpressionInfo(classOf[TopTokenShareExpr].getName, "graft_top_token_share"),
      (children: Seq[Expression]) => TopTokenShareExpr(children.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShinglesExpr].getName, "graft_shingles"),
      (children: Seq[Expression]) => children match {
        case Seq(toks, org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _)) =>
          ShinglesExpr(toks, n)
        case _ => throw new IllegalArgumentException(
          "graft_shingles(tokens, n) requires a literal integer n")
      })
  }
}
