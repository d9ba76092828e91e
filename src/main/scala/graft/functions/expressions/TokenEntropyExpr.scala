package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd per-document unigram Shannon entropy (nats):
  * `graft_token_entropy(tokens) = ln(n) − Σ_t c_t·ln(c_t) / n` over the
  * exact integer token counts `c_t` of the array; null for an empty array
  * (an empty document has no distribution to score).
  *
  * Why an expression and not a groupBy: a document's tokens already live in
  * ONE array in ONE row — shuffling the corpus on (doc_id, token) to count
  * them (the relational spelling, and the oracle's) moves every token over
  * the wire to compute a value that never needed to leave its row. At
  * 100 TB that shuffle is the whole job; this expression makes per-doc
  * entropy a narrow map inside whole-stage codegen, so q111's only shuffle
  * is the 5-row language rollup. Same addend bag as the oracle's
  * `sum(cnt*ln(cnt))` — only the accumulation order differs, which the
  * per-doc 6dp round (applied by the caller) absorbs, exactly as it
  * already does between Spark's and DuckDB's group orders.
  */
case class TokenEntropyExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_token_entropy requires array<string> input, got ${child.dataType}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TokenEntropyExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("ent")
      s"""
         |java.lang.Double $tmp =
         |  graft.functions.expressions.TokenEntropyExpr.compute($a);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenEntropyExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_token_entropy"
}

object TokenEntropyExpr {
  /** One hash-count pass over the array: exact per-token counts. */
  private[expressions] def tokenCounts(
      toks: ArrayData): java.util.HashMap[UTF8String, java.lang.Integer] = {
    val n = toks.numElements()
    val counts = new java.util.HashMap[UTF8String, java.lang.Integer](n * 2)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      val prev = counts.get(t)
      counts.put(t, if (prev == null) 1 else prev.intValue() + 1)
      i += 1
    }
    counts
  }

  /** Static entry the generated code calls: one hash-count pass over the
    * array, one ln per distinct token. Null for empty input.
    */
  def compute(toks: ArrayData): java.lang.Double = {
    val n = toks.numElements()
    if (n == 0) return null
    var acc = 0.0
    val it = tokenCounts(toks).values().iterator()
    while (it.hasNext) {
      val c = it.next().doubleValue()
      acc += c * math.log(c)
    }
    java.lang.Double.valueOf(math.log(n.toDouble) - acc / n)
  }
}

/** Codegen'd share of the single most frequent token:
  * `graft_top_token_share(tokens) = max_t c_t / n` (null for an empty
  * array) — the Gopher-style "top word dominance" repetition gate,
  * computed in-row for the same reason as [[TokenEntropyExpr]]: the
  * tokens never needed to leave their array, so the (doc, word) count
  * shuffle the relational spelling pays is pure data movement. Exact: one
  * integer max over exact integer counts, one division — bit-identical
  * to the oracle's `max(c)/sum(c)` with no accumulation-order caveat.
  */
case class TopTokenShareExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_top_token_share requires array<string> input, got ${child.dataType}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TopTokenShareExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("share")
      s"""
         |java.lang.Double $tmp =
         |  graft.functions.expressions.TopTokenShareExpr.compute($a);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TopTokenShareExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_top_token_share"
}

object TopTokenShareExpr {
  def compute(toks: ArrayData): java.lang.Double = {
    val n = toks.numElements()
    if (n == 0) return null
    var mx = 0
    val it = TokenEntropyExpr.tokenCounts(toks).values().iterator()
    while (it.hasNext) {
      val c = it.next().intValue()
      if (c > mx) mx = c
    }
    java.lang.Double.valueOf(mx.toDouble / n.toDouble)
  }
}
