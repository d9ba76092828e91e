package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word n-gram shingling: `graft_shingles(tokens, n)` returns the
  * array of space-joined n-grams `["t0 t1 .. t(n-1)", "t1 t2 .. tn", ...]`
  * (empty when the document has fewer than n tokens).
  *
  * Semantics identical to the higher-order spelling
  * `transform(sequence(0, size-n), j -> concat_ws(' ', toks[j..j+n-1]))`
  * ([[graft.functions.TextFunctions.wordShinglesHof]]) — including
  * concat_ws's skip-null law — but as a single tight loop inside
  * whole-stage codegen instead of an interpreted lambda per position. The
  * shingle explode feeds every text-dedup pipeline (MinHash, fingerprints,
  * Jaccard), so this is the text path's hot expression the way
  * [[DotProductD]] is the vector path's.
  */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires array<string> input and n >= 1, got ${child.dataType}, n=$n")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val total = math.max(toks.numElements() - n + 1, 0)
    val out = new Array[AnyRef](total)
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < total) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val total = ctx.freshName("total")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val sep = ctx.addReferenceObj("sep", UTF8String.fromString(" "), "UTF8String")
      s"""
         |int $total = $a.numElements() - $n + 1;
         |if ($total < 0) $total = 0;
         |Object[] $out = new Object[$total];
         |for (int $i = 0; $i < $total; $i++) {
         |  UTF8String[] $parts = new UTF8String[$n];
         |  for (int $j = 0; $j < $n; $j++) {
         |    $parts[$j] = $a.getUTF8String($i + $j);
         |  }
         |  $out[$i] = UTF8String.concatWs($sep, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_shingles"
}
