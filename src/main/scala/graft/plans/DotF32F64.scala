package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product of a float32 vector against a float64 vector —
  * the IVF assignment hot path (every vector × every centroid; the
  * centroid side is double because it carries exact decimal-derived
  * means). Same contract as [[CosineF32]]: bit-identical to the
  * interpreted `aggregate(zip_with(emb, cv, (x,w) -> double(x)*w),
  * 0d, +)` fold — one left-to-right accumulation, each float widened
  * before the multiply — so swapping it into a plan changes nothing
  * the oracle can see. Measured: the interpreted HOF made x17
  * superlinear at the 10× corpus (11.7 s); fused codegen restores the
  * linear profile.
  */
case class DotF32F64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_f32f64 expects (array<float>, array<double>), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f32f64"

  // HOF-equivalent null semantics: zip_with pads a length mismatch with
  // nulls and a null element nulls its product, which nulls the whole
  // aggregate — so any mismatch or null element yields NULL, exactly
  // like the interpreted form this replaces.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val w = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != w.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || w.isNullAt(i)) return null
      dot += x.getFloat(i).toDouble * w.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |double $dot = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += ((double) $a.getFloat($i)) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
