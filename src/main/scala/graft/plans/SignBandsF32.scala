package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** All sign-LSH band values of a float32 vector in one fused pass.
  *
  * `sign_bands_f32(embedding)` → `array<int>` of `planes.length / 4`
  * 4-bit band values. The composable form is 16 separate
  * `aggregate(zip_with(...))` projection folds per row — interpreted,
  * and each re-traverses the 64 slots; this expression walks the vector
  * once per plane in a fused codegen loop with the ±1 hyperplanes as a
  * compile-time constant matrix.
  *
  * Numeric contract: per-plane projection is the same left-to-right
  * fold of `(double) x[i] * w[i]` the HOF form and the DuckDB chain
  * use, so band values are identical across all three forms.
  */
case class SignBandsF32(child: Expression, planes: Array[Array[Int]])
    extends UnaryExpression {

  private val nBands = planes.length / 4

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_bands_f32 expects array<float>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sign_bands_f32"

  /** Shared by eval and the generated code. */
  def compute(x: ArrayData): Array[Int] = SignBandsF32.bands(x, planes)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(compute(input.asInstanceOf[ArrayData]).map(_.asInstanceOf[Any]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "int[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val bands = ctx.freshName("bands")
      s"""
         |int[] $bands = graft.plans.SignBandsF32.bandsJava($a, $planesRef);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bands);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBandsF32 {
  /** Fused band computation (called from both eval and codegen). */
  def bandsJava(x: ArrayData, planes: Array[Array[Int]]): Array[Int] =
    bands(x, planes)

  def bands(x: ArrayData, planes: Array[Array[Int]]): Array[Int] = {
    val nBands = planes.length / 4
    val out = new Array[Int](nBands)
    var b = 0
    while (b < nBands) {
      var v = 0
      var j = 0
      while (j < 4) {
        val w = planes(4 * b + j)
        val n = math.min(x.numElements(), w.length)
        var proj = 0.0
        var i = 0
        while (i < n) {
          proj += x.getFloat(i).toDouble * w(i)
          i += 1
        }
        if (proj > 0) v += 8 >> j
        j += 1
      }
      out(b) = v
      b += 1
    }
    out
  }
}
