package graft.plans

import java.util.Locale
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 3-word shingles of a text column in one fused pass.
  *
  * `shingles3(text)` ≡ the composable form
  * `array_distinct(transform(sequence(1, size(tk)-2), i ->
  * concat(tk[i], ' ', tk[i+1], ' ', tk[i+2])))` over
  * `tk = split(trim(lower(text)), '\s+')` — but the HOF chain runs
  * interpreted (tokenize + per-element lambda + distinct), and it sits
  * at the base of every fuzzy-dedup operator. The fused form does
  * lowercase → trim → split → shingle → first-occurrence dedup in one
  * pass per row.
  *
  * Semantics contract (oracle-checked): identical output order to
  * `array_distinct` (first occurrence wins); same `\s+` Java-regex
  * split; `Locale.ROOT` lowercase (locale-independent, matching
  * Spark's `lower`).
  */
case class Shingles3(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles3 expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles3"

  override def nullSafeEval(input: Any): Any =
    Shingles3.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.Shingles3.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingles3 {
  private val ws = "\\s+".r.pattern

  /** Shared by eval and generated code. */
  def compute(text: UTF8String): GenericArrayData = {
    val s = text.toString.toLowerCase(Locale.ROOT).trim
    val tk = if (s.isEmpty) Array.empty[String] else ws.split(s)
    if (tk.length < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](tk.length * 2)
    var i = 0
    while (i + 2 < tk.length) {
      seen.add(tk(i) + " " + tk(i + 1) + " " + tk(i + 2))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}
