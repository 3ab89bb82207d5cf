package graft.plans

import java.util.Locale
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit HASHES of the distinct 3-word shingles of a text column in
  * one fused pass — the integer shuffle keys of the cross-document
  * shingle operators (x48 source overlap, x57 novelty, x64 dedup
  * pressure).
  *
  * `shingles3_h(text)` ≡ `transform(shingles3(text), s3 -> h60(s3))`
  * with the identical hash primitive (first 60 bits of md5 — the
  * cross-engine h64 in graft.llm.Frag). The point is WHAT crosses the
  * exchange: a shingle-keyed groupBy over raw strings ships one
  * ~20-byte UTF-8 triple per shingle INSTANCE; hashing at the point of
  * generation ships an 8-byte long instead, and the downstream
  * aggregations (df counts, first-seer min, posting lists) only ever
  * compare keys for equality — which the hash preserves bit-for-bit in
  * both engines (a collision, vanishingly rare in 2^60, would merge
  * the same pair of shingles on both sides).
  *
  * Order/dedup contract matches Shingles3 (first occurrence wins); the
  * dedup happens on the STRING shingle before hashing, so the output
  * equals hashing `array_distinct` of the string form element-wise.
  */
case class Shingles3H(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles3_h expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingles3_h"

  override def nullSafeEval(input: Any): Any =
    Shingles3H.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.Shingles3H.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingles3H {
  private val ws = "\\s+".r.pattern
  private val mdPool = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

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
    val md = mdPool.get()
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) {
      out(j) = Simhash60.h60(md, UTF8String.fromString(it.next()))
      j += 1
    }
    new GenericArrayData(out)
  }
}
