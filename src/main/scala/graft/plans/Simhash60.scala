package graft.plans

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit SimHash of a shingle set in one fused pass.
  *
  * `simhash60(shingles)` ≡ the distributed form (explode → md5-hash →
  * 60 per-bit majority sums → reassemble), with the identical hash
  * primitive: bit b of h = bit b of the first 15 hex chars of
  * md5(shingle) parsed base-16 — i.e. the first 60 bits of the digest.
  * The distributed form costs a shuffle and a 60-column aggregation;
  * this is a narrow map, O(|shingles| × 60) compiled bit ops per row
  * (a 10^6-shingle document is ~60M ops — still sub-second), so the
  * operator needs no shuffle at all until the hamming-chunk join.
  */
case class Simhash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any =
    Simhash60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.Simhash60.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Simhash60 {
  private val mdPool = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(s) — equals parsing the first 15 hex chars
    * base-16 (the cross-engine h64 primitive in graft.llm.Frag). */
  def h60(md: MessageDigest, s: UTF8String): Long = {
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def compute(shingles: ArrayData): Long = {
    val md = mdPool.get()
    val n = shingles.numElements()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = h60(md, shingles.getUTF8String(i))
      var b = 0
      while (b < 60) {
        counts(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var word = 0L
    var b = 0
    while (b < 60) {
      if (2 * counts(b) > n) word |= 1L << b
      b += 1
    }
    word
  }
}
