package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rendezvous (highest-random-weight) shard assignment in one fused
  * pass: `hrw_assign(key, n)` = argmax over w ∈ [0, n) of
  * h60(key || ':' || w) — Thaler/Ravishankar HRW hashing, the
  * placement rule whose removal of one worker moves ONLY that worker's
  * keys.
  *
  * ≡ the composable form (`transform(sequence(0, n-1), w -> h60(...))`
  * + `array_max` + `filter` for the arg), which evaluates the md5
  * through an INTERPRETED lambda and re-traverses the score array
  * three times; this computes the running argmax in registers — one
  * md5 per worker per row, no arrays, whole-stage-codegen'd. Hash
  * primitive identical to graft.llm.Frag.sH (first 60 bits of md5),
  * so assignments are bit-identical across the fused, the composable,
  * and the DuckDB forms; md5 ties are impossible, and the first
  * maximum wins on every path.
  *
  * `n` must be a foldable literal (it is a topology constant, and the
  * registry builder enforces it).
  */
case class HrwAssign(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hrw_assign expects (string, int), got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hrw_assign"

  override def nullSafeEval(key: Any, n: Any): Any =
    HrwAssign.compute(key.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k, n) =>
      s"${ev.value} = graft.plans.HrwAssign.compute($k, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HrwAssign {
  private val mdPool = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Shared by eval and generated code. */
  def compute(key: UTF8String, n: Int): Int = {
    val md = mdPool.get()
    val base = key.toString
    var best = Long.MinValue
    var arg = 0
    var w = 0
    while (w < n) {
      val h = Simhash60.h60(md, UTF8String.fromString(base + ":" + w))
      if (h > best) { best = h; arg = w } // first max wins (ties impossible)
      w += 1
    }
    arg
  }
}
