package graft.plans

import java.util.Locale
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize-and-count: per-row `map<token, occurrences>` in ONE
  * pass over the text.
  *
  * `tokenize_tf(text)` ≡ counting the elements of
  * `split(trim(lower(text)), '\s+')` — the tokenizer every token-
  * statistics query shares — but the composable form explodes one row
  * per token INSTANCE and re-aggregates them, so the shuffle-side
  * hash aggregate touches the full occurrence stream. This expression
  * collapses the within-document combine into the scan itself: what
  * leaves the row is one `(token, tf)` entry per DISTINCT token, a
  * mean-tokens-per-doc-factor less volume, and the downstream
  * aggregation keys directly on the vocabulary. At 100 TB the
  * tokenize scan IS the query (r23's 100× cell was 48 s of explode
  * throughput on a correct plan).
  *
  * Semantics contract (oracle-checked): entries are exactly the
  * multiset `split(trim(lower(text)), '\s+')` — Java-regex `\s+`
  * split with negative limit (a leading separator run yields one
  * leading `''` token, a trailing run one trailing `''`, the empty
  * string one `''`), Spark `trim` (strips 0x20 ONLY — not tabs or
  * newlines), `Locale.ROOT` lowercase (matching Spark's `lower`).
  * Key order is first occurrence; consumers aggregate, so order never
  * reaches a result.
  */
case class TokenizeTf(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tokenize_tf expects string, got ${other.catalogString}")
  }
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "tokenize_tf"

  override def nullSafeEval(input: Any): Any =
    TokenizeTf.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.TokenizeTf.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenizeTf {
  // Java regex \s — ASCII-only; non-ASCII whitespace is token content,
  // exactly as in split(text, '\\s+')
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** Shared by eval and generated code. */
  def compute(text: UTF8String): MapData = {
    val s = text.toString.toLowerCase(Locale.ROOT)
    // Spark's trim strips ASCII space (0x20) only — NOT Java
    // String.trim, which also eats tabs/newlines and would silently
    // drop the leading/trailing '' tokens the split form produces
    var st = 0
    var en = s.length
    while (st < en && s.charAt(st) == ' ') st += 1
    while (en > st && s.charAt(en - 1) == ' ') en -= 1
    val counts = new java.util.LinkedHashMap[String, Array[Long]]()
    @inline def add(tok: String): Unit = {
      val c = counts.get(tok)
      if (c == null) counts.put(tok, Array(1L)) else c(0) += 1L
    }
    if (st == en) add("")
    else {
      var i = st
      var tokStart = st
      while (i < en) {
        if (isWs(s.charAt(i))) {
          add(s.substring(tokStart, i)) // '' for a leading separator run
          i += 1
          while (i < en && isWs(s.charAt(i))) i += 1
          tokStart = i
        } else i += 1
      }
      add(s.substring(tokStart, en)) // '' if the text ends in a run
    }
    val n = counts.size
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = UTF8String.fromString(e.getKey)
      vals(j) = e.getValue()(0)
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}
