package graft

import org.apache.spark.sql.functions._

class TokenizeTfSpec extends SparkSpec {

  test("tokenize_tf is registered by GraftExtensions") {
    assert(spark.catalog.functionExists("tokenize_tf"))
  }

  /** The fused map must be exactly the multiset of
    * split(trim(lower(text)), '\s+') — including the leading/trailing
    * '' tokens the Java-regex split produces around non-space
    * whitespace, Unicode lowercasing, and the ['']-on-empty case. */
  test("tokenize_tf equals counting the composable split on edge cases") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox the the QUICK",
      "", // split('') = ['']
      "   ", // trim eats spaces -> ''
      "\tleading tab", // leading '' token survives trim
      "trailing newline\n", // trailing '' token (negative-limit split)
      "\n", // ['', '']
      "a  b\t\tc\r\nd", // mixed separator runs merge
      " padded  both  sides ",
      "Üppige GRÖSSE — çedilla İstanbul", // Unicode lowercase paths
      "non breaking space stays one token", // \s is ASCII-only
      "x", "x y x y x",
    ).toDF("text")
    val fused = texts.selectExpr(
      "explode(tokenize_tf(text)) as (token, tf)")
      .groupBy("token").agg(sum("tf").as("tf"))
    val composed = texts.selectExpr(
      "explode(split(trim(lower(text)), '\\\\s+')) as token")
      .groupBy("token").agg(count(lit(1)).as("tf"))
    assert(fused.exceptAll(composed).isEmpty && composed.exceptAll(fused).isEmpty,
      s"fused=${fused.collect().toSeq.sortBy(_.toString)} " +
        s"composed=${composed.collect().toSeq.sortBy(_.toString)}")
  }

  test("tokenize_tf matches the composable form on the real corpus") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val fused = docs.selectExpr("doc_id",
      "explode(tokenize_tf(text)) as (token, tf)")
    val composed = docs.selectExpr("doc_id",
      "explode(split(trim(lower(text)), '\\\\s+')) as token")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    assert(fused.exceptAll(composed).isEmpty &&
      composed.exceptAll(fused).isEmpty)
  }

  test("tokenize_tf of null is null; map keys are distinct per row") {
    val r = spark.sql(
      "SELECT tokenize_tf(cast(null as string)) AS m").collect().head
    assert(r.isNullAt(0))
    val dup = spark.sql(
      "SELECT size(tokenize_tf('a a a b')) AS n").collect().head.getInt(0)
    assert(dup == 2)
  }
}
