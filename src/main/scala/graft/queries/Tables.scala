package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the oracle-verified query surface. */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.parquet may carry TIMESTAMP(NANOS), which Spark's
      // vectorized reader rejects; read nanos as long and truncate to
      // micros (the truncation DuckDB applies casting TIMESTAMP_NS →
      // TIMESTAMP). Corpora with plain micros timestamps read as-is.
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = s.read.parquet(s"$dir/$name.parquet")
      if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else df
    } else s.read.parquet(s"$dir/$name.parquet")

  /** Order-independent exact double sum: accumulate in decimal (exact,
    * associative — immune to parallel summation order), present as
    * double. The DuckDB oracles use the identical CAST(SUM(CAST(..))) so
    * both engines produce bit-equal doubles. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18 + scale, scale))).cast("double")

  /** Exact mean via decimal sum / double count (deterministic division of
    * identical operands on both engines). */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(c).cast("double")

  val cnt: Column = count(lit(1))
}
