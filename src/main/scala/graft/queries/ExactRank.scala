package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact 1-based global rank under a total order, with NO global
  * window (the `ntile().over(Window.orderBy(...))` plan funnels the
  * corpus through one task — the canonical broken plan at scale):
  *
  *  1. range-repartition on the sort key — partitions are ordered
  *     BETWEEN each other by construction;
  *  2. per-partition `row_number` — parallel, partition-bounded;
  *  3. partition-offset exclusive prefix sum over the ≤ P per-partition
  *     counts (P = partition count), via a broadcast product — tiny,
  *     keyed, no single-partition WindowExec.
  *
  * Because the order is total, the composed rank is invariant to
  * partition boundaries. Adds `rank` (1-based bigint) and `n_total`.
  * Used by r38's exact distributed NTILE and x56's deterministic
  * training-shard assignment. */
object ExactRank {
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column]): DataFrame = {
    val s = df.sparkSession
    val base = Shared.temp(df
      .repartitionByRange(s.sparkContext.defaultParallelism, sortCols: _*)
      .withColumn("__pid", spark_partition_id()))
    val c = Shared.temp(base.groupBy("__pid").agg(count(lit(1)).as("__c")))
    val offsets = c.select(col("__pid"))
      .crossJoin(broadcast(c.select(col("__pid").as("__p2"), col("__c").as("__c2"))))
      .groupBy("__pid")
      .agg(sum(when(col("__p2") < col("__pid"), col("__c2")).otherwise(lit(0L))).as("__off"),
        sum(col("__c2")).as("n_total"))
    val wLocal = Window.partitionBy("__pid").orderBy(sortCols: _*)
    base.withColumn("__lr", row_number().over(wLocal))
      .join(broadcast(offsets), "__pid")
      .withColumn("rank", col("__off") + col("__lr"))
      .drop("__pid", "__lr", "__off")
  }
}
