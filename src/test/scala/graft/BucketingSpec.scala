package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Proof of SCALE.md's co-location claim: writing both join sides
  * bucketed by the join key removes every shuffle exchange from the
  * join — the plan Spark would run on a 1000-executor cluster reads
  * bucket i of each table on the same task. Broadcast is disabled for
  * the test so the join would otherwise be a full shuffle SMJ. */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join with zero shuffle exchanges") {
    val loc = Files.createTempDirectory("graft_buckets").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '$loc'")
    try {
      spark.read.parquet(s"$sf001/orders.parquet")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("bucketdb.b_orders")
      spark.read.parquet(s"$sf001/lineitem.parquet")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("bucketdb.b_lineitem")

      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("bucketdb.b_lineitem")
          .join(spark.table("bucketdb.b_orders"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
          !plan.contains("Exchange hashpartitioning(o_orderkey"),
          s"join should be exchange-free on bucketed tables:\n$plan")
        assert(joined.collect().map(_.getAs[Long]("n")).sum > 0)

        // control: the same join over plain parquet DOES shuffle both sides
        val unbucketed = spark.read.parquet(s"$sf001/lineitem.parquet")
          .join(spark.read.parquet(s"$sf001/orders.parquet"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        val ctrl = unbucketed.queryExecution.executedPlan.toString
        assert(ctrl.contains("Exchange hashpartitioning"),
          "control join unexpectedly shuffle-free — test is vacuous")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bucketdb.b_orders")
      spark.sql("DROP TABLE IF EXISTS bucketdb.b_lineitem")
      spark.sql("DROP DATABASE IF EXISTS bucketdb")
    }
  }
}
