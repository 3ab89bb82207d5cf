package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the sf0.1 bench's fixed-cost floor: times the
  * scheduler/task/exchange overheads that dominate sub-second cells so
  * optimization effort goes where the measured floor actually is
  * (guide §1: measure first). Prints ms per job for: a 1-task job, a
  * 32-task job, an AQE two-stage shuffle, and a representative tiny
  * query's full analyze+plan+run cycle. */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineSession.local("graft-floorprobe", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String, n: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      val dt = (System.nanoTime() - t0) / 1e6 / n
      println(f"[floor] $label%-40s ${dt}%8.1f ms/iter")
    }

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // 1. RDD job floor, 1 task vs 32 tasks (no SQL layer)
    val rdd1 = spark.sparkContext.parallelize(1 to 10, 1).cache(); rdd1.count()
    val rdd32 = spark.sparkContext.parallelize(1 to 320, 32).cache(); rdd32.count()
    time("rdd job, 1 task", 100)(rdd1.count())
    time("rdd job, 32 tasks", 100)(rdd32.count())

    // 2. SQL action, no exchange (reused plan object: pure job cost)
    val df0 = spark.range(100).toDF("v")
    time("sql count, no exchange, reused plan", 50)(df0.count())

    // 3. SQL action with one AQE exchange (groupBy) — reused plan
    val df1 = spark.range(1000).toDF("v").selectExpr("v % 10 as k", "v")
      .groupBy("k").count()
    time("sql 1-exchange agg, reused plan", 50)(df1.count())

    // 4. Same but a FRESH DataFrame each iteration (analysis+optimize paid)
    time("sql 1-exchange agg, fresh plan", 50) {
      spark.range(1000).toDF("v").selectExpr("v % 10 as k", "v")
        .groupBy("k").count().count()
    }

    // 5. Two chained exchanges (groupBy then orderBy-count pattern)
    time("sql 2-exchange, fresh plan", 50) {
      spark.range(1000).toDF("v").selectExpr("v % 10 as k", "v")
        .groupBy("k").count().groupBy("count").count().count()
    }

    // 6. localCheckpoint cost on a tiny frame
    time("localCheckpoint tiny frame", 30) {
      spark.range(1000).toDF("v").localCheckpoint().count()
    }

    // 7. A representative tiny real query end-to-end (scan + agg)
    val q = SparkEntry.queries("r03_segment_revenue")
    time("r03_segment_revenue full cycle", 20)(q(spark, sfDir).count())

    // 8. Parquet scan job: 32 forced splits vs natural splits
    val doc = graft.queries.Tables.t(spark, sfDir, "customer")
    time("parquet scan count (minPartitionNum)", 20)(doc.count())

    spark.stop()
  }
}
