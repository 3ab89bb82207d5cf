package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure how a Zipf-skewed shuffle join behaves under
  * (a) AQE's OptimizeSkewedJoin, (b) no mitigation at all (the
  * straggler baseline), and (c) the manual r26-style salted rewrite —
  * the numbers behind SCALE.md's residual-skew paragraph. The fact
  * side puts ~80% of all rows on one key, so one reducer holds half
  * the table unless something intervenes.
  * Usage: runMain graft.SkewProbe [nRows] [reps] */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 20000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle join
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def fact = spark.range(n).selectExpr(
      "case when id % 100 < 80 then 0L else (id % 200) + 1 end as k",
      "id % 97 as v")
    def dim = spark.range(201).selectExpr("id as k", "id * 7 as w")

    def time(label: String)(body: => Long): Unit =
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        val cnt = body
        println(f"[skew] $label rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($cnt)")
      }

    def join() = fact.join(dim, "k").agg(sum(expr("v + w")), count(lit(1)))

    // one untimed pass so JIT/codegen warmup doesn't land on whichever
    // arm runs first
    join().collect()

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // the defaults (256 MB threshold) are sized for multi-GB shuffles;
    // scale them to this corpus so the hot partition is "skewed" in the
    // same proportion a production one is
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16777216")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16777216")
    time("aqe-skew")(join().collect().head.getLong(1))
    val j = join()
    j.collect()
    println("[skew] aqe plan fired: " +
      j.queryExecution.executedPlan.toString.contains("skew=true"))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    time("straggler")(join().collect().head.getLong(1))

    // r26's manual salt: replicate the dimension ×16, key the probe side
    // on (k, row%16) — correct for any downstream shape, incl. the
    // same-key aggregations AQE's split cannot serve
    val salts = 16
    def salted() = {
      val saltedDim = dim.selectExpr("k", "w",
        s"explode(sequence(0, ${salts - 1})) as salt")
      fact.selectExpr("k", "v", s"cast(v % $salts as int) as salt")
        .join(saltedDim, Seq("k", "salt"))
        .agg(sum(expr("v + w")), count(lit(1)))
    }
    time("salted")(salted().collect().head.getLong(1))
    spark.stop()
  }
}
