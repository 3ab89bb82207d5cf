package graft
import org.apache.spark.sql.SparkSession

/** Dev profiler: time named queries twice (cold/warm) at a given SF dir. */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.files.minPartitionNum", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val explain = sys.env.contains("GRAFT_EXPLAIN")
    // JIT-warm the same query shapes on the tiny SF first, so the timed
    // runs measure data work, not first-use codegen compilation
    sys.env.get("GRAFT_WARM").foreach { wdir =>
      names.foreach(n => SparkEntry.queries(n)(spark, wdir).count())
      spark.catalog.clearCache()
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      if (explain) {
        println(s"===== $n =====")
        fn(spark, dir).explain("formatted")
      } else (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        println(f"PROF $n run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
