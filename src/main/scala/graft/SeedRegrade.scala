package graft
import org.apache.spark.sql.SparkSession

/** Measurement harness for the round-15 seeding decision (SCALE.md):
  * the standing-index width curve (x132's exact shape, hops=2,
  * B ∈ {1, 5, 10}) run under BOTH entry seedings — uniform hash (the
  * retired default) and IVF-routed serving entries (the new
  * `ann_search` default) — on the corpus's hash geometry. The
  * clustered-geometry A/B is x136/x137 (slice index): IVF reaches
  * recall@10 = 1.0 at E=8 where hash seeding needs E=32.
  *
  * Usage: runMain graft.SeedRegrade [sfDir]
  */
object SeedRegrade {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.files.minPartitionNum", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    graft.llm.Similarity.seedRegradeTable(spark, dir).collect().foreach { r =>
      println(f"[regrade] seeding=${r.getString(0)}%-5s B=${r.getLong(1)}%-3d " +
        f"n=${r.getLong(2)}%-4d hits=${r.getLong(3)}%-4d recall@10=${r.getDouble(4)}%.4f")
    }
    println(f"[regrade] total ${(System.nanoTime() - t0) / 1e9}%.1f s at $dir")
    spark.stop()
  }
}
