package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: run one named query N times against a corpus dir and print
  * per-repetition wall times — separates real per-query cost from
  * first-use attribution (cold parquet footers, shared-frame builds,
  * codegen JIT) that the full bench necessarily lumps into whichever
  * query runs first. Accepts a comma-separated name list so a
  * multi-query measurement pays one JVM/session start.
  * Usage: runMain graft.RunOne <name>[,<name>...] [sfDir] [reps] */
object RunOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineSession.local("graft-runone", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[runone] $name rep$i: $dt%.3f s ($n rows)")
        graft.queries.Shared.dropTransient()
      }
    }
    spark.stop()
  }
}
