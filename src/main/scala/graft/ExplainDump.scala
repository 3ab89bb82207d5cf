package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for named queries to files —
  * the plan evidence the optimization rounds commit under plans/rNN/.
  * Shared tiers are pre-built (untimed, like the bench prewarm) so the
  * dumped plan is the steady-state one a timed rep actually runs.
  * Usage: runMain graft.ExplainDump <name>[,<name>...] <outDir> [suffix] [sfDir]
  * Writes <outDir>/<name>_<suffix>.txt (suffix defaults to "after").
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val outDir = args(1)
    val suffix = if (args.length > 2) args(2) else "after"
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineSession.local("graft-explain", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")} — " +
        "names must be SparkEntry.queries keys")
      sys.exit(2)
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // steady-state: let the query install its shared tiers first.
      // NonFatal only (ADVICE r15): an OOM/linkage error must abort the
      // dump, not produce a plan that silently isn't the steady state.
      try fn(spark, sfDir).count() catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[explain] prewarm of $name failed: ${e.getMessage}")
      }
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[explain] wrote $outDir/${name}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
