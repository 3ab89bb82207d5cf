package graft
import org.apache.spark.sql.SparkSession

/** Measurement harness for the standing-degree decision (SCALE.md):
  * the depth-2 walk-recall experiment across construction degrees, on
  * BOTH evaluation geometries — the corpus's ~isotropic hash vectors
  * and the clustered twin (Similarity.withSqClustered). Each line is a
  * fresh full-corpus (k, T=2) graph + capped adjacency + the standard
  * hops-2 walk graded at B=5 and B=10 against that geometry's own
  * brute-force truth.
  *
  * Usage: runMain graft.RecallStudy [sfDir] [k,k,...]
  */
object RecallStudy {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
             else Seq(5, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.files.minPartitionNum", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val es = sys.env.get("GRAFT_RECALL_ENTRIES")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(8))
    for (cl <- Seq(false, true); k <- ks; e <- es) {
      val t0 = System.nanoTime()
      val r = graft.llm.Similarity.walkRecallExperiment(
        spark, dir, iters = 2, k = k, clustered = cl, entriesN = e)
      println(f"[recall] geometry=${if (cl) "clustered" else "hash"}%-9s " +
        f"K=$k%-3d E=$e%-3d $r  (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    spark.stop()
  }
}
