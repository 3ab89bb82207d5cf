package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.llm.Frag._

/** A/B measurement for the shingle-key representation decision
  * (SCALE.md): the x64 df-histogram and x48 overlap-matrix pipelines
  * run with (A) raw string shingle keys — the round-13 shape — vs
  * (B) 60-bit hashed keys (fused shingles3_h). Variants interleave
  * (ABAB…) so a host-load drift cannot masquerade as a variant
  * difference; each rep drops the transient tier first.
  *
  * Usage: runMain graft.ShingleProbe [sfDir] [reps]
  */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1x100")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.files.minPartitionNum", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    def x64Like(shingleExpr: String): DataFrame = {
      val ex = graft.queries.Tables.t(spark, dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .selectExpr(s"$shingleExpr as shs")
        .selectExpr("explode(shs) as sh")
      val byDf = ex.groupBy("sh").agg(count(lit(1)).as("df"))
        .groupBy("df").agg(count(lit(1)).as("n_shingles"))
        .selectExpr("df", "n_shingles", "df * n_shingles as mass")
      val tot = byDf.agg(sum(col("mass")).as("total_mass"))
      byDf.crossJoin(broadcast(tot))
        .selectExpr("df", "n_shingles", "mass",
          sRound6("cast(mass as double) / cast(total_mass as double)") + " as mass_frac")
    }
    def x48Like(shingleExpr: String): DataFrame = {
      val ss = graft.queries.Tables.t(spark, dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .selectExpr("source", s"$shingleExpr as shs")
        .selectExpr("source", "explode(shs) as sh")
        .distinct()
      val totals = ss.groupBy("source").agg(count(lit(1)).as("n_sh"))
      val shared = ss.groupBy("sh")
        .agg(sort_array(collect_list(col("source"))).as("ids"))
        .filter(size(col("ids")) >= 2)
        .selectExpr("posexplode(ids) as (i, source_a)", "ids")
        .selectExpr("source_a", "explode(slice(ids, i + 2, size(ids))) as source_b")
        .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_shared"))
      shared
        .join(broadcast(totals.selectExpr("source as source_a", "n_sh as n_a")), "source_a")
        .join(broadcast(totals.selectExpr("source as source_b", "n_sh as n_b")), "source_b")
        .selectExpr("source_a", "source_b", "n_shared")
    }
    val strExpr = sLet(sTokens, "tk", sShingles)
    val strFused = "shingles3(text)"
    val hashFused = "shingles3_h(text)"
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "x64/str-hof" -> (() => x64Like(strExpr)),
      "x64/str-fused" -> (() => x64Like(strFused)),
      "x64/hash-fused" -> (() => x64Like(hashFused)),
      "x48/str-fused" -> (() => x48Like(strFused)),
      "x48/hash-fused" -> (() => x48Like(hashFused)))
    // JIT warm
    variants.foreach { case (_, f) => () } // shapes warm on rep 1 below
    for (r <- 1 to reps; (name, f) <- variants) {
      graft.queries.Shared.dropTransient()
      val t0 = System.nanoTime()
      val n = f().count()
      println(f"[probe] $name%-16s rep$r: ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n rows)")
    }
    spark.stop()
  }
}
