package graft
import org.apache.spark.sql.SparkSession

/** Dev probe: decompose one query's wall time into named sub-frames —
  * build the pieces exactly as the query does, time each with a count,
  * labeled via setJobDescription. Usage: runMain graft.Scratch <sfDir>. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineSession.local("graft-scratch", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.queries.Tables.t

    def time(label: String)(f: => Long): Unit = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val n = f
      println(f"SCRATCH $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      spark.sparkContext.setJobDescription(null)
    }

    // scan-floor attribution: raw text scan vs +md5 vs +group
    (1 to 2).foreach { _ =>
      val base = t(spark, dir, "documents").filter("length(text) > 0")
      time("floor.scanLen")(
        base.selectExpr("sum(length(text))").count())
      time("floor.scanMd5")(
        base.selectExpr("count(distinct md5(text))").count())
    }

    // r47: AQE on/off over the recursion (run twice each: cold/steady)
    (1 to 2).foreach { _ =>
      time("r47.aqeOn")(SparkEntry.queries("r47_recursive_cte")(spark, dir).count())
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      time("r47.aqeOff")(SparkEntry.queries("r47_recursive_cte")(spark, dir).count())
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      graft.queries.Shared.dropTransient()
    }

    // x55 decomposition (run twice: cold then steady)
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      val base = t(spark, dir, "documents").filter("length(text) > 0")
      val reps = base.selectExpr("md5(text) as pfp", "doc_id")
        .groupBy("pfp").agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      time("x55.reps")(reps.count())
      val repsRp = t(spark, dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .filter("length(text) > 0")
        .selectExpr("md5(text) as pfp", "doc_id")
        .groupBy("pfp").agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      time("x55.repsRp")(repsRp.count())
      val tilesNoRp = base.join(reps, "doc_id")
        .selectExpr("doc_id",
          "explode(array_distinct(transform(sequence(0, cast(ceil(length(text) / 32.0d) as int) - 1), i -> md5(substring(text, i * 32 + 1, 32))))) as tfp")
      time("x55.tilesNoRp")(tilesNoRp.count())
      val tiles = graft.queries.Shared.temp(base.join(reps, "doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
        .selectExpr("doc_id",
          "explode(array_distinct(transform(sequence(0, cast(ceil(length(text) / 32.0d) as int) - 1), i -> md5(substring(text, i * 32 + 1, 32))))) as tfp"))
      time("x55.tiles")(tiles.count())
      val tilesMinBy = base
        .groupBy(expr("md5(text)").as("pfp"))
        .agg(min(col("doc_id")).as("doc_id"),
          expr("min_by(text, doc_id)").as("text"))
        .repartition(spark.sparkContext.defaultParallelism)
        .selectExpr("doc_id",
          "explode(array_distinct(transform(sequence(0, cast(ceil(length(text) / 32.0d) as int) - 1), i -> md5(substring(text, i * 32 + 1, 32))))) as tfp")
      time("x55.tilesMinBy")(tilesMinBy.count())
      time("x55.full")(SparkEntry.queries("x55_media_neardup")(spark, dir).count())
      graft.queries.Shared.dropTransient()
    }
    spark.stop()
  }
}
