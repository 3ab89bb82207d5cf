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

    // x73 decomposition (forcing sums so nothing prunes; noop-style)
    (1 to 2).foreach { _ =>
      def q = t(spark, dir, "documents")
        .selectExpr("doc_id", s"${graft.llm.Frag.sTokens} as tk")
        .selectExpr("doc_id",
          s"${graft.llm.Frag.sDistinctRatio} as dr",
          s"${graft.llm.Frag.sLengthScore} as ls")
        .selectExpr("doc_id", graft.llm.Frag.sRound6("dr * ls") + " as quality")
      time("x73.qualityEval")(
        q.agg(sum(col("quality"))).count())
      time("x73.qualityNoop") {
        q.write.format("noop").mode("overwrite").save(); 0L
      }
      time("x73.tokenizeNoop") {
        t(spark, dir, "documents")
          .selectExpr("doc_id", s"${graft.llm.Frag.sTokens} as tk")
          .write.format("noop").mode("overwrite").save(); 0L
      }
      val pre = graft.queries.Shared.temp(q)
      time("x73.preCacheBuild")(pre.agg(sum(col("quality"))).count())
      time("x73.rangeRepart")(
        pre.repartitionByRange(32, col("quality"), col("doc_id"))
          .agg(sum(col("quality"))).count())
      graft.queries.Shared.dropTransient()
      def qLet = t(spark, dir, "documents")
        .selectExpr("doc_id", graft.llm.Frag.sRound6(
          graft.llm.Frag.sLet(graft.llm.Frag.sTokens, "tk",
            s"(${graft.llm.Frag.sDistinctRatio}) * (${graft.llm.Frag.sLengthScore})")) + " as quality")
      val preLet = graft.queries.Shared.temp(qLet)
      time("x73.preCacheBuildLet")(preLet.agg(sum(col("quality"))).count())
      graft.queries.Shared.dropTransient()
      val preTriv = graft.queries.Shared.temp(
        t(spark, dir, "documents")
          .selectExpr("doc_id", "cast(length(text) as double) as quality"))
      time("x73.preCacheTrivial")(preTriv.agg(sum(col("quality"))).count())
      graft.queries.Shared.dropTransient()
      val preRp = graft.queries.Shared.temp(q
        .repartition(spark.sparkContext.defaultParallelism))
      time("x73.preCacheRepart")(preRp.agg(sum(col("quality"))).count())
      graft.queries.Shared.dropTransient()
      val ranked = graft.queries.ExactRank.withGlobalRank(q,
          Seq(col("quality"), col("doc_id")))
      time("x73.rankedForce")(ranked.agg(sum(col("rank"))).count())
      graft.queries.Shared.dropTransient()
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
