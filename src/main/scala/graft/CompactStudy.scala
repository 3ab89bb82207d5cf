package graft

import graft.pipeline.SyncPipeline
import graft.views.Views
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Measurement harness for the landing-store compaction study
  * (SCALE.md §compaction): an append-only parquet landing store grows
  * one small-file batch per sync cycle (the reference's 600 s default
  * loop lands a batch every 10 minutes — thousands of files per
  * month), and every `_LATEST` read pays the file-listing + per-file
  * open cost. `compact` (the CLI's OPTIMIZE analogue) rewrites the
  * store at a target file size. This main quantifies the decay and
  * the payback: cycles → files → cold `latest().count()` seconds,
  * before and after compaction.
  *
  * Usage: runMain graft.CompactStudy <corpusDir> <cycles> [workDir]
  *   [filesPerBatch]
  * Emits one JSON line per checkpoint and a final summary line.
  * At-least-once delivery is modeled: every cycle re-lands the
  * previous cycle's slice alongside its own, so the R1 replay dedup
  * does real work on the read path being measured. `filesPerBatch`
  * (default 8) forces each append to that many files — a sync
  * writer's task parallelism, which is what makes the store decay
  * into thousands of small files in the first place.
  */
object CompactStudy {
  def main(args: Array[String]): Unit = {
    val corpus = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cycles = if (args.length > 1) args(1).toInt else 20
    val work = if (args.length > 2) args(2)
      else Files.createTempDirectory("graft_compact_study").toString
    val filesPerBatch = if (args.length > 3) args(3).toInt else 8
    val landing = s"$work/landing"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def slice(i: Int) = {
      val bd = s"timestamp'2026-01-01 00:00:00' + make_interval(0,0,0,0,0,$i,0)"
      graft.queries.Tables.t(spark, corpus, "documents")
        .filter(s"doc_id % $cycles = ${i % cycles}")
        .selectExpr(
          s"$bd as batch_date", "'DOC' as type",
          "cast(doc_id as string) as id", "cast(1 as bigint) as version",
          "0 as chunk", "source as author", s"$bd as date",
          "false as deleted",
          "to_json(named_struct('LANG', lang, 'N_CHARS', n_chars)) as data")
    }

    def files(): (Long, Long) = {
      val st = Files.walk(Paths.get(landing))
      try {
        val ps = st.iterator.asScala.filter(p =>
          p.toString.endsWith(".parquet") && Files.isRegularFile(p)).toVector
        (ps.size.toLong, ps.map(Files.size).sum)
      } finally st.close()
    }

    def coldRead(): (Double, Long) = {
      // cold: drop every cached plan/file listing so the read pays the
      // real store-open cost a fresh executor would
      spark.catalog.clearCache()
      graft.queries.Shared.dropAll()
      val t0 = System.nanoTime()
      val n = Views.latest(spark.read.schema(graft.ingest.Landing.schema)
        .parquet(landing)).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val checkpoints = Set(1, cycles / 4, cycles / 2, 3 * cycles / 4, cycles)
    (0 until cycles).foreach { i =>
      val batch = if (i == 0) slice(0)
        else slice(i).unionByName(slice(i - 1)) // at-least-once replay
      batch.repartition(filesPerBatch)
        .write.mode("append").partitionBy("type").parquet(landing)
      if (checkpoints(i + 1)) {
        val (nf, bytes) = files()
        val (sec, rows) = coldRead()
        println(s"""{"phase":"grow","cycles":${i + 1},"files":$nf,""" +
          s""""mb":${bytes >> 20},"latest_sec":${math.rint(sec * 100) / 100},"rows":$rows}""")
      }
    }
    val pipe = new SyncPipeline(spark, "", landing, work, 10000)
    val t0 = System.nanoTime()
    pipe.compact(targetFileMB = 128)
    val compactSec = (System.nanoTime() - t0) / 1e9
    val (nf, bytes) = files()
    val (sec, rows) = coldRead()
    println(s"""{"phase":"compacted","cycles":$cycles,"files":$nf,""" +
      s""""mb":${bytes >> 20},"latest_sec":${math.rint(sec * 100) / 100},""" +
      s""""rows":$rows,"compact_sec":${math.rint(compactSec * 100) / 100}}""")
    spark.stop()
  }
}
