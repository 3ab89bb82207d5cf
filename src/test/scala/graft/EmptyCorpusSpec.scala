package graft

/** Degenerate-input hardening: every [EXT] operator run against a
  * 0-row corpus (documents/embeddings with the right schemas but no
  * rows). At 100 TB this is not a corner case — an empty partition, a
  * source filtered to nothing, a first sync before data lands — and
  * an operator that throws on it takes the whole pipeline run down.
  * The contract is: empty in, empty (or zero-valued aggregate) out,
  * never an exception. */
class EmptyCorpusSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = "/tmp/graft_sfempty"
    Seq("documents", "embeddings").foreach { tbl =>
      spark.read.parquet(s"$sf001/$tbl.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$tbl.parquet")
    }
    dir
  }

  private val extNames: Seq[String] =
    (graft.llm.Dedup.queries.keySet ++
      graft.llm.Similarity.queries.keySet ++
      graft.llm.TextAnalysis.queries.keySet ++
      graft.llm.Multimodal.queries.keySet).toSeq.sorted

  test("every [EXT] operator survives a 0-row corpus without throwing") {
    val failures = extNames.flatMap { name =>
      try {
        SparkEntry.queries(name)(spark, emptyDir).count()
        None
      } catch {
        case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} " +
            String.valueOf(e.getMessage).linesIterator.take(1).mkString.take(160))
      }
    }
    assert(failures.isEmpty,
      s"${failures.length} operators crashed on an empty corpus:\n" +
        failures.mkString("\n"))
  }
}
