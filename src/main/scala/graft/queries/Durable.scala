package graft.queries

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable standing-index tiers: the expensive cross-query structures
  * (the NN-Descent edge list and its capped adjacency, IVF routing,
  * PQ codebook/codes, the fingerprint/band stores) persisted as
  * parquet keyed by (corpus dir, tier key, builder version), loaded
  * instead of rebuilt when fresh.
  *
  * Rationale: [[Shared]] memoizes these per SESSION, so every new
  * session rebuilds every index from scratch. At 100 TB the index IS
  * the asset — construction is hours of cluster work, and a session
  * restart must not discard it. This layer is the same move the r85
  * persistent catalog views made for the relational surface, applied
  * to the index tiers.
  *
  * Storage root: `spark.graft.indexDir` conf, else the
  * `GRAFT_INDEX_DIR` environment variable. UNSET ⇒ the layer is
  * transparent (exact [[Shared.shared]] behavior — build in-session,
  * cache in-session); nothing about the verified query surface changes
  * unless an operator opts in. On a cluster the root would be shared
  * storage (S3/HDFS); locally it is a directory.
  *
  * Layout: `<root>/<md5(corpusDir)>/<key>__<version>/` holding the
  * tier parquet plus `_graft_meta.json` with the corpus fingerprint
  * (name, length, mtime of every parquet file directly under the
  * corpus dir). Freshness = fingerprint equality: any corpus rewrite
  * (new files, appended batch, compaction) invalidates every tier of
  * that corpus at the next load. `version` carries the builder
  * parameters (e.g. `k10-t2` for the graph) so a parameter bump never
  * reads a stale structure built under the old algebra.
  *
  * Writes are atomic per tier: build → write parquet to `<dir>.tmp-N`
  * → move into place (directory rename; readers either see the old
  * complete tier or the new complete tier). The builds themselves are
  * deterministic (hash-seeded, decimal-rounded, deterministic
  * tie-breaks), so a concurrent double-build converges to identical
  * bytes and last-rename-wins is safe.
  */
object Durable {

  /** THE TIER-ELIGIBILITY RULE (round-16 codification of the contract
    * the round-13–15 verdicts reviewed): a durable tier must be
    *   (1) derived per-document (or per-token/shingle/vector) corpus
    *       STATE — never the shape of any one query's answer;
    *   (2) query-independent — multiple operators read it, none owns it;
    *   (3) version-keyed by its builder contract (normalizer, shingle
    *       width, seed count, K…) so a parameter change rebuilds;
    *   (4) corpus-fingerprint invalidated (fail-closed, [[fingerprint]]).
    * A query-shaped aggregate (a cached rank, a memoized result) must
    * NEVER become a tier. Enforced: every install goes through this
    * allowlist, and DurableTiersSpec fails on an undeclared key. */
  val allowedKeys: Set[String] = Set(
    "doc_fp", "doc_tf", "doc_stats", "shingle_df", "winnow_fps", // per-doc text state
    "minhash_ms", "simhashed", "lsh_bands", "fp_store", // dedup signatures
    "centroids", "ivf_top2", "pqCodebook", "pq_codes", // vector routing
    "exact_topk", "quantizer_margin", // serving-index calibration state
    "nnd_edges", "nnd_l1", "nnd_ud", "nnd_l1_ud", // standing ANN graph
    "nnd_edges_compacted", "tombstones") // compaction output + delete-set

  private def checkKey(key: String): Unit =
    require(allowedKeys.contains(key),
      s"undeclared durable tier '$key': add it to Durable.allowedKeys ONLY " +
        "if it is per-document corpus state, query-independent, " +
        "version-keyed and fingerprint-invalidated (see the rule above)")

  /** Per-key load outcome counters, for specs and ops visibility:
    * key → (diskHits, builds). */
  val stats = new ConcurrentHashMap[String, (Long, Long)]()

  private def bump(key: String, hit: Boolean): Unit =
    stats.merge(key, if (hit) (1L, 0L) else (0L, 1L),
      (a, b) => (a._1 + b._1, a._2 + b._2))

  def root(s: SparkSession): Option[String] = {
    val conf = s.conf.getOption("spark.graft.indexDir")
      .orElse(sys.env.get("GRAFT_INDEX_DIR"))
    conf.filter(_.nonEmpty)
  }

  private def md5(x: String): String =
    MessageDigest.getInstance("MD5").digest(x.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Corpus fingerprint: every parquet file under `dir`, recursively
    * (the same immutability contract [[Tables.t]] caches under, but
    * also covering Spark-written table DIRECTORIES of part files).
    * Listed through the Hadoop FileSystem of the path, so a remote
    * corpus (S3/HDFS) fingerprints the same way a local one does.
    *
    * FAIL-CLOSED: a path that cannot be listed, or that contains no
    * parquet files at all, yields a unique never-fresh marker — it can
    * never equal a stored meta, so the tier rebuilds rather than
    * serving a stale copy against a corpus we cannot see. (The old
    * java.io.File form returned "" for both cases, which always
    * MATCHED an empty stored meta — a remote corpus rewrite would have
    * served stale tiers forever.) */
  private[graft] def fingerprint(s: SparkSession, dir: String): String = {
    def neverFresh = "UNFRESH:" + java.util.UUID.randomUUID().toString
    try {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) return neverFresh
      val it = fs.listFiles(p, true)
      val entries = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getPath.getName.endsWith(".parquet"))
          entries += s"${f.getPath.toUri.getPath}:${f.getLen}:${f.getModificationTime}"
      }
      if (entries.isEmpty) neverFresh else entries.sorted.mkString("\n")
    } catch { case scala.util.control.NonFatal(_) => neverFresh }
  }

  private def tierDir(rootDir: String, corpus: String, key: String,
      version: String): Path =
    Paths.get(rootDir, md5(new File(corpus).getAbsolutePath),
      s"${key}__$version")

  /** The durable tier: memoized in-session via [[Shared.shared]] (one
    * cached plan per session, selective eviction preserved), loaded
    * from the index root when a fresh copy exists, built + persisted
    * to the root otherwise. With no root configured this IS
    * `Shared.shared(s, dir, key)(build)`. */
  def tier(s: SparkSession, dir: String, key: String, version: String)(
      build: => DataFrame): DataFrame = {
    checkKey(key)
    root(s) match {
      case None => Shared.shared(s, dir, key)(build)
      case Some(r) =>
        Shared.shared(s, dir, key) { loadOrBuild(s, r, dir, key, version)(build) }
    }
  }

  private def loadOrBuild(s: SparkSession, rootDir: String, dir: String,
      key: String, version: String)(build: => DataFrame): DataFrame = {
    val td = tierDir(rootDir, dir, key, version)
    val fp = fingerprint(s, dir)
    if (isFresh(td, fp)) {
      bump(key, hit = true)
      s.read.parquet(td.resolve("data.parquet").toString)
    } else {
      bump(key, hit = false)
      val df = build
      write(s, df, td, fp)
      s.read.parquet(td.resolve("data.parquet").toString)
    }
  }

  private def isFresh(td: Path, fp: String): Boolean = {
    val meta = td.resolve("_graft_meta.json")
    Files.isRegularFile(meta) &&
      new String(Files.readAllBytes(meta), StandardCharsets.UTF_8) == fp
  }

  /** HASH-BUCKETED durable tier: like [[tier]], but installed as a
    * bucketed catalog TABLE (`bucketBy` on `bucketCol` — the only form
    * of pre-shuffled storage Spark honors), so every consumer that
    * joins or groups on `bucketCol` reads it EXCHANGE-FREE: the probe
    * side shuffles to the bucket partitioning (probe-sized work), the
    * store side never does. This is ingest-time state — the standing
    * fingerprint store a sync cycle probes per batch is written once
    * per load, exactly how a warehouse clusters its dedup index.
    *
    * Location: under the index root when configured (durable — a NEW
    * session re-registers the table over the existing bucketed files
    * via CREATE TABLE … CLUSTERED BY, bucket ids are filename-encoded,
    * no rewrite), else java.io.tmpdir (session-scoped, the
    * [[Tables.bucketed]] contract). Freshness = the same corpus
    * fingerprint as every other tier; stale data rebuilds in place.
    * Bucket count 32 = the core count (a bucketed scan reads one task
    * per bucket — see Tables.bucketed's sizing note). */
  def bucketedTier(s: SparkSession, dir: String, key: String,
      version: String, bucketCol: String, nBuckets: Int = 32)(
      build: => DataFrame): DataFrame = {
    checkKey(key)
    Shared.shared(s, dir, key) {
      val fp = fingerprint(s, dir)
      val tag = md5(new File(dir).getAbsolutePath + "|" + version).take(8)
      val table = s"graft_bt_${key}_$tag"
      val loc = root(s) match {
        case Some(r) => tierDir(r, dir, key, version).resolve("bucketed.tbl")
        case None => Paths.get(System.getProperty("java.io.tmpdir"),
          s"graft_bt_${key}_${tag}_${ProcessHandle.current().pid()}")
      }
      val metaF = loc.resolve("_graft_meta.json")
      val fresh = Files.isRegularFile(metaF) &&
        new String(Files.readAllBytes(metaF), StandardCharsets.UTF_8) == fp
      bucketedTierLock.synchronized {
        if (!s.catalog.tableExists(table) || !fresh) {
          s.sql(s"DROP TABLE IF EXISTS $table") // external: files survive
          if (fresh) {
            // fresh files from a previous session: register, don't
            // rewrite — the durable read path
            bump(key, hit = true)
            val schemaDdl = build.schema.toDDL
            s.sql(s"CREATE TABLE $table ($schemaDdl) USING parquet " +
              s"CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol) " +
              s"INTO $nBuckets BUCKETS LOCATION '${loc.toString}'")
          } else {
            bump(key, hit = false)
            deleteRecursive(loc)
            build.write.mode("overwrite").format("parquet")
              .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
              .option("path", loc.toString).saveAsTable(table)
            Files.write(metaF, fp.getBytes(StandardCharsets.UTF_8))
            // under an index root, also stamp the tier dir itself so
            // `index_status` reports this tier's freshness like any other
            if (root(s).isDefined)
              Files.write(loc.getParent.resolve("_graft_meta.json"),
                fp.getBytes(StandardCharsets.UTF_8))
          }
          s.catalog.refreshTable(table)
        } else bump(key, hit = true)
      }
      s.table(table)
    }
  }
  private val bucketedTierLock = new Object

  /** Load tier (dir, key, version) ONLY if present and fingerprint-
    * fresh — never builds. The read path for optional tiers (e.g. the
    * `tombstones` set `compact_index` installs: absent on a corpus
    * that never compacted, and absence means "nothing deleted"). */
  def load(s: SparkSession, rootDir: String, dir: String, key: String,
      version: String): Option[DataFrame] = {
    val td = tierDir(rootDir, dir, key, version)
    if (isFresh(td, fingerprint(s, dir))) {
      bump(key, hit = true)
      Some(s.read.parquet(td.resolve("data.parquet").toString))
    } else None
  }

  /** Atomic tier write: parquet to a tmp sibling, fingerprint meta
    * alongside, then directory move into place. Also the write path
    * the `compact_index` CLI verb uses to install a compacted graph.
    *
    * The LIVE tier dir is never deleted before the new one is in
    * place: the old copy is renamed ASIDE first, then tmp moves in,
    * then the aside copy is removed — a concurrent reader that passed
    * the freshness check either has the old dir's inode open (renames
    * don't invalidate open reads on POSIX) or finds the new complete
    * tier. A concurrent double-install is last-writer-wins: if our
    * move finds the target recreated by the other writer, our copy is
    * discarded (the builds are deterministic — both copies are
    * byte-identical in content). */
  def write(s: SparkSession, df: DataFrame, td: Path, fp: String): Unit = {
    Files.createDirectories(td.getParent)
    val tag = ProcessHandle.current().pid() + "-" + java.lang.System.nanoTime()
    val tmp = td.getParent.resolve(td.getFileName.toString + ".tmp-" + tag)
    deleteRecursive(tmp)
    df.write.mode("overwrite").parquet(tmp.resolve("data.parquet").toString)
    Files.write(tmp.resolve("_graft_meta.json"),
      fp.getBytes(StandardCharsets.UTF_8))
    val aside = td.getParent.resolve(td.getFileName.toString + ".old-" + tag)
    def move(from: Path, to: Path): Unit =
      try Files.move(from, to, StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(from, to) }
    try {
      if (Files.exists(td))
        try move(td, aside)
        catch { case _: java.nio.file.NoSuchFileException => () } // raced
      move(tmp, td)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        deleteRecursive(tmp) // the concurrent writer won; keep theirs
    } finally deleteRecursive(aside)
  }

  /** Install `df` as tier (dir, key, version) regardless of current
    * freshness — the compaction verb's entry point. Returns the tier
    * path. */
  def install(s: SparkSession, rootDir: String, dir: String, key: String,
      version: String, df: DataFrame): String = {
    checkKey(key)
    val td = tierDir(rootDir, dir, key, version)
    write(s, df, td, fingerprint(s, dir))
    // a session that already memoized the old tier must see the new one
    Shared.invalidate(dir)
    td.toString
  }

  /** Human-readable tier inventory for (rootDir, corpus) — the
    * `index_status` CLI verb's body: one line per installed tier with
    * key__version, FRESH/STALE against the corpus's CURRENT
    * fingerprint, on-disk bytes, and this session's load/build
    * counters. The ops-visibility complement of build / ann_search /
    * compact_index. */
  def status(s: SparkSession, rootDir: String, dir: String): Seq[String] = {
    val corpusDir = Paths.get(rootDir, md5(new File(dir).getAbsolutePath))
    if (!Files.isDirectory(corpusDir))
      return Seq(s"no tiers installed for $dir under $rootDir")
    val fp = fingerprint(s, dir)
    import scala.jdk.CollectionConverters._
    val tiers = Files.list(corpusDir).iterator().asScala.toSeq
      .filter(p => Files.isDirectory(p) &&
        !p.getFileName.toString.contains(".tmp-") &&
        !p.getFileName.toString.contains(".old-"))
      .sortBy(_.getFileName.toString)
    val lines = tiers.map { td =>
      val name = td.getFileName.toString
      val fresh = isFresh(td, fp)
      val bytes = Files.walk(td).iterator().asScala
        .filter(Files.isRegularFile(_)).map(Files.size(_)).sum
      val key = name.split("__", 2).head
      val st = Option(stats.get(key))
        .map { case (h, b) => s"loads=$h builds=$b" }.getOrElse("loads=0 builds=0")
      f"$name%-28s ${if (fresh) "FRESH" else "STALE"}%-6s $bytes%10d bytes  $st"
    }
    s"index root $rootDir corpus $dir (${tiers.size} tiers)" +: lines
  }

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
}
