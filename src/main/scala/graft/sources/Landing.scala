package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier

/** Atomic, durable land-or-load for derived artifacts (trained quantizers,
  * banded signature indexes, inverted postings, CC component tables, …).
  *
  * The repo-wide pattern this hardens used to be inlined at ~25 sites:
  * `if (!tableExists) { write parquet under Files.createTempDirectory;
  * saveAsTable }` — which has two defects the landed-artifact story can't
  * carry at production posture: (a) check-then-write is not atomic, so two
  * concurrent first callers both build and the loser's half-written files
  * win or lose arbitrarily; (b) the parquet lives under a process-temp dir,
  * so a catalog entry (or a later process expecting the artifact) can
  * outlive its own data once /tmp is cleaned.
  *
  * The protocol here is the classic stage-rename-register commit:
  *
  *  1. `build(stagingPath)` writes everything under a fresh staging dir
  *     beneath the durable state root (same filesystem as the final dir, so
  *     the publish is a metadata move, never a copy). Builders keep their
  *     existing shape — `saveAsTable` with `option("path", staging/…)` —
  *     including bucketed ([[Layout.writeBucketed]]) and partitioned writes.
  *  2. The table metadata (schema DDL, partition columns, bucket spec,
  *     relative location) is captured into a `_tables.json` sidecar INSIDE
  *     the staging dir, so a brand-new process can re-register the tables
  *     from the landed files alone — bucket/partition specs live in the
  *     session catalog (in-memory here), and without the sidecar a warm
  *     start could not rebuild a `CLUSTERED BY` registration and would
  *     silently lose bucket pruning.
  *  3. Publish = one atomic rename of the staging dir onto the final dir
  *     (`java.nio` ATOMIC_MOVE on `file://`; `FileSystem.rename` elsewhere —
  *     atomic on HDFS; an object store without atomic rename needs a
  *     committer layer, which is out of scope for the state root). Losers of
  *     a cross-process race see the rename fail, delete their staging, and
  *     read the winner's artifact — which is complete by construction, since
  *     it only becomes visible through the rename.
  *  4. Registration (`CREATE TABLE IF NOT EXISTS … USING parquet LOCATION`)
  *     happens LAST, against the final dir only — no reader can ever resolve
  *     a table to half-built files.
  *
  * State root resolution: the `graft.state.dir` system property, else the
  * `GRAFT_STATE_DIR` environment variable, else `spark.sql.warehouse.dir`
  * (so by default the artifact data shares fate with the catalog's own
  * storage root). [[graft.Verify]]/[[graft.Bench]] pin a per-run root so the
  * driver's gates measure their own land every round instead of inheriting a
  * prior round's artifacts; library users get cross-process durability.
  *
  * [[FormatVersion]] is part of the on-disk path: bump it whenever any
  * landed artifact's schema or semantics changes, so a durable root never
  * serves a stale-format artifact to newer code.
  */
object Landing {
  /** On-disk format/semantics version of ALL landed artifacts (one shared
    * token: artifacts are cheap to rebuild relative to the cost of a stale
    * read, so any builder change invalidates the whole root). */
  val FormatVersion = "v1"

  // per-artifact in-process build lock: a second thread ensuring the same
  // artifact blocks here, re-checks, and returns without building (the
  // cross-PROCESS race is settled by the atomic rename instead)
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(artifact: String): Object =
    locks.computeIfAbsent(artifact, _ => new Object)

  def stateRoot(spark: SparkSession): Path = {
    val base = sys.props.get("graft.state.dir")
      .orElse(sys.env.get("GRAFT_STATE_DIR"))
      .getOrElse(spark.conf.get("spark.sql.warehouse.dir"))
    new Path(new Path(base), s"graft_state/$FormatVersion")
  }

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Land-or-load a set of catalog tables as ONE atomic artifact.
    *
    * `build(stagingPath)` must register every table in `tables` with its
    * data under `stagingPath` (the existing `land*` builders do exactly
    * this). On return, every table in `tables` is registered against the
    * published final dir. Idempotent; safe under concurrent callers in this
    * process (lock) and across processes (rename). */
  def ensureLanded(spark: SparkSession, artifact: String,
      tables: Seq[String])(build: String => Unit): Unit = {
    if (tables.forall(spark.catalog.tableExists)) return
    lockFor(artifact).synchronized {
      if (tables.forall(spark.catalog.tableExists)) return
      val root = stateRoot(spark)
      val fs = fsFor(spark, root)
      val fin = fs.makeQualified(new Path(root, artifact))
      if (!fs.exists(fin)) {
        fs.mkdirs(root)
        val staging = fs.makeQualified(new Path(root,
          s".staging-$artifact-${UUID.randomUUID().toString.take(8)}"))
        build(staging.toString)
        writeSidecar(spark, fs, staging, tables)
        val won = publish(fs, staging, fin)
        // the build registered `tables` against staging paths (renamed away
        // if we won, about to be deleted if we lost) — drop those bindings
        // before re-registering against the published dir
        tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
        if (!won) {
          fs.delete(staging, true)
          require(fs.exists(fin),
            s"publish of landed artifact $artifact failed with no winner at $fin")
        }
      }
      registerAll(spark, fs, fin, tables)
    }
  }

  /** Land-or-load a plain parquet DIRECTORY artifact (no catalog tables):
    * `build(stagingPath)` writes files under the staging dir; the published
    * final dir's path is returned. Same atomicity/durability contract as
    * [[ensureLanded]]. */
  def ensureDir(spark: SparkSession, artifact: String)
      (build: String => Unit): String = {
    val root = stateRoot(spark)
    val fs = fsFor(spark, root)
    val fin = fs.makeQualified(new Path(root, artifact))
    if (!fs.exists(fin)) lockFor(artifact).synchronized {
      if (!fs.exists(fin)) {
        fs.mkdirs(root)
        val staging = fs.makeQualified(new Path(root,
          s".staging-$artifact-${UUID.randomUUID().toString.take(8)}"))
        build(staging.toString)
        if (!publish(fs, staging, fin)) {
          fs.delete(staging, true)
          require(fs.exists(fin),
            s"publish of landed artifact $artifact failed with no winner at $fin")
        }
      }
    }
    fin.toString
  }

  /** Atomic publish of `staging` onto `fin`. Returns true iff THIS call's
    * staging became the artifact (false = a concurrent lander won). */
  private def publish(fs: FileSystem, staging: Path, fin: Path): Boolean = {
    if (fs.exists(fin)) return false
    val scheme = Option(fin.toUri.getScheme).getOrElse("file")
    if (scheme == "file") {
      // rename(2) semantics: atomic, and fails (ENOTEMPTY) when a concurrent
      // winner's non-empty dir already occupies fin — exactly the loser path
      try {
        java.nio.file.Files.move(
          java.nio.file.Paths.get(staging.toUri.getPath),
          java.nio.file.Paths.get(fin.toUri.getPath),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        true
      } catch { case _: java.nio.file.FileSystemException => false }
    } else {
      // HDFS rename is atomic and returns false when fin exists; object
      // stores without atomic rename need a committer layer (scaladoc)
      fs.rename(staging, fin)
    }
  }

  // ------------------------------------------------------------------
  // sidecar: enough catalog metadata to re-register every table of the
  // artifact in a fresh process — schema (also covers empty tables, where
  // footer inference has nothing to read), partition cols, bucket spec
  // ------------------------------------------------------------------

  private val SidecarName = "_tables.json"

  private def writeSidecar(spark: SparkSession, fs: FileSystem,
      staging: Path, tables: Seq[String]): Unit = {
    val stagingStr = staging.toString
    val entries = tables.map { t =>
      val m = spark.sessionState.catalog.getTableMetadata(TableIdentifier(t))
      val loc = fs.makeQualified(new Path(m.location)).toString
      require(loc.startsWith(stagingStr),
        s"landed table $t's data ($loc) is not under its staging dir $stagingStr")
      val rel = loc.stripPrefix(stagingStr).stripPrefix("/")
      val bucket = m.bucketSpec.map { b =>
        s""","bucket":{"n":${b.numBuckets},"cols":${jsonArr(b.bucketColumnNames)},"sortCols":${jsonArr(b.sortColumnNames)}}"""
      }.getOrElse("")
      s"""{"name":${jsonStr(t)},"rel":${jsonStr(rel)},"schema":${jsonStr(m.schema.toDDL)},"partitionCols":${jsonArr(m.partitionColumnNames)}$bucket}"""
    }
    val out = fs.create(new Path(staging, SidecarName), false)
    try out.write(entries.mkString("[", ",\n", "]").getBytes("UTF-8"))
    finally out.close()
  }

  private def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def jsonArr(xs: Seq[String]): String =
    xs.map(jsonStr).mkString("[", ",", "]")

  private case class SidecarEntry(name: String, rel: String, schema: String,
      partitionCols: Seq[String], bucket: Option[(Int, Seq[String], Seq[String])])

  private def readSidecar(spark: SparkSession, fs: FileSystem,
      fin: Path): Map[String, SidecarEntry] = {
    val in = fs.open(new Path(fin, SidecarName))
    val raw = try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toString("UTF-8")
    } finally in.close()
    // parse with the JSON parser already on the classpath (json4s ships
    // with Spark) — the sidecar is trusted self-authored metadata
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(raw) match {
      case JArray(items) => items.map { item =>
        def str(f: String): String = (item \ f) match {
          case JString(s) => s
          case other => sys.error(s"sidecar field $f: unexpected $other")
        }
        def strs(v: JValue): Seq[String] = v match {
          case JArray(xs) => xs.map { case JString(s) => s
            case other => sys.error(s"sidecar array element: $other") }
          case JNothing => Nil
          case other => sys.error(s"sidecar array: unexpected $other")
        }
        val bucket = (item \ "bucket") match {
          case JNothing | JNull => None
          case b =>
            val n = (b \ "n") match {
              case JInt(i) => i.toInt
              case other => sys.error(s"sidecar bucket n: $other")
            }
            Some((n, strs(b \ "cols"), strs(b \ "sortCols")))
        }
        val e = SidecarEntry(str("name"), str("rel"), str("schema"),
          strs(item \ "partitionCols"), bucket)
        e.name -> e
      }.toMap
      case other => sys.error(s"sidecar ${new Path(fin, SidecarName)}: $other")
    }
  }

  private def registerAll(spark: SparkSession, fs: FileSystem, fin: Path,
      tables: Seq[String]): Unit = {
    lazy val metas = readSidecar(spark, fs, fin)
    tables.foreach { t =>
      if (!spark.catalog.tableExists(t)) {
        val m = metas.getOrElse(t,
          sys.error(s"landed artifact at $fin has no sidecar entry for table $t"))
        val part =
          if (m.partitionCols.isEmpty) ""
          else m.partitionCols.mkString(" PARTITIONED BY (`", "`, `", "`)")
        val bucket = m.bucket.map { case (n, cols, sortCols) =>
          val sorted =
            if (sortCols.isEmpty) ""
            else sortCols.mkString(" SORTED BY (`", "`, `", "`)")
          cols.mkString(" CLUSTERED BY (`", "`, `", s"`)$sorted INTO $n BUCKETS")
        }.getOrElse("")
        val loc = new Path(fin, m.rel).toString.replace("'", "''")
        spark.sql(s"CREATE TABLE IF NOT EXISTS `$t` (${m.schema}) " +
          s"USING parquet$part$bucket LOCATION '$loc'")
        // partition metadata lives in the catalog — discover the landed
        // dirs (the external-table MSCK step)
        if (m.partitionCols.nonEmpty) spark.catalog.recoverPartitions(t)
      }
    }
  }
}
