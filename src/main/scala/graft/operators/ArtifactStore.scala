package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Cross-session stored artifacts: the on-disk generalization of the
  * stored-index pattern q95/q96/q98 already use (PQ codebooks written next
  * to the corpus) — applied to every expensive session hub (the corpus
  * term-frequency index, the gram explode, the IVF/Lloyd tower, the PPJoin
  * prefix index, the daily event rollup).
  *
  * Why: [[ResultMemo]] and [[CacheRegistry]] make a hub build once per
  * SESSION — but a real deployment restarts, and a 100 TB engine cannot
  * re-pay an index build (a full-corpus tokenize + shuffle) on every
  * restart. The artifact store gives those hubs published-artifact
  * semantics across sessions: build once, write parquet + a fingerprint
  * sidecar, and every later session (or bench pass) whose INPUTS are
  * byte-identical loads the stored table instead of re-deriving it.
  *
  * Invalidation is structural, the [[graft.plans.TopicBucketPruning]]
  * sidecar discipline: the sidecar records an md5 over the sorted
  * (name, mtime, length) triples of every input file plus the build's
  * parameter string. Rewriting an input under the SAME path changes its
  * (mtime, len) identity, the fingerprint stops matching, and the next
  * load rebuilds — a stale artifact is unreachable, never served. A
  * changed build parameter (k-means iteration count, shingle width)
  * invalidates the same way via `params`.
  *
  * Commit protocol (concurrent-writer safe): build into a nonce-suffixed
  * temp dir, write the sidecar into it LAST (sidecar presence == commit
  * marker), then swap it in with delete + rename. A reader that races a
  * swap sees either the old committed artifact or the new one; a
  * half-written dir is never at the published path. Writers in one JVM
  * serialize per artifact path; a cross-JVM losing writer just rebuilt
  * the same deterministic table and overwrites with identical content.
  *
  * Opt-in by conf: `spark.graft.artifacts.dir` names the store root
  * (Bench and Verify set it; plan-audit test sessions leave it unset so
  * linters sweep the REAL derivation plans, not a stored-table scan).
  * Unset conf or any storage failure falls back to the in-session build —
  * the store is a cache tier, never a correctness dependency. Determinism
  * contract: `build` must be value-deterministic (every hub here already
  * is — rounded Lloyd averages, md5 hashes, exact decimal sums), because
  * a loaded artifact must hash-match a fresh derivation.
  */
object ArtifactStore {

  val ConfKey = "spark.graft.artifacts.dir"

  /** Sidecar file inside a committed artifact directory. Underscore-
    * prefixed, so parquet directory listings ignore it (`_SUCCESS`
    * convention).
    */
  val MetaFile = "_graft_artifact.json"

  private val nonce = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Per-published-path intra-JVM build locks. */
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Build counter per artifact name — observable by specs ("second load
    * did NOT rebuild"; "rewritten input DID").
    */
  private val builds =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def buildCount(name: String): Long =
    Option(builds.get(name)).map(_.longValue).getOrElse(0L)

  def root(s: SparkSession): Option[String] =
    s.conf.getOption(ConfKey).map(_.trim).filter(_.nonEmpty)

  /** Stored-or-built table. `inputs` are the paths (files or directories)
    * the build reads; `params` is any non-path build configuration that
    * must participate in invalidation. Returns the published parquet scan
    * when a committed artifact matches the current fingerprint, else runs
    * `build`, publishes it, and returns a scan of the fresh artifact (so
    * hit and miss hand every caller the SAME plan shape — one parquet
    * scan — and the cache manager dedupes repeat callers within the
    * session exactly as it did for the derived plans).
    */
  def table(s: SparkSession, name: String, inputs: Seq[String],
      params: String = "")(build: => DataFrame): DataFrame =
    tables(s, Seq(name), inputs, params)(Seq(build)).head

  /** Multi-table variant for builds that produce SIBLING tables from one
    * chain (an IVF tower's cells + centroids; PPJoin's sets + prefix
    * rows): `builds` are evaluated only on a miss, all tables publish
    * under one fingerprint, and a partial store (some names committed,
    * some missing/stale) rebuilds the whole group — siblings from
    * different builds must never mix.
    */
  def tables(s: SparkSession, names: Seq[String], inputs: Seq[String],
      params: String = "")(builders: => Seq[DataFrame]): Seq[DataFrame] = {
    root(s) match {
      case None => builders
      case Some(r) =>
        try {
          val fp = fingerprint(s, inputs, params)
          val dirs = names.map(n => new Path(artifactDir(r, inputs, n)))
          val fs = dirs.head.getFileSystem(s.sessionState.newHadoopConf())
          val lock = locks.computeIfAbsent(dirs.head.toString, _ => new Object)
          lock.synchronized {
            if (dirs.forall(d => committedMatches(s, fs, d, fp)))
              dirs.map(d => load(s, fs, d))
            else {
              val built = builders
              require(built.size == names.size,
                s"ArtifactStore.tables: ${names.size} names, ${built.size} builds")
              names.zip(built).zip(dirs).map { case ((n, df), d) =>
                publish(s, fs, d, n, fp, df)
                builds.merge(n, 1L, (a, b) => a + b)
                load(s, fs, d)
              }
            }
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"[graft] artifact store unavailable for ${names.mkString(",")}" +
                s" (${e.getMessage}); building in-session")
            builders
        }
    }
  }

  /** md5 over the sorted identity triples of every data file reachable
    * from `inputs` (one directory level — the layouts here are flat
    * parquet), plus `params` and a format version. Hidden files (`_`/`.`
    * prefixed) are metadata, not data: a rewritten `_SUCCESS` alone must
    * not invalidate.
    */
  def fingerprint(s: SparkSession, inputs: Seq[String],
      params: String): String = {
    val conf = s.sessionState.newHadoopConf()
    val ids = inputs.sorted.flatMap { in =>
      val p = new Path(in)
      val fs = p.getFileSystem(conf)
      val st = fs.getFileStatus(p)
      if (st.isFile) Seq(s"${p.getName}:${st.getModificationTime}:${st.getLen}")
      else fs.listStatus(p).toSeq
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
        .map(f => s"${p.getName}/${f.getPath.getName}:${f.getModificationTime}:${f.getLen}")
        .sorted
    }
    md5Hex(("graft-artifact-v1" +: ids :+ params).mkString("\n"))
  }

  private def md5Hex(text: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** `<root>/<md5 of the input-path list>/<name>` — keyed by input
    * IDENTITY (the sf dir), not content, so sf0.01 and sf0.1 artifacts
    * coexist; content staleness is the sidecar's job.
    */
  private def artifactDir(root: String, inputs: Seq[String], name: String): String =
    s"${root.stripSuffix("/")}/${md5Hex(inputs.sorted.mkString("\n")).take(12)}/$name"

  private def committedMatches(s: SparkSession, fs: FileSystem, dir: Path,
      fp: String): Boolean =
    try {
      val meta = new Path(dir, MetaFile)
      fs.exists(meta) && {
        val in = fs.open(meta)
        val text =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        """"fingerprint"\s*:\s*"([0-9a-f]+)"""".r.findFirstMatchIn(text)
          .exists(_.group(1) == fp)
      }
    } catch { case scala.util.control.NonFatal(_) => false }

  private def load(s: SparkSession, fs: FileSystem, dir: Path): DataFrame = {
    // schema comes from the sidecar, not inference: an EMPTY artifact
    // (legal — a hub over an empty slice) has no part files to infer
    // from, and the sidecar DDL also pins column order and types exactly
    // as the build produced them.
    val in = fs.open(new Path(dir, MetaFile))
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val ddl = """"schema"\s*:\s*"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(text)
      .map(m => m.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
      .getOrElse(throw new IllegalStateException(s"no schema in $dir/$MetaFile"))
    s.read.schema(StructType.fromDDL(ddl)).parquet(dir.toString)
  }

  private def publish(s: SparkSession, fs: FileSystem, dir: Path,
      name: String, fp: String, df: DataFrame): Unit = {
    val tmp = new Path(dir.getParent,
      s"${dir.getName}.tmp-${System.nanoTime()}-${nonce.incrementAndGet()}")
    df.write.mode("overwrite").parquet(tmp.toString)
    val ddl = df.schema.toDDL.replace("\\", "\\\\").replace("\"", "\\\"")
    val out = fs.create(new Path(tmp, MetaFile), true)
    try out.write(
      s"""{"name":"$name","fingerprint":"$fp","schema":"$ddl"}"""
        .getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(dir)) fs.delete(dir, true)
    if (!fs.rename(tmp, dir)) {
      // lost a cross-JVM race: the winner published the same deterministic
      // content; discard ours and use theirs
      fs.delete(tmp, true)
      if (!fs.exists(new Path(dir, MetaFile)))
        throw new IllegalStateException(s"artifact publish failed for $dir")
    }
  }
}
