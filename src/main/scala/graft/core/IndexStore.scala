package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Crash-atomic versioning for the persisted index stores
  * ([[graft.operators.Similarity]]'s k-NN index,
  * [[graft.queries.TextQueries]]'s RAG chunk index) — the two-phase
  * commit discipline the reference applies to every job's output
  * (`src/mapred/org/apache/hadoop/mapred/FileOutputCommitter.java:41-42,121`
  * — `_temporary` staging + atomic promote), lifted to INDEX
  * granularity: a save writes its 6–8 artifact tables under a fresh
  * `v=<n>/` directory and only then commits the version with one
  * atomic marker rename, so a crash at ANY point between table writes
  * leaves the store serving the previous committed version instead of
  * a torn mix of new centroids beside old codes.
  *
  * Layout under the store root:
  * {{{
  *   $path/v=1/<tables...>   $path/v=1/COMMIT   <- committed
  *   $path/v=2/<tables...>                      <- torn save: no COMMIT,
  *                                                 invisible to loaders
  * }}}
  *
  * The COMMIT marker carries the store metadata (currently the last
  * folded streaming batch id — the replay-idempotence cursor the
  * ingest classes resume from). It is written as `COMMIT.tmp` and
  * RENAMED into place: rename-to-fresh-target is the one atomic
  * primitive every Hadoop `FileSystem` guarantees, so a marker either
  * exists with complete content or not at all — existence alone is the
  * commit signal, exactly the `_SUCCESS` contract.
  *
  * Loaders resolve the HIGHEST committed version; [[prune]] (called
  * after a successful commit) deletes every other version directory,
  * so steady state holds one committed version plus at most one
  * in-flight save. A torn `v=<n>` is simply overwritten by the next
  * save of the same version number (table writes are
  * `mode("overwrite")`).
  */
object IndexStore {

  /** Metadata carried by a committed version. `lastBatch` is the last
    * streaming batch id folded into the saved index (−1 when the save
    * did not come from a streaming ingest).
    */
  final case class Commit(version: Long, lastBatch: Long)

  private def fsOf(s: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def versionDir(path: String, v: Long): String = s"$path/v=$v"

  private def commitMarker(path: String, v: Long): Path =
    new Path(versionDir(path, v), "COMMIT")

  /** All version numbers present under the root — committed or torn. */
  private def versions(fs: FileSystem, path: String): Seq[Long] = {
    val root = new Path(path)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v=") =>
        scala.util.Try(n.stripPrefix("v=").toLong).toOption
      }
      .flatten
  }

  /** The highest COMMITTED version and its metadata, or None when the
    * store has never completed a save.
    */
  def latest(s: SparkSession, path: String): Option[Commit] = {
    val fs = fsOf(s, path)
    versions(fs, path).sorted(Ordering[Long].reverse)
      .collectFirst(Function.unlift { v =>
        val m = commitMarker(path, v)
        if (!fs.exists(m)) None
        else {
          val in = fs.open(m)
          val txt =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
            finally in.close()
          Some(Commit(v, txt.split('\n').head.trim.toLong))
        }
      })
  }

  /** Directory of the highest committed version — what loaders read.
    * Fails loudly on a store with no committed version (serving a torn
    * or absent store silently is the failure mode this layer removes).
    */
  def latestDir(s: SparkSession, path: String): String = {
    val c = latest(s, path).getOrElse(sys.error(
      s"IndexStore: no committed index version under $path " +
        "(either never saved, or every save crashed before commit)"))
    versionDir(path, c.version)
  }

  /** Start a save: the next version number (past every existing
    * directory, committed or torn) and its staging directory. Nothing
    * is visible to loaders until [[commit]].
    */
  def begin(s: SparkSession, path: String): (String, Long) = {
    val next = (versions(fsOf(s, path), path) :+ 0L).max + 1
    (versionDir(path, next), next)
  }

  /** Atomically commit version `v`: write the marker content to
    * `COMMIT.tmp`, then rename it to `COMMIT` — the flip that makes
    * the version visible. Rename targets a fresh path (any stale tmp
    * is deleted first), so the marker appears complete or not at all.
    */
  def commit(s: SparkSession, path: String, v: Long, lastBatch: Long): Unit = {
    val fs = fsOf(s, path)
    val tmp = new Path(versionDir(path, v), "COMMIT.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"$lastBatch\n".getBytes("UTF-8")) finally out.close()
    val marker = commitMarker(path, v)
    if (fs.exists(marker)) fs.delete(marker, false)
    if (!fs.rename(tmp, marker))
      sys.error(s"IndexStore: commit rename failed for $marker")
  }

  /** Delete every version directory other than `keep` — called after a
    * successful commit so the store doesn't accumulate superseded
    * versions. Safe to crash mid-prune: loaders only ever resolve the
    * highest committed version, which `keep` is.
    */
  def prune(s: SparkSession, path: String, keep: Long): Unit = {
    val fs = fsOf(s, path)
    versions(fs, path).filter(_ != keep)
      .foreach(v => fs.delete(new Path(versionDir(path, v)), true))
  }
}
