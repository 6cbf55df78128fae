package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Commit protocol for the persisted shared artifacts (bucketed table
  * copies, IVF/PQ indexes, cluster tables, shingle postings): Hadoop
  * `FileSystem`-based markers — so the same code works on HDFS/S3/GCS
  * paths, not just `file:` (a `java.io.File` probe silently returns
  * false on any remote filesystem and every session rebuilds) — plus
  * write-to-staging-then-rename so a half-written artifact is never
  * visible at the published location.
  *
  * Concurrency contract: `FileSystem.rename` is atomic on HDFS (and
  * real-filesystem schemes like file:), so when two sessions race to
  * build the same artifact, exactly one rename lands; the loser
  * detects the existing destination, discards its staging dir, and
  * reads the winner's files. On OBJECT stores (S3A, GCS) a directory
  * rename is a client-side copy loop, not atomic — there the marker
  * check still gates readers correctly only because the marker file
  * is the artifact's documented LAST write inside the staging tree
  * and copies preserve per-file completeness; a deployment that needs
  * hard atomicity on S3 should point `dir` at an HDFS/consistent
  * namespace or use a manifest committer. This replaces the earlier
  * check-then-act gate, which could let a reader see a directory
  * mid-write on ANY filesystem.
  */
object Stage {
  def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** Is the artifact at `dir` committed? `marker` is relative to
    * `dir` (default: the FileOutputCommitter `_SUCCESS` of the last
    * write in the artifact's documented write order). */
  def isCommitted(spark: SparkSession, dir: String,
      marker: String = "_SUCCESS"): Boolean =
    fs(spark, dir).exists(new Path(dir, marker))

  /** Session-unique staging location next to the destination (same
    * filesystem — a cross-FS rename is a copy, not atomic). */
  def stagingDir(spark: SparkSession, dir: String): String =
    s"$dir.staging-${spark.sparkContext.applicationId}"

  /** Build into `staging` via `write`, then atomically publish it at
    * `dir`. Returns true if this session's artifact landed, false if
    * a concurrent writer already published (staging is discarded; the
    * winner's artifact is content-equivalent, since locations are
    * keyed by source-content signature + parameters). An existing
    * UNCOMMITTED destination (no marker — a crashed writer's debris,
    * or a pre-created empty dir) is replaced. The racy interleaving
    * where a winner commits between the debris delete and the rename
    * is detected POST-rename (see the in-body comment on HDFS's
    * rename-into-existing-dir semantics) rather than assumed away. */
  def publish(spark: SparkSession, dir: String,
      marker: String = "_SUCCESS")(write: String => Unit): Boolean = {
    val f = fs(spark, dir)
    val staging = stagingDir(spark, dir)
    val stagingPath = new Path(staging)
    f.delete(stagingPath, true) // leftover from a crashed prior run
    write(staging)
    val dst = new Path(dir)
    def committed = f.exists(new Path(dst, marker))
    if (committed) {
      f.delete(stagingPath, true)
      false
    } else {
      // Replace uncommitted debris (a crashed writer's half-written
      // dir), then rename. HDFS hazard: if a concurrent winner commits
      // BETWEEN the delete and the rename, HDFS's rename-onto-an-
      // existing-directory does not fail — it moves the staging dir
      // INSIDE dst and returns true, nesting a '*.staging-*' subtree
      // into the committed artifact (which would pollute partition
      // discovery for every later reader). So a true return is not
      // trusted by itself: verify no nested staging entry landed under
      // dst (the staging name is session-unique, so the check is
      // unambiguous) and that the marker is present at the expected
      // relative path. Local-FS renames onto a non-empty dst simply
      // fail, which the committed-recheck branch below handles.
      //
      // Narrow re-check IMMEDIATELY before the destructive delete: a
      // winner that committed between the initial marker check and
      // here would otherwise have its fully committed artifact
      // removed — only safe under the content-equivalence convention,
      // which publish cannot enforce for caller-chosen explicit dirs
      // (e.g. two IvfAnn writers with different nlist at one dir; the
      // NLIST marker would catch the damage only at load time). The
      // re-check is a single metadata probe and composes with the
      // post-rename nested-staging verification below.
      if (committed) {
        f.delete(stagingPath, true)
        false
      } else {
        f.delete(dst, true)
        if (f.rename(stagingPath, dst)) {
          val nested = new Path(dst, stagingPath.getName)
          if (f.exists(nested)) {
            // lost the race on HDFS semantics: un-nest our debris and
            // defer to the winner's (content-equivalent) artifact
            f.delete(nested, true)
            false
          } else if (committed) true
          else throw new java.io.IOException(
            s"publish to $dir renamed but marker $marker is absent — " +
              "the write callback did not produce the marker as its last write")
        }
        else if (committed) {
          // rename lost to a concurrent winner that landed in the gap
          f.delete(stagingPath, true)
          false
        } else {
          // rename failed with NO winner present: a real IO problem.
          // Keep staging for post-mortem and fail loudly — silently
          // returning would leave isCommitted-gated readers pointing at
          // a nonexistent artifact.
          throw new java.io.IOException(
            s"rename $staging -> $dir failed and no committed artifact exists")
        }
      }
    }
  }
}
