package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared maintenance plumbing for the parquet-backed index artifacts
  * (the minhash dedup index and the residual IVF-PQ index): both grow
  * by appending files per drop, so both eventually need their data
  * dirs rewritten into few large files — and the rewrite must never
  * leave the artifact without a live dir.
  *
  * Reference analogue: none — cj-zhukov/datafusion-example has no
  * persisted index artifacts; this is the operational half the 100 TB
  * deployment adds. */
object ArtifactMaintenance {

  /** Rewrite one artifact subdir via a staged swap: `write` produces
    * the replacement at `<live>__compact`, then the dirs are exchanged
    * by rename. A crash during the WRITE leaves the live dir untouched;
    * the two renames of the swap are not jointly atomic (no Hadoop
    * filesystem offers a dir exchange), so a crash in that window
    * leaves the intact original at `<live>__old` and the intact
    * rewrite at `<live>__compact` — nothing is deleted before its
    * replacement is live, and the next call SELF-HEALS that state at
    * entry (r14 advice: recovery used to be manual) by renaming the
    * original back before proceeding.
    *
    * Filesystem assumption: dir rename must be a cheap metadata
    * operation (HDFS, local FS). On object stores (S3A) Hadoop rename
    * is copy+delete — non-atomic and O(data) — so neither the
    * crash-safety window nor the cheap-swap cost model holds there;
    * object-store deployments should front the artifact with a
    * rename-atomic layer (HDFS, a manifest/commit-marker scheme) rather
    * than calling this against s3a:// paths directly. */
  private[operators] def stagedSwap(spark: SparkSession, live: String)
                                   (write: String => Unit): Unit = {
    val staged = live + "__compact"
    healCrashState(spark, live)
    write(staged)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(staged).getFileSystem(conf)
    val livePath = new org.apache.hadoop.fs.Path(live)
    val old = new org.apache.hadoop.fs.Path(live + "__old")
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(livePath, old),
      s"stagedSwap: could not stage out $livePath")
    if (!fs.rename(new org.apache.hadoop.fs.Path(staged), livePath)) {
      // put the original back before failing — the artifact must never
      // be left without a live dir
      fs.rename(old, livePath)
      throw new IllegalStateException(
        s"stagedSwap: could not swap $staged into place at $livePath")
    }
    fs.delete(old, true)
  }

  /** [[stagedSwap]] for dirs that may not exist yet (sidecar rebuilds:
    * a bloom invalidated before its codes rewrite, or a first write).
    * When `live` exists the rewrite swaps in crash-safe; when it does
    * not, the replacement is written at `<live>__compact` and renamed
    * into place — a crash before the rename leaves NO live dir, which
    * every sidecar reader treats as absent (degrade to the full scan),
    * never as a torn-but-readable dir that still carries its stamps
    * (r15 advice: a plain mode("overwrite") rebuild could commit some
    * part-files, stamps included, and a stamped-but-incomplete bloom
    * manufactures false negatives). */
  private[operators] def stagedReplace(spark: SparkSession, live: String)
                                      (write: String => Unit): Unit = {
    healCrashState(spark, live)
    val conf = spark.sparkContext.hadoopConfiguration
    val livePath = new org.apache.hadoop.fs.Path(live)
    val fs = livePath.getFileSystem(conf)
    if (fs.exists(livePath)) stagedSwap(spark, live)(write)
    else {
      val staged = new org.apache.hadoop.fs.Path(live + "__compact")
      if (fs.exists(staged)) fs.delete(staged, true)
      write(staged.toString)
      require(fs.rename(staged, livePath),
        s"stagedReplace: could not move $staged into place at $livePath")
    }
  }

  /** Detect and repair the documented [[stagedSwap]] crash state —
    * live dir missing, `<live>__old` present (a previous swap staged
    * the original out and died before staging the rewrite in): rename
    * the intact original back so the next read/rewrite proceeds
    * normally (r14 advice: recovery used to be manual, and the next
    * compaction failed at "could not stage out" instead of
    * self-healing). Any orphaned `<live>__compact` dir is left for the
    * next rewrite to overwrite. Returns true when a repair was made.
    * Called at [[stagedSwap]] entry and by each artifact's compaction
    * entry point BEFORE it reads the artifact (the read would otherwise
    * fail on the missing live dir). */
  private[operators] def healCrashState(spark: SparkSession,
                                        live: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val livePath = new org.apache.hadoop.fs.Path(live)
    val fs = livePath.getFileSystem(conf)
    val old = new org.apache.hadoop.fs.Path(live + "__old")
    if (!fs.exists(livePath) && fs.exists(old)) {
      require(fs.rename(old, livePath),
        s"healCrashState: found crash state (no live dir, $old " +
          s"present) but could not rename the original back to " +
          s"$livePath — manual recovery required")
      true
    } else false
  }
}
