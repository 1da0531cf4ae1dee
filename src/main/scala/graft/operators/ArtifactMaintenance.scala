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
    * rewrite at `<live>__compact` — rename either back to recover;
    * nothing is deleted before its replacement is live. */
  private[operators] def stagedSwap(spark: SparkSession, live: String)
                                   (write: String => Unit): Unit = {
    val staged = live + "__compact"
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
}
