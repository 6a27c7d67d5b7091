package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-audit-publish snapshot layout for the streaming maintenance
  * sinks (E7/E8) on a PLAIN filesystem — the crash-safety tier below a
  * real table format (Iceberg/Delta transactional commits remain the
  * documented production seam).
  *
  * A snapshot root contains immutable version directories `v<N>` plus
  * a `_CURRENT` pointer file naming the live one:
  *
  *  - WRITE: the new version lands in its own `v<batchId>` directory —
  *    never touching the live one. A streaming retry of the same batch
  *    overwrites the same directory (idempotent).
  *  - AUDIT: the parquet committer's `_SUCCESS` marker must exist
  *    before the version is eligible.
  *  - PUBLISH: `_CURRENT` is replaced via temp-file + rename — the
  *    only mutation readers can observe, and it's a single small-file
  *    swap. A crash at ANY point leaves either the old pointer (new
  *    version invisible, replay rewrites it) or a missing pointer for
  *    the one rename instant — recovered by falling back to the
  *    newest audited version directory.
  *
  * GC keeps the newest `keepLast` audited predecessors (default 1 —
  * the published one's predecessor survives so an in-flight reader of
  * the old pointer target never loses its files mid-read); older
  * versions and unaudited orphans are deleted best-effort after the
  * flip. Raising `keepLast` turns the retained window into a
  * TIME-TRAVEL history: [[versions]] lists the audited versions still
  * on disk and [[readVersion]] reads any of them — the offline half of
  * a table format's snapshot reads (Iceberg/Delta transactional
  * commits remain the documented production seam).
  */
object SnapshotStore {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val Pointer = "_CURRENT"

  /** The live version directory, or None before the first publish.
    * Pointer first; if it's missing (the rename instant, or a pre-WAP
    * layout), the newest `v<N>` directory bearing `_SUCCESS` wins.
    */
  def currentDir(spark: SparkSession, root: String): Option[String] = {
    val hfs = fs(spark, root)
    val rootP = new Path(root)
    if (!hfs.exists(rootP)) return None
    val ptr = new Path(rootP, Pointer)
    val fromPointer =
      if (hfs.exists(ptr)) {
        val in = hfs.open(ptr)
        val name =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        Some(new Path(rootP, name)).filter(hfs.exists(_)).map(_.toString)
      } else None
    fromPointer.orElse {
      val audited = hfs.listStatus(rootP).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+"))
        .filter(s => hfs.exists(new Path(s.getPath, "_SUCCESS")))
        .sortBy(s => s.getPath.getName.drop(1).toLong)
      audited.lastOption.map(_.getPath.toString)
    }
  }

  /** Read the live snapshot, or None before the first publish. */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    currentDir(spark, root).map(spark.read.parquet(_))

  /** Audited version numbers still on disk, ascending — the
    * time-travel index. Unaudited orphans (crashed writes) are never
    * listed.
    */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val hfs = fs(spark, root)
    val rootP = new Path(root)
    if (!hfs.exists(rootP)) return Seq.empty
    hfs.listStatus(rootP).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+"))
      .map(_.getPath.getName.drop(1).toLong)
      .filter(v => hfs.exists(new Path(rootP, s"v$v/_SUCCESS")))
      .sorted
  }

  /** Time-travel read of a specific AUDITED version, or None if that
    * version never published, failed its audit, or has been GC'd
    * (retention is `publish`'s `keepLast`). Version directories are
    * immutable after publish, so the read is stable even while later
    * versions land.
    */
  def readVersion(spark: SparkSession, root: String, version: Long): Option[DataFrame] = {
    val hfs = fs(spark, root)
    val dir = new Path(new Path(root), s"v$version")
    if (hfs.exists(new Path(dir, "_SUCCESS"))) Some(spark.read.parquet(dir.toString))
    else None
  }

  /** Publish `df` as version `version` of the snapshot (WAP as above).
    * Safe to re-run with the same version (streaming batch replay).
    * `keepLast` is the retention policy: how many audited PREDECESSOR
    * versions survive the post-flip GC (≥ 1 so an in-flight reader of
    * the previous pointer target never loses files mid-read).
    */
  def publish(df: DataFrame, root: String, version: Long, keepLast: Int = 1): Unit = {
    require(keepLast >= 1, "keepLast must be >= 1 (in-flight reader safety)")
    val spark = df.sparkSession
    val hfs = fs(spark, root)
    val rootP = new Path(root)
    val versionDir = new Path(rootP, s"v$version")
    df.write.mode("overwrite").parquet(versionDir.toString)
    require(hfs.exists(new Path(versionDir, "_SUCCESS")),
      s"snapshot audit failed: no _SUCCESS marker in $versionDir")
    val tmp = new Path(rootP, s"$Pointer.tmp$version")
    val out = hfs.create(tmp, true)
    try out.write(s"v$version".getBytes("UTF-8")) finally out.close()
    val ptr = new Path(rootP, Pointer)
    hfs.delete(ptr, false)
    require(hfs.rename(tmp, ptr), s"pointer publish failed for $versionDir")
    // GC: keep the newly published version and its newest `keepLast`
    // AUDITED predecessors; everything else — older versions and
    // crashed writes' unaudited orphans — goes
    val others = hfs.listStatus(rootP).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+"))
      .map(s => s.getPath.getName.drop(1).toLong)
      .filter(_ != version)
    val keep = others.filter(v =>
      hfs.exists(new Path(rootP, s"v$v/_SUCCESS"))).sorted.takeRight(keepLast).toSet
    others.filterNot(keep.contains).foreach(v =>
      hfs.delete(new Path(rootP, s"v$v"), true))
  }
}
