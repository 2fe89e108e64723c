package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared machinery for write-once, fingerprint-keyed, bucketed artifacts
  * ([[DedupClosure]], [[EmbedArtifact]]) — extracted so the staleness
  * contract and the orphan-location cleanup live in ONE place instead of a
  * hand-maintained copy per artifact (the r11 `crossPairsFromSignatures`
  * lesson applied to sources).
  *
  * The reference materializes every intermediate at an asset boundary and
  * downstream assets consume the persisted copy
  * (/root/reference/dagster_icij/assets.py:86-98); these helpers are that
  * boundary's engine shape: a bucketed catalog table whose NAME embeds a
  * fingerprint of the source snapshot, so re-runs over the same snapshot
  * reuse it and a regenerated corpus forces a rebuild.
  */
object Artifacts {

  /** 12-hex fingerprint of the source snapshot backing `src`.
    *
    * File-backed frames (the production path): md5 over the sorted
    * (path, length, modificationTime) of every file the scan reads —
    * driver-side FS metadata only, NO Spark job and NO data scan (at
    * 100 TB a consumer locating an artifact pays a file listing, not a
    * corpus read; DedupClosureSpec pins the zero-job re-read). Frames with
    * no file lineage (in-memory test data) fall back to a content
    * fingerprint — one pruned (count, Σ id) scan.
    */
  def sourceFingerprint(src: DataFrame, dir: String, idCol: String): String = {
    val files = src.inputFiles
    val key =
      if (files.nonEmpty) {
        val hconf = src.sparkSession.sparkContext.hadoopConfiguration
        files.sorted.map { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          val st = p.getFileSystem(hconf).getFileStatus(p)
          s"$f|${st.getLen}|${st.getModificationTime}"
        }.mkString("\n")
      } else {
        // coalesce: sum over ZERO rows is NULL — an empty no-lineage frame
        // must still fingerprint to a stable key, not throw on getLong
        val row = src.agg(count(lit(1)),
          coalesce(sum(col(idCol)), lit(0L))).collect()(0)
        s"${row.getLong(0)}|${row.getLong(1)}"
      }
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir|$key".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
  }

  /** Orphan-LOCATION cleanup shared by both materialization entry points
    * (extracted per the r11 drift lesson — one copy, not two): the default
    * (in-memory) catalog is per-session but the warehouse directory
    * persists, so a previous session may have left the table's LOCATION
    * behind with no catalog entry carrying its bucketing metadata.
    * Orphaned data without metadata is unreadable as a bucketed table, so
    * clear it and rebuild rather than fail on LOCATION_ALREADY_EXISTS. */
  private def clearOrphanLocation(spark: SparkSession, table: String): Unit =
    if (!spark.catalog.tableExists(table)) {
      val warehouse = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table)
      val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(warehouse)) fs.delete(warehouse, true)
    }

  /** Write-once materialization: persist `build` bucketed+sorted on
    * `keyCol` under `table` unless it already exists in the catalog. */
  def materializeBucketed(spark: SparkSession, table: String, keyCol: String,
                          buckets: Int)(build: => DataFrame): String = {
    if (!spark.catalog.tableExists(table)) {
      clearOrphanLocation(spark, table)
      Bucketing.writeBucketed(build, table, keyCol, buckets)
    }
    table
  }

  /** MAINTENANCE materialization: always (re)write `build` under `table` —
    * the CDC-batch action, NOT a cache probe. The write-once law above
    * governs SNAPSHOT builds (same fingerprint ⇒ same contents ⇒ skip);
    * maintenance advances a version, so re-running it must re-apply the
    * delta, never silently return the stale table. */
  def rematerializeBucketed(spark: SparkSession, table: String, keyCol: String,
                            buckets: Int)(build: => DataFrame): String = {
    clearOrphanLocation(spark, table)
    Bucketing.writeBucketed(build, table, keyCol, buckets)
    table
  }
}
