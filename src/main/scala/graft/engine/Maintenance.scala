package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path

/** Table-maintenance write paths for a plain-parquet (non-Delta/Iceberg)
  * lake: MERGE-style upsert/delete as copy-on-write set algebra, and
  * small-files compaction.
  *
  * The reference mutates rows in place one statement at a time
  * (render-complete-deploy.js:226-230, :476-486, :723-737 — point
  * UPDATEs through a connection pool). The batch-engine equivalent is a
  * declarative rewrite: compute the post-image as a DataFrame and swap
  * it in. At 100 TB the same plan shapes run under Delta/Iceberg MERGE,
  * which additionally prunes the rewrite to the files that actually
  * contain matched keys — the logical algebra below is identical, only
  * the physical rewrite scope changes (SCALE.md).
  */
object Maintenance {

  /** MERGE … WHEN MATCHED THEN UPDATE (whole row) WHEN NOT MATCHED THEN
    * INSERT: survivors of the base that match no update key, plus every
    * update row. One anti-join (broadcast when `updates` is small — the
    * overwhelmingly common case: updates ≪ base) and a union; no wide
    * coalesce of every column, no row multiplication. */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    base.join(updates.select(keys.map(org.apache.spark.sql.functions.col): _*),
        keys, "left_anti")
      .unionByName(updates)

  /** MERGE … WHEN MATCHED THEN DELETE: base rows whose key appears in
    * `tombstones` are dropped. */
  def deleteMatching(base: DataFrame, tombstones: DataFrame,
                     keys: Seq[String]): DataFrame =
    base.join(tombstones.select(keys.map(org.apache.spark.sql.functions.col): _*),
      keys, "left_anti")

  /** Rewrite a parquet directory into ~`targetBytes` files. Streaming
    * appends and per-redemption inserts (reference S3 sites) accumulate
    * kB-sized files; at scale the fix is a periodic compaction that
    * sizes output files to the scan-split sweet spot (HDFS/S3 block ≈
    * 128 MB) so readers get full-size splits and the namenode/listing
    * cost stays bounded. Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    def dataFiles(p: String): Array[org.apache.hadoop.fs.FileStatus] = {
      val path = new Path(p)
      path.getFileSystem(conf).listStatus(path)
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    }
    val before = dataFiles(inPath)
    val totalBytes = before.map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath).repartition(n)
      .write.mode("overwrite").parquet(outPath)
    (before.length, dataFiles(outPath).length)
  }
}
