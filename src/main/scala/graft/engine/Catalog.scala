package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-metastore production mode (BASELINE north star: "Spark SQL +
  * Hive metastore integration"). The testdata loaders in `Tables` are
  * the dev seam; these helpers are the deployment seam: register the
  * same datasets as managed metastore tables with the physical layout
  * the 100 TB plans assume (SCALE.md) — facts bucketed by join key,
  * event-shaped tables partitioned by a pruning column.
  *
  * Exercised end-to-end in CatalogSpec (saveAsTable round-trip,
  * shuffle-free bucketed join, partition pruning).
  */
object Catalog {

  /** A Hive-enabled session (embedded derby metastore under
    * `warehouseDir` — on a cluster, point `hive.metastore.uris` at the
    * shared metastore instead). */
  def hiveSession(warehouseDir: String, master: String = "local[*]"): SparkSession =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.warehouse.dir", warehouseDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$warehouseDir/metastore_db;create=true")
      .enableHiveSupport()
      .getOrCreate()

  /** Register every testdata table as a managed table in `db`. */
  def registerAll(s: SparkSession, sfDir: String, db: String = "graft"): Unit = {
    s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    Tables.all.foreach { t =>
      Tables.table(s, sfDir, t).write.mode("overwrite").saveAsTable(s"$db.$t")
    }
  }

  /** Re-layout a fact table bucketed+sorted by its join key — joins on
    * that key against an equally-bucketed table need no shuffle. */
  def bucketize(df: DataFrame, table: String, key: String,
                buckets: Int = 64): Unit =
    df.write.bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").saveAsTable(table)

  /** Re-layout an event-shaped table partitioned by a low-cardinality
    * pruning column (at 100 TB: a date column). */
  def partitionize(df: DataFrame, table: String, partCol: String): Unit =
    df.write.partitionBy(partCol).mode("overwrite").saveAsTable(table)
}
