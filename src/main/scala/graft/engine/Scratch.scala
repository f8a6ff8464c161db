package graft.engine

import org.apache.spark.sql.SparkSession

/** Scratch-path discipline for queries that materialize roundtrip
  * artifacts (CSV/ORC/JSON/parquet rewrite jobs).
  *
  * Two failure modes of the naive `/tmp/x_${dir.hashCode}` scheme:
  * concurrent sessions (or parallel test forks) racing on the same
  * path — one overwrites the directory while the other reads it —
  * and distinct datasets colliding on `hashCode` (plus
  * `math.abs(Int.MinValue)` being negative). Paths here are keyed by
  * the Spark application id (unique per JVM launch, so concurrent
  * sessions never share a root) and an MD5 prefix of the dataset key
  * (collision-free in practice, stable within a session so repeated
  * runs overwrite in place instead of accumulating garbage).
  */
object Scratch {

  /** Stable 16-hex-char digest of an arbitrary key (e.g. a data dir). */
  def key(k: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(k.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)

  /** Per-application scratch directory for (tag, dataset-key). */
  def dir(s: SparkSession, tag: String, k: String): String =
    s"/tmp/graft_scratch_${s.sparkContext.applicationId}/${tag}_${key(k)}"

  /** Sanitized application id, safe inside a SQL table identifier. */
  def appTag(s: SparkSession): String =
    s.sparkContext.applicationId.toLowerCase.replaceAll("[^a-z0-9]", "_")

  /** Per-application STATE-TABLE key: sanitized appId + dataset
    * digest. Embedding the appId (exactly as `dir` does for /tmp
    * paths) means two concurrent sessions or parallel test forks
    * sharing a warehouse directory can never name — and therefore
    * never overwrite or sweep — each other's live state tables. */
  def stateKey(s: SparkSession, k: String): String =
    s"${appTag(s)}_${key(k)}"

  /** Delete the stale warehouse directory of a catalog-unknown state
    * table (this application crashed or re-ran between a physical
    * write and catalog registration; with appId-keyed names no OTHER
    * application's directory can ever match). Provably scoped: the
    * name must be a `graft_state_*` identifier carrying THIS
    * application's tag, and the resolved path must sit directly under
    * the session warehouse — anything else is refused loudly. */
  def sweepStaleState(s: SparkSession, name: String): Unit = {
    require(name.matches("graft_state_[a-z0-9_]+"),
      s"refusing to sweep a non-state-table name: $name")
    require(name.contains(appTag(s)),
      s"refusing to sweep another application's state dir: $name")
    if (!s.catalog.tableExists(name)) {
      val whConf = s.conf.get("spark.sql.warehouse.dir")
      val wh = new java.io.File(
        if (whConf.startsWith("file:")) new java.net.URI(whConf).getPath
        else whConf).getCanonicalFile
      val target = new java.io.File(wh, name.toLowerCase).getCanonicalFile
      require(target.getParentFile == wh,
        s"refusing to sweep outside the warehouse: $target")
      def wipe(f: java.io.File): Unit = {
        if (f.isDirectory) {
          val cs = f.listFiles(); if (cs != null) cs.foreach(wipe)
        }
        f.delete(); ()
      }
      wipe(target)
    }
  }
}
