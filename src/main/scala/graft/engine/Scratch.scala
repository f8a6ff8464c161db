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
}
