package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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

  /** Incremental aggregate (materialized-view) maintenance, step 1:
    * reduce rows to the stored COMBINE-ABLE partial form — exact count
    * + scaled-integer sum per key. Because the state is associative/
    * commutative partials (never finalized doubles), a refresh is
    * `merge(state, aggState(delta))` at cost ∝ |delta| + |state| —
    * the base table is read exactly once, ever. This is how a 100 TB
    * dashboard aggregate stays fresh without nightly full recompute,
    * and the scaled-integer sums make the incremental result
    * BIT-IDENTICAL to a from-scratch aggregation, not just close. */
  def aggState(rows: DataFrame, key: String, valueCol: String): DataFrame =
    rows.groupBy(col(key)).agg(
      count(lit(1)).as("n"),
      sum(Exact.scaled(col(valueCol))).as("sum_scaled"))

  /** Step 2: combine stored state with a delta batch's partials (also
    * subsumes compacting many delta states into one). */
  def mergeAggState(state: DataFrame, delta: DataFrame, key: String): DataFrame =
    state.unionByName(delta).groupBy(col(key)).agg(
      sum(col("n")).as("n"),
      sum(col("sum_scaled")).as("sum_scaled"))

  /** Step 3: finalize partials into the served view (sum/avg). */
  def finalizeAgg(state: DataFrame, key: String): DataFrame =
    state.select(col(key), col("n"),
      (col("sum_scaled").cast("double") / Exact.MoneyScale.toDouble).as("total"),
      (col("sum_scaled").cast("double") / col("n").cast("double") /
        Exact.MoneyScale.toDouble).as("mean"))

  /** Order-independent per-bucket checksum of a table: rows are
    * canonicalized (every column cast to string, null-marked, joined
    * with a field separator), hashed, and bucketed by hash prefix;
    * each bucket's checksum is the SUM of its 52-bit row hashes —
    * addition commutes, so the summary is partitioning- and
    * order-invariant, mergeable map-side, and O(buckets) in size.
    *
    * This is the 100 TB reconciliation tool: comparing two copies of a
    * table (post-MERGE vs expected, pre/post compaction or migration,
    * replica vs primary) costs one scan of each side + a
    * `buckets`-row join, instead of a full sort-and-compare shuffle of
    * both tables. A divergent bucket narrows the search space by
    * `buckets`×; recursing with a second salt localizes single-row
    * differences in O(log) scans (MaintenanceSpec pins detection and
    * localization).
    *
    * Multiset semantics: duplicate rows hash identically and the sum
    * counts multiplicity — the checksum distinguishes copies that
    * differ only in duplicate counts (an equality join can't). */
  /** Rows of `df` annotated with their checksum bucket (`__bucket`)
    * and 52-bit row hash (`__rh`) — the shared spine of
    * [[tableChecksum]] and [[patchFrom]]. */
  private def bucketed(df: DataFrame, buckets: Int, salt: String): DataFrame = {
    val canon = concat_ws("",
      df.columns.sorted.map(c =>
        coalesce(col(c).cast("string"), lit("NULL"))): _*)
    df.withColumn("__h", md5(concat(lit(salt), canon)))
      .withColumn("__bucket",
        conv(substring(col("__h"), 1, 4), 16, 10).cast("long") % buckets)
      .withColumn("__rh", conv(substring(col("__h"), 5, 13), 16, 10).cast("long"))
      .drop("__h")
  }

  def tableChecksum(df: DataFrame, buckets: Int = 1024,
                    salt: String = ""): DataFrame =
    bucketed(df, buckets, salt)
      .groupBy(col("__bucket").as("bucket"))
      // Checksum = Σ __rh  mod 2^52, computed from the 26-bit halves so
      // no intermediate ever wraps: sum_lo ≤ rows·2^26 and sum_hi ≤
      // rows·2^26 stay inside a long up to ~1.4e11 rows PER BUCKET
      // (~10^14 rows/table at 1024 buckets), and
      // (sum_hi mod 2^26)·2^26 + sum_lo ≡ Σrh (mod 2^52) caps at
      // ~2^52 + rows·2^26. The naive sum(__rh) wraps (ANSI: throws) at
      // ~4·10^3 rows per bucket — the sf3 rung caught exactly that on
      // q247's 17.6k-row buckets. Modular truncation costs nothing: the
      // checksum was already a 52-bit-space collision argument, and a
      // mod-2^52 sum has the same 2^-52 random-collision bound.
      .agg(count(lit(1)).as("n_rows"),
        (((sum(expr("__rh DIV 67108864")) % lit(67108864L)) * lit(67108864L) +
          sum(expr("__rh % 67108864"))) % lit(4503599627370496L))
          .as("checksum"))

  /** Buckets where two tables disagree (empty ⇔ identical as
    * multisets up to the checksum's collision probability). Full
    * outer join so a bucket present on one side only still surfaces. */
  def tableDiff(a: DataFrame, b: DataFrame, buckets: Int = 1024,
                salt: String = ""): DataFrame = {
    val ca = tableChecksum(a, buckets, salt)
      .withColumnRenamed("n_rows", "a_rows").withColumnRenamed("checksum", "a_sum")
    val cb = tableChecksum(b, buckets, salt)
      .withColumnRenamed("n_rows", "b_rows").withColumnRenamed("checksum", "b_sum")
    ca.join(cb, Seq("bucket"), "full_outer")
      .filter(not(coalesce(col("a_rows"), lit(0L)) === coalesce(col("b_rows"), lit(0L)) &&
        coalesce(col("a_sum"), lit(0L)) === coalesce(col("b_sum"), lit(0L))))
  }

  /** Repair a divergent copy from the authoritative table using the
    * checksum diff: rows of `b` in agreeing buckets are kept as-is,
    * rows of `a` in divergent buckets replace whatever `b` had there.
    * The result is multiset-equal to `a` (MaintenanceSpec asserts via
    * exceptAll both ways), but the work is proportional to the
    * DIVERGENCE, not the table: the divergent-bucket set is tiny by
    * construction (it is the defect being repaired), both joins
    * against it broadcast, and only the rows of those buckets move.
    * This is how a 100 TB replica converges after tableDiff flags a
    * handful of buckets — fetch+patch, not re-copy. */
  def patchFrom(a: DataFrame, b: DataFrame, buckets: Int = 1024,
                salt: String = ""): DataFrame = {
    val bad = broadcast(
      tableDiff(a, b, buckets, salt).select(col("bucket").as("__bucket")))
    val keep = bucketed(b, buckets, salt).join(bad, Seq("__bucket"), "left_anti")
    val fetch = bucketed(a, buckets, salt).join(bad, Seq("__bucket"), "left_semi")
    keep.unionByName(fetch).drop("__bucket", "__rh")
  }

  /** MERGE … WHEN MATCHED THEN DELETE: base rows whose key appears in
    * `tombstones` are dropped. */
  def deleteMatching(base: DataFrame, tombstones: DataFrame,
                     keys: Seq[String]): DataFrame =
    base.join(tombstones.select(keys.map(org.apache.spark.sql.functions.col): _*),
      keys, "left_anti")

  /** Partition-pruned copy-on-write MERGE over a `partitionBy(pcol)`
    * parquet table — the plain-parquet halfway point to Delta/Iceberg
    * file-level MERGE pruning: only the partitions that actually
    * contain matched update keys are rewritten; every other partition
    * directory is left untouched (byte-identical files, asserted in
    * MaintenanceSpec). At 100 TB this is the difference between
    * rewriting the whole table and rewriting the handful of date
    * partitions a backfill touches.
    *
    * The update set's distinct partition values are a bounded driver
    * action (# touched partitions, the same cardinality a MERGE's
    * partition predicate would carry). Each touched partition is
    * merged with [[upsert]] and staged to a temp dir BEFORE swapping,
    * because Spark reads lazily — overwriting the directory being
    * scanned would corrupt the merge input.
    *
    * @param updates must carry `pcol` plus the base schema
    * @return touched partition values, for commit bookkeeping
    */
  def upsertPartitioned(spark: SparkSession, tableDir: String,
                        updates: DataFrame, keys: Seq[String],
                        pcol: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(tableDir).getFileSystem(conf)
    val touched = updates.select(col(pcol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    touched.foreach { pv =>
      val esc = escapePartitionValue(pv)
      val pdir = s"$tableDir/$pcol=$esc"
      val tmp = s"$tableDir/.merge_tmp_$pcol=$esc"
      val upd = updates.filter(col(pcol).cast("string") === pv).drop(pcol)
      if (!fs.exists(new Path(pdir))) {
        upd.write.mode("overwrite").parquet(pdir) // brand-new partition
      } else {
        val base = spark.read.parquet(pdir) // partition col not materialized in files
        upsert(base, upd, keys).write.mode("overwrite").parquet(tmp)
        // Rename the old partition ASIDE before promoting the staged
        // one: a crash between the two renames leaves the partition
        // recoverable at .merge_old_… instead of gone (true atomic
        // commit needs a table-format manifest; this is the
        // plain-parquet best effort).
        val old = new Path(s"$tableDir/.merge_old_$pcol=$esc")
        fs.delete(old, true)
        fs.rename(new Path(pdir), old)
        fs.rename(new Path(tmp), new Path(pdir))
        fs.delete(old, true)
      }
    }
    touched
  }

  /** Partition directory names must escape special characters exactly
    * the way Spark's writer does (ExternalCatalogUtils): building
    * "$pcol=$pv" from the raw value would send a value containing '/'
    * or ' ' to a different directory and duplicate the partition. */
  private[engine] def escapePartitionValue(pv: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(pv)

  /** (min, max) of `key` across one parquet file's row groups, straight
    * from the footer — no data pages read. None when any row group
    * lacks usable stats (the caller must then treat the file as a
    * potential match). */
  private[engine] def fileKeyRange(conf: org.apache.hadoop.conf.Configuration,
                                   file: Path, key: String): Option[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    def asLong(v: Any): Long = v match {
      case l: java.lang.Long => l.longValue
      case i: java.lang.Integer => i.longValue
      case other => other.toString.toLong
    }
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try {
      val perBlock = reader.getFooter.getBlocks.asScala.toSeq.map { b =>
        b.getColumns.asScala.find(_.getPath.toDotString == key)
          .map(_.getStatistics)
          .filter(st => st != null && st.hasNonNullValue)
          .map(st => (asLong(st.genericGetMin), asLong(st.genericGetMax)))
      }
      if (perBlock.isEmpty || perBlock.exists(_.isEmpty)) None
      else Some((perBlock.flatten.map(_._1).min, perBlock.flatten.map(_._2).max))
    } finally reader.close()
  }

  /** File-level pruned MERGE — the remaining step from partition-level
    * copy-on-write to table-format MERGE semantics over plain parquet:
    * within each touched partition, only the FILES whose footer
    * min/max range on the (integral) merge key can contain an update
    * key are rewritten. Every other file is left physically untouched
    * — byte-identical, asserted in MaintenanceSpec — so a backfill
    * that touches 10 keys in a 10k-file partition rewrites a handful
    * of files, not the partition.
    *
    * Kept files are provably disjoint from the update keys (their
    * footer range contains none), so `kept ∪ upsert(hitFiles, updates)`
    * is exactly the partition post-image; update keys present in no
    * file's range surface as inserts in the merged output.
    *
    * The per-partition update keys come to the driver as a sorted
    * array (binary-searched against each file range). That is bounded
    * by the update batch — the small side of a MERGE by construction;
    * an update set big enough to strain the driver intersects
    * essentially every file, at which point [[upsertPartitioned]]'s
    * whole-partition rewrite is the right tool anyway.
    *
    * @return (filesRewritten, filesKept) across all touched partitions
    */
  def upsertFilePruned(spark: SparkSession, tableDir: String,
                       updates: DataFrame, key: String,
                       pcol: String): (Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(tableDir).getFileSystem(conf)
    val touched = updates.select(col(pcol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    var rewritten = 0
    var kept = 0
    touched.foreach { pv =>
      val esc = escapePartitionValue(pv)
      val pdir = new Path(s"$tableDir/$pcol=$esc")
      val upd = updates.filter(col(pcol).cast("string") === pv).drop(pcol)
      if (!fs.exists(pdir)) {
        upd.write.mode("overwrite").parquet(pdir.toString)
      } else {
        val updKeys = upd.select(col(key).cast("long")).distinct()
          .collect().map(_.getLong(0)).sorted
        def rangeHasKey(lo: Long, hi: Long): Boolean = {
          val i = java.util.Arrays.binarySearch(updKeys, lo)
          val from = if (i >= 0) i else -i - 1
          from < updKeys.length && updKeys(from) <= hi
        }
        val dataFiles = fs.listStatus(pdir)
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
          .map(_.getPath)
        val (hit, miss) = dataFiles.partition { p =>
          fileKeyRange(conf, p, key).forall { case (lo, hi) => rangeHasKey(lo, hi) }
        }
        rewritten += hit.length
        kept += miss.length
        val basePart =
          if (hit.isEmpty) upd.limit(0)
          else spark.read.parquet(hit.map(_.toString).toIndexedSeq: _*)
        val tmp = new Path(s"$tableDir/.merge_tmp_$pcol=$esc")
        upsert(basePart, upd, Seq(key)).write.mode("overwrite").parquet(tmp.toString)
        // promote: move the superseded files aside (crash-recoverable),
        // land the staged files under their own unique names (Spark
        // part-file names carry a fresh UUID — no collision with kept
        // files), then drop the old copies
        val old = new Path(s"$tableDir/.merge_old_$pcol=$esc")
        fs.delete(old, true)
        fs.mkdirs(old)
        hit.foreach(p => fs.rename(p, new Path(old, p.getName)))
        fs.listStatus(tmp)
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
          .foreach(f => fs.rename(f.getPath, new Path(pdir, f.getPath.getName)))
        fs.delete(tmp, true)
        fs.delete(old, true)
      }
    }
    (rewritten, kept)
  }

  /** Latest-version-wins upsert: union base and updates, keep one row
    * per key by `tieBreak` (descending-priority ordering columns, e.g.
    * event time then id). Unlike plain [[upsert]], this is commutative
    * across batches — micro-batches applying out of order still
    * converge to the same state — which is what an incremental
    * (foreachBatch) CDC materialization needs. */
  def upsertLatest(base: DataFrame, updates: DataFrame, keys: Seq[String],
                   tieBreak: Seq[Column]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(tieBreak.map(_.desc): _*)
    base.unionByName(updates)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Apply one micro-batch to a versioned parquet state directory:
    * reads `stateDir/v<N>`, merges with [[upsertLatest]], writes
    * `v<N+1>`, returns its path. Versioned dirs (not in-place
    * overwrite) because Spark reads lazily — overwriting the directory
    * being read drops the old state mid-scan. At scale this is exactly
    * a table format's snapshot/commit: keep K versions for readers,
    * vacuum the rest. */
  def applyBatch(batch: DataFrame, stateDir: String, keys: Seq[String],
                 tieBreak: Seq[Column]): String = {
    val spark = batch.sparkSession
    val root = new Path(stateDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions =
      if (fs.exists(root))
        fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
          .collect { case n if n.startsWith("v") => n.drop(1).toLong }
      else Array.empty[Long]
    val merged =
      if (versions.isEmpty) upsertLatest(batch.limit(0), batch, keys, tieBreak)
      else upsertLatest(spark.read.parquet(s"$stateDir/v${versions.max}"),
        batch, keys, tieBreak)
    val out = s"$stateDir/v${versions.headOption.fold(1L)(_ => versions.max + 1)}"
    merged.write.mode("overwrite").parquet(out)
    out
  }

  /** Z-order (Morton) value over two numeric columns: each value is
    * min/max-normalized to `bits` bits and the bits interleaved, so
    * sorting by the result clusters rows that are close in BOTH
    * dimensions. Written with range partitioning, every output file
    * then covers a narrow min/max range of EVERY z-ordered column —
    * which is what makes parquet row-group/file skipping fire for
    * filters on any of them, not just the leading sort key. This is the
    * layout lever for multi-dimension point/range workloads at 100 TB
    * (a linear sort only skips on its leading column). */
  def zvalue(x: Column, xMin: Double, xMax: Double,
             y: Column, yMin: Double, yMax: Double, bits: Int = 16): Column = {
    val scale = (1L << bits) - 1
    def norm(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L) // constant column: contributes nothing to the order
      else least(greatest(round((c.cast("double") - lo) / (hi - lo) * scale)
        .cast("long"), lit(0L)), lit(scale))
    val (nx, ny) = (norm(x, xMin, xMax), norm(y, yMin, yMax))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftright(nx, i).bitwiseAND(1) * lit(1L << (2 * i + 1)) +
        shiftright(ny, i).bitwiseAND(1) * lit(1L << (2 * i))
    }
  }

  /** Rewrite `df` z-ordered by two numeric columns into `nFiles` files
    * (range-partitioned + sorted by the interleaved value: file k holds
    * the k-th z-range, i.e. a compact region of the (x,y) plane). */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String,
                  outPath: String, nFiles: Int): Unit = {
    val r = df.agg(min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
      min(col(yCol)).cast("double"), max(col(yCol)).cast("double")).head()
    val z = zvalue(col(xCol), r.getDouble(0), r.getDouble(1),
      col(yCol), r.getDouble(2), r.getDouble(3))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outPath)
  }

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
