package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 connector: a deterministic sequence/corpus
  * generator table — the remaining Spark extension point the §2.9
  * ladder (Expression → Rule → Strategy → SparkPlan) didn't cover.
  * `spark.read.format("graft.sources.SeqSource")` yields rows
  *
  *   (id BIGINT, bucket BIGINT, val BIGINT, tag STRING)
  *
  * where every column is a pure function of `id`, so any slice can be
  * (re)generated on any executor with no data movement. Options:
  * `start`/`end` (row range), `partitions` (split count).
  *
  * Scale story (the reason a 100 TB pipeline wants this): synthetic /
  * backfill / load-test corpora are generated IN PLACE on the cluster —
  * 1000 executors each materialize only their own id-slice; there is no
  * driver-side collect, no shuffle, and no storage read. The same
  * mechanics (planning-time slice pruning + per-slice readers) are how
  * any external range-addressable store (a KV range scan, a REST-paged
  * feed) is wired into Spark.
  *
  * Pushdown, the part the driver can see in plans (PLANS.md shows
  * `PushedFilters` on the scan node):
  *
  *   - [[SupportsPushDownFilters]]: id-range predicates (`= < <= > >=`)
  *     tighten the generated [lo, hi) BEFORE planning, so partitions
  *     whose slice is empty are never created — partition pruning at
  *     plan time, generation work ∝ selected range, not table size.
  *     Pushed id-filters are fully evaluated here (not re-checked by
  *     Spark); every other predicate is returned as residual and stays
  *     in the query plan.
  *   - [[SupportsPushDownRequiredColumns]]: readers materialize only
  *     the projected columns (a `tag`-free scan never builds strings).
  *
  * Reference analogue: the reference seeds demo rows imperatively at
  * boot (render-complete-deploy.js:1187-1204 one-shot INSERTs); here
  * seeding is a distributed, restartable, sliceable table.
  */
class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SeqTable(
      properties.getOrDefault("start", "0").toLong,
      properties.getOrDefault("end", "1000").toLong,
      properties.getOrDefault("partitions", "8").toInt)
}

object SeqSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("val", LongType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  /** Planning metrics for specs: slices planned / pruned by the last
    * batch planning pass (driver-side only; local-mode tests read it). */
  val lastPlanned = new AtomicInteger(0)
  val lastPruned = new AtomicInteger(0)

  /** Column generators — modular arithmetic keeps every value well
    * inside BIGINT on both engines (DuckDB errors on int64 overflow,
    * so the oracle replays this token-for-token). */
  def valOf(id: Long): Long = ((id % 100003L) * 31L + 7L) % 100003L
  def bucketOf(id: Long): Long = id % 32L
}

class SeqTable(start: Long, end: Long, partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_seq[$start,$end)"
  override def schema(): StructType = SeqSource.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(start, end, partitions)
}

class SeqScanBuilder(start: Long, end: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var lo = start
  private var hi = end
  private var pushed = Array.empty[Filter]
  private var required: StructType = SeqSource.fullSchema

  // Accept id-range filters by tightening [lo, hi); everything else is
  // residual. `a > v` on a LongType id ⇒ lo = v+1 (exact — ids are
  // integers), so the pushed form loses nothing.
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case LessThan("id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SeqScan(start, end, lo, hi, partitions,
    required, pushed)
}

class SeqScan(start: Long, end: Long, lo: Long, hi: Long, partitions: Int,
    required: StructType, pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // Surfaced in .explain() / PLANS.md next to the scan node.
  override def description(): String =
    s"graft_seq range=[$lo,$hi) of [$start,$end) " +
      s"PushedFilters: ${pushed.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${required.map(_.name).mkString(",")}"

  // Slice the ORIGINAL [start, end) into `partitions` contiguous runs,
  // then keep only slices intersecting the pushed [lo, hi): the pruned
  // count is real planning-time work avoidance (those slices have no
  // reader, no task).
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, partitions)
    val span = math.max(0L, end - start)
    val all = (0 until n).map { i =>
      val s = start + span * i / n
      val e = start + span * (i + 1) / n
      SeqSlice(math.max(s, lo), math.min(e, hi))
    }
    val kept = all.filter(p => p.lo < p.hi)
    SeqSource.lastPlanned.set(kept.length)
    SeqSource.lastPruned.set(all.length - kept.length)
    kept.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required)
}

case class SeqSlice(lo: Long, hi: Long) extends InputPartition

class SeqReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val s = partition.asInstanceOf[SeqSlice]
    new SeqReader(s.lo, s.hi, required)
  }
}

/** Generates the slice's rows one by one; only `required` columns are
  * materialized (column pruning reaches the row builder, not just the
  * schema). */
class SeqReader(lo: Long, hi: Long, required: StructType)
    extends PartitionReader[InternalRow] {
  private var cur = lo - 1
  private val cols: Array[Long => Any] = required.fields.map { f =>
    f.name match {
      case "id" => (id: Long) => id
      case "bucket" => (id: Long) => SeqSource.bucketOf(id)
      case "val" => (id: Long) => SeqSource.valOf(id)
      case "tag" => (id: Long) => UTF8String.fromString("doc_" + id)
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
  }
  override def next(): Boolean = { cur += 1; cur < hi }
  override def get(): InternalRow =
    InternalRow.fromSeq(cols.toIndexedSeq.map(_(cur)))
  override def close(): Unit = ()
}
