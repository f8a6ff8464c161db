package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document character-trigram profile: one pass over the
  * text builds the distinct-gram count table in a local hash map and
  * emits it as `array<struct<g string, c long>>` — the map-side
  * replacement for the row-per-CHARACTER explode → hash-aggregate
  * pipeline language-ID (q142) otherwise runs. On a 1 KB document the
  * explode materializes ~1000 rows through the aggregate hash table;
  * this expression walks the same characters in a tight JVM loop and
  * hands downstream operators a few hundred pre-counted rows, so the
  * shuffle carries per-doc DISTINCT grams and the per-doc top-k can be
  * taken with built-in `array_sort`+`slice` with no window shuffle at
  * all.
  *
  * Semantics mirror the composed built-ins EXACTLY (the engine-side
  * refactor must not move values): words are `\s+` splits with empties
  * dropped, each word is padded `_w_`, and gram i (1-based, i ≤
  * codepoint-length of w) is `substring(padded, i, 3)` — CODEPOINT
  * indexed, as Spark's `substring`/`length` are. Output order is the
  * grams' UTF-8 binary order (deterministic; downstream aggregation is
  * order-free anyway). CodegenFallback: the per-row call is one
  * megamorphic dispatch per DOCUMENT (not per char), so the loop still
  * runs fused JVM code; the surrounding operators stay in
  * WholeStageCodegen.
  */
case class NgramCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "gram_counts"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val counts = new java.util.HashMap[String, Array[Long]]()
    val words = text.split("\\s+")
    var wi = 0
    while (wi < words.length) {
      val w = words(wi); wi += 1
      if (w.nonEmpty) {
        val padded = "_" + w + "_"
        val cps = padded.codePoints().toArray
        val nGrams = cps.length - 2 // = codepoint length of w
        var i = 0
        while (i < nGrams) {
          val sb = new java.lang.StringBuilder(6)
          sb.appendCodePoint(cps(i))
          sb.appendCodePoint(cps(i + 1))
          sb.appendCodePoint(cps(i + 2))
          val g = sb.toString
          val slot = counts.get(g)
          if (slot == null) counts.put(g, Array(1L)) else slot(0) += 1L
          i += 1
        }
      }
    }
    val out = new Array[(UTF8String, Long)](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = (UTF8String.fromString(e.getKey), e.getValue()(0))
      j += 1
    }
    java.util.Arrays.sort(out, (a: (UTF8String, Long), b: (UTF8String, Long)) =>
      a._1.compareTo(b._1))
    new GenericArrayData(out.map { case (g, c) => InternalRow(g, c) })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramCounts {
  /** Register in the session's function registry and return a Column
    * builder (the CosineSimilarity pattern). */
  def gramCounts(s: SparkSession)(text: Column): Column = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gram_counts", exprs => NgramCounts(exprs(0)), "scala_udf")
    call_function("gram_counts", text)
  }
}
