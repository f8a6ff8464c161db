package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column support (SURVEY.md §2.10).
  *
  * Media lives as opaque `binary` columns + typed metadata — the Spark
  * re-expression of the reference's multer file uploads, which store
  * bytes on disk and only a URL in the database
  * (render-complete-deploy.js:181-195,:620). Here the bytes ride WITH
  * the row (binaryFile source → BinaryType column), so decode/feature
  * stages are data-local — no sidecar fetches at 100 TB.
  *
  * The decode kernels are STUBS (deterministic fakes — no image/audio
  * codecs ship in this environment); everything around them — source,
  * schema, batch iteration via mapPartitions, output feature schema,
  * size-aware repartitioning — is real and tested. Swap `stubDecode*`
  * for a JNI/codec call and nothing else changes.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  case class MediaMeta(path: String, ext: String, length: Long,
                       content_md5: String)
  case class ImageFeatures(path: String, width: Int, height: Int,
                           channels: Int, histogram: Array[Float])

  /** Ingest a directory of opaque files as (path, modificationTime,
    * length, content) rows — Spark's binaryFile source. The glob rides
    * in `pathGlobFilter` rather than the load path: a glob in the path
    * makes FileStreamSink's metadata probe log a spurious
    * FileNotFoundException stack trace for the literal `*` path. */
  def readBinary(s: SparkSession, dir: String, glob: String): DataFrame =
    s.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)

  /** Metadata + content hash (all real computation). The fingerprint is
    * md5 over the HEX of the bytes (not the raw bytes) because the
    * DuckDB oracle's md5 only accepts VARCHAR — hex() is bit-identical
    * (uppercase) in both engines, so the digest still covers every
    * byte of content. */
  def withMeta(bin: DataFrame): DataFrame =
    bin.select(
      col("path"),
      regexp_extract(col("path"), "\\.([^./]+)$", 1).as("ext"),
      col("length"),
      md5(hex(col("content"))).as("content_md5"),
      col("content"))

  /** ==== STUB ==== deterministic fake image decode: derives fake
    * dimensions and a 16-bin byte histogram from the raw bytes. A real
    * implementation calls an image codec here; the per-partition batch
    * iteration, the output schema, and the driver-free distribution are
    * exactly what the real kernel would use. */
  def decodeImages(bin: DataFrame): Dataset[ImageFeatures] = {
    import bin.sparkSession.implicits._
    bin.select("path", "content").as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (path, bytes) =>
          // STUB: fake W/H from byte length; real code: codec.decode(bytes)
          val w = 64 + (bytes.length % 512)
          val h = 64 + ((bytes.length / 7) % 512)
          val hist = new Array[Float](16)
          var i = 0
          while (i < bytes.length && i < 65536) {
            hist((bytes(i) & 0xff) / 16) += 1f; i += 1
          }
          ImageFeatures(path, w, h, 3, hist)
        }
      }
  }

  /** ==== STUB ==== deterministic fake frame sampling for video bytes:
    * emits every k-th "frame offset" with a content hash — the
    * explode-shaped plumbing of a real frame sampler. */
  def sampleFrames(bin: DataFrame, everyNth: Int = 10): DataFrame = {
    val frames = bin.select(col("path"), col("length"))
      .withColumn("frame_idx",
        explode(sequence(lit(0L), greatest((col("length") / 1000000L).cast("long"), lit(0L)))))
    frames.filter(pmod(col("frame_idx"), lit(everyNth.toLong)) === 0)
      .withColumn("frame_key", md5(concat(col("path"), lit("#"), col("frame_idx"))))
  }

  val queries: Map[String, Q] = Map(
    // Binary ingest of a FIXED directory of opaque files (the sf0.01
    // testdata parquets standing in for an uploads/ dir) — real
    // binaryFile scan + metadata/hash extraction. Oracle: DuckDB
    // read_blob() over the same files gives (filename, size, content),
    // so name/length/md5 are fully cross-checkable. Both sides pin the
    // same literal directory because a binary corpus is an artifact
    // store, not a scale-factor table — and the oracle SQL (static
    // text) cannot interpolate the runtime sfDir.
    "q70_binary_ingest" -> ((s, _) => {
      import s.implicits._
      withMeta(readBinary(s, "/root/testdata/sf0.01", "*.parquet"))
        .select(
          element_at(split($"path", "/"), -1).as("file_name"),
          $"ext", $"length", $"content_md5")
        .orderBy($"file_name")
    }),

    // Image-feature extraction through the REAL distribution plumbing
    // (typed Dataset → mapPartitions batch iteration → feature schema).
    // The decode kernel is the documented deterministic stub, which is
    // exactly what makes the plumbing oracle-checkable: width/height
    // derive from byte length and the histogram mass equals
    // min(length, 64KiB), all reproducible from DuckDB's read_blob —
    // so path carry, per-partition iteration, and the output schema
    // are verified even though no codec ships in this environment.
    "q83_image_features" -> ((s, _) => {
      import s.implicits._
      decodeImages(readBinary(s, "/root/testdata/sf0.01", "*.parquet")).toDF()
        .select(
          element_at(split($"path", "/"), -1).as("file_name"),
          $"width".cast("long").as("width"),
          $"height".cast("long").as("height"),
          $"channels".cast("long").as("channels"),
          aggregate($"histogram", lit(0.0d),
            (acc, x) => acc + x.cast("double")).cast("long").as("n_hist_bytes"))
        .orderBy($"file_name")
    }))

  /** The driver verifies at sf0.01; read_blob needs a literal path (the
    * table-name view substitution only covers the 10 parquet tables). */
  val oracle: Map[String, String] = Map(
    "q70_binary_ingest" ->
      """SELECT regexp_extract(filename, '([^/]+)$', 1) AS file_name,
        |  regexp_extract(filename, '\.([^./]+)$', 1) AS ext,
        |  size AS length,
        |  md5(hex(content)) AS content_md5
        |FROM read_blob('/root/testdata/sf0.01/*.parquet')
        |ORDER BY file_name""".stripMargin,

    "q83_image_features" ->
      """SELECT regexp_extract(filename, '([^/]+)$', 1) AS file_name,
        |  CAST(64 + size % 512 AS BIGINT) AS width,
        |  CAST(64 + (size // 7) % 512 AS BIGINT) AS height,
        |  CAST(3 AS BIGINT) AS channels,
        |  CAST(least(size, 65536) AS BIGINT) AS n_hist_bytes
        |FROM read_blob('/root/testdata/sf0.01/*.parquet')
        |ORDER BY file_name""".stripMargin)
}
