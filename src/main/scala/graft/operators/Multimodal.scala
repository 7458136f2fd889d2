package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side plumbing (schema, partition-friendly batch shape,
  * deterministic pipeline) is real and tested; the actual codec calls are
  * STUBBED behind `decodeStub` with a deterministic fake (no image/audio
  * libraries in this container). Swapping in a real decoder means replacing
  * ONLY the body of `decodeStub` — the mapPartitions batch shape, schema,
  * and downstream feature columns are unchanged.
  *
  * Scale notes: media bytes never shuffle — every stage below is a narrow
  * map; metadata extraction projects away the payload as early as possible
  * so downstream joins/aggs move only scalars. At 100 TB the media table
  * would be bucketed by content hash so dedup joins co-locate.
  */
object Multimodal {

  /** Canonical media-table schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("fingerprint", StringType, nullable = false)))

  case class DecodedFrame(media_id: Long, frame_idx: Int, width: Int,
      height: Int, features: Array[Double])

  /** Build a media table from any (id, payload) source: computes byte
    * length + content fingerprint, keeping the payload opaque.
    */
  def toMediaTable(src: DataFrame, idCol: String, payloadCol: String,
      mime: String): DataFrame =
    src.select(
      col(idCol).cast("long").as("media_id"),
      lit(mime).as("mime"),
      col(payloadCol).cast("binary").as("payload"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("fingerprint", sha2(col("payload"), 256))

  /** The decoder seam: a production build plugs a real codec (javax.imageio
    * / ffmpeg bindings) in here; everything else — the mapPartitions batch
    * shape, per-partition init hook, schema, downstream feature columns —
    * is identical for any implementation. Must be Serializable: instances
    * ship inside the task closure.
    */
  trait FrameDecoder extends Serializable {
    /** Called once per partition before any decode — amortize codec
      * contexts / model weights here (what a Pandas-UDF batch init does). */
    def openPartition(): Unit = ()
    def decodeFrame(mediaId: Long, payload: Array[Byte], frameIdx: Int): DecodedFrame
  }

  /** Deterministic fake decoder. REAL IMPLEMENTATION STUBBED: this
    * container has no image/audio libraries, so "pixels" are synthesized
    * from the payload bytes (stable across runs → testable plumbing).
    */
  object DeterministicFakeDecoder extends FrameDecoder {
    def decodeFrame(id: Long, payload: Array[Byte], f: Int): DecodedFrame = {
      // ??? real decode goes here; deterministic fake below.
      val w = 8; val h = 8
      val feats = Array.tabulate(4) { k =>
        val slice = payload.iterator.drop(f * 4 + k).grouped(16)
          .map(_.map(b => (b & 0xFF).toLong).sum).sum
        (slice % 997).toDouble / 997.0
      }
      DecodedFrame(id, f, w, h, feats)
    }
  }

  /** Decode stage over any FrameDecoder — a narrow mapPartitions; payloads
    * never shuffle.
    *
    * @param framesPer number of frames to sample per media item
    */
  def decode(media: DataFrame, framesPer: Int,
      decoder: FrameDecoder): Dataset[DecodedFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        decoder.openPartition()
        it.flatMap { case (id, payload) =>
          (0 until framesPer).iterator.map(f => decoder.decodeFrame(id, payload, f))
        }
      }
  }

  /** Decode with the deterministic stub decoder (container default). */
  def decodeStub(media: DataFrame, framesPer: Int = 2): Dataset[DecodedFrame] =
    decode(media, framesPer, DeterministicFakeDecoder)

  /** Frame sampling: keep every nth frame — a filter on the decoded set,
    * never re-touching payloads. */
  def sampleFrames(frames: Dataset[DecodedFrame], everyN: Int): Dataset[DecodedFrame] =
    frames.filter(col("frame_idx") % everyN === 0)

  /** "Resize" metadata transform (dimension bookkeeping only — the stub
    * has no pixels; a real impl maps features). */
  def resize(frames: DataFrame, w: Int, h: Int): DataFrame =
    frames.withColumn("width", lit(w)).withColumn("height", lit(h))

  // ── q40: media metadata extraction over documents-as-binary — byte
  //        length, content fingerprint, chunk count (the payload-opaque
  //        subset, fully oracle-checkable).
  def q40(s: SparkSession, dir: String): DataFrame =
    toMediaTable(documents(s, dir), "doc_id", "text", "text/plain")
      .select(col("media_id"), col("mime"), col("n_bytes"), col("fingerprint"),
        ((col("n_bytes") + 255) / 256).cast("long").as("n_chunks"))
      .orderBy(col("media_id"))

  val q40Sql: String =
    """SELECT doc_id AS media_id, 'text/plain' AS mime,
      |  octet_length(encode(text)) AS n_bytes,
      |  sha256(text) AS fingerprint,
      |  CAST((octet_length(encode(text)) + 255) // 256 AS BIGINT) AS n_chunks
      |FROM documents ORDER BY media_id""".stripMargin

  // ── q63: metadata over a TRUE BinaryType parquet scan — the r2 gap
  //        (q40 runs documents-as-binary via cast). The fixture is
  //        deterministic pseudo-PNG bytes (PNG magic + k×32-byte sha
  //        digest, k = doc_id%8+1) derived from `documents`, materialized
  //        to parquet and READ BACK, so the scanned column is binary on
  //        disk; the DuckDB oracle rebuilds the identical bytes from the
  //        same table. Fingerprint is sha256 of the payload's upper-hex
  //        (DuckDB v1.0 sha256 takes VARCHAR only — the byte-level
  //        sha2(payload) of toMediaTable stays the production form).
  private val PngMagicHex = "89504E470D0A1A0A"

  /** Deterministic variable-length binary payloads from `documents`. */
  def mediaFixture(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(col("doc_id"),
      unhex(concat(lit(PngMagicHex),
        expr("repeat(sha2(text, 256), cast(doc_id % 8 + 1 as int))")))
        .as("payload"))

  /** Writes the binary fixture for `dir` to a stable temp path and
    * returns the read-back DataFrame (true binary parquet scan). */
  def binaryMediaTable(s: SparkSession, dir: String): DataFrame = {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_media_fixture_" +
        java.lang.Integer.toHexString(dir.hashCode)).getAbsolutePath
    mediaFixture(s, dir).write.mode("overwrite").parquet(path)
    s.read.parquet(path)
  }

  def q63(s: SparkSession, dir: String): DataFrame = {
    val hx = upper(hex(col("payload")))
    toMediaTable(binaryMediaTable(s, dir), "doc_id", "payload", "image/png")
      .select(col("media_id"), col("mime"), col("n_bytes"),
        sha2(hx, 256).as("fingerprint"),
        when(substring(hx, 1, 16) === PngMagicHex, lit(1L)).otherwise(lit(0L))
          .as("is_png"))
      .orderBy(col("media_id"))
  }

  val q63Sql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    unhex(concat('89504E470D0A1A0A',
      |      repeat(sha256(text), CAST(doc_id % 8 + 1 AS INT)))) AS payload
      |  FROM documents),
      |h AS (SELECT media_id, payload, upper(hex(payload)) AS hx FROM m)
      |SELECT media_id, 'image/png' AS mime,
      |  CAST(octet_length(payload) AS BIGINT) AS n_bytes,
      |  sha256(hx) AS fingerprint,
      |  CAST(CASE WHEN substring(hx, 1, 16) = '89504E470D0A1A0A'
      |       THEN 1 ELSE 0 END AS BIGINT) AS is_png
      |FROM h ORDER BY media_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_multimodal_meta" -> q40,
    "q63_media_binary" -> q63)

  val oracle: Map[String, String] = Map(
    "q40_multimodal_meta" -> q40Sql,
    "q63_media_binary" -> q63Sql)
}
