package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * Every modality decodes for REAL on pure-JDK codecs: PNG images via
  * javax.imageio (q107/q109/q156), WAV audio via javax.sound.sampled
  * (q110), frame streams (q111), and AVI video via the RIFF demux in
  * [[graft.operators.Video]] (q165). `DeterministicFakeDecoder` remains
  * only as the documented seam for EXTERNAL codecs this container lacks
  * (H.264, MP3, ...): swapping one in means replacing only the
  * `FrameDecoder` body — the mapPartitions batch shape, schema, and
  * downstream feature columns are unchanged.
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

  /** Deterministic fake decoder — the seam for EXTERNAL codecs only
    * (H.264/VP9/MP3 need native libraries this container lacks); every
    * JDK-decodable modality has a real decoder (PngImageIODecoder here,
    * WAV in q110, AVI/MJPEG in [[graft.operators.Video]]). "Pixels" are
    * synthesized from payload bytes (stable across runs → testable
    * plumbing).
    */
  object DeterministicFakeDecoder extends FrameDecoder {
    def decodeFrame(id: Long, payload: Array[Byte], f: Int): DecodedFrame = {
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

  // ── q107: REAL image decode — the r5 gap ("decoder seam is a
  //        deterministic fake"). The container has no external codecs, but
  //        the JDK ships javax.imageio: the fixture below is a genuine
  //        8-bit grayscale PNG per document (pixels = the 32 bytes of
  //        sha256(text), dims vary by doc_id%6), materialized to parquet
  //        and READ BACK, and the decoder runs ImageIO.read on the scanned
  //        BinaryType column — header parse for dims, IDAT inflate for
  //        pixels, nothing replayed. The DuckDB oracle recomputes what the
  //        decoder must OBSERVE (dims, pixel sum/min/max/mean) from the
  //        same sha256 WITHOUT a codec, via a 256-row hex-pair→value
  //        lookup join — so a decoder that doesn't truly parse the PNG
  //        cannot pass.
  //        Scale shape: encode and decode are narrow mapPartitions (media
  //        bytes never shuffle); only (id, dims, 4 scalars) leave the scan.
  private[graft] val DimsByMod: Array[(Int, Int)] =
    Array((8, 4), (4, 8), (16, 2), (2, 16), (32, 1), (1, 32))

  /** Encode 32 digest bytes as a real w×h 8-bit grayscale PNG. */
  private[graft] def grayPng(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < w * h) {
      raster.setSample(i % w, i / w, 0, pixels(i) & 0xFF)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream(128)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real-PNG payloads from `documents` (deterministic: sha256 pixels). */
  def pngFixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir).select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file cache in tasks
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, text) =>
          val dgst = md.digest(
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val (w, h) = DimsByMod(((id % 6) + 6).toInt % 6)
          (id, grayPng(dgst, w, h))
        }
      }.toDF("doc_id", "payload")
  }

  /** Read-back of the PNG fixture (true BinaryType parquet scan, like
    * q63); built+written once per JVM via graft.Fixtures. */
  def pngMediaTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(graft.Fixtures.path("png", dir)(pngFixture(s, dir)))

  /** Real decoder behind the FrameDecoder seam: javax.imageio (JDK-only,
    * zero new deps). features = (pixel sum, min, max, mean) over band 0.
    */
  object PngImageIODecoder extends FrameDecoder {
    override def openPartition(): Unit =
      javax.imageio.ImageIO.setUseCache(false)
    def decodeFrame(id: Long, payload: Array[Byte], f: Int): DecodedFrame = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, s"media_id=$id: not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      var sum = 0L; var min = 255; var max = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = raster.getSample(x, y, 0)
          sum += v; if (v < min) min = v; if (v > max) max = v
          x += 1
        }
        y += 1
      }
      DecodedFrame(id, f, w, h,
        Array(sum.toDouble, min.toDouble, max.toDouble,
          sum.toDouble / (w.toLong * h)))
    }
  }

  def q107(s: SparkSession, dir: String): DataFrame =
    decode(pngMediaTable(s, dir).withColumnRenamed("doc_id", "media_id"),
        1, PngImageIODecoder)
      .select(col("media_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        (col("width") * col("height")).cast("long").as("n_pixels"),
        col("features")(0).cast("long").as("px_sum"),
        col("features")(1).cast("long").as("px_min"),
        col("features")(2).cast("long").as("px_max"),
        col("features")(3).as("px_mean"))
      .orderBy(col("media_id"))

  // Oracle recomputes the decoder's observations codec-free: pixel i is
  // hex pair i of sha256(text), mapped to its value by a 256-row LUT
  // join; dims are the doc_id%6 table above; mean = sum/32 (n_pixels is
  // always 32 — every dim pair multiplies to 32 — and /32 is a
  // power-of-two division, exact in both engines' doubles).
  val q107Sql: String =
    """WITH b AS (
      |  SELECT d.doc_id, upper(substring(sha256(d.text), g.i*2+1, 2)) AS hp
      |  FROM documents d CROSS JOIN generate_series(0,31) g(i)),
      |lut AS (
      |  SELECT i AS v, upper(lpad(hex(i),2,'0')) AS hp
      |  FROM generate_series(0,255) t(i)),
      |px AS (
      |  SELECT b.doc_id, CAST(sum(lut.v) AS BIGINT) AS px_sum,
      |    CAST(min(lut.v) AS BIGINT) AS px_min,
      |    CAST(max(lut.v) AS BIGINT) AS px_max
      |  FROM b JOIN lut USING (hp) GROUP BY 1)
      |SELECT doc_id AS media_id,
      |  CAST(CASE ((doc_id % 6) + 6) % 6 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 16
      |       WHEN 3 THEN 2 WHEN 4 THEN 32 ELSE 1 END AS BIGINT) AS width,
      |  CAST(CASE ((doc_id % 6) + 6) % 6 WHEN 0 THEN 4 WHEN 1 THEN 8 WHEN 2 THEN 2
      |       WHEN 3 THEN 16 WHEN 4 THEN 1 ELSE 32 END AS BIGINT) AS height,
      |  CAST(32 AS BIGINT) AS n_pixels,
      |  px_sum, px_min, px_max,
      |  CAST(px_sum AS DOUBLE) / 32 AS px_mean
      |FROM px ORDER BY media_id""".stripMargin

  // ── q109: REAL raster resize — the last fake in the multimodal quartet
  //        (decode ✓ q107 / feature-extract ✓ / resize / frame-sample ✓).
  //        Nearest-neighbor downscale by 2 on the DECODED raster:
  //        resized (x2,y2) takes source pixel (2·x2, 2·y2), so the oracle
  //        can name every surviving pixel's index in the sha256 digest
  //        and recompute the resized stats codec-free (same hex-pair LUT
  //        as q107). Bilinear would average pixels — real too, but its
  //        result is not SQL-nameable; nearest keeps the transform
  //        honest AND oracle-checkable. Narrow mapPartitions; payloads
  //        never shuffle.
  def q109(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    pngMediaTable(s, dir).select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, payload) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
          require(img != null, s"media_id=$id: not a decodable image")
          val (w, h) = (img.getWidth, img.getHeight)
          val (w2, h2) = ((w + 1) / 2, (h + 1) / 2)
          val src = img.getRaster
          // materialize the resized raster, then read stats back from it
          // (a real transform, not index arithmetic on the source)
          val out = new java.awt.image.BufferedImage(
            w2, h2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val dst = out.getRaster
          var y = 0
          while (y < h2) {
            var x = 0
            while (x < w2) {
              dst.setSample(x, y, 0, src.getSample(2 * x, 2 * y, 0))
              x += 1
            }
            y += 1
          }
          var sum = 0L; var min = 255; var max = 0
          y = 0
          while (y < h2) {
            var x = 0
            while (x < w2) {
              val v = dst.getSample(x, y, 0)
              sum += v; if (v < min) min = v; if (v > max) max = v
              x += 1
            }
            y += 1
          }
          (id, w2.toLong, h2.toLong, (w2.toLong * h2), sum,
            min.toLong, max.toLong)
        }
      }
      .toDF("media_id", "width", "height", "n_pixels", "px_sum",
        "px_min", "px_max")
      .orderBy(col("media_id"))
  }

  // Oracle: resized pixel (x2,y2) = source index 2·y2·w + 2·x2 = hex
  // pair at that index in sha256(text). Source dims from doc_id%6 (the
  // q107 table); resized dims are ceil-half. generate_series enumerates
  // the resized grid; the 256-row LUT maps hex pairs to values.
  val q109Sql: String =
    """WITH dims AS (
      |  SELECT doc_id, text,
      |    CASE ((doc_id % 6) + 6) % 6 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 16
      |         WHEN 3 THEN 2 WHEN 4 THEN 32 ELSE 1 END AS w,
      |    CASE ((doc_id % 6) + 6) % 6 WHEN 0 THEN 4 WHEN 1 THEN 8 WHEN 2 THEN 2
      |         WHEN 3 THEN 16 WHEN 4 THEN 1 ELSE 32 END AS h
      |  FROM documents),
      |d2 AS (
      |  SELECT doc_id, text, w, h,
      |    (w + 1) // 2 AS w2, (h + 1) // 2 AS h2 FROM dims),
      |grid AS (
      |  SELECT d2.doc_id, d2.w2, d2.h2,
      |    upper(substring(sha256(d2.text),
      |      (2*(g.i // d2.w2)*d2.w + 2*(g.i % d2.w2))*2 + 1, 2)) AS hp
      |  FROM d2 CROSS JOIN generate_series(0,255) g(i)
      |  WHERE g.i < d2.w2 * d2.h2),
      |lut AS (
      |  SELECT i AS v, upper(lpad(hex(i),2,'0')) AS hp
      |  FROM generate_series(0,255) t(i)),
      |px AS (
      |  SELECT grid.doc_id, CAST(sum(lut.v) AS BIGINT) AS px_sum,
      |    CAST(min(lut.v) AS BIGINT) AS px_min,
      |    CAST(max(lut.v) AS BIGINT) AS px_max
      |  FROM grid JOIN lut USING (hp) GROUP BY 1)
      |SELECT d2.doc_id AS media_id,
      |  CAST(d2.w2 AS BIGINT) AS width, CAST(d2.h2 AS BIGINT) AS height,
      |  CAST(d2.w2 * d2.h2 AS BIGINT) AS n_pixels,
      |  px.px_sum, px.px_min, px.px_max
      |FROM d2 JOIN px ON d2.doc_id = px.doc_id
      |ORDER BY media_id""".stripMargin

  // ── q110: REAL audio decode — second modality, same pattern as q107.
  //        The JDK ships a WAV codec (javax.sound.sampled): the fixture
  //        writes a genuine RIFF/WAVE file per document (8-bit unsigned
  //        PCM mono, sample rate varying by doc_id%4, samples = the 32
  //        sha256(text) bytes), materialized to BinaryType parquet and
  //        read back; the decoder AudioSystem-parses the container
  //        (format chunk for rate/channels/width, data chunk for
  //        samples). Oracle recomputes what the decoder must observe
  //        (rate, channels, n_samples, sample sum/min/max) codec-free
  //        via the same hex-pair LUT. Video gets the same treatment in
  //        [[graft.operators.Video]] (q165: RIFF/AVI demux + decode).
  private[graft] val RatesByMod: Array[Int] = Array(8000, 16000, 22050, 44100)

  /** Encode 32 digest bytes as a real 8-bit unsigned PCM mono WAV. */
  private[graft] def wavBytes(samples: Array[Byte], rate: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(
      AudioFormat.Encoding.PCM_UNSIGNED, rate.toFloat, 8, 1, 1,
      rate.toFloat, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream(128)
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Real-WAV payloads from `documents` (deterministic: sha256 samples). */
  def wavFixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir).select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, text) =>
          val dgst = md.digest(
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          (id, wavBytes(dgst, RatesByMod(((id % 4) + 4).toInt % 4)))
        }
      }.toDF("doc_id", "payload")
  }

  def wavMediaTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(graft.Fixtures.path("wav", dir)(wavFixture(s, dir)))

  def q110(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    wavMediaTable(s, dir).select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        import javax.sound.sampled._
        it.map { case (id, payload) =>
          val ais = AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(payload))
          val fmt = ais.getFormat
          val n = ais.getFrameLength.toInt * fmt.getFrameSize
          val buf = new Array[Byte](n)
          var off = 0
          while (off < n) {
            val r = ais.read(buf, off, n - off)
            require(r > 0, s"media_id=$id: truncated WAV data chunk")
            off += r
          }
          ais.close()
          var sum = 0L; var min = 255; var max = 0
          buf.foreach { b =>
            val v = b & 0xFF // 8-bit PCM is unsigned
            sum += v; if (v < min) min = v; if (v > max) max = v
          }
          (id, fmt.getSampleRate.toLong, fmt.getChannels.toLong, n.toLong,
            sum, min.toLong, max.toLong)
        }
      }
      .toDF("media_id", "sample_rate", "channels", "n_samples",
        "s_sum", "s_min", "s_max")
      .orderBy(col("media_id"))
  }

  val q110Sql: String =
    """WITH b AS (
      |  SELECT d.doc_id, upper(substring(sha256(d.text), g.i*2+1, 2)) AS hp
      |  FROM documents d CROSS JOIN generate_series(0,31) g(i)),
      |lut AS (
      |  SELECT i AS v, upper(lpad(hex(i),2,'0')) AS hp
      |  FROM generate_series(0,255) t(i)),
      |px AS (
      |  SELECT b.doc_id, CAST(sum(lut.v) AS BIGINT) AS s_sum,
      |    CAST(min(lut.v) AS BIGINT) AS s_min,
      |    CAST(max(lut.v) AS BIGINT) AS s_max
      |  FROM b JOIN lut USING (hp) GROUP BY 1)
      |SELECT doc_id AS media_id,
      |  CAST(CASE ((doc_id % 4) + 4) % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
      |       WHEN 2 THEN 22050 ELSE 44100 END AS BIGINT) AS sample_rate,
      |  CAST(1 AS BIGINT) AS channels,
      |  CAST(32 AS BIGINT) AS n_samples,
      |  s_sum, s_min, s_max
      |FROM px ORDER BY media_id""".stripMargin

  // ── q111: multi-frame container demux + frame sampling over REAL
  //        decoded frames. The JDK ships no video codec and its GIF
  //        writer remaps gray palettes (probed: not byte-exact), so the
  //        container is a minimal length-prefixed PNG frame stream —
  //        [4-byte BE length][PNG]... — which keeps every stage real:
  //        the demux genuinely parses lengths and slices frames, every
  //        frame is a genuine ImageIO decode, and frame sampling
  //        (keep even frame_idx) filters rows that exist only because
  //        the demux found them. Frame f's pixels are
  //        sha256(text ‖ ':' ‖ f), frame count = doc_id%3+1 — so the
  //        oracle replays sampled-frame stats codec-free per (doc,f).
  def frameStreamFixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir).select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, text) =>
          val k = (((id % 3) + 3) % 3 + 1).toInt
          val bos = new java.io.ByteArrayOutputStream(256)
          val out = new java.io.DataOutputStream(bos)
          (0 until k).foreach { f =>
            val png = grayPng(md.digest(
              s"$text:$f".getBytes(java.nio.charset.StandardCharsets.UTF_8)),
              8, 4)
            out.writeInt(png.length)
            out.write(png)
          }
          (id, bos.toByteArray)
        }
      }.toDF("doc_id", "payload")
  }

  def frameStreamTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(
      graft.Fixtures.path("fstream", dir)(frameStreamFixture(s, dir)))

  def q111(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    frameStreamTable(s, dir).select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, payload) =>
          val in = new java.io.DataInputStream(
            new java.io.ByteArrayInputStream(payload))
          val frames = Iterator.continually(in.available())
            .takeWhile(_ >= 4).map { _ =>
              val len = in.readInt()
              val buf = new Array[Byte](len)
              in.readFully(buf)
              javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(buf))
            }.toVector
          frames.zipWithIndex.map { case (img, f) =>
            require(img != null, s"media_id=$id frame $f: not decodable")
            val (w, h) = (img.getWidth, img.getHeight)
            val raster = img.getRaster
            var sum = 0L; var min = 255; var max = 0
            var i = 0
            while (i < w * h) {
              val v = raster.getSample(i % w, i / w, 0)
              sum += v; if (v < min) min = v; if (v > max) max = v
              i += 1
            }
            (id, f.toLong, frames.length.toLong, w.toLong, h.toLong, sum,
              min.toLong, max.toLong)
          }
        }
      }
      .toDF("media_id", "frame_idx", "n_frames", "width", "height",
        "px_sum", "px_min", "px_max")
      .filter(col("frame_idx") % 2 === 0) // frame sampling: keep even
      .orderBy(col("media_id"), col("frame_idx"))
  }

  val q111Sql: String =
    """WITH fr AS (
      |  SELECT d.doc_id, d.text, g.f, ((d.doc_id % 3) + 3) % 3 + 1 AS k
      |  FROM documents d CROSS JOIN generate_series(0,2) g(f)
      |  WHERE g.f < ((d.doc_id % 3) + 3) % 3 + 1 AND g.f % 2 = 0),
      |b AS (
      |  SELECT fr.doc_id, fr.f, fr.k,
      |    upper(substring(sha256(fr.text || ':' || CAST(fr.f AS VARCHAR)),
      |      g.i*2+1, 2)) AS hp
      |  FROM fr CROSS JOIN generate_series(0,31) g(i)),
      |lut AS (
      |  SELECT i AS v, upper(lpad(hex(i),2,'0')) AS hp
      |  FROM generate_series(0,255) t(i)),
      |px AS (
      |  SELECT b.doc_id, b.f, b.k, CAST(sum(lut.v) AS BIGINT) AS px_sum,
      |    CAST(min(lut.v) AS BIGINT) AS px_min,
      |    CAST(max(lut.v) AS BIGINT) AS px_max
      |  FROM b JOIN lut USING (hp) GROUP BY 1, 2, 3)
      |SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_idx,
      |  CAST(k AS BIGINT) AS n_frames,
      |  CAST(8 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
      |  px_sum, px_min, px_max
      |FROM px ORDER BY media_id, frame_idx""".stripMargin

  // ── q168: acoustic-fingerprint AUDIO dedup — the audio face of the
  //        dedup family (text q32/q34, image q156, video q167). Byte-level
  //        dedup misses a re-encoded audio duplicate (same waveform,
  //        different container metadata) and a remastered one (DC offset
  //        added), so each clip reduces to a delta-sign fingerprint
  //        computed on the DECODED samples (AudioSystem parse, like q110):
  //        bit i = sample[i+1] > sample[i] — invariant to the sample-rate
  //        relabel (samples unchanged) AND to constant gain offsets
  //        (deltas unchanged where no clipping occurs). The fixture plants
  //        rate-relabeled twins (doc_id%3==0: same samples at 22050 Hz —
  //        byte-different WAV, identical fingerprint) and DC-offset twins
  //        (doc_id%4==0: samples +7, clamped at 255 — fingerprint equal
  //        unless clamping flattens a rising delta near full-scale, which
  //        the oracle replays exactly). Oracle-green via the hex-pair LUT.
  //        Scale shape: payloads never shuffle; only (id, 8-byte
  //        fingerprint) leaves the decode scan.
  def wavVariantsTable(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val p = graft.Fixtures.path("wavvar", dir) {
      val docs = documents(s, dir).select(col("doc_id"), col("text"))
      def build(idShift: Long, pred: org.apache.spark.sql.Column,
          rateOf: Long => Int, offset: Int) =
        docs.filter(pred).as[(Long, String)]
          .mapPartitions { it =>
            val md = java.security.MessageDigest.getInstance("SHA-256")
            it.map { case (id, text) =>
              val dgst = md.digest(
                text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              val samples =
                if (offset == 0) dgst
                else dgst.map(b => math.min(255, (b & 0xFF) + offset).toByte)
              (id + idShift, wavBytes(samples, rateOf(id)))
            }
          }.toDF("media_id", "payload")
      build(0L, lit(true), id => RatesByMod(((id % 4) + 4).toInt % 4), 0)
        .unionByName(build(1000000000L, col("doc_id") % 3 === 0,
          _ => 11025, 0))   // re-encode: same samples, new rate label
                            // (11025 ∉ RatesByMod → always byte-different)
        .unionByName(build(2000000000L, col("doc_id") % 4 === 0,
          id => RatesByMod(((id % 4) + 4).toInt % 4), 7)) // DC offset +7
    }
    s.read.parquet(p)
  }

  /** Direct RIFF/WAVE parse: verify magic, walk chunks, REQUIRE 8-bit
    * mono PCM from 'fmt ', slice 'data'. Byte-identical to what
    * AudioSystem decodes (MultimodalSpec pins the equality over the
    * fixture), but without javax.sound's per-call service-provider
    * lookup — which dominated the 100× rehearsal at ~800k clips
    * (q168 196.9s with AudioSystem; the bulk fingerprint path has no
    * business paying an SPI scan per row). q110 deliberately KEEPS the
    * AudioSystem path: it is the real-JDK-codec conformance query.
    */
  private[graft] def wavDataChunk(payload: Array[Byte]): Array[Byte] = {
    def le32(off: Int): Int =
      (payload(off) & 0xFF) | ((payload(off + 1) & 0xFF) << 8) |
        ((payload(off + 2) & 0xFF) << 16) | ((payload(off + 3) & 0xFF) << 24)
    def le16(off: Int): Int =
      (payload(off) & 0xFF) | ((payload(off + 1) & 0xFF) << 8)
    def cc(off: Int): String =
      new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    require(payload.length >= 12 && cc(0) == "RIFF" && cc(8) == "WAVE",
      "not a RIFF/WAVE container")
    var p = 12
    var data: Array[Byte] = null
    var fmtSeen = false
    while (p + 8 <= payload.length) {
      val id = cc(p); val sz = le32(p + 4)
      if (id == "fmt ") {
        require(le16(p + 8) == 1, "not PCM")             // wFormatTag
        require(le16(p + 10) == 1, "not mono")           // nChannels
        require(le16(p + 22) == 8, "not 8-bit samples")  // wBitsPerSample
        fmtSeen = true
      } else if (id == "data") {
        data = java.util.Arrays.copyOfRange(payload, p + 8, p + 8 + sz)
      }
      p += 8 + sz + (sz % 2)
    }
    require(fmtSeen && data != null, "missing fmt /data chunk")
    data
  }

  def q168(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val fps = wavVariantsTable(s, dir).select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val buf = wavDataChunk(payload)
          val n = buf.length
          var bits = 0L
          var i = 0
          while (i < n - 1) {
            if ((buf(i + 1) & 0xFF) > (buf(i) & 0xFF)) bits |= (1L << i)
            i += 1
          }
          (id, bits)
        }
      }.toDF("media_id", "afp")
    val groups = fps.groupBy(col("afp"))
      .agg(count(lit(1)).as("n_clips"), min(col("media_id")).as("rep_id"))
    fps.join(groups, Seq("afp"))
      .filter(col("n_clips") > 1)
      .select(col("media_id"), col("afp"), col("n_clips"),
        when(col("media_id") === col("rep_id"), 1L).otherwise(0L)
          .as("is_rep"))
      .orderBy(col("media_id"))
  }

  // Oracle: sample p of clip m = LUT value of hex pair p (DC twins add 7,
  // clamped via least(255, v+7)); fingerprint = Σ_{i<31} [s_{i+1} > s_i]·2^i
  // (31 bits — fits BIGINT exactly).
  val q168Sql: String =
    """WITH media AS (
      |  SELECT doc_id AS media_id, doc_id AS src_id, 0 AS dc FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000000, doc_id, 0 FROM documents
      |  WHERE doc_id % 3 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000000, doc_id, 7 FROM documents
      |  WHERE doc_id % 4 = 0),
      |lut AS (
      |  SELECT i AS v, upper(lpad(hex(i),2,'0')) AS hp
      |  FROM generate_series(0,255) t(i)),
      |samp AS (
      |  SELECT m.media_id, g.p, least(255, lut.v + m.dc) AS v
      |  FROM media m JOIN documents d ON d.doc_id = m.src_id
      |  CROSS JOIN generate_series(0,31) g(p)
      |  JOIN lut ON lut.hp = upper(substring(sha256(d.text), g.p*2+1, 2))),
      |fp AS (
      |  SELECT a.media_id,
      |    CAST(sum(CASE WHEN b.v > a.v THEN power(2, a.p) ELSE 0 END)
      |      AS BIGINT) AS afp
      |  FROM samp a JOIN samp b
      |    ON b.media_id = a.media_id AND b.p = a.p + 1
      |  GROUP BY 1),
      |grp AS (
      |  SELECT afp, count(*) AS n_clips, min(media_id) AS rep_id
      |  FROM fp GROUP BY 1)
      |SELECT f.media_id, f.afp, g.n_clips,
      |  CAST(CASE WHEN f.media_id = g.rep_id THEN 1 ELSE 0 END AS BIGINT)
      |    AS is_rep
      |FROM fp f JOIN grp g USING (afp)
      |WHERE g.n_clips > 1
      |ORDER BY f.media_id""".stripMargin

  // ── q156: perceptual-hash IMAGE dedup — the multimodal face of the
  //        dedup family: byte-level dedup misses a re-encoded duplicate
  //        (same pixels, different PNG bytes), so each image is reduced to
  //        a 64-bit average-hash computed on the DECODED raster (ImageIO,
  //        like q107), and grouping happens on the hash. Near-duplicates
  //        (a few perturbed pixels) pair via the SimHash banding machinery
  //        applied to image hashes: 4×16-bit bands, exact-band equi-join
  //        among DISTINCT hashes only (clone collapse first), Hamming
  //        verify by bit_count(xor) ∈ [1,6]. Banding recall is guaranteed
  //        for Hamming ≤ 3 (pigeonhole over 4 bands) and probabilistic
  //        above — the same contract as the text SimHash path (q35).
  //        Scale shape: payloads never shuffle (hashing is a narrow
  //        mapPartitions); only (id, 8-byte hash) leaves the scan, and the
  //        pair join runs on distinct hashes. Rows-only (ImageIO is not
  //        SQL-expressible); MultimodalSpec pins the re-encode-invariance
  //        and near-pair mechanics.

  /** 64-bit average-hash: 8×8 nearest-neighbor grid samples thresholded
    * against their own mean — cross-multiplied, so integer-exact. */
  private[graft] def aHash64(img: java.awt.image.BufferedImage): Long = {
    val r = img.getRaster
    val w = img.getWidth; val h = img.getHeight
    val s = new Array[Long](64)
    var sum = 0L
    var i = 0
    while (i < 64) {
      s(i) = r.getSample((i % 8) * w / 8, (i / 8) * h / 8, 0).toLong
      sum += s(i); i += 1
    }
    var bits = 0L; i = 0
    while (i < 64) { if (s(i) * 64 >= sum) bits |= (1L << i); i += 1 }
    bits
  }

  /** Insert a tEXt metadata chunk right after IHDR: a byte-different,
    * pixel-identical PNG — the re-encoded-duplicate fixture case. */
  private[graft] def withTextChunk(png: Array[Byte], kv: String): Array[Byte] = {
    val tpe = "tEXt".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val data = kv.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val buf = java.nio.ByteBuffer.allocate(12 + data.length)
    buf.putInt(data.length).put(tpe).put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(tpe); crc.update(data)
    buf.putInt(crc.getValue.toInt)
    val chunk = buf.array()
    val insertAt = 8 + 25 // PNG signature + IHDR (len+type+13 data+crc)
    val out = new Array[Byte](png.length + chunk.length)
    System.arraycopy(png, 0, out, 0, insertAt)
    System.arraycopy(chunk, 0, out, insertAt, chunk.length)
    System.arraycopy(png, insertAt, out, insertAt + chunk.length,
      png.length - insertAt)
    out
  }

  /** q156 fixture: base PNGs ∪ re-encoded twins (doc_id%3==0 → +1e9, tEXt
    * chunk injected, pixels identical) ∪ perturbed near-twins
    * (doc_id%5==0 → +2e9, first digest byte inverted before encode). */
  def pngVariantsTable(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val p = graft.Fixtures.path("pngvar", dir) {
      val base = pngFixture(s, dir)
      val re = base.filter(col("doc_id") % 3 === 0)
        .as[(Long, Array[Byte])]
        .map { case (id, png) =>
          (id + 1000000000L, withTextChunk(png, "src re-encode")) }
        .toDF("doc_id", "payload")
      val pert = documents(s, dir).select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 5 === 0).as[(Long, String)]
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          val md = java.security.MessageDigest.getInstance("SHA-256")
          it.map { case (id, text) =>
            val dgst = md.digest(
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            dgst(0) = (~dgst(0)).toByte
            val (w, h) = DimsByMod(((id % 6) + 6).toInt % 6)
            (id + 2000000000L, grayPng(dgst, w, h))
          }
        }.toDF("doc_id", "payload")
      base.unionByName(re).unionByName(pert)
    }
    s.read.parquet(p)
  }

  def q156(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val hashed = pngVariantsTable(s, dir).select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, payload) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
          require(img != null, s"media_id=$id: not a decodable image")
          (id, aHash64(img))
        }
      }.toDF("media_id", "ahash")
    val groups = hashed.groupBy(col("ahash"))
      .agg(count(lit(1)).as("n_images"), min(col("media_id")).as("rep_id"))
    val bands = groups.select(col("ahash"))
      .select(col("ahash"), explode(expr("array(" +
        (0 until 4).map(b =>
          s"struct($b as b, shiftrightunsigned(ahash, ${b * 16}) & 65535 as v)")
          .mkString(",") + ")")).as("bd"))
      .select(col("ahash"), col("bd.b").as("b"), col("bd.v").as("v"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.v") === col("y.v") &&
          col("x.ahash") < col("y.ahash"))
      .select(col("x.ahash").as("ha"), col("y.ahash").as("hb")).distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming").between(1, 6))
    val near = cand.select(col("ha").as("ahash"), col("hb").as("other"))
      .unionByName(cand.select(col("hb").as("ahash"), col("ha").as("other")))
      .groupBy(col("ahash"))
      .agg(countDistinct(col("other")).as("near_hashes"))
    hashed.join(groups, Seq("ahash"))
      .join(near, Seq("ahash"), "left")
      .withColumn("near_hashes", coalesce(col("near_hashes"), lit(0L)))
      .filter(col("n_images") > 1 || col("near_hashes") > 0)
      .select(col("media_id"),
        lpad(hex(col("ahash")), 16, "0").as("ahash_hex"),
        col("n_images"), (col("media_id") === col("rep_id")).as("is_rep"),
        col("near_hashes"))
      .orderBy(col("media_id"))
  }

  // ── q170: the MULTIMODAL SHARD MANIFEST — the join that makes the
  //        modality decoders one engine instead of four demos: for every
  //        document, its token count plus the decode-derived fingerprint
  //        of each attached modality (image aHash from the ImageIO raster,
  //        audio delta-sign fp from the WAV data chunk, video signature
  //        from the demuxed AVI frames), and a CONTENT-ADDRESSED shard
  //        assignment (low nibble of the image perceptual hash) — so
  //        pixel-identical media land in the same shard whatever their
  //        bytes, which is what lets a 100 TB packing job co-locate
  //        duplicates for free. Every fingerprint is integer-exact and
  //        LUT-replayable, so the ENTIRE manifest (joins, shard keys and
  //        all) is hash-oracled. Plan shape: three narrow decode maps
  //        (payloads never shuffle) + equi-joins on doc_id + one shuffle
  //        for the ordered output.
  def q170(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val toks = documents(s, dir).select(col("doc_id"),
      regexp_count(col("text"), lit("[^\\t\\n\\f\\r ]+")).cast("long").as("n_tokens"))
    val imgs = pngMediaTable(s, dir).select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, payload) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
          require(img != null, s"doc $id: image not decodable")
          val h = aHash64(img)
          (id, f"$h%016X", h & 15L)
        }
      }.toDF("doc_id", "img_hash", "shard")
    val auds = wavMediaTable(s, dir).select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val buf = wavDataChunk(payload)
          var bits = 0L
          var i = 0
          while (i < buf.length - 1) {
            if ((buf(i + 1) & 0xFF) > (buf(i) & 0xFF)) bits |= (1L << i)
            i += 1
          }
          (id, bits)
        }
      }.toDF("doc_id", "audio_fp")
    val vids = Video.aviMediaTable(s, dir).select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, payload) =>
          val av = Video.demux(payload)
          val sig = av.frames.map { fb =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(fb))
            require(img != null, s"doc $id: video frame not decodable")
            f"${aHash64(img)}%016X"
          }.mkString
          (id, sig)
        }
      }.toDF("doc_id", "vid_sig")
    toks.join(imgs, Seq("doc_id")).join(auds, Seq("doc_id"))
      .join(vids, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("img_hash"),
        col("audio_fp"), col("vid_sig"), col("shard"))
      .orderBy(col("doc_id"))
  }

  // Oracle rebuilds every fingerprint from sha256(text) via the hex-pair
  // LUT: image aHash over the VARIABLE doc_id%6 dims (grid sample i reads
  // pixel ((i/8)·h/8)·w + (i%8)·w/8), audio delta-sign fp over the 32
  // digest samples, video signature over the per-frame digests at 8×4 —
  // shard = the image hash's low nibble (bits 0–3).
  val q170Sql: String =
    """WITH lut AS (
      |  SELECT i AS v, upper(lpad(hex(i),2,'0')) AS hp
      |  FROM generate_series(0,255) t(i)),
      |dims AS (
      |  SELECT doc_id, text,
      |    CASE ((doc_id % 6) + 6) % 6 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 16
      |         WHEN 3 THEN 2 WHEN 4 THEN 32 ELSE 1 END AS w,
      |    CASE ((doc_id % 6) + 6) % 6 WHEN 0 THEN 4 WHEN 1 THEN 8 WHEN 2 THEN 2
      |         WHEN 3 THEN 16 WHEN 4 THEN 1 ELSE 32 END AS h
      |  FROM documents),
      |ipix AS (
      |  SELECT d.doc_id, g.p, lut.v
      |  FROM dims d CROSS JOIN generate_series(0,31) g(p)
      |  JOIN lut ON lut.hp = upper(substring(sha256(d.text), g.p*2+1, 2))),
      |isamp AS (
      |  SELECT d.doc_id, g.i, px.v
      |  FROM dims d CROSS JOIN generate_series(0,63) g(i)
      |  JOIN ipix px ON px.doc_id = d.doc_id
      |    AND px.p = ((g.i // 8) * d.h // 8) * d.w + ((g.i % 8) * d.w // 8)),
      |ibits AS (
      |  SELECT s.doc_id, s.i,
      |    CASE WHEN s.v * 64 >= t.total THEN 1 ELSE 0 END AS b
      |  FROM isamp s JOIN (
      |    SELECT doc_id, sum(v) AS total FROM isamp GROUP BY 1) t
      |    ON t.doc_id = s.doc_id),
      |ibytes AS (
      |  SELECT doc_id, i // 8 AS k,
      |    CAST(sum(b * power(2, i % 8)) AS INT) AS byte
      |  FROM ibits GROUP BY 1, 2),
      |ihash AS (
      |  SELECT doc_id,
      |    string_agg(upper(lpad(hex(byte),2,'0')), '' ORDER BY k DESC)
      |      AS img_hash
      |  FROM ibytes GROUP BY 1),
      |ishard AS (
      |  SELECT doc_id,
      |    CAST(sum(b * power(2, i)) AS BIGINT) AS shard
      |  FROM ibits WHERE i < 4 GROUP BY 1),
      |afp AS (
      |  SELECT a.doc_id,
      |    CAST(sum(CASE WHEN b.v > a.v THEN power(2, a.p) ELSE 0 END)
      |      AS BIGINT) AS audio_fp
      |  FROM ipix a JOIN ipix b
      |    ON b.doc_id = a.doc_id AND b.p = a.p + 1
      |  GROUP BY 1),
      |vfr AS (
      |  SELECT d.doc_id, d.text, g.f
      |  FROM documents d CROSS JOIN generate_series(0,2) g(f)
      |  WHERE g.f < ((d.doc_id % 3) + 3) % 3 + 1),
      |vpix AS (
      |  SELECT fr.doc_id, fr.f, g.p, lut.v
      |  FROM vfr fr CROSS JOIN generate_series(0,31) g(p)
      |  JOIN lut ON lut.hp = upper(substring(
      |    sha256(fr.text || ':' || CAST(fr.f AS VARCHAR)), g.p*2+1, 2))),
      |vsamp AS (
      |  SELECT px.doc_id, px.f, g.i, px.v
      |  FROM (SELECT DISTINCT doc_id, f FROM vpix) mf
      |  CROSS JOIN generate_series(0,63) g(i)
      |  JOIN vpix px ON px.doc_id = mf.doc_id AND px.f = mf.f
      |    AND px.p = ((g.i // 8) // 2) * 8 + (g.i % 8)),
      |vbits AS (
      |  SELECT s.doc_id, s.f, s.i,
      |    CASE WHEN s.v * 64 >= t.total THEN 1 ELSE 0 END AS b
      |  FROM vsamp s JOIN (
      |    SELECT doc_id, f, sum(v) AS total FROM vsamp GROUP BY 1, 2) t
      |    ON t.doc_id = s.doc_id AND t.f = s.f),
      |vbytes AS (
      |  SELECT doc_id, f, i // 8 AS k,
      |    CAST(sum(b * power(2, i % 8)) AS INT) AS byte
      |  FROM vbits GROUP BY 1, 2, 3),
      |vfhex AS (
      |  SELECT doc_id, f,
      |    string_agg(upper(lpad(hex(byte),2,'0')), '' ORDER BY k DESC)
      |      AS fh
      |  FROM vbytes GROUP BY 1, 2),
      |vsig AS (
      |  SELECT doc_id, string_agg(fh, '' ORDER BY f) AS vid_sig
      |  FROM vfhex GROUP BY 1)
      |SELECT d.doc_id,
      |  CAST(len(regexp_extract_all(d.text, '\S+')) AS BIGINT) AS n_tokens,
      |  ihash.img_hash, afp.audio_fp, vsig.vid_sig, ishard.shard
      |FROM documents d
      |JOIN ihash USING (doc_id) JOIN ishard USING (doc_id)
      |JOIN afp USING (doc_id) JOIN vsig USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  // Oracle for q156: replays the variant population (base ∪ pixel-
  // identical re-encode twins ∪ first-byte-inverted perturbed twins),
  // the decoder's aHash observation (the q107/q170 hex-LUT honesty
  // model: dims from id%6, 64 samples by the integer-division grid,
  // mean threshold), then the banding and Hamming mechanics with exact
  // integer arithmetic — the signed 64-bit hash is assembled from its
  // bytes with BIGINT place values (power() doubles lose bits ≥ 2^53),
  // band values come from byte pairs (no shift-semantics dependence),
  // and xor/bit_count give the pairwise Hamming distances.
  val q156Sql: String =
    """WITH lut AS (
      |  SELECT i AS v, upper(lpad(hex(i),2,'0')) AS hp
      |  FROM generate_series(0,255) t(i)),
      |media AS (
      |  SELECT doc_id AS media_id, doc_id AS src_id, 0 AS pert
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000000, doc_id, 0 FROM documents
      |  WHERE doc_id % 3 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000000, doc_id, 1 FROM documents
      |  WHERE doc_id % 5 = 0),
      |dd AS (
      |  SELECT m.media_id, m.pert, d.text,
      |    CASE ((m.src_id % 6) + 6) % 6 WHEN 0 THEN 8 WHEN 1 THEN 4
      |      WHEN 2 THEN 16 WHEN 3 THEN 2 WHEN 4 THEN 32 ELSE 1 END AS w,
      |    CASE ((m.src_id % 6) + 6) % 6 WHEN 0 THEN 4 WHEN 1 THEN 8
      |      WHEN 2 THEN 2 WHEN 3 THEN 16 WHEN 4 THEN 1 ELSE 32 END AS h
      |  FROM media m JOIN documents d ON d.doc_id = m.src_id),
      |pix AS (
      |  SELECT dd.media_id, g.p,
      |    CASE WHEN dd.pert = 1 AND g.p = 0 THEN 255 - lut.v
      |      ELSE lut.v END AS v
      |  FROM dd CROSS JOIN generate_series(0,31) g(p)
      |  JOIN lut ON lut.hp = upper(substring(sha256(dd.text), g.p*2+1, 2))),
      |samp AS (
      |  SELECT dd.media_id, g.i, px.v
      |  FROM dd CROSS JOIN generate_series(0,63) g(i)
      |  JOIN pix px ON px.media_id = dd.media_id
      |    AND px.p = ((g.i // 8) * dd.h // 8) * dd.w
      |      + ((g.i % 8) * dd.w // 8)),
      |bits AS (
      |  SELECT s.media_id, s.i,
      |    CASE WHEN s.v * 64 >= t.total THEN 1 ELSE 0 END AS b
      |  FROM samp s JOIN (
      |    SELECT media_id, sum(v) AS total FROM samp GROUP BY 1) t
      |    USING (media_id)),
      |bytes AS (
      |  SELECT media_id, i // 8 AS k,
      |    CAST(sum(b * power(2, i % 8)) AS BIGINT) AS byte
      |  FROM bits GROUP BY 1, 2),
      |hhex AS (
      |  SELECT media_id,
      |    string_agg(upper(lpad(hex(byte),2,'0')), '' ORDER BY k DESC)
      |      AS ahash_hex
      |  FROM bytes GROUP BY 1),
      |hval AS (
      |  SELECT media_id, CAST(sum(
      |    CASE k
      |      WHEN 7 THEN (byte - CASE WHEN byte >= 128 THEN 256 ELSE 0 END)
      |        * 72057594037927936
      |      WHEN 6 THEN byte * 281474976710656
      |      WHEN 5 THEN byte * 1099511627776
      |      WHEN 4 THEN byte * 4294967296
      |      WHEN 3 THEN byte * 16777216
      |      WHEN 2 THEN byte * 65536
      |      WHEN 1 THEN byte * 256
      |      ELSE byte END) AS BIGINT) AS ahash
      |  FROM bytes GROUP BY 1),
      |grp AS (
      |  SELECT ahash, count(*) AS n_images, min(media_id) AS rep_id
      |  FROM hval GROUP BY 1),
      |bexp AS (
      |  SELECT h.ahash, g.b,
      |    lo.byte + hi.byte * 256 AS v
      |  FROM (SELECT ahash, min(media_id) AS media_id FROM hval
      |        GROUP BY 1) h
      |  CROSS JOIN generate_series(0,3) g(b)
      |  JOIN bytes lo ON lo.media_id = h.media_id AND lo.k = g.b * 2
      |  JOIN bytes hi ON hi.media_id = h.media_id AND hi.k = g.b * 2 + 1),
      |cand AS (
      |  SELECT DISTINCT x.ahash AS ha, y.ahash AS hb
      |  FROM bexp x JOIN bexp y
      |    ON x.b = y.b AND x.v = y.v AND x.ahash < y.ahash),
      |ham AS (
      |  SELECT ha, hb FROM cand
      |  WHERE bit_count(xor(ha, hb)) BETWEEN 1 AND 6),
      |near AS (
      |  SELECT ahash, count(DISTINCT other) AS near_hashes FROM (
      |    SELECT ha AS ahash, hb AS other FROM ham
      |    UNION ALL SELECT hb, ha FROM ham)
      |  GROUP BY 1)
      |SELECT v.media_id, x.ahash_hex, g.n_images,
      |  v.media_id = g.rep_id AS is_rep,
      |  coalesce(n.near_hashes, 0) AS near_hashes
      |FROM hval v
      |JOIN hhex x USING (media_id)
      |JOIN grp g USING (ahash)
      |LEFT JOIN near n USING (ahash)
      |WHERE g.n_images > 1 OR coalesce(n.near_hashes, 0) > 0
      |ORDER BY v.media_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q170_multimodal_manifest" -> q170,
    "q40_multimodal_meta" -> q40,
    "q63_media_binary" -> q63,
    "q107_png_decode" -> q107,
    "q109_png_resize" -> q109,
    "q110_wav_decode" -> q110,
    "q111_frame_stream" -> q111,
    "q156_image_phash" -> q156,
    "q168_audio_dedup" -> q168)

  val oracle: Map[String, String] = Map(
    "q170_multimodal_manifest" -> q170Sql,
    "q40_multimodal_meta" -> q40Sql,
    "q63_media_binary" -> q63Sql,
    "q107_png_decode" -> q107Sql,
    "q109_png_resize" -> q109Sql,
    "q110_wav_decode" -> q110Sql,
    "q111_frame_stream" -> q111Sql,
    "q156_image_phash" -> q156Sql,
    "q168_audio_dedup" -> q168Sql)
}
