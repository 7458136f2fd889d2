package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val media = Multimodal.toMediaTable(
    Seq((1L, "hello world"), (2L, "café")).toDF("id", "body"),
    "id", "body", "image/fake")

  test("toMediaTable: opaque payload + typed metadata, utf-8 byte counts") {
    val rows = media.orderBy("media_id").collect()
    assert(media.schema.fieldNames.toSeq ==
      Multimodal.mediaSchema.fieldNames.toSeq)
    assert(rows(0).getAs[Long]("n_bytes") == 11L)
    assert(rows(1).getAs[Long]("n_bytes") == 5L) // é is 2 bytes in UTF-8
    assert(rows(0).getAs[String]("fingerprint").length == 64)
  }

  test("decodeStub: deterministic frames with the declared batch shape") {
    val a = Multimodal.decodeStub(media, framesPer = 3).collect()
      .sortBy(f => (f.media_id, f.frame_idx))
    val b = Multimodal.decodeStub(media, framesPer = 3).collect()
      .sortBy(f => (f.media_id, f.frame_idx))
    assert(a.length == 6) // 2 items × 3 frames
    assert(a.zip(b).forall { case (x, y) =>
      x.media_id == y.media_id && x.frame_idx == y.frame_idx &&
        x.features.sameElements(y.features)
    })
    assert(a.forall(_.features.length == 4))
  }

  test("decoder seam: an injected non-default decoder drives the pipeline") {
    // Proves the swap-in seam the stub promises: a custom FrameDecoder
    // (with per-partition init) flows through the same decode stage.
    object ByteCountDecoder extends Multimodal.FrameDecoder {
      @transient private var opened = false
      override def openPartition(): Unit = { opened = true }
      def decodeFrame(id: Long, payload: Array[Byte], f: Int): Multimodal.DecodedFrame = {
        assert(opened, "openPartition must run before any decode")
        Multimodal.DecodedFrame(id, f, 1, 1, Array(payload.length.toDouble, f.toDouble))
      }
    }
    val out = Multimodal.decode(media, framesPer = 2, ByteCountDecoder)
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    assert(out.length == 4)
    assert(out.filter(_.media_id == 1L).forall(_.features(0) == 11.0))
    assert(out.filter(_.media_id == 2L).forall(_.features(0) == 5.0))
    assert(out.map(_.features(1)).toSeq == Seq(0.0, 1.0, 0.0, 1.0))
    // and the default path is the stub decoder, unchanged
    val stub = Multimodal.decodeStub(media, framesPer = 2).collect()
    assert(stub.length == 4)
  }

  test("sampleFrames keeps every nth frame without touching payloads") {
    val frames = Multimodal.decodeStub(media, framesPer = 4)
    val sampled = Multimodal.sampleFrames(frames, 2).collect()
    assert(sampled.map(_.frame_idx).toSet == Set(0, 2))
  }

  test("binary fixture: true BinaryType parquet round-trip drives the pipeline") {
    import org.apache.spark.sql.types.BinaryType
    val tbl = Multimodal.binaryMediaTable(spark, sfDir)
    // the scanned column is binary ON DISK, not cast text
    assert(tbl.schema("payload").dataType == BinaryType)
    val first = tbl.orderBy("doc_id").limit(3).collect()
    val pngMagic = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)
    first.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("payload")
      assert(bytes.take(8).sameElements(pngMagic), "payload must carry the PNG magic")
      assert((bytes.length - 8) % 32 == 0, "body must be whole 32-byte digests")
    }
    // decode + frame-sample run unchanged over the true binary column
    val m = Multimodal.toMediaTable(tbl.limit(5), "doc_id", "payload", "image/png")
    val frames = Multimodal.decodeStub(m, framesPer = 4)
    assert(Multimodal.sampleFrames(frames, 2).collect()
      .map(_.frame_idx).toSet == Set(0, 2))
    // deterministic across writes: a second materialization is identical
    val again = Multimodal.binaryMediaTable(spark, sfDir)
      .orderBy("doc_id").limit(3).collect()
    first.zip(again).foreach { case (a, b) =>
      assert(a.getAs[Array[Byte]]("payload")
        .sameElements(b.getAs[Array[Byte]]("payload")))
    }
  }

  test("grayPng: ImageIO encode→decode round-trips exact pixel bytes") {
    // PNG 8-bit grayscale is lossless; the decoder must read back exactly
    // the digest bytes the fixture wrote, for every dim shape.
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest("round-trip probe".getBytes("UTF-8"))
    Multimodal.DimsByMod.foreach { case (w, h) =>
      val png = Multimodal.grayPng(digest, w, h)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == w && img.getHeight == h)
      val got = Array.tabulate(w * h)(i =>
        img.getRaster.getSample(i % w, i / w, 0).toByte)
      assert(got.sameElements(digest))
    }
  }

  test("q107: real ImageIO decode over BinaryType parquet matches sha256 pixels") {
    val out = graft.operators.Multimodal.q107(spark, sfDir)
      .orderBy("media_id").collect()
    assert(out.nonEmpty)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val docs = graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.take(20).foreach { r =>
      val id = r.getAs[Long]("media_id")
      val bytes = md.digest(docs(id).getBytes("UTF-8")).map(_ & 0xFF)
      val (w, h) = Multimodal.DimsByMod((id % 6).toInt)
      assert(r.getAs[Long]("width") == w && r.getAs[Long]("height") == h)
      assert(r.getAs[Long]("n_pixels") == 32L)
      assert(r.getAs[Long]("px_sum") == bytes.map(_.toLong).sum)
      assert(r.getAs[Long]("px_min") == bytes.min.toLong)
      assert(r.getAs[Long]("px_max") == bytes.max.toLong)
      assert(r.getAs[Double]("px_mean") == bytes.map(_.toLong).sum / 32.0)
    }
  }

  test("q109: nearest-neighbor resize stats match strided digest bytes") {
    val out = graft.operators.Multimodal.q109(spark, sfDir)
      .orderBy("media_id").collect()
    assert(out.nonEmpty)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val docs = graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.take(20).foreach { r =>
      val id = r.getAs[Long]("media_id")
      val bytes = md.digest(docs(id).getBytes("UTF-8")).map(_ & 0xFF)
      val (w, h) = Multimodal.DimsByMod((id % 6).toInt)
      val (w2, h2) = ((w + 1) / 2, (h + 1) / 2)
      // the surviving pixels, named independently of the raster code
      val kept = for (y <- 0 until h2; x <- 0 until w2)
        yield bytes(2 * y * w + 2 * x)
      assert(r.getAs[Long]("width") == w2 && r.getAs[Long]("height") == h2)
      assert(r.getAs[Long]("n_pixels") == w2.toLong * h2)
      assert(r.getAs[Long]("px_sum") == kept.map(_.toLong).sum)
      assert(r.getAs[Long]("px_min") == kept.min.toLong)
      assert(r.getAs[Long]("px_max") == kept.max.toLong)
    }
  }

  test("wavBytes: AudioSystem encode→decode round-trips exact samples per rate") {
    import javax.sound.sampled._
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest("wav round-trip probe".getBytes("UTF-8"))
    Multimodal.RatesByMod.foreach { rate =>
      val wav = Multimodal.wavBytes(digest, rate)
      assert(new String(wav.take(4), "US-ASCII") == "RIFF")
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      assert(ais.getFormat.getSampleRate.toInt == rate)
      assert(ais.getFormat.getChannels == 1)
      val back = ais.readAllBytes()
      assert(back.sameElements(digest))
    }
  }

  test("q110: real WAV decode over BinaryType parquet matches sha256 samples") {
    val out = graft.operators.Multimodal.q110(spark, sfDir)
      .orderBy("media_id").collect()
    assert(out.nonEmpty)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val docs = graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.take(20).foreach { r =>
      val id = r.getAs[Long]("media_id")
      val bytes = md.digest(docs(id).getBytes("UTF-8")).map(_ & 0xFF)
      assert(r.getAs[Long]("sample_rate") ==
        Multimodal.RatesByMod((id % 4).toInt).toLong)
      assert(r.getAs[Long]("channels") == 1L)
      assert(r.getAs[Long]("n_samples") == 32L)
      assert(r.getAs[Long]("s_sum") == bytes.map(_.toLong).sum)
      assert(r.getAs[Long]("s_min") == bytes.min.toLong)
      assert(r.getAs[Long]("s_max") == bytes.max.toLong)
    }
  }

  test("q111: frame-stream demux decodes every frame, samples even indices") {
    val out = graft.operators.Multimodal.q111(spark, sfDir)
      .orderBy("media_id", "frame_idx").collect()
    assert(out.nonEmpty)
    // sampling contract: only even frame indices survive
    assert(out.forall(_.getAs[Long]("frame_idx") % 2 == 0))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val docs = graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.take(20).foreach { r =>
      val id = r.getAs[Long]("media_id")
      val f = r.getAs[Long]("frame_idx")
      val k = (id % 3 + 1)
      assert(r.getAs[Long]("n_frames") == k && f < k)
      val bytes = md.digest(s"${docs(id)}:$f".getBytes("UTF-8")).map(_ & 0xFF)
      assert(r.getAs[Long]("px_sum") == bytes.map(_.toLong).sum)
      assert(r.getAs[Long]("px_min") == bytes.min.toLong)
      assert(r.getAs[Long]("px_max") == bytes.max.toLong)
    }
    // every doc appears: frame 0 always survives sampling
    assert(out.map(_.getAs[Long]("media_id")).distinct.length == docs.size)
  }

  test("q156: aHash is invariant under re-encode (tEXt chunk) and both decode") {
    val png = operators.Multimodal.grayPng(
      (0 until 32).map(i => (i * 7 % 256).toByte).toArray, 8, 4)
    val re = operators.Multimodal.withTextChunk(png, "k v")
    assert(!java.util.Arrays.equals(png, re), "bytes must differ")
    def hash(b: Array[Byte]) = operators.Multimodal.aHash64(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
    assert(hash(png) == hash(re), "pixels identical => same perceptual hash")
  }

  test("q156: re-encoded twins group with their base; some perturbed near-pairs survive banding") {
    val out = operators.Multimodal.q156(spark, sfDir).collect()
    assert(out.nonEmpty)
    val byId = out.map(r => r.getAs[Long]("media_id") -> r).toMap
    // every %3 doc has a pixel-identical re-encode => its hash group has ≥2
    val base = graft.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0))
    base.filter(_ % 3 == 0).foreach { id =>
      assert(byId.contains(id) && byId(id).getAs[Long]("n_images") >= 2,
        s"doc $id missing its re-encode group")
      assert(byId.contains(id + 1000000000L), s"twin of $id missing")
    }
    // at least one perturbed twin pairs as a near-dup (dims 8×4 flip ≤2
    // sampled bits inside one 16-bit band — guaranteed banding recall)
    assert(out.exists(_.getAs[Long]("near_hashes") > 0),
      "expected at least one near-duplicate pair")
  }

  test("wavDataChunk: direct RIFF parse equals AudioSystem decode byte-for-byte") {
    import javax.sound.sampled._
    val variants = Multimodal.wavVariantsTable(spark, sfDir)
      .limit(200).collect().map(r => r.getAs[Array[Byte]](1))
    assert(variants.nonEmpty)
    variants.foreach { payload =>
      val direct = Multimodal.wavDataChunk(payload)
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val n = ais.getFrameLength.toInt * ais.getFormat.getFrameSize
      val ref = new Array[Byte](n)
      var off = 0
      while (off < n) { off += math.max(0, ais.read(ref, off, n - off)) }
      ais.close()
      assert(java.util.Arrays.equals(direct, ref),
        "direct RIFF data chunk must equal the AudioSystem decode")
    }
    intercept[IllegalArgumentException](
      Multimodal.wavDataChunk("RIFFxxxxAVI ".getBytes))
  }

  test("q168: fingerprint groups rate-relabeled twins; DC-offset invariance holds sans clipping") {
    val variants = Multimodal.wavVariantsTable(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val rateIds = variants.keys.filter(id =>
      id >= 1000000000L && id < 2000000000L).toSeq
    assert(rateIds.nonEmpty)
    // the rate twin's WAV bytes differ (fmt chunk), samples don't
    rateIds.foreach { id =>
      assert(!java.util.Arrays.equals(variants(id), variants(id - 1000000000L)),
        s"rate twin $id must be byte-different from its base")
    }
    val out = Multimodal.q168(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val fpOf = out.map(r => r._1 -> r._2).toMap
    rateIds.foreach { id =>
      assert(fpOf.contains(id) && fpOf(id) == fpOf(id - 1000000000L),
        s"rate twin $id must share its base's fingerprint")
    }
    // DC twins: fingerprints match their base wherever no sample clipped
    // at 255 (delta signs are gain-invariant); replay the clip test from
    // the digest to decide which twins must match
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val texts = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val dcIds = variants.keys.filter(_ >= 2000000000L).toSeq
    assert(dcIds.nonEmpty)
    dcIds.foreach { id =>
      val base = id - 2000000000L
      val dg = md.digest(texts(base).getBytes("UTF-8")).map(_ & 0xFF)
      val unclipped = dg.forall(_ + 7 <= 255)
      if (unclipped)
        assert(fpOf.get(id).forall(f => fpOf.get(base).contains(f)),
          s"unclipped DC twin $id must share its base's fingerprint")
    }
    out.groupBy(_._2).foreach { case (_, rows) =>
      val reps = rows.filter(_._4 == 1L)
      assert(reps.length == 1 && reps.head._1 == rows.map(_._1).min)
    }
  }
}
