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
}
