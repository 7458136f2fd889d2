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

  test("sampleFrames keeps every nth frame without touching payloads") {
    val frames = Multimodal.decodeStub(media, framesPer = 4)
    val sampled = Multimodal.sampleFrames(frames, 2).collect()
    assert(sampled.map(_.frame_idx).toSet == Set(0, 2))
  }
}
