package graft

import graft.operators.{Multimodal, Video}

class VideoSpec extends SparkTestBase {

  private def sha(s: String): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def pngFrames(n: Int): Seq[Array[Byte]] =
    (0 until n).map(f => Multimodal.grayPng(sha(s"frame:$f"), 8, 4))

  test("aviBytes/demux round-trip: header facts and frame bytes survive") {
    val frames = pngFrames(3)
    val avi = Video.aviBytes(frames, 8, 4, 30, 1, "MPNG")
    // structural RIFF facts
    assert(new String(avi, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(avi, 8, 4, "US-ASCII") == "AVI ")
    val av = Video.demux(avi)
    assert(av.totalFrames == 3 && av.frames.length == 3)
    assert(av.width == 8 && av.height == 4)
    assert(av.fpsRate == 30 && av.fpsScale == 1)
    assert(av.usPerFrame == 33333)
    assert(av.handler == "MPNG")
    // frame payloads byte-identical after the chunk walk (incl. odd-length
    // frames exercising the word-alignment padding rule)
    av.frames.zip(frames).foreach { case (got, exp) =>
      assert(java.util.Arrays.equals(got, exp))
    }
  }

  test("demux word-alignment: odd-length chunks are padded, not misparsed") {
    // JPEG/PNG byte lengths are arbitrary; force an odd length to prove the
    // demux honors the RIFF even-byte padding rule for every chunk.
    val odd = Array.tabulate[Byte](33)(i => (i * 7).toByte)
    val even = Array.tabulate[Byte](40)(i => (i * 3).toByte)
    val av = Video.demux(Video.aviBytes(Seq(odd, even, odd), 8, 4, 10, 1, "MPNG"))
    assert(av.frames.length == 3)
    assert(java.util.Arrays.equals(av.frames(0), odd))
    assert(java.util.Arrays.equals(av.frames(1), even))
    assert(java.util.Arrays.equals(av.frames(2), odd))
  }

  test("demux rejects malformed containers") {
    intercept[IllegalArgumentException](Video.demux("nope".getBytes))
    intercept[IllegalArgumentException](
      Video.demux("RIFFxxxxWAVE".getBytes)) // wrong form type
    // truncation below the declared RIFF size
    val avi = Video.aviBytes(pngFrames(2), 8, 4, 15, 1, "MPNG")
    intercept[IllegalArgumentException](
      Video.demux(java.util.Arrays.copyOf(avi, avi.length / 2)))
  }

  test("fractional fps: rate/scale is carried exactly (30000/1001 NTSC)") {
    val av = Video.demux(
      Video.aviBytes(pngFrames(1), 8, 4, 30000, 1001, "MPNG"))
    assert(av.fpsRate == 30000 && av.fpsScale == 1001)
    assert(av.usPerFrame == 33366) // floor(1e6 * 1001 / 30000)
  }

  test("q165: demux+decode matches per-frame digest pixels end-to-end") {
    val out = graft.operators.Video.q165(spark, sfDir).collect()
    assert(out.nonEmpty)
    // group sizes follow doc_id%3+1 and frame indices are dense
    val byId = out.groupBy(_.getLong(0))
    byId.foreach { case (id, rows) =>
      val k = (((id % 3) + 3) % 3 + 1).toInt
      assert(rows.length == k, s"media $id: ${rows.length} frames, want $k")
      assert(rows.map(_.getLong(1)).sorted.sameElements(
        (0 until k).map(_.toLong)))
      rows.foreach { r =>
        assert(r.getLong(2) == k)     // n_frames
        assert(r.getLong(4) == 8 && r.getLong(5) == 4)
        // stats equal a direct digest replay (decode really read pixels)
        val want = sha(s"${docText(id)}:${r.getLong(1)}").map(_ & 0xFF)
        assert(r.getLong(6) == want.map(_.toLong).sum, s"px_sum media $id")
        assert(r.getLong(7) == want.min.toLong)
        assert(r.getLong(8) == want.max.toLong)
      }
    }
    // fps column replays the fixture's strh rate table
    out.foreach { r =>
      val want = Video.FpsByMod((r.getLong(0) % 3).toInt)
      assert(r.getLong(3) == want, s"fps media ${r.getLong(0)}")
    }
  }

  private lazy val docTexts: Map[Long, String] =
    Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
  private def docText(id: Long): String = docTexts(id)

  test("q167: perceptual dedup groups byte-different re-muxed twins with their base") {
    // container-robustness is the core claim: the re-mux twin (fps 25
    // instead of 30) is BYTE-different but pixel-identical, so it must
    // land in its base's signature group; and the twin's payload really
    // differs from the base's (otherwise the test proves nothing).
    val variants = graft.operators.Video.aviVariantsTable(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val remuxIds = variants.keys.filter(id =>
      id >= 1000000000L && id < 2000000000L).toSeq
    assert(remuxIds.nonEmpty)
    remuxIds.foreach { id =>
      assert(!java.util.Arrays.equals(variants(id), variants(id - 1000000000L)),
        s"re-mux twin $id must be byte-different from its base")
    }
    val out = graft.operators.Video.q167(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val sigOf = out.map(r => r._1 -> r._2).toMap
    remuxIds.foreach { id =>
      assert(sigOf.contains(id) && sigOf.contains(id - 1000000000L) &&
        sigOf(id) == sigOf(id - 1000000000L),
        s"re-mux twin $id must share its base's perceptual signature")
    }
    // exactly one representative per group, and it's the min id
    out.groupBy(_._2).foreach { case (_, rows) =>
      val reps = rows.filter(_._4 == 1L)
      assert(reps.length == 1 && reps.head._1 == rows.map(_._1).min)
    }
  }

  test("MJPEG: real JPEG-in-AVI decode — exact dims, mean within quant tolerance") {
    val pixels = (0 until 3).map(f => sha(s"jpeg:$f"))
    val frames = pixels.map(p => Video.grayJpeg(p, 8, 4))
    // a real JPEG stream: SOI marker present, lengths vary with content
    frames.foreach { f =>
      assert((f(0) & 0xFF) == 0xFF && (f(1) & 0xFF) == 0xD8, "missing SOI")
    }
    val avi = Video.aviBytes(frames, 8, 4, 30, 1, "MJPG")
    val decoded = Video.decodeMjpeg(avi)
    assert(decoded.length == 3)
    decoded.zip(pixels).foreach { case ((w, h, mean), src) =>
      assert(w == 8 && h == 4)
      val srcMean = src.map(_ & 0xFF).sum.toDouble / 32
      // JPEG is lossy but DC (block mean) survives quantization closely
      assert(math.abs(mean - srcMean) <= 8.0,
        s"JPEG mean drifted: got $mean, source $srcMean")
    }
    // deterministic across encode+decode runs (same JDK codec)
    val again = Video.decodeMjpeg(
      Video.aviBytes(pixels.map(p => Video.grayJpeg(p, 8, 4)), 8, 4, 30, 1, "MJPG"))
    assert(decoded == again)
  }
}
