package graft

import org.apache.spark.sql.functions._
import graft.operators.{Clusters, Crossmodal}

/** q176 — cross-modal (image, caption) pair entity resolution. */
class CrossmodalSpec extends SparkTestBase {

  test("transitive chain across modalities lands in one entity: " +
    "caption-dup 1↔2, image-dup 2↔3 ⇒ {1,2,3}") {
    import spark.implicits._
    val pairs = Seq(
      (1L, "captA", "img1"),
      (2L, "captA", "img2"),
      (3L, "captB", "img2"),
      (4L, "captC", "img3")).toDF("doc_id", "tfp", "ifp")
    val edges = Crossmodal.starEdges(pairs, "tfp")
      .unionByName(Crossmodal.starEdges(pairs, "ifp"))
    val cc = Clusters.connectedComponents(edges)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toMap
    assert(cc.get(1L).isEmpty || cc(1L) === 1L) // rep may stay implicit
    assert(cc(2L) === 1L)
    assert(cc(3L) === 1L)
    assert(cc.get(4L).isEmpty) // singleton never enters the edge set
  }

  test("q176: entities partition the corpus and per-entity counts are " +
    "coherent with the per-modality group structure") {
    val rows = Crossmodal.q176(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum === docs)
    rows.foreach { r =>
      val n = r.getLong(1)
      assert(r.getLong(2) <= n && r.getLong(3) <= n)
      assert(r.getLong(2) >= 1 && r.getLong(3) >= 1)
    }
    // entity labels are min member ids → strictly increasing output
    val ents = rows.map(_.getLong(0)).toSeq
    assert(ents === ents.sorted && ents.distinct.length === ents.length)
    // the image key folds 500 pairs onto ≤97 keys: entities must merge
    // below the doc count
    assert(rows.length < docs)
  }

  test("pair images are REAL decodable PNGs (8×4 grayscale, pixel row = " +
    "sha256 of the pair's image key)") {
    val r = Crossmodal.imageTable(spark, sfDir)
      .orderBy(col("doc_id")).limit(1).collect().head
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
    assert(img.getWidth === 8 && img.getHeight === 4)
    val id = r.getLong(0)
    val dgst = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"xm:${((id % 97) + 97) % 97}".getBytes("UTF-8"))
    val raster = img.getRaster
    val decoded = (0 until 32).map(i => raster.getSample(i % 8, i / 8, 0))
    assert(decoded === dgst.map(_ & 0xFF).toSeq)
  }
}
