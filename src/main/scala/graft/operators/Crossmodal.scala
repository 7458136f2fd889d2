package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Cross-modal PAIR dedup — entity resolution over (image, caption)
  * training pairs, where a pair is a duplicate if EITHER side matches:
  * two pairs sharing the same image bytes, or the same normalized
  * caption, belong to one entity (the rule a LAION-style multimodal
  * curation pass applies before sampling: near-identical captions with
  * different crops, and identical images with rewritten captions, must
  * not be sampled as independent examples).
  *
  * Mechanism: exact-dup groups per MODALITY (image = payload digest,
  * caption = q59's normalized-text digest) are contracted to STAR edges
  * (member → min-id representative), the union of both stars feeds the
  * large-star/small-star connected-components loop, and entity labels
  * expand back over all pairs. Everything after the scan shuffles
  * digests and ids only — image bytes never move past the digest
  * projection, and the edge list is linear in pairs (never a clique
  * expansion; the round-8 contraction lesson in PLANS.md applied to a
  * bipartite relation).
  *
  * The image fixture is REAL bytes: one 8×4 grayscale PNG per pair via
  * Multimodal.grayPng, pixels = sha256 of the pair's image key, so
  * byte-identical dup groups exist by construction, materialized to
  * parquet and scanned back as BinaryType (the q107 discipline).
  */
object Crossmodal {

  /** (doc_id, payload) — deterministic PNG per pair: image key repeats
    * every 97 ids, CROSS-CUTTING the caption clone structure (two pairs
    * can share an image without sharing a caption and vice versa). */
  def imageFixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    documents(s, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { id =>
          val dgst = md.digest(s"xm:${((id % 97) + 97) % 97}"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          (id, Multimodal.grayPng(dgst, 8, 4))
        }
      }.toDF("doc_id", "payload")
  }

  /** Read-back of the pair-image fixture (true BinaryType parquet scan;
    * built once per JVM via graft.Fixtures). */
  def imageTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(graft.Fixtures.path("xmodal", dir)(imageFixture(s, dir)))

  /** member → min-id-representative star edges of the exact-dup groups of
    * `fpCol` (one edge per non-representative member — linear, no
    * clique). */
  private[graft] def starEdges(df: DataFrame, fpCol: String): DataFrame = {
    val reps = df.groupBy(col(fpCol)).agg(min(col("doc_id")).as("rep"))
    df.join(reps, Seq(fpCol))
      .where(col("doc_id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("doc_id").as("id_b"))
  }

  // ── q176: cross-modal pair entities — every (image, caption) pair
  //        labeled with its entity (min doc_id of its component), one
  //        summary row per entity: pair count, distinct captions,
  //        distinct images. Components via the contracted star union —
  //        a pair chain img-dup → caption-dup → img-dup lands in ONE
  //        entity (the transitive rule exact per-modality dedup misses).
  def q176(s: SparkSession, dir: String): DataFrame = {
    val pairs = documents(s, dir)
      .select(col("doc_id"),
        sha2(Dedup.normalizeText(col("text")), 256).as("tfp"))
      .join(imageTable(s, dir)
        .select(col("doc_id"), sha2(col("payload"), 256).as("ifp")),
        Seq("doc_id"))
      .localCheckpoint(true)
    val edges = starEdges(pairs, "tfp").unionByName(starEdges(pairs, "ifp"))
    val cc = Clusters.connectedComponents(edges)
      .select(col("id").as("doc_id"), col("cluster"))
    pairs.join(cc, Seq("doc_id"), "left")
      .select(coalesce(col("cluster"), col("doc_id")).as("entity"),
        col("doc_id"), col("tfp"), col("ifp"))
      .groupBy(col("entity"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("tfp")).as("n_captions"),
        countDistinct(col("ifp")).as("n_images"))
      .orderBy(col("entity"))
  }

  // Oracle replays the grouping keys codec-free (caption = the q59
  // normalization, image = the fixture's doc_id % 97 key — the PNG bytes
  // are a bijection of that key) and the component rule as a recursive
  // reach over the same star edges (the q67 oracle recipe).
  val q176Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(lower(text),
      |      '[^a-z0-9\t\n\f\r ]', '', 'g'), '[\t\n\f\r ]+', ' ', 'g')) AS nrm,
      |    doc_id % 97 AS ik
      |  FROM documents),
      |tg AS (SELECT nrm, min(doc_id) AS rep FROM d GROUP BY 1),
      |ig AS (SELECT ik, min(doc_id) AS rep FROM d GROUP BY 1),
      |edges AS (
      |  SELECT tg.rep AS a, d.doc_id AS b FROM d JOIN tg USING (nrm)
      |  WHERE d.doc_id <> tg.rep
      |  UNION
      |  SELECT ig.rep AS a, d.doc_id AS b FROM d JOIN ig USING (ik)
      |  WHERE d.doc_id <> ig.rep),
      |bi AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
      |rec AS (
      |  WITH RECURSIVE reach(id, root) AS (
      |    SELECT doc_id, doc_id FROM d
      |    UNION
      |    SELECT bi.b, r.root FROM reach r
      |    JOIN bi ON bi.a = r.id AND r.root < bi.b)
      |  SELECT id, min(root) AS entity FROM reach GROUP BY id)
      |SELECT r.entity, count(*) AS n_pairs,
      |  count(DISTINCT d.nrm) AS n_captions,
      |  count(DISTINCT d.ik) AS n_images
      |FROM rec r JOIN d ON r.id = d.doc_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q176_crossmodal_dedup" -> q176)

  val oracle: Map[String, String] = Map(
    "q176_crossmodal_dedup" -> q176Sql)
}
