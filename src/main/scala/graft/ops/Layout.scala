package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Z-order (Morton-curve) data layout — the standard data-skipping story
  * at 100 TB: interleave the bits of two query dimensions so that sorting
  * by the resulting z-value makes every file/partition cover a small
  * RECTANGLE of (x, y) space, and a box predicate on either or both
  * dimensions prunes most files by min/max stats or partition values
  * (the same layout Delta/Iceberg `ZORDER BY` produces; public idea,
  * Morton 1966).
  *
  * Everything here is closed-form integer arithmetic, so the z-value is
  * computed identically by Spark and DuckDB (q96's oracle) and stays
  * inside WholeStageCodegen — no UDF.
  */
object Layout {

  /** Morton z-value of two non-negative ints, `bits` bits each: bit i of
    * x lands at position 2i, bit i of y at 2i+1. Pure bit arithmetic,
    * codegen-friendly, same semantics as the SQL the oracle runs. */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** The matching SQL text for `zValue` (DuckDB + Spark SQL parse it
    * identically) — kept string-built so the two engines can never drift
    * from the Column form above. */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** Tile index = top 2·tileBits bits of the z-value: a 2^tileBits ×
    * 2^tileBits grid cell. Used as the write-time partition column. */
  def zTileOf(z: Column, bits: Int, tileBits: Int): Column =
    shiftright(z, 2 * (bits - tileBits))

  /** De-interleave a tile index back to its (xTile, yTile) grid cell. */
  private def deinterleave(tile: Long, tileBits: Int): (Long, Long) = {
    var x = 0L; var y = 0L
    var i = 0
    while (i < tileBits) {
      x |= ((tile >> (2 * i)) & 1L) << i
      y |= ((tile >> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (x, y)
  }

  /** All tile indexes whose (x, y) rectangle intersects the query box —
    * the reader-side half of z-order pruning: a box predicate becomes a
    * `z_tile IN (...)` partition filter. Enumerates the 4^tileBits grid
    * (tileBits is small by construction: it counts OUTPUT FILES). */
  def zTiles(bits: Int, tileBits: Int,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): Seq[Long] = {
    require(tileBits <= bits && tileBits <= 15,
      s"tileBits=$tileBits must be <= bits=$bits and small")
    val side = 1L << (bits - tileBits) // tile edge length in value space
    (0L until (1L << (2 * tileBits))).filter { t =>
      val (tx, ty) = deinterleave(t, tileBits)
      val (x0, y0) = (tx * side, ty * side)
      x0 <= xHi && xHi.min(x0 + side - 1) >= xLo.max(x0) &&
        y0 <= yHi && yHi.min(y0 + side - 1) >= yLo.max(y0)
    }
  }

  /** S12 sink: write `df` z-ordered on (xCol, yCol), one directory
    * partition per z-tile. Range-partitioning on the full z-value aligns
    * tasks with tiles (a tile is a z-prefix), so each partition directory
    * is written by ~one task → ~one file, sorted by z within — at 100 TB
    * raise `numFiles` with the data volume, everything else is unchanged.
    * Parquet min/max footers then carry tight per-file x/y bounds. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, dir: String,
      bits: Int, tileBits: Int, numFiles: Int): Unit =
    df.withColumn("z", zValue(col(xCol), col(yCol), bits))
      .withColumn("z_tile", zTileOf(col("z"), bits, tileBits))
      .repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode("overwrite").partitionBy("z_tile").parquet(dir)

  /** Reader-side box query over a z-ordered layout: the tile list becomes
    * a partition filter (directory pruning — visible as PartitionFilters
    * in the scan), the residual x/y bounds prune row groups and rows. */
  def readBox(spark: SparkSession, dir: String, xCol: String, yCol: String,
      bits: Int, tileBits: Int,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    val tiles = zTiles(bits, tileBits, xLo, xHi, yLo, yHi)
    spark.read.parquet(dir)
      .where(col("z_tile").isin(tiles: _*) &&
        col(xCol).between(xLo, xHi) && col(yCol).between(yLo, yHi))
  }

  // ── q96: z-order locality audit — map events onto a 64×64 (user, day)
  //        grid, compute the Morton value and its 4×4-grid tile, and show
  //        per-tile row counts plus the x/y bounding box each tile covers.
  //        The bounded min/max spreads ARE the data-skipping evidence: any
  //        file holding one tile serves a box query with ≤ 1/16 of the
  //        grid. One narrow scan + one small groupBy; bit-exact integers.
  private val Bits = 6
  private val TileBits = 2

  def q96(s: SparkSession, dir: String): DataFrame = {
    val x = pmod(col("user_id"), lit(64L))
    val y = pmod(dayofyear(col("ts")).cast("long"), lit(64L))
    events(s, dir)
      .select(x.as("x"), y.as("y"))
      .withColumn("z", zValue(col("x"), col("y"), Bits))
      .withColumn("z_tile", zTileOf(col("z"), Bits, TileBits))
      .groupBy(col("z_tile"))
      .agg(count(lit(1)).as("n_events"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .orderBy(col("z_tile"))
  }

  val q96Sql: String = {
    val z = zValueSql("x", "y", Bits)
    s"""WITH g AS (
       |  SELECT user_id % 64 AS x, CAST(dayofyear(ts) AS BIGINT) % 64 AS y
       |  FROM events),
       |zed AS (SELECT x, y, $z AS z FROM g)
       |SELECT z >> ${2 * (Bits - TileBits)} AS z_tile, count(*) AS n_events,
       |  min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
       |FROM zed GROUP BY z_tile ORDER BY z_tile""".stripMargin
  }

  // ── q160: schema-drift-tolerant scan AS AN ORACLED QUERY — a 100 TB
  //         table is written over months by evolving jobs, so generations
  //         disagree on columns. Fixture: generation 1 (doc_id%2==0) is
  //         written WITHOUT `lang`; generation 2 carries it. The read is
  //         `mergeSchema=true` over both generations (gen-1 rows surface
  //         lang=NULL), and the report buckets per effective language with
  //         a coalesced default — the exact semantics a late-added column
  //         must have. The oracle reproduces the result from the original
  //         `documents` table (gen-1 rows forced to 'unknown'), so the
  //         driver hash proves the drifted read loses and invents nothing.
  def q160(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val gens = writeDriftGenerations(s, dir)
    graft.sources.Sources.readParquetEvolved(s, gens)
      .select(coalesce(col("lang"), lit("unknown")).as("lang_eff"),
        col("n_chars"))
      .groupBy(col("lang_eff"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("tot_chars"))
      .orderBy(col("lang_eff"))
  }

  /** Two-generation parquet layout for q160: gen1 files lack `lang`
    * entirely (physical schema drift, not just nulls). Built once per
    * (dir) per JVM under a stable tmp path. */
  private val driftWritten = scala.collection.mutable.Set.empty[String]
  private[graft] def writeDriftGenerations(s: SparkSession, dir: String): String = {
    import org.apache.spark.sql.functions._
    // Collision-resistant path key: full SHA-256 of the fixture dir, so
    // two distinct dirs can never share a generations tree (hashCode's
    // 32 bits could collide and silently serve the wrong corpus).
    val dirKey = java.security.MessageDigest.getInstance("SHA-256")
      .digest(dir.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(32)
    val root = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_schemadrift_gens_$dirKey").getAbsolutePath
    driftWritten.synchronized {
      if (!driftWritten.contains(root)) {
        val d = graft.Tables.documents(s, dir)
        d.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .write.mode("overwrite").parquet(s"$root/gen=1")
        d.filter(col("doc_id") % 2 =!= 0)
          .select(col("doc_id"), col("source"), col("n_chars"), col("lang"))
          .write.mode("overwrite").parquet(s"$root/gen=2")
        driftWritten.add(root)
      }
    }
    root
  }

  val q160Sql: String =
    """SELECT CASE WHEN doc_id % 2 = 0 THEN 'unknown' ELSE lang END AS lang_eff,
      |  count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS tot_chars
      |FROM documents
      |GROUP BY 1 ORDER BY lang_eff""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q96_zorder_tiles" -> q96,
    "q160_schema_drift" -> q160)

  val oracle: Map[String, String] = Map(
    "q96_zorder_tiles" -> q96Sql,
    "q160_schema_drift" -> q160Sql)
}
