package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.ops.Layout

/** Z-order layout: the Morton math, the tile-cover helper, and the real
  * point — a box query over the written layout prunes partitions (fewer
  * files read) while returning exactly the rows a full scan would.
  */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  /** Straight-line Scala Morton interleave as the model. */
  private def zModel(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zValue column matches the bit-interleave model") {
    val pts = for (x <- 0L to 63L by 7; y <- 0L to 63L by 5) yield (x, y)
    val got = pts.toDF("x", "y")
      .withColumn("z", Layout.zValue(col("x"), col("y"), 6))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == zModel(x, y, 6), s"($x,$y)")
    }
  }

  test("zValueSql evaluates identically to the Column form in Spark SQL") {
    val df = Seq((13L, 57L), (0L, 63L), (63L, 0L), (42L, 42L)).toDF("x", "y")
    val viaSql = df.selectExpr(s"${Layout.zValueSql("x", "y", 6)} AS z")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = df.select(Layout.zValue(col("x"), col("y"), 6))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaCol)
  }

  test("zTiles is exactly the set of tiles the box's points land in, padded to full rectangles") {
    val (bits, tileBits) = (6, 2)
    val (xLo, xHi, yLo, yHi) = (5L, 20L, 30L, 40L)
    val cover = Layout.zTiles(bits, tileBits, xLo, xHi, yLo, yHi).toSet
    // every point in the box must land in a covered tile
    val landed = (for (x <- xLo to xHi; y <- yLo to yHi)
      yield zModel(x, y, bits) >> (2 * (bits - tileBits))).toSet
    assert(landed.subsetOf(cover))
    // and the cover contains no tile whose rectangle misses the box
    val side = 1L << (bits - tileBits)
    cover.foreach { t =>
      val corners = for (x <- 0L until (1L << tileBits);
          y <- 0L until (1L << tileBits)
          if (zModel(x, y, tileBits) == t)) yield (x * side, y * side)
      val (x0, y0) = corners.head
      assert(x0 <= xHi && x0 + side - 1 >= xLo &&
        y0 <= yHi && y0 + side - 1 >= yLo, s"tile $t does not intersect box")
    }
  }

  test("writeZOrdered + readBox: pruned scan, identical result") {
    val dir = Files.createTempDirectory("graft-zorder").toString
    // grid dims chosen to SPAN the 64×64 space at the tiny sf0.001 fixture
    // (its raw user/day ranges cover <2 tiles — too narrow to show pruning)
    val src = Tables.events(spark, sfDir)
      .select(pmod(col("event_id"), lit(64L)).as("x"),
        pmod(col("user_id") * 5L, lit(64L)).as("y"),
        col("event_id"))
    Layout.writeZOrdered(src, "x", "y", dir, bits = 6, tileBits = 2,
      numFiles = 16)

    val (xLo, xHi, yLo, yHi) = (0L, 15L, 0L, 15L) // one tile of the 4×4 grid
    val boxed = Layout.readBox(spark, dir, "x", "y", 6, 2, xLo, xHi, yLo, yHi)
    val expected = src
      .where(col("x").between(xLo, xHi) && col("y").between(yLo, yHi))
      .select(col("event_id")).collect().map(_.getLong(0)).sorted
    val got = boxed.select(col("event_id")).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == expected.toSeq)
    assert(got.nonEmpty)

    // pruning evidence: the scan planned fewer partition dirs than exist
    boxed.count()
    val plan = boxed.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = plan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.get
    val scannedFiles = scan.metrics("numFiles").value
    val allTiles = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("z_tile="))
    assert(allTiles > 4, s"layout wrote only $allTiles tiles")
    assert(scannedFiles < allTiles,
      s"no pruning: scanned $scannedFiles files over $allTiles tile dirs")
    assert(scan.metadata("PartitionFilters").contains("z_tile"))
  }
}
