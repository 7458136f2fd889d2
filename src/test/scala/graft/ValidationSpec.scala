package graft

import org.apache.spark.sql.types._
import graft.ops.Validation

/** Accept/reject parity with the reference's runtime gates on the crafted
  * negative fixtures from FIXTURES.md §A5. */
class ValidationSpec extends SparkTestBase {
  import spark.implicits._

  private val good = Seq(("2024-01-01", "AA", 0.0), ("2024-01-02", "DL", 1.0))
    .toDF("FL_DATE", "OP_CARRIER", "CANCELLED")

  test("V1: missing required column rejects") {
    assert(Validation.requireColumns(good, Seq("FL_DATE", "OP_CARRIER")).passed)
    val r = Validation.requireColumns(good, Seq("FL_DATE", "ORIGIN"))
    assert(!r.passed && r.errors.head.contains("ORIGIN"))
  }

  test("V2: nulls in critical columns reject, single-pass") {
    val bad = Seq((Some("2024-01-01"), "AA"), (None, "DL"))
      .toDF("FL_DATE", "OP_CARRIER")
    assert(Validation.noNulls(good, Seq("FL_DATE", "OP_CARRIER")).passed)
    assert(!Validation.noNulls(bad, Seq("FL_DATE")).passed)
  }

  test("V3: dtype mismatch rejects") {
    assert(Validation.dtypeCheck(good, Map("CANCELLED" -> DoubleType)).passed)
    val r = Validation.dtypeCheck(good, Map("CANCELLED" -> IntegerType))
    assert(!r.passed && r.errors.head.contains("CANCELLED"))
  }

  test("V4: CANCELLED=2.0 out of 0..1 range rejects") {
    assert(Validation.rangeCheck(good, "CANCELLED", 0.0, 1.0).passed)
    val bad = Seq(0.0, 2.0).toDF("CANCELLED")
    assert(!Validation.rangeCheck(bad, "CANCELLED", 0.0, 1.0).passed)
  }

  test("V5: malformed JSON rejects") {
    val tmp = java.nio.file.Files.createTempDirectory("vjson")
    java.nio.file.Files.writeString(tmp.resolve("bad.json"), "{not json]")
    val df = spark.read.json(tmp.toString)
    assert(!Validation.jsonStructure(df).passed)
    val okDf = Seq("""{"stations": []}""").toDS()
    assert(Validation.jsonStructure(spark.read.json(okDf)).passed)
  }

  test("V6/F6: empty input rejects") {
    assert(!Validation.notEmpty(good.filter("FL_DATE = 'nope'")).passed)
  }

  test("combined gate fails fast on structure before launching data checks") {
    val r = Validation.validateProcessed(good, required = Seq("MISSING_COL"),
      critical = Seq("FL_DATE"), flagCols = Seq("CANCELLED"))
    assert(!r.passed && r.errors.length == 1)
  }
}
