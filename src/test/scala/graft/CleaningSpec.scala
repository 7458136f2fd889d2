package graft

import org.apache.spark.sql.functions._
import graft.ops.Cleaning

class CleaningSpec extends SparkTestBase {
  import spark.implicits._

  test("cleanTime: HHMM floats → HH:MM strings, null-safe (X1 parity)") {
    val df = Seq(Some(1456.0), Some(5.0), Some(930.0), Some(0.0), None)
      .toDF("t").select(Cleaning.cleanTime(col("t")).as("c"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("14:56", "00:05", "09:30", "00:00", null))
  }

  test("cleanTime property: matches dd:dd across the whole HHMM domain") {
    // property-style sweep via scalacheck Gen over the full domain
    val vs = org.scalacheck.Gen.choose(0, 2399)
    val sample = (0 until 200).flatMap(i => vs.apply(
      org.scalacheck.Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))
    val distinctVs = (sample ++ Seq(0, 59, 100, 2359, 2399)).distinct
    val out = distinctVs.map(v => (v, v.toDouble)).toDF("v", "t")
      .select(col("v"), Cleaning.cleanTime(col("t")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getString(1))
    out.foreach { case (v, s) =>
      assert(s.matches("\\d{2}:\\d{2}"), s"bad format for $v: $s")
      assert(s == f"${v / 100}%02d:${v % 100}%02d")
    }
  }

  test("projectRename selects and renames (P1)") {
    val df = Seq((1, "a", 9.9)).toDF("X", "Y", "Z")
    val out = Cleaning.projectRename(df, Seq("Y" -> "y2", "X" -> "x2"))
    assert(out.columns.toSeq == Seq("y2", "x2"))
  }

  test("dropHighMissing drops only columns above threshold (P2)") {
    val df = Seq((Some(1), None: Option[Int], Some("x")),
      (Some(2), None, None), (Some(3), Some(9), None))
      .toDF("keep", "all_null_ish", "mostly_null")
    // all_null_ish: 2/3 ≈ 66.7% missing; mostly_null: 2/3 missing
    val out70 = Cleaning.dropHighMissing(df, 70.0)
    assert(out70.columns.toSeq == Seq("keep", "all_null_ish", "mostly_null"))
    val out50 = Cleaning.dropHighMissing(df, 50.0)
    assert(out50.columns.toSeq == Seq("keep"))
  }

  test("addDelayAndStatus: naive HHMM delta + threshold status (X6/X9 parity)") {
    val df = Seq(
      ("1405.0", "1456.0", "1500.0", "1512.0"),
      ("1000.0", "1010.0", "1100.0", "1105.0"),
      ("0900.0", null, "1000.0", null))
      .toDF("scheduled_departure", "actual_departure",
        "scheduled_arrival", "actual_arrival")
    val out = Cleaning.addDelayAndStatus(df)
      .select("departure_delay", "flight_status").collect()
    assert(out(0).getDouble(0) == 51.0) // 1456-1405, NOT 51 true minutes
    assert(out(0).getString(1) == "Delayed")
    assert(out(1).getDouble(0) == 10.0 && out(1).getString(1) == "On Time")
    assert(out(2).isNullAt(0) && out(2).getString(1) == "On Time") // null → default
  }

  test("upperCodes uppercases airport codes (X2)") {
    val out = Cleaning.upperCodes(Seq(("jfk", "Lax")).toDF("origin", "destination"),
      Seq("origin", "destination")).head()
    assert(out.getString(0) == "JFK" && out.getString(1) == "LAX")
  }

  test("stampGenerated adds an isoformat timestamp column (X14)") {
    val out = Cleaning.stampGenerated(Seq(1, 2).toDF("x"))
    assert(out.columns.toSeq == Seq("x", "generated_at"))
    val stamps = out.collect().map(_.getString(1))
    // Python isoformat shape: 2025-03-27T18:07:09.494899
    val iso = """\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{6}""".r
    stamps.foreach(s => assert(iso.matches(s), s"bad stamp: $s"))
    // one deterministic stamp per query (current_timestamp is per-query
    // constant — every row in one action shares it)
    assert(stamps.distinct.length == 1)
  }
}
