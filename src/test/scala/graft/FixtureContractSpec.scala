package graft

import org.apache.spark.sql.types._

/** Early-warning contract on the driver-generated fixtures. Round 6 lost
  * five streaming queries and three batch queries to a silent fixture
  * re-encoding (events.ts TIMESTAMP(NANOS) → TIMESTAMP_NTZ µs); this spec
  * turns the next such drift into ONE named failure here instead of a
  * scatter of wrong-rows diagnoses downstream.
  */
class FixtureContractSpec extends SparkTestBase {

  test("events loader normalizes ts to TimestampType whatever the footer encoding") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"events.ts must normalize to TimestampType, got ${ev.schema("ts").dataType}")
    // and the values live in the fixture's documented era, not 1970
    // (the round-6 µs-as-ns symptom collapsed everything to January 1970)
    val yr = ev.selectExpr("min(year(ts))", "max(year(ts))").collect()(0)
    assert(yr.getInt(0) >= 2000 && yr.getInt(1) <= 2100,
      s"events.ts outside plausible era: $yr — encoding mis-truncation?")
  }

  test("streaming reader agrees with the batch loader row-for-row on ts") {
    val tmp = java.nio.file.Files.createTempDirectory("events_contract")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      tmp.resolve("events.parquet"))
    val streamed = graft.streaming.EventsStream
      .readEvents(spark, tmp.toString, Some("events.parquet"))
    assert(streamed.schema("ts").dataType == TimestampType)
    // AvailableNow drain into memory, then compare to the batch read
    import org.apache.spark.sql.streaming.Trigger
    val qn = "fixture_contract_sink"
    spark.catalog.dropTempView(qn)
    val q = streamed.select("event_id", "ts").writeStream.format("memory")
      .queryName(qn).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val viaStream = spark.table(qn).orderBy("event_id").collect().map(_.toSeq)
    val viaBatch = Tables.events(spark, sfDir)
      .select("event_id", "ts").orderBy("event_id").collect().map(_.toSeq)
    assert(viaStream.toSeq == viaBatch.toSeq,
      "stream and batch readers must see identical instants")
  }

  test("every fixture table loads with its TESTDATA.md columns") {
    val expect = Map(
      "region" -> Seq("r_regionkey", "r_name"),
      "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
      "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"),
      "orders" -> Seq("o_orderkey", "o_custkey", "o_orderdate"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_shipdate"),
      "events" -> Seq("event_id", "ts", "user_id", "event_type", "value"),
      "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Seq("vec_id", "embedding", "label"))
    expect.foreach { case (t, cols) =>
      val have =
        if (t == "events") Tables.events(spark, sfDir).columns.toSet
        else Tables.table(spark, sfDir, t).columns.toSet
      val missing = cols.filterNot(have)
      assert(missing.isEmpty, s"$t missing expected columns: $missing (has $have)")
    }
  }

  test("drift-prone element types hold: embeddings stay array<float32>, " +
    "ids stay long (the encodings every ANN expression and media " +
    "fixture keys on)") {
    Tables.embeddings(spark, sfDir).schema("embedding").dataType match {
      case ArrayType(FloatType, _) => ()
      case other => fail(s"embedding must be array<float>, got $other — " +
        "cosine kernels and the ::DOUBLE[] oracle casts assume float32")
    }
    assert(Tables.embeddings(spark, sfDir).schema("vec_id").dataType
      == LongType)
    assert(Tables.documents(spark, sfDir).schema("doc_id").dataType
      == LongType)
    assert(Tables.documents(spark, sfDir).schema("text").dataType
      == StringType)
    assert(Tables.events(spark, sfDir).schema("value").dataType
      == DoubleType)
  }

  test("freshScratch deletes a dead-JVM leftover on first touch but " +
    "keeps state across later touches in the same JVM (PID-reuse " +
    "double-count guard, r16 ADVICE)") {
    val name = s"graft_freshtest_p${ProcessHandle.current.pid}"
    // simulate the PID-reuse hazard: a tree at OUR pid's scratch path,
    // left by a "dead" JVM — pruneStaleTrees sees a live PID and keeps it
    val stale = new java.io.File(
      System.getProperty("java.io.tmpdir"), name)
    stale.mkdirs()
    val junk = new java.io.File(stale, "committed-by-dead-jvm.parquet")
    java.nio.file.Files.write(junk.toPath, "stale".getBytes("UTF-8"))
    val p1 = Fixtures.freshScratch(name)
    assert(!junk.exists(),
      "first freshScratch touch must delete the leftover tree")
    // same JVM, second touch: checkpoint-style state must SURVIVE —
    // q201's rerun-as-incremental-no-op contract
    new java.io.File(p1).mkdirs()
    val ck = new java.io.File(p1, "checkpoint-of-this-jvm")
    java.nio.file.Files.write(ck.toPath, "ours".getBytes("UTF-8"))
    val p2 = Fixtures.freshScratch(name)
    assert(p2 == p1 && ck.exists(),
      "later touches in the same JVM must keep the tree intact")
  }
}
