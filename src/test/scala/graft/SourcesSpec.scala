package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Sources

class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  private val flightSchema = StructType(Seq(
    StructField("FL_DATE", StringType),
    StructField("OP_CARRIER", StringType),
    StructField("DEP_TIME", DoubleType)))

  test("S1/S2: CSV round-trip with explicit schema") {
    val dir = Files.createTempDirectory("csv").toString
    val df = Seq(("2024-01-01", "AA", 930.0), ("2024-01-02", "DL", 1456.0))
      .toDF("FL_DATE", "OP_CARRIER", "DEP_TIME")
    Sources.writeCsvSingle(df, s"$dir/out")
    val back = Sources.readCsv(spark, s"$dir/out", flightSchema)
    assert(back.schema == flightSchema)
    assert(back.count() == 2)
    assert(back.filter(col("DEP_TIME") === 1456.0).count() == 1)
  }

  test("S14: lenient CSV quarantines malformed rows, good rows flow on") {
    val dir = Files.createTempDirectory("csv-lenient")
    Files.writeString(dir.resolve("in.csv"),
      """FL_DATE,OP_CARRIER,DEP_TIME
        |2024-01-01,AA,930.0
        |2024-01-02,DL,not_a_number
        |2024-01-03,UA,1456.0
        |""".stripMargin)
    val lenient = Sources.readCsvLenient(spark, dir.toString, flightSchema)
    val (good, bad) = Sources.splitCorrupt(lenient)
    assert(good.schema == flightSchema)
    assert(good.count() == 2)
    assert(good.where(col("OP_CARRIER") === "DL").count() == 0)
    val quarantined = bad.collect()
      .map(r => r.getString(r.fieldIndex("_corrupt")))
    assert(quarantined.length == 1 && quarantined(0).contains("not_a_number"),
      quarantined.mkString("; "))
    // same file under DROPMALFORMED: bad row silently gone when columns
    // are materialized — AND count() sees 3, because a pruned-to-nothing
    // read parses no fields so nothing is "malformed". Both behaviors are
    // the trap readCsvLenient exists to avoid.
    val dropped = spark.read.option("header", "true")
      .option("mode", "DROPMALFORMED").schema(flightSchema)
      .csv(dir.toString)
    assert(dropped.collect().length == 2)
    assert(dropped.count() == 3)
    OperatorCaches.release()
  }

  test("S8: parquet aggregate pushdown answers count/min/max from footers") {
    // The 100 TB "don't scan what the footers already know" recipe:
    // with the V2 parquet reader, whole-query COUNT/MIN/MAX compile to
    // PushedAggregation in the scan — row groups are never decoded. The
    // conf scope must cover the ACTION (pushdown happens at optimization).
    val dir = Files.createTempDirectory("agg-push").toString + "/t"
    spark.range(0, 10000).selectExpr("id", "id % 7 AS x")
      .repartition(4).write.parquet(dir)
    ScopedConf.withConf(spark, "spark.sql.sources.useV1SourceList", "") {
     ScopedConf.withConf(spark, "spark.sql.parquet.aggregatePushdown", "true") {
      val agg = spark.read.parquet(dir)
        .agg(count(col("id")).as("n"), min(col("x")).as("lo"),
          max(col("x")).as("hi"))
      val row = agg.collect()(0)
      assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((10000L, 0L, 6L)))
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [COUNT(id), MIN(x), MAX(x)]"), plan)
     }
    }
  }

  test("S15: XML round-trip (Spark 4 built-in source) with explicit schema") {
    val dir = Files.createTempDirectory("xml").toString
    val df = Seq(("2024-01-01", "AA", 930.0), ("2024-01-02", "DL", 1456.0))
      .toDF("FL_DATE", "OP_CARRIER", "DEP_TIME")
    Sources.writeXmlSingle(df, s"$dir/out", rowTag = "flight")
    val back = Sources.readXml(spark, s"$dir/out", flightSchema, rowTag = "flight")
    assert(back.schema == flightSchema)
    assert(back.count() == 2)
    assert(back.filter(col("OP_CARRIER") === "DL")
      .select("DEP_TIME").collect()(0).getDouble(0) == 1456.0)
  }

  test("S15: XML malformed-record triage mirrors the CSV quarantine") {
    val dir = Files.createTempDirectory("xml-lenient")
    Files.writeString(dir.resolve("in.xml"),
      """<rows>
        |<flight><FL_DATE>2024-01-01</FL_DATE><OP_CARRIER>AA</OP_CARRIER><DEP_TIME>930.0</DEP_TIME></flight>
        |<flight><FL_DATE>2024-01-02</FL_DATE><OP_CARRIER>DL</OP_CARRIER><DEP_TIME>bogus</DEP_TIME></flight>
        |<flight><FL_DATE>2024-01-03</FL_DATE><OP_CARRIER>UA</OP_CARRIER><DEP_TIME>1456.0</DEP_TIME></flight>
        |</rows>""".stripMargin)
    val lenient = spark.read
      .option("rowTag", "flight")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(flightSchema.add("_corrupt", StringType))
      .xml(dir.toString)
    val (good, bad) = Sources.splitCorrupt(lenient)
    assert(good.count() == 2)
    val quarantined = bad.collect().map(r => r.getString(r.fieldIndex("_corrupt")))
    assert(quarantined.length == 1 && quarantined(0).contains("bogus"),
      quarantined.mkString("; "))
    OperatorCaches.release()
  }

  test("S3: weather JSON document explodes to relational station rows") {
    val dir = Files.createTempDirectory("json")
    Files.writeString(dir.resolve("weather.json"),
      """{"stations": [
        |  {"id": "JFK", "temperature": 72, "conditions": "clear"},
        |  {"id": "LAX", "temperature": 75, "conditions": "sunny"}]}""".stripMargin)
    val stations = Sources.explodeWeather(Sources.readJson(spark, dir.toString))
    val rows = stations.orderBy("station_id").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("JFK", "LAX"))
    assert(rows(0).getLong(1) == 72L && rows(0).getString(2) == "clear")
  }

  test("S4: metric-document JSON sink round-trips nested structure") {
    val dir = Files.createTempDirectory("jsink").toString
    val metrics = Seq((14000L, 3052L, 78.2)).toDF(
      "total_flights", "total_delayed_flights", "overall_ontime_percentage")
    Sources.writeJsonSingle(metrics, s"$dir/m")
    val back = spark.read.json(s"$dir/m")
    assert(back.select("total_flights").head().getLong(0) == 14000L)
    val doc = Sources.toJsonDocument(metrics).head().getString(0)
    assert(doc.contains(""""total_flights":14000"""))
  }

  test("S7: glob source carries provenance; per-file validation rolls up") {
    val dir = Files.createTempDirectory("glob")
    Files.writeString(dir.resolve("a.csv"),
      "FL_DATE,OP_CARRIER,DEP_TIME\n2024-01-01,AA,930.0\n")
    Files.writeString(dir.resolve("b.csv"),
      "FL_DATE,OP_CARRIER,DEP_TIME\n2024-01-02,,1001.0\n2024-01-03,DL,\n")
    val df = Sources.readCsvDir(spark, s"$dir/*.csv", flightSchema)
    val stats = Sources.perFileStats(df, Seq("OP_CARRIER", "DEP_TIME"))
      .collect().map(r => r.getString(0).split("/").last ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(stats("a.csv") == ((1L, 0L, 0L)))
    assert(stats("b.csv") == ((2L, 1L, 1L)))
  }

  test("S8: partitioned parquet write prunes partitions on read") {
    val dir = Files.createTempDirectory("pq").toString
    val df = Seq(("2024-01-01", "AA", 1.0), ("2024-01-02", "DL", 2.0))
      .toDF("flight_date", "airline", "v")
    Sources.writeParquet(df, s"$dir/t", partitionBy = Seq("flight_date"))
    val back = spark.read.parquet(s"$dir/t")
      .filter(col("flight_date") === "2024-01-01")
    assert(back.count() == 1)
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
  }

  test("S10: ORC round-trip preserves values; filters push to the scan") {
    val dir = Files.createTempDirectory("orc").toString
    val df = Seq(("2024-01-01", "AA", 1.5), ("2024-01-02", "DL", 2.5))
      .toDF("flight_date", "airline", "v")
    Sources.writeOrc(df, s"$dir/t", partitionBy = Seq("flight_date"))
    val back = Sources.readOrc(spark, s"$dir/t")
      .filter(col("flight_date") === "2024-01-02")
    assert(back.select("airline", "v").collect().map(r =>
      (r.getString(0), r.getDouble(1))).toSeq == Seq(("DL", 2.5)))
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
  }

  test("S5/S6: JDBC sink + pushed-query scan round-trip (embedded Derby)") {
    val db = java.nio.file.Files.createTempDirectory("derby").resolve("g").toString
    val url = s"jdbc:derby:$db;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val df = Seq((1L, "AA", 130.5), (2L, "DL", 7.0), (3L, "AA", 99.0))
      .toDF("flight_number", "airline", "departure_delay")
    Sources.writeJdbc(df, url, "flights", props,
      columnTypes = Some("airline VARCHAR(10)"))
    // S6: the analytic query runs INSIDE the database, like the
    // reference's Postgres push (dags/flight_data_pipeline.py:160)
    val back = Sources.readJdbc(spark, url,
      """SELECT "airline", count(*) AS n FROM flights GROUP BY "airline"""", props)
    val m = back.collect()
      .map(r => r.getString(0) -> r.getAs[Number](1).longValue()).toMap
    assert(m == Map("AA" -> 2L, "DL" -> 1L))
  }

  test("S5/S6: real-Postgres round-trip (auto-skips without POSTGRES_URL)") {
    // Parity gap carried since round 1: the reference's sink is Postgres
    // (dags/flight_data_pipeline.py:78-122). Round-9 audit: this
    // container DOES ship a postgres 15 server (psql/pg_ctl), but no
    // org.postgresql JDBC driver jar exists anywhere on disk and the
    // environment is zero-egress — so Spark cannot speak to it and the
    // gate remains the driver jar, not the server. When an environment
    // provides both the driver on the classpath and POSTGRES_URL
    // (jdbc:postgresql://...; credentials via POSTGRES_USER/PASSWORD),
    // the same writeJdbc/readJdbc pair must round-trip against it —
    // green either way, real parity when the environment allows.
    sys.env.get("POSTGRES_URL") match {
      case None => cancel("POSTGRES_URL not set — embedded Derby covers S5/S6")
      case Some(url) =>
        val props = new java.util.Properties()
        sys.env.get("POSTGRES_USER").foreach(props.setProperty("user", _))
        sys.env.get("POSTGRES_PASSWORD")
          .foreach(props.setProperty("password", _))
        val tbl = s"graft_smoke_${System.nanoTime()}"
        val df = Seq((1L, "AA", 130.5), (2L, "DL", 7.0), (3L, "AA", 99.0))
          .toDF("flight_number", "airline", "departure_delay")
        Sources.writeJdbc(df, url, tbl, props,
          columnTypes = Some("airline VARCHAR(10)"))
        val back = Sources.readJdbc(spark, url,
          s"SELECT airline, count(*) AS n FROM $tbl GROUP BY airline", props)
        val m = back.collect()
          .map(r => r.getString(0) -> r.getAs[Number](1).longValue()).toMap
        assert(m == Map("AA" -> 2L, "DL" -> 1L))
    }
  }

  test("S9: alert listener fires on failed actions") {
    val seen = new java.util.concurrent.atomic.AtomicReference[String]()
    val l = Sources.registerAlertListener(spark)((fn, e) => seen.set(fn))
    try {
      intercept[Exception] {
        spark.range(10).selectExpr("assert_true(id < 5)", "id").collect()
      }
      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 5000
      while (seen.get() == null && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(seen.get() != null, "onFailure callback must fire")
    } finally spark.listenerManager.unregister(l)
  }

  test("S11: writeSized hits the file budget; compaction defragments") {
    val dir = Files.createTempDirectory("sized").toString
    val df = spark.range(10000).select(col("id"),
      concat(lit("payload-"), col("id")).as("s"))
    // fragment: 32 tiny files
    df.repartition(32).write.parquet(s"$dir/frag")
    assert(new java.io.File(s"$dir/frag").listFiles()
      .count(_.getName.endsWith(".parquet")) == 32)
    // compact with a budget that wants everything in one or two files
    val files = Sources.compactParquet(spark, s"$dir/frag", s"$dir/compact",
      targetFileBytes = 16L * 1024 * 1024)
    val got = new java.io.File(s"$dir/compact").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(got == files.toInt)
    assert(got <= 2)
    // content survives
    assert(spark.read.parquet(s"$dir/compact").count() == 10000)
    assert(spark.read.parquet(s"$dir/compact").agg(sum(col("id")))
      .collect()(0).getLong(0) == 10000L * 9999 / 2)
  }

  test("S11: compactParquet refuses in-place rewrite") {
    val dir = Files.createTempDirectory("inplace").toString
    spark.range(10).write.parquet(s"$dir/t")
    intercept[IllegalArgumentException] {
      Sources.compactParquet(spark, s"$dir/t", s"$dir/t")
    }
  }

  test("S16: schema-evolution read unions drifted file schemas, nulls the gaps") {
    val dir = Files.createTempDirectory("evolve").toString
    // v1 files: (id, a); v2 adds column b
    spark.range(0, 5).selectExpr("id", "id * 2 AS a")
      .write.parquet(s"$dir/t/v1")
    spark.range(5, 10).selectExpr("id", "id * 2 AS a", "id * 3 AS b")
      .write.parquet(s"$dir/t/v2")
    val merged = Sources.readParquetEvolved(spark, s"$dir/t/*")
    assert(merged.columns.sorted.toSeq == Seq("a", "b", "id"))
    assert(merged.count() == 10)
    // v1 rows surface the new column as NULL; v2 rows carry real values
    assert(merged.filter(col("b").isNull).count() == 5)
    assert(merged.filter(col("b") === col("id") * 3).count() == 5)
    // plain read of the same glob sees only ONE footer's schema — the
    // evolution read is what provides the stable wide view
    assert(spark.read.parquet(s"$dir/t/*").columns.length <= 2)
  }

  test("S17: binaryFile ingestion lists by glob, decodes real PNGs, packs to parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bin").toString
    // five real grayscale PNGs (4×8) + one decoy the glob must never open
    val dims = (0 until 5).map { i =>
      val px = Array.tabulate[Byte](32)(j => ((i * 37 + j * 11) % 251).toByte)
      val bytes = graft.operators.Multimodal.grayPng(px, 4, 8)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$i.png"), bytes)
      i.toLong -> bytes.length.toLong
    }.toMap
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/readme.txt"),
      "not an image".getBytes)
    val scanned = graft.sources.Sources.readBinaryFiles(spark, dir, "*.png")
    assert(scanned.count() == 5)
    assert(scanned.columns.toSet ==
      Set("path", "modificationTime", "length", "content"))
    // length column matches the bytes actually written
    scanned.select(col("path"), col("length")).collect().foreach { r =>
      val id = "(\\d+)\\.png$".r.findFirstMatchIn(r.getString(0)).get.group(1).toLong
      assert(r.getLong(1) == dims(id))
    }
    // pack to the BinaryType parquet layout and ImageIO-decode the payloads
    graft.sources.Sources.packBinaryFiles(spark, dir, "*.png", s"$dir/packed")
    val packed = spark.read.parquet(s"$dir/packed")
    assert(packed.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val decoded = packed.collect().map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
      (r.getAs[Long]("media_id"), img.getWidth, img.getHeight)
    }
    assert(decoded.length == 5)
    assert(decoded.forall { case (_, w, h) => w == 4 && h == 8 })
    assert(decoded.map(_._1).sorted.sameElements(0L until 5L))
  }
}
