package graft
// Dev-scratch (deleted after use): dump the real q70 BloomFilter internals
// so the DuckDB oracle replica can be pinned against ground truth.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object BloomDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val evalHashes = docs.filter(col("doc_id") % 97 === 0)
      .select(graft.ops.TextQueries.tokens(col("text")).as("_toks"))
      .select(explode(graft.operators.Dedup.shinglesFromTokens(col("_toks"), 4)).as("t"))
      .select(xxhash64(col("t")).as("h")).distinct()
    val expected = evalHashes.count()
    val f = evalHashes.stat.bloomFilter("h", expected, 1e-6)
    println(s"BLOOM expected=$expected bitSize=${f.bitSize()}")
    // probe vectors: first 5 eval hashes + 3 constants
    val some = evalHashes.orderBy(col("h")).limit(5).collect().map(_.getLong(0))
    some.foreach(h => println(s"BLOOM probe $h -> ${f.mightContainLong(h)}"))
    Seq(0L, 42L, -1L).foreach(h => println(s"BLOOM probe $h -> ${f.mightContainLong(h)}"))
    val bos = new java.io.ByteArrayOutputStream()
    f.writeTo(bos)
    val hdr = bos.toByteArray.take(12)
    println("BLOOM header " + hdr.map(b => f"${b & 0xff}%02x").mkString(" "))
    // FP sweep: which of 0..99999 test positives (none are eval members)
    val fps = (0L until 100000L).filter(f.mightContainLong).toList
    println(s"BLOOM fp_sweep n=${fps.length} " + fps.take(20).mkString(","))
    spark.stop()
  }
}
