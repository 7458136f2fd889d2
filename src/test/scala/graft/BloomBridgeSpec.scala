package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomMightContain

import scala.util.Random

/** BloomMightContain — the q70 scan-gate bridge to Spark's own
  * BloomFilterMightContain. Pins the build/probe hash contract the
  * Scaladoc states (build with putLong over an xxhash64 column, probe
  * the same xxhash64 through the bridge): no false negatives ever, a
  * sane false-positive rate on a disjoint probe set, and stability of
  * the writeTo/readFrom wire format the probe bytes ride. */
class BloomBridgeSpec extends SparkTestBase {
  import spark.implicits._

  private def bloomBytesOf(keys: Seq[String], fpp: Double): Array[Byte] = {
    val sketch = keys.toDF("t").select(xxhash64(col("t")).as("h"))
      .stat.bloomFilter("h", keys.size.toLong, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    sketch.writeTo(bos)
    bos.toByteArray
  }

  test("no false negatives: every built key probes true through the bridge") {
    val rnd = new Random(42L)
    val keys = Seq.fill(2000)(rnd.alphanumeric.take(12).mkString).distinct
    val bytes = bloomBytesOf(keys, fpp = 0.03)
    val hits = keys.toDF("t")
      .filter(BloomMightContain.column(bytes, xxhash64(col("t"))))
      .count()
    assert(hits == keys.size.toLong,
      s"a Bloom filter must have NO false negatives; $hits/${keys.size}")
  }

  test("disjoint probe set stays near the built fpp (one-sided error only)") {
    val rnd = new Random(43L)
    val keys = Seq.fill(2000)("in-" + rnd.alphanumeric.take(12).mkString).distinct
    val probes = Seq.fill(4000)("out-" + rnd.alphanumeric.take(12).mkString).distinct
    val bytes = bloomBytesOf(keys, fpp = 0.03)
    val fps = probes.toDF("t")
      .filter(BloomMightContain.column(bytes, xxhash64(col("t"))))
      .count()
    // 4k probes at fpp 0.03 → ~120 expected; 3× headroom keeps this a
    // contract pin, not a flake (the seed is fixed anyway)
    assert(fps.toDouble / probes.size < 0.09,
      s"false-positive rate ${fps.toDouble / probes.size} way above built fpp")
  }

  test("writeTo/readFrom round trip answers identically to the original") {
    val rnd = new Random(44L)
    val keys = Seq.fill(500)(rnd.alphanumeric.take(10).mkString).distinct
    val original = keys.toDF("t").select(xxhash64(col("t")).as("h"))
      .stat.bloomFilter("h", keys.size.toLong, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    original.writeTo(bos)
    val bytes = bos.toByteArray
    val back = org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val bos2 = new java.io.ByteArrayOutputStream()
    back.writeTo(bos2)
    assert(java.util.Arrays.equals(bytes, bos2.toByteArray),
      "wire format must be stable across a readFrom/writeTo cycle")
    val probeHashes = (keys ++ Seq("absent-1", "absent-2")).toDF("t")
      .select(col("t"), xxhash64(col("t")).as("h")).collect()
    probeHashes.foreach { r =>
      assert(back.mightContainLong(r.getLong(1)) ==
        original.mightContainLong(r.getLong(1)),
        s"round-tripped sketch disagrees on ${r.getString(0)}")
    }
  }
}
