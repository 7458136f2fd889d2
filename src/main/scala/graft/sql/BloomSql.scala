package graft.sql

/** DuckDB-SQL replay of Spark's `BloomFilter` (the V2 implementation
  * `org.apache.spark.util.sketch.BloomFilterImplV2`, which
  * `DataFrame.stat.bloomFilter` builds in Spark 4) — the piece that made
  * q70's Bloom decontamination "rows-only by nature". Semantics pinned by
  * decompiling the sketch jar and validated against a REAL filter's
  * false-positive sweep (16/16 identical FP values over 100k probes —
  * the FP pattern is the fingerprint of every bit in the filter):
  *
  *   hi = Murmur3_x86_32.hashLong(item, seed=0)        (signed 32-bit)
  *   lo = Murmur3_x86_32.hashLong(item, hi)
  *   position_i (i = 1..k):  c = hi·2147483647 + i·lo  (LONG arithmetic;
  *     |hi·2^31| < 2^62 so it never wraps);  c < 0 ⇒ c = ~c;  c % bitSize
  *   numBits  = (long)(−n·ln(p) / ln(2)²)              (truncation)
  *   k        = max(1, round(numBits/n · ln 2))
  *   bitSize  = ceil(numBits/64)·64                    (BitArray words)
  *
  * The filter itself is RELATIONAL here: `bits` = the distinct positions
  * of every inserted item; mightContain(x) = all of x's distinct
  * positions present. One-ulp caveat: numBits/k derive from ln() — a
  * libm-vs-JVM last-ulp difference at an exact integer boundary would
  * shift the geometry and fail the hash check LOUDLY (never silently).
  *
  * Murmur3_x86_32 arithmetic: all 32-bit state as UBIGINT values < 2^32
  * (products < 2^64 never overflow UBIGINT), explicit % 2^32 after every
  * multiply, rotations as (x·2^r mod 2^32) | (x >> 32−r).
  */
object BloomSql {
  private val C32 = "4294967296"

  private def m32(a: String, c: String) = s"(($a * $c::UBIGINT) % $C32)"
  private def rot32(x: String, r: Int) =
    s"((($x * ${1L << r}::UBIGINT) % $C32) | ($x >> ${32 - r}))"
  private def mixK1(k: String) =
    m32(rot32(m32(k, "3432918353"), 15), "461845907")
  private def mixH1(h: String, k: String) =
    s"((${rot32(s"xor($h, $k)", 13)} * 5::UBIGINT + 3864292196::UBIGINT) % $C32)"

  /** CTE chain computing the (hi, lo) signed-32 Murmur pair for every
    * row of `srcSql` (must select one signed BIGINT column `hs`). Ends in
    * `mmh(hs, hi, lo)`. The fmix tail is staged over two levels; the
    * lo-hash reuses the mixK1 lane values (they depend only on the item,
    * not the seed). */
  def murmurPairCtes(srcSql: String): String = {
    // fmix for len=8, staged: f1 = h ^ 8 ^ ((h ^ 8) >> 16) — via two cols
    def fmixA(h: String) = // after xor len: h ^= h>>16; h *= 0x85ebca6b
      m32(s"xor(xor($h, 8::UBIGINT), xor($h, 8::UBIGINT) >> 16)", "2246822507")
    def fmixB(h: String) = // h ^= h>>13; h *= 0xc2b2ae35
      m32(s"xor($h, $h >> 13)", "3266489909")
    def fmixC(h: String) = s"xor($h, $h >> 16)"
    s"""mm0 AS (
       |  SELECT hs,
       |    CASE WHEN hs < 0 THEN CAST(CAST(hs AS HUGEINT) + 18446744073709551616 AS UBIGINT)
       |         ELSE CAST(hs AS UBIGINT) END AS u
       |  FROM ($srcSql)),
       |mm1 AS (SELECT hs, u % $C32 AS lo32, u // $C32 AS hi32 FROM mm0),
       |mm2 AS (SELECT hs, ${mixK1("lo32")} AS kl, ${mixK1("hi32")} AS kh FROM mm1),
       |mm3 AS (SELECT hs, kl, kh, ${mixH1("0::UBIGINT", "kl")} AS ha1 FROM mm2),
       |mm4 AS (SELECT hs, kl, kh, ${mixH1("ha1", "kh")} AS hb1 FROM mm3),
       |mm5 AS (SELECT hs, kl, kh, ${fmixA("hb1")} AS fa1 FROM mm4),
       |mm6 AS (SELECT hs, kl, kh, ${fmixC(fmixB("fa1"))} AS hiu FROM mm5),
       |mm7 AS (SELECT hs, hiu, ${mixH1("hiu", "kl")} AS ha2, kh FROM mm6),
       |mm8 AS (SELECT hs, hiu, ${mixH1("ha2", "kh")} AS hb2 FROM mm7),
       |mm9 AS (SELECT hs, hiu, ${fmixA("hb2")} AS fa2 FROM mm8),
       |mmA AS (SELECT hs, hiu, ${fmixC(fmixB("fa2"))} AS lou FROM mm9),
       |mmh AS (
       |  SELECT hs,
       |    CAST(CASE WHEN hiu >= 2147483648 THEN CAST(hiu AS HUGEINT) - $C32
       |              ELSE CAST(hiu AS HUGEINT) END AS BIGINT) AS hi,
       |    CAST(CASE WHEN lou >= 2147483648 THEN CAST(lou AS HUGEINT) - $C32
       |              ELSE CAST(lou AS HUGEINT) END AS BIGINT) AS lo
       |  FROM mmA)""".stripMargin
  }

  /** Geometry CTE `geo(n, num_bits, k, bit_size)` from a 1-column count
    * source (`SELECT count(*) AS n FROM ...`) and the fpp literal —
    * replaying BloomFilter.create's optimal formulas (truncating cast,
    * Math.round-compatible rounding, BitArray word padding). */
  def geometryCte(countSrc: String, fpp: Double): String =
    s"""geo AS (
       |  SELECT n,
       |    CAST(trunc(-n * ln($fpp) / (ln(2) * ln(2))) AS BIGINT) AS num_bits,
       |    greatest(1, CAST(round(
       |      CAST(trunc(-n * ln($fpp) / (ln(2) * ln(2))) AS BIGINT)
       |      / greatest(n, 1) * ln(2)) AS BIGINT)) AS k,
       |    greatest(64, ((CAST(trunc(-n * ln($fpp) / (ln(2) * ln(2))) AS BIGINT) + 63) // 64) * 64)
       |      AS bit_size
       |  FROM ($countSrc))""".stripMargin

  /** Position relation `pos(hs, p)`: the DISTINCT bit positions of every
    * hashed item under the geometry — requires `mmh` and `geo` CTEs. */
  val positionsCte: String =
    """iv AS (SELECT unnest(range(1, k + 1)) AS i FROM geo),
      |pos AS (
      |  SELECT DISTINCT mmh.hs,
      |    CASE WHEN mmh.hi * 2147483647 + iv.i * mmh.lo < 0
      |         THEN (-(mmh.hi * 2147483647 + iv.i * mmh.lo) - 1) % geo.bit_size
      |         ELSE (mmh.hi * 2147483647 + iv.i * mmh.lo) % geo.bit_size
      |    END AS p
      |  FROM mmh, iv, geo)""".stripMargin
}
