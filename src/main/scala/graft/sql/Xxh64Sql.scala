package graft.sql

/** DuckDB-SQL generator for Spark's `xxhash64` (XXH64, seed 42) over UTF-8
  * strings — the piece that made the seeded-MinHash queries (q34, q106)
  * "rows-only by design" for seven rounds. The oracle replays the EXACT
  * production hash: standard XXH64 (validated bit-for-bit against
  * `org.apache.spark.sql.functions.xxhash64` by tools/xxh64_ref.py over
  * 80+ vectors incl. non-ASCII), then the fixed-seed affine MinHash
  * permutations, banding, and estimates — all as one SELECT of chained
  * CTEs (the driver's oracle runner executes a single statement; no
  * macros available).
  *
  * Arithmetic discipline: all 64-bit state is UBIGINT; x*y mod 2^64 runs
  * in HUGEINT via a 32-bit split (a full 64x64 product can reach 2^128
  * and overflow HUGEINT); rotations are (x*2^r mod 2^64) | (x >> 64-r).
  * Every sequential hash step gets its own CTE level so expressions stay
  * linear in size (naive inlining is exponential: each mul/rot references
  * its argument twice).
  *
  * Scope: tokens < 32 bytes (no 4-lane stripe loop). Longer input hits an
  * explicit `error()` so the oracle fails LOUDLY instead of silently
  * diverging; the fixture vocabulary max is 8 bytes and whitespace-split
  * natural-language tokens stay far under 32. The Spark side
  * (Dedup.minhashSignatures) is fully general regardless.
  */
object Xxh64Sql {
  private val H = "18446744073709551616" // 2^64
  private val C32 = "4294967296" // 2^32
  private val P1 = "11400714785074694791" // 0x9E3779B185EBCA87
  private val P2 = "14029467366897019727" // 0xC2B2AE3D27D4EB4F
  private val P3 = "1609587929392839161" // 0x165667B19E3779F9
  private val P4 = "9650029242287828579" // 0x85EBCA77C2B2AE63
  private val P5 = "2870177450012600261" // 0x27D4EB2F165667C5
  private val SeedP5 = "2870177450012600303" // 42 + P5

  private def hug(x: String) = s"CAST($x AS HUGEINT)"
  private def u64(x: String) = s"CAST($x AS UBIGINT)"
  private def add(a: String, b: String) =
    u64(s"((${hug(a)} + ${hug(b)}) % $H)")
  /** a*b mod 2^64 with a split on a's high/low 32 bits. */
  private def mul(a: String, b: String) =
    u64(s"(((${hug(a)} % $C32) * ${hug(b)} + (${hug(a)} // $C32 * ${hug(b)} % $C32) * $C32) % $H)")
  private def xor(a: String, b: String) = s"xor($a, $b)"
  private def shr(x: String, r: Int) = s"($x >> $r)"
  private def rot(x: String, r: Int) =
    s"(${u64(s"((${hug(x)} * ${1L << r}) % $H)")} | ($x >> ${64 - r}))"

  /** CTE chain mapping a vocabulary of tokens to
    * `xxh(t, ux, hs, h0)` — the unsigned/signed Spark `xxhash64(t)` and
    * h0 = pmod(hash, 2^31-1), the exact values Dedup's seeded operators
    * compute per distinct token.
    * `vocabSrc` must select a single column `t` (the distinct tokens).
    *
    * Covers n < 64 bytes: the short path (n < 32) plus ONE 4-lane stripe
    * round (32 ≤ n < 64 — 4-word shingles reach 33+ bytes). The
    * continuation words after the stripe reuse the short path's step
    * structure at base offset (n//32)*32; the 4-byte and tail-byte
    * offsets are base-independent ((n//8)*8 and n − n%4). n ≥ 64 hits
    * the error() tripwire — a second stripe round would need the loop.
    */
  def tokenHashCtes(vocabSrc: String): String = {
    // little-endian 64-bit word from bytes at FIXED 0-based offset o
    def word(o: Int): String = u64("(" +
      (0 until 8).map(j => s"${hug(s"bys[${o + j + 1}]")} * ${java.math.BigInteger.valueOf(256L).pow(j)}")
        .mkString(" + ") + ")")
    // little-endian 64-bit word at base-relative offset 8k (base = (n//32)*32)
    def wordAt(k: Int): String = u64("(" +
      (0 until 8).map(j => s"${hug(s"bys[(n//32)*32 + ${8 * k + j + 1}]")} * ${java.math.BigInteger.valueOf(256L).pow(j)}")
        .mkString(" + ") + ")")
    // little-endian 32-bit word at the post-words offset (n//8)*8
    val i4 = "(" + (0 until 4)
      .map(j => s"bys[(n//8)*8 + ${j + 1}] * ${1L << (8 * j)}")
      .mkString(" + ") + ")"
    val wordStep = (h: String, g: String) => // h ^= rnd(0,w); h=rot27*P1+P4 (g = P1*rot31(P2*w))
      add(mul(rot(xor(h, g), 27), P1), P4)
    // XXH64 accumulator seeds for seed=42 as 2^64 residues
    val M = java.math.BigInteger.ONE.shiftLeft(64)
    def c(v: java.math.BigInteger) = v.mod(M).toString
    val bi = (s: String) => new java.math.BigInteger(s)
    val v1c = c(bi("42").add(bi(P1)).add(bi(P2)))
    val v2c = c(bi("42").add(bi(P2)))
    val v3c = "42"
    val v4c = c(bi("42").subtract(bi(P1)))
    // stripe round: acc' = P1 * rot31(acc + w*P2)
    def strRound(accConst: String, w: String) =
      mul(rot(add(accConst, mul(w, P2)), 31), P1)
    // merge round: h' = (h XOR (P1*rot31(P2*v))) * P1 + P4
    def mergeRound(h: String, g: String) =
      add(mul(xor(h, g), P1), P4)
    s"""xxv AS ($vocabSrc),
       |xx0 AS (
       |  SELECT t, octet_length(encode(t)) AS n, hex(encode(t)) AS hx FROM xxv),
       |xx1 AS (
       |  SELECT t, CASE WHEN n >= 64
       |      THEN error('xxh64 oracle bound: token >= 64 bytes') ELSE n END AS n,
       |    [ (strpos('0123456789ABCDEF', substr(hx, 2*i+1, 1))-1)*16
       |      + (strpos('0123456789ABCDEF', substr(hx, 2*i+2, 1))-1)
       |      FOR i IN range(0, octet_length(encode(t))) ] AS bys
       |  FROM xx0),
       |xx2 AS (
       |  SELECT t, n,
       |    CASE WHEN n >= (n//32)*32 + 8  THEN ${wordAt(0)} ELSE 0::UBIGINT END AS w0,
       |    CASE WHEN n >= (n//32)*32 + 16 THEN ${wordAt(1)} ELSE 0::UBIGINT END AS w1,
       |    CASE WHEN n >= (n//32)*32 + 24 THEN ${wordAt(2)} ELSE 0::UBIGINT END AS w2,
       |    CASE WHEN n >= 32 THEN ${word(0)} ELSE 0::UBIGINT END AS s0,
       |    CASE WHEN n >= 32 THEN ${word(8)} ELSE 0::UBIGINT END AS s1,
       |    CASE WHEN n >= 32 THEN ${word(16)} ELSE 0::UBIGINT END AS s2,
       |    CASE WHEN n >= 32 THEN ${word(24)} ELSE 0::UBIGINT END AS s3,
       |    CASE WHEN n % 8 >= 4 THEN ${u64(i4)} ELSE 0::UBIGINT END AS i4,
       |    CASE WHEN n % 4 > 0 THEN CAST(bys[n - n % 4 + 1] AS UBIGINT) ELSE 0::UBIGINT END AS tb0,
       |    CASE WHEN n % 4 > 1 THEN CAST(bys[n - n % 4 + 2] AS UBIGINT) ELSE 0::UBIGINT END AS tb1,
       |    CASE WHEN n % 4 > 2 THEN CAST(bys[n - n % 4 + 3] AS UBIGINT) ELSE 0::UBIGINT END AS tb2
       |  FROM xx1),
       |xxS1 AS (
       |  SELECT t, n, w0, w1, w2, i4, tb0, tb1, tb2,
       |    ${strRound(s"$v1c::UBIGINT", "s0")} AS va1,
       |    ${strRound(s"$v2c::UBIGINT", "s1")} AS va2,
       |    ${strRound(s"$v3c::UBIGINT", "s2")} AS va3,
       |    ${strRound(s"$v4c::UBIGINT", "s3")} AS va4
       |  FROM xx2),
       |xxS2 AS (
       |  SELECT t, n, w0, w1, w2, i4, tb0, tb1, tb2,
       |    ${add(add(rot("va1", 1), rot("va2", 7)), add(rot("va3", 12), rot("va4", 18)))} AS hm0,
       |    ${mul(rot(mul("va1", P2), 31), P1)} AS gm1,
       |    ${mul(rot(mul("va2", P2), 31), P1)} AS gm2,
       |    ${mul(rot(mul("va3", P2), 31), P1)} AS gm3,
       |    ${mul(rot(mul("va4", P2), 31), P1)} AS gm4
       |  FROM xxS1),
       |xxS3 AS (SELECT *, ${mergeRound("hm0", "gm1")} AS hm1 FROM xxS2),
       |xxS4 AS (SELECT *, ${mergeRound("hm1", "gm2")} AS hm2 FROM xxS3),
       |xxS5 AS (SELECT *, ${mergeRound("hm2", "gm3")} AS hm3 FROM xxS4),
       |xxS6 AS (SELECT *, ${mergeRound("hm3", "gm4")} AS hm4 FROM xxS5),
       |xx3 AS (
       |  SELECT t, n, w0, w1, w2, i4, tb0, tb1, tb2,
       |    ${mul(rot(mul("w0", P2), 31), P1)} AS g0,
       |    ${mul(rot(mul("w1", P2), 31), P1)} AS g1,
       |    ${mul(rot(mul("w2", P2), 31), P1)} AS g2,
       |    CASE WHEN n >= 32 THEN ${add("hm4", "n")}
       |         ELSE ${u64(s"(($SeedP5 + n) % $H)")} END AS ha
       |  FROM xxS6),
       |xx4 AS (SELECT *, CASE WHEN n >= (n//32)*32 + 8  THEN ${wordStep("ha", "g0")} ELSE ha END AS h1 FROM xx3),
       |xx5 AS (SELECT *, CASE WHEN n >= (n//32)*32 + 16 THEN ${wordStep("h1", "g1")} ELSE h1 END AS h2 FROM xx4),
       |xx6 AS (SELECT *, CASE WHEN n >= (n//32)*32 + 24 THEN ${wordStep("h2", "g2")} ELSE h2 END AS h3 FROM xx5),
       |xx7 AS (SELECT *, CASE WHEN n % 8 >= 4
       |    THEN ${add(mul(rot(xor("h3", mul("i4", P1)), 23), P2), P3)} ELSE h3 END AS h4 FROM xx6),
       |xx8 AS (SELECT *, CASE WHEN n % 4 > 0
       |    THEN ${mul(rot(xor("h4", mul("tb0", P5)), 11), P1)} ELSE h4 END AS h5 FROM xx7),
       |xx9 AS (SELECT *, CASE WHEN n % 4 > 1
       |    THEN ${mul(rot(xor("h5", mul("tb1", P5)), 11), P1)} ELSE h5 END AS h6 FROM xx8),
       |xxA AS (SELECT *, CASE WHEN n % 4 > 2
       |    THEN ${mul(rot(xor("h6", mul("tb2", P5)), 11), P1)} ELSE h6 END AS h7 FROM xx9),
       |xxB AS (SELECT t, ${mul(xor("h7", shr("h7", 33)), P2)} AS a2 FROM xxA),
       |xxC AS (SELECT t, ${mul(xor("a2", shr("a2", 29)), P3)} AS a4 FROM xxB),
       |xxD AS (SELECT t, ${xor("a4", shr("a4", 32))} AS ux FROM xxC),
       |xxh AS (
       |  SELECT t, ux,
       |    CAST(CASE WHEN ux >= 9223372036854775808
       |      THEN ${hug("ux")} - $H ELSE ${hug("ux")} END AS BIGINT) AS hs,
       |    CAST(((CASE WHEN ux >= 9223372036854775808
       |      THEN ${hug("ux")} - $H ELSE ${hug("ux")} END
       |      % 2147483647 + 2147483647) % 2147483647) AS BIGINT) AS h0
       |  FROM xxD)""".stripMargin
  }

  /** CTE chain computing Spark's `xxhash64` over a single BIGINT column
    * (the XXH64.hashLong path, seed 42): h = seed+P5+8, one 8-byte round
    * over the value's little-endian word (= the unsigned value itself),
    * avalanche. `srcSql` must select one BIGINT column `k`; the chain
    * ends in `xlh(k, hs)` with hs = the signed Spark hash. Same staging
    * discipline as tokenHashCtes (inlining is exponential). */
  def longHashCtes(srcSql: String): String = {
    val S0 = "2870177450012600311" // 42 + P5 + 8
    val u = u64(s"(CASE WHEN k < 0 THEN ${hug("k")} + $H ELSE ${hug("k")} END)")
    s"""xl0 AS (SELECT k, $u AS u FROM ($srcSql)),
       |xl1 AS (SELECT k, ${mul(rot(mul("u", P2), 31), P1)} AS r FROM xl0),
       |xl2 AS (SELECT k, ${add(mul(rot(xor(s"CAST($S0 AS UBIGINT)", "r"), 27), P1), P4)} AS h FROM xl1),
       |xl3 AS (SELECT k, ${mul(xor("h", shr("h", 33)), P2)} AS a2 FROM xl2),
       |xl4 AS (SELECT k, ${mul(xor("a2", shr("a2", 29)), P3)} AS a4 FROM xl3),
       |xl5 AS (SELECT k, ${xor("a4", shr("a4", 32))} AS ux FROM xl4),
       |xlh AS (
       |  SELECT k, CAST(CASE WHEN ux >= 9223372036854775808
       |    THEN ${hug("ux")} - $H ELSE ${hug("ux")} END AS BIGINT) AS hs
       |  FROM xl5)""".stripMargin
  }

  /** Per-doc 64-permutation MinHash signature CTE `xsigs(doc_id, m0..m63)`
    * over `docSrc` (must select doc_id, text), replaying
    * Dedup.minhashSignatures with the production coefficients. */
  def minhashSigsCtes(docSrc: String, coeffs: Array[(Long, Long)],
      prime: Long): String = {
    val mins = coeffs.zipWithIndex.map { case ((a, b), i) =>
      s"min((h0 * $a + $b) % $prime) AS m$i"
    }.mkString(",\n    ")
    s"""${tokenHashCtes(
        s"SELECT DISTINCT unnest(regexp_extract_all(text, '\\S+')) AS t FROM ($docSrc)")},
       |xdt AS (
       |  SELECT DISTINCT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t
       |  FROM ($docSrc)),
       |xdh AS (SELECT xdt.doc_id, xxh.h0 FROM xdt JOIN xxh USING (t)),
       |xsigs AS (
       |  SELECT doc_id,
       |    $mins
       |  FROM xdh GROUP BY doc_id)""".stripMargin
  }

  /** Band-match predicate between sig aliases x and y: true iff some band
    * of `rows` consecutive permutations matches exactly (the LSH bucket
    * join on xxhash64 band keys, replayed as tuple equality — identical
    * modulo 64-bit hash collisions, which the estimate check would
    * surface). */
  def bandMatch(x: String, y: String, numHashes: Int, rows: Int): String =
    (0 until numHashes / rows).map { b =>
      (0 until rows).map(j => s"$x.m${b * rows + j} = $y.m${b * rows + j}")
        .mkString("(", " AND ", ")")
    }.mkString("(", "\n     OR ", ")")

  /** Signature-agreement estimate (k matching permutations / n). */
  def estExpr(x: String, y: String, numHashes: Int): String =
    "(" + (0 until numHashes).map(i => s"($x.m$i = $y.m$i)::INT")
      .mkString(" + ") + s") / $numHashes.0"
}
