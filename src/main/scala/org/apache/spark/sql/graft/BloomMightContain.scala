package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Column bridge to Spark's own runtime-filter probe expression
  * (`BloomFilterMightContain`, the engine's InjectRuntimeFilter machinery)
  * so a driver-built `util.sketch.BloomFilter` can gate a scan.
  *
  * Hash contract: the sketch must be BUILT over the same long values the
  * probe receives — build with `df.stat.bloomFilter` on an `xxhash64(x)`
  * column (putLong) and probe with `column(bytes, xxhash64(x))`
  * (mightContainLong); both sides then apply the sketch's internal
  * Murmur3 to the same long. Serialization is the shared
  * BloomFilterImpl.writeTo/readFrom format.
  */
object BloomMightContain {
  def column(bloomBytes: Array[Byte], hashedValue: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      ExpressionUtils.expression(hashedValue)))
}
