package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom bit-array buffer; top-level for the product encoder. */
case class BloomBuf(words: Array[Long])

/** Bloom-filter join pruning (SURVEY.md §2.8): build a bit-array
  * sketch of the (smaller) build side's join keys, broadcast it, and
  * drop probe rows that cannot match BEFORE the exact join. False
  * positives only mean a little extra exact-join work — the final
  * result stays exact — while true negatives never enter the
  * shuffle. At 100 TB a selective dimension predicate turns into a
  * fact-scan-side row filter this way (the same idea as Spark's
  * runtime row-level filtering, here as an explicit operator).
  *
  * The aggregator and [[mightContain]] share one double-hashing
  * scheme over a PRE-HASHED long input (feed `xxhash64(key)` — the
  * per-row hash stays codegen'd):
  *   h2 = (h1 >>> 17) | 1   (odd → cycles through all bit positions)
  *   bit_i = (h1 + i·h2) mod numBits, i in [0, k)
  */
object BloomFilter {

  /** Bit-array builder: buffer is numBits/64 longs; merge is
    * element-wise OR — order-independent, map-side combinable. */
  class BloomAgg(numBits: Int, numHashes: Int) extends Aggregator[Long, BloomBuf, BloomBuf] {
    require(numBits % 64 == 0 && numBits > 0 && numHashes >= 1)

    override def zero: BloomBuf = BloomBuf(new Array[Long](numBits / 64))

    override def reduce(b: BloomBuf, h1: Long): BloomBuf = {
      val h2 = (h1 >>> 17) | 1L
      var i = 0
      while (i < numHashes) {
        val bit = java.lang.Math.floorMod(h1 + i * h2, numBits.toLong).toInt
        b.words(bit >> 6) |= (1L << (bit & 63))
        i += 1
      }
      b
    }

    override def merge(a: BloomBuf, b: BloomBuf): BloomBuf = {
      var i = 0
      while (i < a.words.length) { a.words(i) |= b.words(i); i += 1 }
      a
    }

    override def finish(b: BloomBuf): BloomBuf = b
    override def bufferEncoder: Encoder[BloomBuf] = Encoders.product[BloomBuf]
    override def outputEncoder: Encoder[BloomBuf] = Encoders.product[BloomBuf]
  }

  /** Driver-side membership probe over a raw bit-word array — the
    * ONE place the double-hashing scheme lives next to
    * [[BloomAgg.reduce]], so builders (bloomAgg) and probers
    * (warehouse key-Bloom sidecars) cannot drift: a silent scheme
    * mismatch would turn false-negatives into silently-empty lookups. */
  def mightContainWords(words: Array[Long], numBits: Int, numHashes: Int, h1: Long): Boolean = {
    val h2 = (h1 >>> 17) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(h1 + i * h2, numBits.toLong).toInt
      if ((words(bit >> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Column handle: struct(words: array<bigint>) of a pre-hashed
    * long key column (use `.getField("words")` for the bit array). */
  def bloomAgg(hashed: Column, numBits: Int = 1 << 20, numHashes: Int = 5): Column =
    udaf(new BloomAgg(numBits, numHashes), Encoders.scalaLong).apply(hashed)

  /** Membership probe mirroring [[BloomAgg]]'s bit scheme as pure
    * Column arithmetic (codegen'd; k small and fixed). */
  def mightContain(bloom: Column, hashed: Column, numBits: Int = 1 << 20, numHashes: Int = 5): Column = {
    val h2 = shiftrightunsigned(hashed, 17).bitwiseOR(lit(1L))
    (0 until numHashes).map { i =>
      val bit = pmod(hashed + lit(i.toLong) * h2, lit(numBits.toLong))
      val word = element_at(bloom, (bit / 64).cast("int") + 1)
      // functions.shiftleft only takes a literal shift; the SQL
      // function accepts a column shift amount
      word.bitwiseAND(call_function("shiftleft", lit(1L), pmod(bit, lit(64L)).cast("int"))) =!= 0L
    }.reduce(_ && _)
  }

  /** Exact semi join with Bloom pre-pruning: probe rows failing the
    * broadcast sketch never reach the exact join's shuffle. */
  def bloomSemiJoin(probe: DataFrame, probeKey: Column, build: DataFrame, buildKey: Column,
      numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    val bloom = build.agg(bloomAgg(xxhash64(buildKey), numBits, numHashes).as("__b"))
      .select(col("__b.words").as("__bloom"))
    val pruned = probe
      .crossJoin(broadcast(bloom))
      .filter(mightContain(col("__bloom"), xxhash64(probeKey), numBits, numHashes))
      .drop("__bloom")
    pruned.join(build.select(buildKey.as("__bk")).distinct(), probeKey === col("__bk"), "left_semi")
  }
}
