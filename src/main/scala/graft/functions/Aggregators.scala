package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregators (the UDAF tier of the extension ladder —
  * used when a fold isn't expressible with built-in agg functions;
  * shmr's `reduce_by_key` with an arbitrary Python fn maps here when
  * the built-ins genuinely can't express it).
  *
  * State is a pair of exact integer sums, so the final division is
  * the only floating-point step — engine-portable and shuffle-order
  * independent (merge is commutative integer addition).
  */
object Aggregators {

  /** Weighted mean of `value` by `weight`, both integral. */
  class WeightedMean extends Aggregator[(Long, Long), (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(acc: (Long, Long), in: (Long, Long)): (Long, Long) =
      (acc._1 + in._1 * in._2, acc._2 + in._2)
    override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(acc: (Long, Long)): Double =
      if (acc._2 == 0L) Double.NaN else acc._1.toDouble / acc._2
    override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column-API handle: weighted_mean(value, weight). */
  val weightedMean: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new WeightedMean, Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
}
