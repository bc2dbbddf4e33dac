package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exemplar typed UDAF (SURVEY.md §2.2 UDAF row): arg-max — the key whose
  * value is greatest, ties broken toward the smaller key (deterministic,
  * unlike most engines' arg_max). Buffer is (key, value, seen).
  *
  * Merge is associative+commutative, so Catalyst runs it partial+final —
  * the same two-phase shape as built-in aggregates, no shuffle penalty
  * versus a built-in.
  */
object ArgMaxAggregator
    extends Aggregator[(Long, Double), (Long, Double, Boolean), Long] {

  override def zero: (Long, Double, Boolean) = (0L, Double.NegativeInfinity, false)

  private def better(cur: (Long, Double, Boolean), k: Long, v: Double): Boolean =
    !cur._3 || v > cur._2 || (v == cur._2 && k < cur._1)

  override def reduce(b: (Long, Double, Boolean), in: (Long, Double)): (Long, Double, Boolean) =
    if (better(b, in._1, in._2)) (in._1, in._2, true) else b

  override def merge(a: (Long, Double, Boolean), b: (Long, Double, Boolean)): (Long, Double, Boolean) =
    if (!b._3) a else if (better(a, b._1, b._2)) (b._1, b._2, true) else a

  override def finish(r: (Long, Double, Boolean)): Long = r._1

  override def bufferEncoder: Encoder[(Long, Double, Boolean)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaBoolean)
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
