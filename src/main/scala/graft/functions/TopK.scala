package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a typed `Aggregator` — the scale-true
  * replacement for `row_number() OVER (PARTITION BY g ORDER BY …)`
  * + `rank <= k` when the group cardinality is SMALL and the input
  * per group is HUGE (the ANN candidate cut: 8 queries × the whole
  * corpus). The window shape sorts and shuffles every input row into
  * k partitions; this aggregate keeps a ≤ 2k-element buffer per
  * partition (trim on overflow, amortized O(log) per row) and ships
  * AT MOST 2k rows per (partition, group) through the exchange —
  * partial aggregation does the candidate cut map-side.
  *
  * Selection is by ascending `(key, id)` — identical to
  * `ORDER BY key, id` with `row_number <= k`, so swapping the window
  * for this aggregate changes NO result (ties are totally ordered by
  * id; the spec pins the equality). Merge is commutative and
  * associative; finish sorts the final ≤ 2k survivors once.
  */
class BoundedMinTopK(k: Int)
    extends Aggregator[(Int, Long), List[(Int, Long)], Seq[(Int, Long)]] {
  require(k > 0, s"top-k needs k > 0: $k")

  private def trim(l: List[(Int, Long)]): List[(Int, Long)] =
    if (l.lengthCompare(k) <= 0) l else l.sorted.take(k)

  override def zero: List[(Int, Long)] = Nil

  override def reduce(buf: List[(Int, Long)], in: (Int, Long)): List[(Int, Long)] = {
    val l = in :: buf
    if (l.lengthCompare(2 * k) >= 0) trim(l) else l
  }

  override def merge(a: List[(Int, Long)], b: List[(Int, Long)]): List[(Int, Long)] =
    trim(a ::: b)

  override def finish(buf: List[(Int, Long)]): Seq[(Int, Long)] =
    trim(buf).sorted

  override def bufferEncoder: Encoder[List[(Int, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Int, Long)]]()

  override def outputEncoder: Encoder[Seq[(Int, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Int, Long)]]()
}
