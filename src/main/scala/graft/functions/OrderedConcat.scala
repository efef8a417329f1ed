package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` for order-stable string
  * concatenation — the grow-and-concat accumulator of the reference
  * (`process_list.c:112-152`) as a first-class Spark aggregation
  * (SURVEY §4.2's "ordered string_agg" custom item).
  *
  * Input is (sortKey, value); the buffer accumulates unordered (merge
  * is commutative, so partial aggregation across partitions stays
  * correct) and the finishing step sorts once — deterministic for
  * unique (sortKey, value) pairs regardless of partitioning.
  */
class OrderedConcat(sep: String)
    extends Aggregator[(Int, String), List[(Int, String)], String] {

  override def zero: List[(Int, String)] = Nil

  override def reduce(buf: List[(Int, String)], in: (Int, String)): List[(Int, String)] =
    in :: buf

  override def merge(a: List[(Int, String)], b: List[(Int, String)]): List[(Int, String)] =
    a ::: b

  override def finish(buf: List[(Int, String)]): String =
    buf.sorted.map(_._2).mkString(sep)

  override def bufferEncoder: Encoder[List[(Int, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Int, String)]]()

  override def outputEncoder: Encoder[String] = Encoders.STRING
}
