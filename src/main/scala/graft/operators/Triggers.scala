package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trigger scheduling operators (SURVEY §2.9): the delayed-callback
  * and fork-per-trigger semantics of the reference's trigger listener,
  * re-expressed as declarative/parallel engine operations.
  */
object Triggers {

  /** Deterministic variance in [-bound, +bound] from the record id —
    * the analyzable stand-in for the reference's random
    * `CalcVariance(&variance, 30)` (`server/trigger_listen.c:88`),
    * same contract as the repo's jitter treatment (SURVEY §2.11:
    * bounds checked, randomness excluded from oracles).
    */
  def variance(id: Column, bound: Int = 30): Column =
    (id % (2 * bound + 1)) - bound

  /** Scheduled-action computation (`server/trigger_listen.c:79-98`
    * `TriggerDelay`): calc_delay = delay + variance, clamped to a
    * 1-second minimum (`MAX(1, calc_delay)`), fired at
    * trigger-time + calc_delay. `fire_order` ranks the resulting
    * schedule per implant — partitioned, so the schedule never
    * funnels through one task.
    */
  def scheduleActions(df: DataFrame, idCol: String, implantCol: String,
      tsCol: String, delayCol: String, bound: Int = 30): DataFrame = {
    val w = Window.partitionBy(implantCol).orderBy("action_us", idCol)
    df.withColumn("variance", variance(col(idCol), bound))
      .withColumn("calc_delay", greatest(lit(1L), col(delayCol) + col("variance")))
      .withColumn("action_us",
        unix_micros(col(tsCol)) + col("calc_delay") * 1000000L)
      .withColumn("fire_order", row_number().over(w))
  }

  final case class CallbackResult(trigger_id: Long, status: String, bytes_sent: Long)

  /** Fork-per-trigger (`server/trigger_listen.c:243-253`): each
    * accepted trigger MESSAGE forks its own callback — a typed map,
    * one invocation per row, so duplicate trigger ids fork duplicate
    * callbacks exactly as the reference does (no silent per-id
    * collapse). A callback that fails yields a `fork_failed` row and
    * the rest of the batch proceeds, mirroring the reference's
    * "if the fork fails ... continue" contract.
    */
  def forkPerTrigger(spark: SparkSession, triggers: DataFrame, idCol: String,
      callback: Long => CallbackResult): Dataset[CallbackResult] = {
    import spark.implicits._
    triggers.select(col(idCol).cast("long")).as[Long]
      .map { id =>
        try callback(id)
        catch { case _: Exception => CallbackResult(id, "fork_failed", 0L) }
      }
  }
}
