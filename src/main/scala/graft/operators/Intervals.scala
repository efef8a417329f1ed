package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Interval (range-containment) join — "which events fall inside
  * which maintenance windows" — as a BINNED equi join, the shape
  * that survives 100 TB. The naive formulation is a non-equi join
  * on half-open containment (`ev.ts >= iv.start AND ev.ts < iv.end`
  * — an event exactly at `end` belongs to the NEXT window, the
  * standard windowing convention; both this implementation and the
  * DuckDB oracle use it), which Spark can only plan
  * as a broadcast nested loop: every event row against every
  * interval. Binning makes it an equi join: each interval explodes
  * to its covering fixed-width time bins (`ceil(width / bin) + 1`
  * rows — bounded duplication, chosen so bin ≥ typical width keeps
  * it ≤ 2), each event keys by the ONE bin containing its timestamp,
  * and the join runs on the bin key with the exact containment
  * predicate as a residual filter. An (event, interval) pair can
  * only meet in the event's own bin, so the output needs no
  * dedup — the binned plan is EXACTLY the naive join's result, and
  * the oracle checks it with the naive formulation.
  *
  * Timestamps surface as epoch micros end to end (the repo's
  * timestamp discipline — DuckDB truncates ns to µs on read, so µs
  * integers are the cross-engine common precision).
  */
object Intervals {

  /** Maintenance windows derived from the events table: every 5th
    * error event spawns a window starting at its timestamp, 10–25
    * minutes wide (width keyed by event id — deterministic, and the
    * 4 distinct widths exercise the bin-explode arithmetic beyond
    * the single-bin case).
    */
  def maintenanceWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "error" && col("event_id") % 5 === 0)
      .select(col("event_id").as("interval_id"),
        unix_micros(col("ts")).as("start_us"),
        (unix_micros(col("ts"))
          + (lit(10) + col("event_id") % 4 * 5) * 60L * 1000000L).as("end_us"))

  /** All (event, containing-window) pairs with the event's lag into
    * the window — the binned containment join over
    * [[maintenanceWindows]]. `binMinutes` trades interval-side
    * duplication (ceil(width/bin) + 1 rows per interval) against
    * bin-key selectivity; correctness is bin-size-invariant
    * (spec-pinned), only the constant factor moves.
    */
  def intervalJoin(spark: SparkSession, dir: String,
      binMinutes: Int = 30): DataFrame = {
    require(binMinutes > 0, s"bin width must be positive: $binMinutes")
    val binUs = binMinutes * 60L * 1000000L
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("bin", expr(s"tus div $binUs"))
    val ivb = maintenanceWindows(spark, dir)
      .select(col("interval_id"), col("start_us"), col("end_us"),
        explode(sequence(expr(s"start_us div $binUs"),
          expr(s"(end_us - 1) div $binUs"))).as("bin"))
    ev.join(ivb, Seq("bin"))
      .filter(col("tus") >= col("start_us") && col("tus") < col("end_us"))
      .select(col("event_id"), col("interval_id"),
        (col("tus") - col("start_us")).as("lag_us"))
      .orderBy("event_id", "interval_id")
  }
}
