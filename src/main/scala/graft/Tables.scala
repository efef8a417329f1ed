package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table registry over the driver-generated parquet test data
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md §1).
  *
  * All loaders return plain DataFrames so Catalyst sees the raw parquet
  * scan and can push filters / prune columns into it. Nothing is cached
  * here — the query packs decide caching policy.
  */
object Tables {

  /** Names of the driver tables, in a stable order. */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def region(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(path(dir, "region"))
  def nation(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(path(dir, "nation"))
  def customer(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(path(dir, "customer"))
  def supplier(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(path(dir, "supplier"))
  def part(spark: SparkSession, dir: String): DataFrame      = spark.read.parquet(path(dir, "part"))
  def orders(spark: SparkSession, dir: String): DataFrame    = spark.read.parquet(path(dir, "orders"))
  def lineitem(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(path(dir, "lineitem"))
  def documents(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "documents"))
  def embeddings(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "embeddings"))

  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    * reader rejects. We read it as a raw nanosecond BIGINT
    * (`spark.sql.legacy.parquet.nanosAsLong`) and derive a
    * microsecond-precision timestamp by integer division — exactly the
    * truncation DuckDB applies when it narrows ns to its TIMESTAMP type,
    * so both engines see identical values.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // GraftSession sets the legacy flag at build; on a foreign session
    // scope it to this read (schema inference captures it eagerly at
    // read.parquet(), so restoring right after doesn't affect this
    // DataFrame). The toggle mutates shared session conf, so it's
    // serialized per session — two threads interleaving set/restore
    // could otherwise strand the flag off mid-read.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    def read() = spark.read.parquet(path(dir, "events"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    if (spark.conf.getOption(key).contains("true")) read()
    else spark.synchronized {
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try read()
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** Register every table as a temp view (`spark.sql` convenience). */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    region(spark, dir).createOrReplaceTempView("region")
    nation(spark, dir).createOrReplaceTempView("nation")
    customer(spark, dir).createOrReplaceTempView("customer")
    supplier(spark, dir).createOrReplaceTempView("supplier")
    part(spark, dir).createOrReplaceTempView("part")
    orders(spark, dir).createOrReplaceTempView("orders")
    lineitem(spark, dir).createOrReplaceTempView("lineitem")
    events(spark, dir).createOrReplaceTempView("events")
    documents(spark, dir).createOrReplaceTempView("documents")
    embeddings(spark, dir).createOrReplaceTempView("embeddings")
  }
}
