package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-ful RSI document extraction: the reference's RSI writer
  * emits a repeated `extraData` element per survey blob
  * (`honeycomb/honeycomb.py:360-377`) which `processRSI.py:54-117`
  * re-parses positionally. The engine's structured path is `from_xml`
  * with an explicit schema — repeated elements land as an array, and
  * binding is by name, so reordered or partially-missing documents
  * still extract correctly.
  */
class RsiXmlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val rsiSchema = StructType(Seq(
    StructField("header", StructType(Seq(
      StructField("ID", LongType),
      StructField("byteCount", LongType)))),
    StructField("beacon", StructType(Seq(
      StructField("deviceStats", StringType),
      StructField("extraData", ArrayType(StringType)))))))

  private def parse(docs: Seq[String]) = {
    import spark.implicits._
    docs.toDF("doc")
      .select(from_xml(col("doc"), rsiSchema).as("r"))
      .select(
        col("r.header.ID").as("rid"),
        col("r.header.byteCount").as("bytes"),
        col("r.beacon.deviceStats").as("stats"),
        col("r.beacon.extraData").as("extra"))
  }

  test("repeated extraData elements collect into an array, in document order") {
    val doc =
      """<ToolHandlerFile><header><ID>7</ID><byteCount>42</byteCount></header>
        |<beacon><deviceStats>ok</deviceStats>
        |<extraData>proc-list</extraData>
        |<extraData>ipconfig</extraData>
        |<extraData>netstat-rn</extraData>
        |</beacon></ToolHandlerFile>""".stripMargin
    val r = parse(Seq(doc)).head()
    assert(r.getLong(0) === 7L)
    assert(r.getLong(1) === 42L)
    assert(r.getString(2) === "ok")
    assert(r.getSeq[String](3) === Seq("proc-list", "ipconfig", "netstat-rn"))
  }

  test("reordered elements bind by name; absent ones are null, not shifted") {
    val reordered =
      """<ToolHandlerFile><beacon><extraData>x</extraData>
        |<deviceStats>late-stats</deviceStats></beacon>
        |<header><byteCount>9</byteCount><ID>3</ID></header></ToolHandlerFile>""".stripMargin
    val missing =
      """<ToolHandlerFile><header><ID>4</ID></header>
        |<beacon><deviceStats>bare</deviceStats></beacon></ToolHandlerFile>""".stripMargin
    val rows = parse(Seq(reordered, missing)).orderBy("rid").collect()
    assert(rows(0).getLong(0) === 3L)
    assert(rows(0).getLong(1) === 9L)
    assert(rows(0).getString(2) === "late-stats")
    assert(rows(0).getSeq[String](3) === Seq("x"))
    assert(rows(1).getLong(0) === 4L)
    assert(rows(1).isNullAt(1))
    assert(rows(1).getString(2) === "bare")
    assert(rows(1).isNullAt(3))
  }

  test("one repeated element still parses as a one-element array") {
    val doc =
      "<ToolHandlerFile><header><ID>1</ID><byteCount>2</byteCount></header>" +
        "<beacon><deviceStats>s</deviceStats><extraData>only</extraData></beacon></ToolHandlerFile>"
    assert(parse(Seq(doc)).head().getSeq[String](3) === Seq("only"))
  }
}
