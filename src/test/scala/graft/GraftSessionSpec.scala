package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Library bootstrap: function registration across packs, and the
  * salting utilities' exactness.
  */
class GraftSessionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("registerAll exposes every pack's functions to SQL") {
    GraftSession.registerAll(spark)
    val r = spark.sql(
      """SELECT crc16_ccitt(CAST('123456789' AS BINARY)) AS a,
        |       simhash64(array('x','y')) AS b,
        |       dot_f32(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS c,
        |       lang_id('the cat and the dog') AS d
        |""".stripMargin).head()
    assert(r.getInt(0) === 0x29B1)
    assert(r.getDouble(2) === 11.0)
    assert(r.getString(3) === "en")
  }

  test("GraftExtensions injects functions at session build time") {
    val active = SparkSession.getActiveSession
    try {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val crc = s2.sql("SELECT crc16_ccitt(CAST('123456789' AS BINARY)) AS c")
        .head().getInt(0)
      assert(crc === 0x29B1)
    } finally {
      active.foreach { s =>
        SparkSession.setActiveSession(s); SparkSession.setDefaultSession(s)
      }
    }
  }

  test("typed OrderedConcat aggregator equals the window-sorted string agg (DQ20)") {
    import spark.implicits._
    val agg = new graft.functions.OrderedConcat(",").toColumn
    val typedResult = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select($"l_orderkey", $"l_linenumber".cast("int"), $"l_returnflag")
      .as[(Long, Int, String)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("flags"))
      .collect().toMap
    val dq20 = queries.RelationalPack.dq20(spark, "/root/testdata/sf0.001")
      .as[(Long, String)].collect().toMap
    dq20.foreach { case (k, v) => assert(typedResult(k) === v, s"order $k") }
  }

  test("multi-probe LSH top-k recall >= single-probe recall") {
    import spark.implicits._
    import graft.operators.Similarity
    val brute = Similarity.bruteForceTopK(spark, "/root/testdata/sf0.001")
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val single = Similarity.lshTopK(spark, "/root/testdata/sf0.001")
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val multi = Similarity.lshTopK(spark, "/root/testdata/sf0.001", multiProbe = true)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val rs = (brute intersect single).size.toDouble / brute.size
    val rm = (brute intersect multi).size.toDouble / brute.size
    assert(rm >= rs, s"multi-probe recall $rm < single $rs")
  }

  test("salted aggregation equals plain aggregation") {
    import spark.implicits._
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    val plain = df.groupBy($"user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val salted = Skew.saltedAgg(df, $"user_id", $"event_id", 8)(
      Seq(count(lit(1)).as("pn")), Seq(sum($"pn").as("n")))
      .as[(Long, Long)].collect().toMap
    assert(salted === plain)
  }

  test("approx_count_distinct tracks exact distinct within rsd") {
    import spark.implicits._
    val df = Tables.orders(spark, "/root/testdata/sf0.01")
    val exact = df.select(countDistinct($"o_custkey")).head().getLong(0)
    val approx = df.select(approx_count_distinct($"o_custkey", 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx $approx vs exact $exact")
  }

  test("salted join equals plain join") {
    import spark.implicits._
    val left = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", ($"user_id" % 25).cast("int").as("n_nationkey"))
    val right = Tables.nation(spark, "/root/testdata/sf0.001")
    val plain = left.join(right, Seq("n_nationkey"))
      .select($"event_id", $"n_name").as[(Long, String)].collect().toSet
    val salted = Skew.saltedJoin(left, right, "n_nationkey", 8)
      .select($"event_id", $"n_name").as[(Long, String)].collect().toSet
    assert(salted === plain)
  }
}
