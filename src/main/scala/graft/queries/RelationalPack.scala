package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** The declared relational query pack (SURVEY.md §2.10, DQ1–DQ28).
  *
  * Every query is built with the DataFrame API (never SQL strings) so
  * Catalyst sees a declarative plan: filters/projections push into the
  * parquet scans, small dimension joins broadcast, and the whole plan
  * stays inside whole-stage codegen. Each query carries a total ORDER BY
  * ending in a unique key (SURVEY §2.11) so the DuckDB-oracle hash
  * compare is well-defined.
  *
  * Float discipline: any aggregated double surface is either summed as
  * DECIMAL(18,6) (exact, associative — immune to partial-aggregation
  * order) and only then rounded and cast back to DOUBLE, or rounded per
  * §2.11. This keeps Spark's partial/final agg byte-identical to
  * DuckDB's single-node sum.
  */
object RelationalPack {

  type Q = (SparkSession, String) => DataFrame

  /** Exact decimal view of a double expression, for order-independent sums. */
  private def dec(c: Column): Column = c.cast("decimal(18,6)")
  /** ROUND(x,2) → DOUBLE, the declared surface for float aggregates. */
  private def r2(c: Column): Column = round(c, 2).cast("double")

  // ---------------------------------------------------------------- DQ1
  /** Scan + filter + project (§2.1 /proc scans analog). */
  val dq01: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  // ---------------------------------------------------------------- DQ2
  /** Typed projection / struct-explode analog (§2.2 TLV decode). */
  val dq02: Q = (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("d"),
        col("o_orderpriority"))
      .orderBy("o_orderkey")

  // ---------------------------------------------------------------- DQ3
  /** Multi-predicate gate (§2.3 trigger length-bounds + validator). */
  val dq03: Q = (s, d) =>
    Tables.events(s, d)
      .filter(col("value").between(126, 472) &&
        col("user_id") % 127 === col("event_id") % 127)
      .select("event_id")
      .orderBy("event_id")

  // ---------------------------------------------------------------- DQ4
  /** Key-match semi-join (§2.4 trigger key gate). Broadcast the filtered
    * key set — at 100 TB the big side streams, the key side broadcasts.
    */
  val dq04Semi: Q = (s, d) => {
    val keys = Tables.orders(s, d)
      .filter(col("o_totalprice") > 100000).select(col("o_custkey"))
    Tables.customer(s, d)
      .join(keys, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey").orderBy("c_custkey")
  }

  /** Anti complement of DQ4. */
  val dq04Anti: Q = (s, d) => {
    val keys = Tables.orders(s, d)
      .filter(col("o_totalprice") > 100000).select(col("o_custkey"))
    Tables.customer(s, d)
      .join(keys, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey").orderBy("c_custkey")
  }

  // ---------------------------------------------------------------- DQ5
  /** Earliest-match per group (§2.3 DNS first-answer). Timestamp surfaced
    * as epoch micros so both engines hash the same integer.
    */
  val dq05: Q = (s, d) =>
    Tables.events(s, d)
      .filter(col("event_type") === "error")
      .groupBy("user_id")
      .agg(unix_micros(min(col("ts"))).as("first_error"))
      .orderBy("user_id")

  // ---------------------------------------------------------------- DQ6
  /** Coalesce-priority dimension lookup (§2.3 host resolution). */
  val dq06: Q = (s, d) =>
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"), "left")
      .select(col("c_custkey"),
        coalesce(col("n_name"), lit("UNRESOLVED")).as("nation"))
      .orderBy("c_custkey")

  // ---------------------------------------------------------------- DQ7
  /** Age/TTL filter (§2.3 self-delete timer, retention). */
  val dq07: Q = (s, d) =>
    Tables.events(s, d)
      .filter(col("ts") < to_timestamp(lit("2024-01-15 00:00:00")))
      .select("event_id")
      .orderBy("event_id")

  // ---------------------------------------------------------------- DQ8
  /** CASE routing (§2.3 command-code dispatch). */
  val dq08: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"),
        when(col("event_type") === "purchase", 1)
          .when(col("event_type") === "signup", 2)
          .when(col("event_type") === "error", 6)
          .otherwise(0).as("opcode"),
        col("n"))
      .orderBy("event_type")

  // ---------------------------------------------------------------- DQ9
  /** Validation predicate set (§2.3 input validation). */
  val dq09: Q = (s, d) =>
    Tables.events(s, d)
      .filter(col("user_id").between(1, 65535) && length(col("event_type")) >= 4)
      .agg(count(lit(1)).as("ok"))

  // --------------------------------------------------------------- DQ10
  /** Changed-set anti-join (§2.3 incremental file diff). */
  val dq10: Q = (s, d) => {
    val e1 = Tables.events(s, d).select(col("event_id"))
    val e2 = Tables.events(s, d).select((col("event_id") + 1).as("succ"))
    e1.join(e2, col("event_id") === col("succ"), "left_anti")
      .orderBy("event_id")
  }

  // --------------------------------------------------------------- DQ11
  /** Dimension decode join (§2.4 OS-code → name). */
  val dq11: Q = (s, d) =>
    Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("nations"))
      .orderBy("r_name")

  // --------------------------------------------------------------- DQ12
  /** Precedence / first-wins selection (§2.4 longest-prefix, §2.6). */
  val dq12: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey")
      .orderBy("o_custkey")
  }

  // --------------------------------------------------------------- DQ13
  /** Flagship multi-way equi-join + aggregate (revenue by nation).
    * nation is broadcast; customer⋈orders⋈lineitem shuffle on their
    * keys — at scale AQE picks broadcast for customer too if it fits.
    */
  val dq13: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(r2(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount"))))).as("revenue"))
      .orderBy("n_name")

  // --------------------------------------------------------------- DQ14
  /** Hex/typed parse analog (§2.1 netstat scan): lossless narrowing. */
  val dq14: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_linenumber") === 1)
      .select(col("l_orderkey"), col("l_quantity").cast("bigint").as("q"))
      .orderBy("l_orderkey")

  // --------------------------------------------------------------- DQ15
  /** Bitmask → flag letters (§2.8 route flags). */
  val dq15: Q = (s, d) =>
    Tables.events(s, d)
      .filter(col("event_id") < 100)
      .select(col("event_id"),
        concat(
          when(col("user_id") % 2 === 1, "U").otherwise(""),
          when(col("user_id") % 4 >= 2, "G").otherwise("")).as("flags"))
      .orderBy("event_id")

  // --------------------------------------------------------------- DQ16
  /** Offset arithmetic (§2.2 session-key extraction). */
  val dq16: Q = (s, d) =>
    Tables.events(s, d)
      .filter(col("event_id") < 50)
      .select(col("event_id"), (col("user_id") % 15 + 1).as("key_offset"))
      .orderBy("event_id")

  // --------------------------------------------------------------- DQ17
  /** Base64 round-trip (§2.2): the predicate asserts
    * unbase64(base64(text)) == text engine-side (a tautology the
    * optimizer cannot fold because base64 is opaque), so the surviving
    * rows equal the oracle's plain projection.
    */
  val dq17: Q = (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 20 &&
        base64(unbase64(base64(col("text").cast("binary")))) ===
          base64(col("text").cast("binary")))
      .select("doc_id")
      .orderBy("doc_id")

  // --------------------------------------------------------------- DQ18
  /** Formatting + clamp (§2.5 min-floor, §2.8 fixed-width format). */
  val dq18: Q = (s, d) =>
    Tables.events(s, d)
      .filter(col("event_id") < 50)
      .select(col("event_id"),
        greatest(lit(1.0), col("value")).as("clamped"),
        lpad(col("user_id").cast("string"), 5, "0").as("padded"))
      .orderBy("event_id")

  // --------------------------------------------------------------- DQ19
  /** Hash aggregation: counts + exact-decimal sums (§2.5 counters). */
  val dq19: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), r2(sum(dec(col("value")))).as("total"))
      .orderBy("user_id")

  // --------------------------------------------------------------- DQ20
  /** Ordered string aggregation (§2.5 grow-and-concat accumulator).
    * collect_list gives no cross-partition order guarantee, so the
    * (l_linenumber, flag) pairs are collected and array_sort'ed inside
    * the group — deterministic because the sort key is unique per group.
    */
  val dq20: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(concat_ws(",",
        transform(
          array_sort(collect_list(struct(col("l_linenumber"), col("l_returnflag")))),
          x => x.getField("l_returnflag"))).as("flags"))
      .orderBy("l_orderkey")
      .limit(100)

  // --------------------------------------------------------------- DQ21
  /** Exact distinct count (§2.5). */
  val dq21: Q = (s, d) =>
    Tables.orders(s, d)
      .agg(countDistinct(col("o_custkey")).as("buyers"))

  // --------------------------------------------------------------- DQ22
  /** ROLLUP (§2.5 grouping sets surface). Goes through the SQL API:
    * Dataset.rollup over a join-derived child false-positives Spark 4.1's
    * DetectAmbiguousSelfJoin (the Expand duplicates the grouping attrs);
    * the SQL path carries no dataset-id metadata and plans identically
    * (Expand + single hash aggregate, one shuffle).
    */
  val dq22: Q = (s, d) => {
    Tables.nation(s, d).createOrReplaceTempView("dq22_nation")
    Tables.region(s, d).createOrReplaceTempView("dq22_region")
    s.sql(
      """SELECT r_name, n_name, COUNT(*) AS c
        |FROM dq22_nation JOIN dq22_region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
  }

  /** CUBE twin of DQ22 (declared §2.5 surface). */
  val dq22Cube: Q = (s, d) => {
    Tables.nation(s, d).createOrReplaceTempView("dq22_nation")
    Tables.region(s, d).createOrReplaceTempView("dq22_region")
    s.sql(
      """SELECT r_name, n_name, COUNT(*) AS c
        |FROM dq22_nation JOIN dq22_region ON n_regionkey = r_regionkey
        |GROUP BY CUBE (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
  }

  /** Explicit GROUPING SETS twin of DQ22. */
  val dq22Gsets: Q = (s, d) => {
    Tables.nation(s, d).createOrReplaceTempView("dq22_nation")
    Tables.region(s, d).createOrReplaceTempView("dq22_region")
    s.sql(
      """SELECT r_name, n_name, COUNT(*) AS c
        |FROM dq22_nation JOIN dq22_region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (n_name), ())
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
  }

  // --------------------------------------------------------------- DQ23
  /** LAG inter-arrival (§2.6 next-beacon prediction). */
  val dq23: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .filter(col("user_id") <= 5)
      .withColumn("prev_id", lag(col("event_id"), 1).over(w))
      .orderBy("user_id", "ts", "event_id")
      .select(col("event_id"), col("ts").cast("date").as("d"), col("prev_id"))
  }

  // --------------------------------------------------------------- DQ24
  /** Gap sessionization, 30-min gap (§2.9 session window). */
  val dq24: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .groupBy("user_id")
      .agg(sum(col("new_s")).as("sessions"))
      .orderBy("user_id")
  }

  /** DQ24 twin via the native session_window operator (same 30-min gap
    * semantics, realized by Spark's built-in session windows instead
    * of lag arithmetic) — counts sessions per user.
    */
  val dq24SessionWindow: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("sessions"))
      .orderBy("user_id")

  // --------------------------------------------------------------- DQ25
  /** Top-k (§2.7): ORDER BY + LIMIT → TakeOrderedAndProject, no full sort. */
  val dq25: Q = (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  // --------------------------------------------------------------- DQ26
  /** Set ops (§2.7). */
  val dq26Intersect: Q = (s, d) =>
    Tables.customer(s, d)
      .filter(col("c_acctbal") > 0).select("c_custkey")
      .intersect(Tables.orders(s, d).select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")
      .limit(100)

  val dq26Except: Q = (s, d) =>
    Tables.customer(s, d)
      .filter(col("c_acctbal") > 0).select("c_custkey")
      .except(Tables.orders(s, d).select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")
      .limit(100)

  // --------------------------------------------------------------- DQ27
  /** JSON scalar extraction (§2.8; XML-tag analog processRSI.py:80-117). */
  val dq27: Q = (s, d) =>
    Tables.events(s, d)
      .filter(col("event_id") < 100)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .orderBy("event_id")

  // --------------------------------------------------------------- DQ28
  /** Window frame aggregate (§2.6 moving average). The ≤3-row frame is
    * summed in deterministic frame order, so plain double AVG + ROUND is
    * reproducible across engines.
    */
  val dq28: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-2, Window.currentRow)
    Tables.events(s, d)
      .filter(col("user_id") <= 3)
      .withColumn("mavg", r2(avg(col("value")).over(w)))
      .orderBy("user_id", "ts", "event_id")
      .select("event_id", "mavg")
  }

  /** Multi-key sort with explicit NULL ordering (§2.7 declared
    * surface); NULLIF manufactures nulls in the synthetic data.
    */
  val dq32: Q = (s, d) =>
    Tables.events(s, d)
      .filter(col("event_id") < 500)
      .select(col("event_id"),
        nullif(col("event_type"), lit("error")).as("et"),
        (col("user_id") % 3).as("grp"))
      .orderBy(col("et").desc_nulls_last, col("grp").asc_nulls_first, col("event_id"))

  /** Percentile statistics (exact interpolated percentiles over
    * integer inputs — both engines interpolate the same two exact
    * values, so doubles agree bitwise).
    */
  val dq33: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy("lang")
      .agg(expr("percentile(n_chars, 0.5)").as("median_chars"),
        expr("percentile(n_chars, 0.9)").as("p90_chars"))
      .orderBy("lang")

  /** Ranking-function surface: ntile buckets plus percent_rank /
    * cume_dist (small-integer ratios — IEEE division is correctly
    * rounded, so both engines produce bit-identical doubles).
    */
  val dq35: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .filter(col("user_id") <= 5)
      .select(col("user_id"), col("event_id"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("user_id", "event_id")
  }

  /** Scalar subquery surface: rows above 90% of the global max,
    * realized as a broadcast of the 1-row aggregate (no driver-side
    * collect; the idiomatic distributed scalar-subquery plan).
    */
  val dq34: Q = (s, d) => {
    val mx = Tables.orders(s, d).agg(max(col("o_totalprice")).as("mx"))
    Tables.orders(s, d)
      .crossJoin(broadcast(mx))
      .filter(col("o_totalprice") > col("mx") * 0.9)
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  // ------------------------------------------------------- DQ29–31 (breadth)

  /** Supplier-side revenue by nation: the supplier dimension's twin of
    * DQ13, completing star-schema coverage.
    */
  val dq29: Q = (s, d) =>
    Tables.supplier(s, d)
      .join(Tables.lineitem(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(r2(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount"))))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("n_name")

  /** Part-dimension aggregation with a LIKE predicate pushdown. */
  val dq30: Q = (s, d) =>
    Tables.part(s, d)
      .filter(col("p_type").startsWith("STANDARD") || col("p_size") < 10)
      .join(Tables.lineitem(s, d), col("p_partkey") === col("l_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), r2(sum(dec(col("l_quantity")))).as("qty"))
      .orderBy("p_brand")

  /** Cross-table id join documents ↔ embeddings (the corpus and its
    * vector sidecar share the id domain): per-language vector norms.
    */
  val dq31: Q = (s, d) =>
    Tables.documents(s, d)
      .join(Tables.embeddings(s, d), col("doc_id") === col("vec_id"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        r2(sum(dec(graft.functions.VectorExpressions.dot_f32(col("embedding"), col("embedding")))))
          .as("norm_sum"))
      .orderBy("lang")

  // ------------------------------------------------------------ registry

  val queries: Map[String, Q] = Map(
    "dq01_scan_filter_project" -> dq01,
    "dq02_typed_projection"    -> dq02,
    "dq03_multi_predicate"     -> dq03,
    "dq04_semi_join"           -> dq04Semi,
    "dq04_anti_join"           -> dq04Anti,
    "dq05_earliest_match"      -> dq05,
    "dq06_coalesce_lookup"     -> dq06,
    "dq07_ttl_filter"          -> dq07,
    "dq08_case_routing"        -> dq08,
    "dq09_validation"          -> dq09,
    "dq10_changed_set"         -> dq10,
    "dq11_dim_decode"          -> dq11,
    "dq12_first_wins"          -> dq12,
    "dq13_revenue_join"        -> dq13,
    "dq14_typed_cast"          -> dq14,
    "dq15_bitmask_flags"       -> dq15,
    "dq16_offset_arith"        -> dq16,
    "dq17_b64_roundtrip"       -> dq17,
    "dq18_format_clamp"        -> dq18,
    "dq19_hash_agg"            -> dq19,
    "dq20_ordered_string_agg"  -> dq20,
    "dq21_count_distinct"      -> dq21,
    "dq22_rollup"              -> dq22,
    "dq22_cube"                -> dq22Cube,
    "dq22_gsets"               -> dq22Gsets,
    "dq23_lag_interarrival"    -> dq23,
    "dq24_sessionization"      -> dq24,
    "dq24_session_window"      -> dq24SessionWindow,
    "dq25_topk"                -> dq25,
    "dq26_intersect"           -> dq26Intersect,
    "dq26_except"              -> dq26Except,
    "dq27_json_scalar"         -> dq27,
    "dq28_window_frame"        -> dq28,
    "dq29_supplier_revenue"    -> dq29,
    "dq30_part_brand"          -> dq30,
    "dq31_doc_embedding"       -> dq31,
    "dq32_null_ordering"       -> dq32,
    "dq33_percentiles"         -> dq33,
    "dq34_scalar_subquery"     -> dq34,
    "dq35_rank_functions"      -> dq35,
  )

  /** DuckDB-dialect oracle SQL, value-equivalent per SURVEY §2.11. */
  val oracle: Map[String, String] = Map(
    "dq01_scan_filter_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R' ORDER BY l_orderkey, l_linenumber",
    "dq02_typed_projection" ->
      "SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d, o_orderpriority FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey",
    "dq03_multi_predicate" ->
      "SELECT event_id FROM events WHERE value BETWEEN 126 AND 472 AND MOD(user_id, 127) = MOD(event_id, 127) ORDER BY event_id",
    "dq04_semi_join" ->
      "SELECT c_custkey FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000) ORDER BY c_custkey",
    "dq04_anti_join" ->
      "SELECT c_custkey FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_totalprice > 100000 AND o.o_custkey = c.c_custkey) ORDER BY c_custkey",
    "dq05_earliest_match" ->
      "SELECT user_id, epoch_us(MIN(ts)) AS first_error FROM events WHERE event_type = 'error' GROUP BY user_id ORDER BY user_id",
    "dq06_coalesce_lookup" ->
      "SELECT c.c_custkey, COALESCE(n.n_name, 'UNRESOLVED') AS nation FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey ORDER BY c.c_custkey",
    "dq07_ttl_filter" ->
      "SELECT event_id FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00' ORDER BY event_id",
    "dq08_case_routing" ->
      "SELECT event_type, CASE event_type WHEN 'purchase' THEN 1 WHEN 'signup' THEN 2 WHEN 'error' THEN 6 ELSE 0 END AS opcode, COUNT(*) AS n FROM events GROUP BY event_type ORDER BY event_type",
    "dq09_validation" ->
      "SELECT COUNT(*) AS ok FROM events WHERE user_id BETWEEN 1 AND 65535 AND LENGTH(event_type) >= 4",
    "dq10_changed_set" ->
      "SELECT e1.event_id FROM events e1 LEFT JOIN events e2 ON e1.event_id = e2.event_id + 1 WHERE e2.event_id IS NULL ORDER BY e1.event_id",
    "dq11_dim_decode" ->
      "SELECT r_name, COUNT(*) AS nations FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name",
    "dq12_first_wins" ->
      "SELECT o_custkey, o_orderkey FROM (SELECT o_custkey, o_orderkey, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn FROM orders) t WHERE rn = 1 ORDER BY o_custkey",
    "dq13_revenue_join" ->
      "SELECT n_name, CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name",
    "dq14_typed_cast" ->
      "SELECT l_orderkey, CAST(l_quantity AS BIGINT) AS q FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey",
    "dq15_bitmask_flags" ->
      "SELECT event_id, CONCAT(CASE WHEN MOD(user_id, 2) = 1 THEN 'U' ELSE '' END, CASE WHEN MOD(user_id, 4) >= 2 THEN 'G' ELSE '' END) AS flags FROM events WHERE event_id < 100 ORDER BY event_id",
    "dq16_offset_arith" ->
      "SELECT event_id, MOD(user_id, 15) + 1 AS key_offset FROM events WHERE event_id < 50 ORDER BY event_id",
    "dq17_b64_roundtrip" ->
      "SELECT doc_id FROM documents WHERE doc_id < 20 AND doc_id = CAST(doc_id AS BIGINT) ORDER BY doc_id",
    "dq18_format_clamp" ->
      "SELECT event_id, GREATEST(1.0, value) AS clamped, LPAD(CAST(user_id AS VARCHAR), 5, '0') AS padded FROM events WHERE event_id < 50 ORDER BY event_id",
    "dq19_hash_agg" ->
      "SELECT user_id, COUNT(*) AS n, CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total FROM events GROUP BY user_id ORDER BY user_id",
    "dq20_ordered_string_agg" ->
      "SELECT l_orderkey, STRING_AGG(l_returnflag, ',' ORDER BY l_linenumber, l_returnflag) AS flags FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey LIMIT 100",
    "dq21_count_distinct" ->
      "SELECT COUNT(DISTINCT o_custkey) AS buyers FROM orders",
    "dq22_rollup" ->
      "SELECT r_name, n_name, COUNT(*) AS c FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY ROLLUP (r_name, n_name) ORDER BY r_name NULLS FIRST, n_name NULLS FIRST",
    "dq22_cube" ->
      "SELECT r_name, n_name, COUNT(*) AS c FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY CUBE (r_name, n_name) ORDER BY r_name NULLS FIRST, n_name NULLS FIRST",
    "dq22_gsets" ->
      "SELECT r_name, n_name, COUNT(*) AS c FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY GROUPING SETS ((r_name), (n_name), ()) ORDER BY r_name NULLS FIRST, n_name NULLS FIRST",
    "dq23_lag_interarrival" ->
      "SELECT event_id, CAST(ts AS DATE) AS d, LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_id FROM events WHERE user_id <= 5 ORDER BY user_id, ts, event_id",
    "dq24_sessionization" ->
      "WITH g AS (SELECT user_id, ts, CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL '30' MINUTE THEN 1 ELSE 0 END AS new_s, event_id FROM events) SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS sessions FROM g GROUP BY user_id ORDER BY user_id",
    // session_window's boundary is exclusive (a gap of exactly 30min
    // starts a new session), hence >= rather than DQ24's >
    "dq24_session_window" ->
      "WITH g AS (SELECT user_id, ts, CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) >= INTERVAL '30' MINUTE THEN 1 ELSE 0 END AS new_s, event_id FROM events) SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS sessions FROM g GROUP BY user_id ORDER BY user_id",
    "dq25_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "dq26_intersect" ->
      "SELECT c_custkey FROM customer WHERE c_acctbal > 0 INTERSECT SELECT o_custkey FROM orders ORDER BY c_custkey LIMIT 100",
    "dq26_except" ->
      "SELECT c_custkey FROM customer WHERE c_acctbal > 0 EXCEPT SELECT o_custkey FROM orders ORDER BY c_custkey LIMIT 100",
    "dq27_json_scalar" ->
      "SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events WHERE event_id < 100 ORDER BY event_id",
    "dq28_window_frame" ->
      "SELECT event_id, CAST(ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS mavg FROM events WHERE user_id <= 3 ORDER BY user_id, ts, event_id",
    "dq29_supplier_revenue" ->
      "SELECT n_name, CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue, COUNT(*) AS n_lines FROM supplier JOIN lineitem ON s_suppkey = l_suppkey JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name",
    "dq30_part_brand" ->
      "SELECT p_brand, COUNT(*) AS n, CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS qty FROM part JOIN lineitem ON p_partkey = l_partkey WHERE p_type LIKE 'STANDARD%' OR p_size < 10 GROUP BY p_brand ORDER BY p_brand",
    "dq31_doc_embedding" ->
      "SELECT lang, COUNT(*) AS n, CAST(ROUND(SUM(CAST(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS DECIMAL(18,6))), 2) AS DOUBLE) AS norm_sum FROM documents JOIN embeddings ON doc_id = vec_id GROUP BY lang ORDER BY lang",
    "dq32_null_ordering" ->
      "SELECT event_id, NULLIF(event_type, 'error') AS et, user_id % 3 AS grp FROM events WHERE event_id < 500 ORDER BY et DESC NULLS LAST, grp ASC NULLS FIRST, event_id",
    "dq33_percentiles" ->
      "SELECT lang, quantile_cont(n_chars, 0.5) AS median_chars, quantile_cont(n_chars, 0.9) AS p90_chars FROM documents GROUP BY lang ORDER BY lang",
    "dq34_scalar_subquery" ->
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > (SELECT MAX(o_totalprice) FROM orders) * 0.9 ORDER BY o_orderkey",
    "dq35_rank_functions" ->
      """SELECT user_id, event_id,
        |  CAST(NTILE(4) OVER w AS INT) AS quartile,
        |  PERCENT_RANK() OVER w AS pct_rank,
        |  CUME_DIST() OVER w AS cume
        |FROM events WHERE user_id <= 5
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
  )
}
