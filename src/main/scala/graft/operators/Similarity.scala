package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextImpl

/** Similarity search over the `embeddings` table (`ARRAY<FLOAT>`,
  * L2-normalized, so dot product == cosine similarity).
  *
  * Numeric discipline: the ranking/threshold score is a DECIMAL(38,12)
  * sum of per-component products rounded to 12 dp — exact and
  * order-independent, so Spark's partial aggregation and DuckDB's
  * single-threaded sum produce identical values (hash-safe). A plain
  * double dot is used only as a wide prefilter with a margin far above
  * ulp noise.
  *
  * Scale path: brute force is the per-query baseline (fine for a
  * bounded query set); the LSH variant buckets by 16-bit hyperplane
  * signature so the candidate join shuffles on the bucket key, not the
  * cross product.
  */
object Similarity {

  /** Exact decimal dot product of two float-array columns (native
    * kernel; value-identical to
    * `SUM(CAST(x*y AS DECIMAL(28,12)))` in both engines).
    */
  def dotDecimal(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot_f32_dec(a, b)

  /** Fast double dot product — native expression with a primitive
    * loop (graft.functions.VectorExpressions.DotF32); same IEEE fold
    * order as the oracle's list_sum.
    */
  def dotDouble(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot_f32(a, b)

  /** Brute-force top-k cosine neighbors for a bounded query set
    * (query_id < nQueries), ranked by the exact decimal score with
    * vec_id tie-break.
    */
  def bruteForceTopK(spark: SparkSession, dir: String,
      nQueries: Int = 8, k: Int = 10): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    val corpus = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").as("v"))
    val scored = queries.join(corpus, col("query_id") =!= col("vec_id"))
      .withColumn("dot", dotDecimal(col("q"), col("v")))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("dot"), 6).cast("double").as("score"))
      .orderBy("query_id", "rank")
  }

  /** All-pairs near-duplicate detection by cosine ≥ threshold:
    * double-dot prefilter (margin 0.01 ≫ float noise) then exact
    * decimal threshold.
    */
  def embeddingNearDup(spark: SparkSession, dir: String,
      threshold: Double = 0.95): DataFrame = {
    val a = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("i"), col("embedding").as("va"))
    val b = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("j"), col("embedding").as("vb"))
    a.join(b, col("i") < col("j"))
      .filter(dotDouble(col("va"), col("vb")) >= threshold - 0.01)
      .withColumn("dot", dotDecimal(col("va"), col("vb")))
      .filter(col("dot") >= threshold)
      .select(col("i"), col("j"), round(col("dot"), 6).cast("double").as("cos"))
      .orderBy("i", "j")
  }

  /** Scale path for all-pairs near-dup: candidates restricted to
    * hyperplane-bucket collisions (8 planes → 256 buckets so highly
    * similar vectors co-bucket with high probability), then the same
    * exact decimal verify. Shuffles on the bucket key, never the
    * cross product; recall vs the exact operator is measured in
    * TrainingSpec, precision is exact by construction.
    */
  def embeddingNearDupLsh(spark: SparkSession, dir: String,
      threshold: Double = 0.95, nPlanes: Int = 8): DataFrame = {
    val signs = hyperplaneSigns(nPlanes, 64)
    def side(idName: String, vName: String): DataFrame =
      Tables.embeddings(spark, dir)
        .select(col("vec_id").as(idName), col("embedding").as(vName))
        .withColumn(s"bucket_$idName", lshSignature(col(vName), signs))
    val a = side("i", "va")
    val b = side("j", "vb")
    a.join(b, col("bucket_i") === col("bucket_j") && col("i") < col("j"))
      .filter(dotDouble(col("va"), col("vb")) >= threshold - 0.01)
      .withColumn("dot", dotDecimal(col("va"), col("vb")))
      .filter(col("dot") >= threshold)
      .select(col("i"), col("j"), round(col("dot"), 6).cast("double").as("cos"))
      .orderBy("i", "j")
  }

  /** Deterministic ±1 hyperplane matrix: sign(p)(i) from the engine's
    * own fnv1a64 of "p|i" — reproducible across sessions, no RNG.
    */
  def hyperplaneSigns(nPlanes: Int, dim: Int): Array[Array[Int]] =
    Array.tabulate(nPlanes, dim) { (p, i) =>
      if ((TextImpl.fnv1a64(s"$p|$i") & 1L) == 0L) 1 else -1
    }

  /** 16-bit random-hyperplane signature of an embedding column: each
    * bit is the sign of the dot with a ±1 plane (native dot kernel).
    */
  def lshSignature(v: Column, signs: Array[Array[Int]]): Column = {
    val bits = signs.zipWithIndex.map { case (row, p) =>
      val signed = graft.functions.VectorExpressions.dot_f32(v, lit(row.map(_.toFloat)))
      when(signed > 0, lit(1 << p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** ANN via hyperplane LSH: bucket by signature, rank within bucket.
    * Candidates missing from the query's bucket are simply not
    * returned (recall measured against brute force in the spec).
    */
  def lshTopK(spark: SparkSession, dir: String,
      nQueries: Int = 8, k: Int = 10, nPlanes: Int = 16,
      multiProbe: Boolean = false): DataFrame = {
    val signs = hyperplaneSigns(nPlanes, 64)
    val emb = Tables.embeddings(spark, dir)
      .withColumn("bucket", lshSignature(col("embedding"), signs))
    // multi-probe: a query also visits every bucket one sign-flip away
    // (nPlanes+1 probes) — recall of near-boundary neighbors without
    // growing the corpus side
    val probes =
      if (multiProbe)
        explode(concat(array(col("bucket")),
          array((0 until nPlanes).map(p =>
            col("bucket").bitwiseXOR(lit(1 << p))): _*)))
      else col("bucket")
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        probes.as("bucket"))
    val corpus = emb.select(col("vec_id"), col("embedding").as("v"), col("bucket").as("cbucket"))
    val scored = queries.join(corpus,
        col("bucket") === col("cbucket") && col("query_id") =!= col("vec_id"))
      .withColumn("dot", dotDecimal(col("q"), col("v")))
    val deduped = if (multiProbe) scored.dropDuplicates("query_id", "vec_id") else scored
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("vec_id"))
    deduped.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("dot"), 6).cast("double").as("score"))
      .orderBy("query_id", "rank")
  }
}
