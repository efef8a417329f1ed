package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Similarity

/** Landed embedding-screening catalog — the vector twin of
  * [[DedupCatalog]]: the history side of the hyperplane-LSH near-dup
  * screen is computed ONCE, landed as two bucketed tables, and
  * appended per accepted batch, so every later screen's cost scales
  * with its batch, never with the corpus.
  *
  *  - `<name>_buckets` (vec_id, tk): multi-table hyperplane bucket
  *    keys, bucketed by `tk` — the candidate join reads it
  *    co-partitioned on the join key, so only the (small) batch side
  *    shuffles;
  *  - `<name>_vectors` (vec_id, embedding): the raw vectors, bucketed
  *    by `vec_id` — the decimal-verify join key.
  *
  * Same persisted-state shape as the reference's incremental pipeline
  * (honeycomb/owt/hcOwt.py:250-331 diffs new input against landed
  * state), expressed as Spark bucketed tables.
  */
object VecCatalog {

  /** The two landed table names for one catalog. */
  case class Handle(bucketsT: String, vectorsT: String)

  private def handle(name: String): Handle = {
    val n = name.replaceAll("[^A-Za-z0-9_]", "_")
    Handle(s"graft_vccat_${n}_buckets", s"graft_vccat_${n}_vectors")
  }

  /** Land `histEmb` (a (vec_id, embedding) frame) as the screening
    * catalog `name`, as ingest partition 0. Idempotent per (session
    * catalog, name): if both tables exist the handle comes back
    * without recomputation.
    */
  def land(spark: SparkSession, histEmb: DataFrame, name: String,
      nBuckets: Int = 8): Handle = {
    val h = handle(name)
    if (Seq(h.bucketsT, h.vectorsT).forall(spark.catalog.tableExists))
      return h
    val base = s"${sys.props("java.io.tmpdir")}/graft_vccat"
    import org.apache.spark.sql.functions.lit
    def part(df: DataFrame) = df.withColumn("ingest_id", lit(0L))
    BucketedLayout.write(part(Similarity.bucketKeys(histEmb, "vec_id")),
      h.bucketsT, "tk", nBuckets, Seq("tk"), Some(s"$base/${h.bucketsT}"),
      Seq("ingest_id"))
    BucketedLayout.write(part(histEmb.select("vec_id", "embedding")),
      h.vectorsT, "vec_id", nBuckets, Seq("vec_id"), Some(s"$base/${h.vectorsT}"),
      Seq("ingest_id"))
    h
  }

  /** Screen a batch of vectors against the landed catalog — the
    * per-ingest-batch operator. Everything batch-sized is derived
    * in-plan; everything history-sized is a bucketed table read.
    */
  def screen(spark: SparkSession, batchEmb: DataFrame, h: Handle,
      threshold: Double = 0.95): DataFrame =
    Similarity.embeddingScreen(batchEmb,
      spark.table(h.bucketsT).select("vec_id", "tk"),
      spark.table(h.vectorsT).select("vec_id", "embedding"), threshold)

  /** Record `emb` (accepted batch members) into the catalog as ingest
    * partition `ingestId` so the next screen sees them as history.
    * Replay-idempotent like [[DedupCatalog.append]]: a dynamic
    * partition overwrite of exactly that partition. `ingestId` > 0.
    */
  def append(spark: SparkSession, emb: DataFrame, h: Handle,
      ingestId: Long): Unit = {
    require(ingestId > 0, s"ingestId must be > 0 (0 is the landing): $ingestId")
    import org.apache.spark.sql.functions.lit
    def part(df: DataFrame) = df.withColumn("ingest_id", lit(ingestId))
    BucketedLayout.overwritePartitions(spark,
      part(Similarity.bucketKeys(emb, "vec_id")), h.bucketsT)
    BucketedLayout.overwritePartitions(spark,
      part(emb.select("vec_id", "embedding")), h.vectorsT)
  }
}
