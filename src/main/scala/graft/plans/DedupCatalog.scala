package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Landed near-dup screening catalog — the production shape of the
  * incremental dedup surface (closing round 9's "history recomputed
  * in-plan" gap): the history side of the MinHash screen is computed
  * ONCE, landed as three bucketed tables, and appended per accepted
  * batch, so every later screen's cost scales with its batch, never
  * with the corpus.
  *
  *  - `<name>_bands`    (doc, bk): band keys, bucketed by `bk` — the
  *    candidate join reads it co-partitioned on the join key, so only
  *    the (small) batch side shuffles;
  *  - `<name>_shingles` (doc, sg): shingle sets, bucketed by `doc` —
  *    the Jaccard-verify join key;
  *  - `<name>_sizes`    (doc, n): shingle-set sizes, bucketed by `doc`.
  *
  * The reference's incremental pipeline diffs new input against
  * PERSISTED state rather than re-walking history
  * (honeycomb/owt/hcOwt.py:250-331); this is that state store,
  * expressed as Spark bucketed tables.
  */
object DedupCatalog {

  /** The three landed table names for one catalog. */
  case class Handle(bandsT: String, shinglesT: String, sizesT: String)

  private def handle(name: String): Handle = {
    val n = name.replaceAll("[^A-Za-z0-9_]", "_")
    Handle(s"graft_ddcat_${n}_bands", s"graft_ddcat_${n}_shingles",
      s"graft_ddcat_${n}_sizes")
  }

  /** Land `histDocs` (a (doc_id, text, …) frame) as the screening
    * catalog `name`, as ingest partition 0. Idempotent per (session
    * catalog, name): if the three tables exist the handle comes back
    * without recomputation — landing cost is paid once, every screen
    * reads. The shingle and signature subtrees are pinned only for
    * the landing writes and released before returning (scoped, so
    * caller pins survive).
    */
  def land(spark: SparkSession, histDocs: DataFrame, name: String,
      nBuckets: Int = 8): Handle = {
    val h = handle(name)
    if (Seq(h.bandsT, h.shinglesT, h.sizesT).forall(spark.catalog.tableExists))
      return h
    val m = graft.Shared.mark(spark)
    try {
      val sh = graft.Shared.materialize(
        Dedup.shinglesOf(histDocs, "doc").toDF("doc", "sg"))
      val sig = graft.Shared.materialize(Dedup.minhashSignaturesFrom(sh, "doc"))
      val base = s"${sys.props("java.io.tmpdir")}/graft_ddcat"
      def part(df: DataFrame) = df.withColumn("ingest_id", lit(0L))
      BucketedLayout.write(part(Dedup.bandKeys(sig, "doc")), h.bandsT, "bk",
        nBuckets, Seq("bk"), Some(s"$base/${h.bandsT}"), Seq("ingest_id"))
      BucketedLayout.write(part(sh), h.shinglesT, "doc",
        nBuckets, Seq("doc", "sg"), Some(s"$base/${h.shinglesT}"), Seq("ingest_id"))
      BucketedLayout.write(part(sig.select("doc", "n")), h.sizesT, "doc",
        nBuckets, Seq("doc"), Some(s"$base/${h.sizesT}"), Seq("ingest_id"))
    } finally graft.Shared.releaseSince(spark, m)
    h
  }

  /** Screen a batch of documents against the landed catalog — the
    * per-ingest-batch operator. Everything batch-sized is derived
    * in-plan; everything history-sized is a bucketed table read.
    */
  def screen(spark: SparkSession, batchDocs: DataFrame, h: Handle,
      threshold: Double = Dedup.JaccardThreshold): DataFrame =
    Dedup.minhashLshScreen(Dedup.shinglesOf(batchDocs, "doc"),
      spark.table(h.bandsT).select("doc", "bk"),
      spark.table(h.shinglesT).select("doc", "sg"),
      spark.table(h.sizesT).select("doc", "n"), threshold)

  /** Record `docs` (accepted batch members) into the catalog as
    * ingest partition `ingestId` so the next screen sees them as
    * history. Replay-idempotent: the write is a dynamic partition
    * OVERWRITE of exactly that ingest partition, so a crashed and
    * re-run batch replaces its own state rows instead of duplicating
    * them (duplicate shingle rows would inflate the screen's
    * intersection counts — corruption, not mere duplication).
    * `ingestId` must be > 0 (0 is the landed history).
    */
  def append(spark: SparkSession, docs: DataFrame, h: Handle,
      ingestId: Long): Unit = {
    require(ingestId > 0, s"ingestId must be > 0 (0 is the landing): $ingestId")
    val m = graft.Shared.mark(spark)
    try {
      val sh = graft.Shared.materialize(
        Dedup.shinglesOf(docs, "doc").toDF("doc", "sg"))
      val sig = graft.Shared.materialize(Dedup.minhashSignaturesFrom(sh, "doc"))
      def part(df: DataFrame) = df.withColumn("ingest_id", lit(ingestId))
      BucketedLayout.overwritePartitions(spark, part(Dedup.bandKeys(sig, "doc")),
        h.bandsT)
      BucketedLayout.overwritePartitions(spark, part(sh), h.shinglesT)
      BucketedLayout.overwritePartitions(spark, part(sig.select("doc", "n")),
        h.sizesT)
    } finally graft.Shared.releaseSince(spark, m)
  }
}
