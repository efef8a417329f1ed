package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import graft.plans.{SemCatalog, VecCatalog}

/** Streaming embedding dedup-at-ingest — the vector twin of
  * [[DocScreen]]: new vectors arriving as files are screened for
  * near-duplicates against the LANDED bucket catalog per micro-batch,
  * using the same screen core as the batch path
  * ([[graft.operators.Similarity.embeddingScreen]]). The screen is
  * catalog-only (each verdict depends on one vector and the catalog,
  * never on batch-mates), so the union of per-batch verdicts equals
  * the batch verdict regardless of micro-batching — StreamingSpec
  * asserts that equality file-by-file.
  *
  * The history side is landed ONCE ([[VecCatalog.land]], two bucketed
  * tables) before the stream starts; each micro-batch costs batch
  * bucketing + a candidate join reading the catalog co-partitioned on
  * the bucket key — per-batch cost scales with the batch, not history.
  *
  * Exactly-once: checkpointed file source + idempotent sink — each
  * micro-batch overwrites its own `batch_id=<n>` partition (same
  * discipline as [[DocScreen]] and AckSink).
  */
object VecScreen {

  /** Screen `srcDir`'s embedding files against `histEmb` (a static
    * (vec_id, embedding) frame); flagged rows land in `sinkDir`,
    * partitioned by micro-batch id.
    *
    * The catalog is landed under a name derived from `checkpointDir`
    * (raw-name-hashed): a RESUMED stream — same checkpoint, even in a
    * new session after a crash — reattaches to the landed tables and
    * appended partitions without recomputation. Reusing a checkpoint
    * PATH after wiping its contents requires [[VecCatalog.drop]] too
    * (batch ids restart and would collide with old partitions).
    */
  def incrementalEmbScreen(spark: SparkSession, srcDir: String,
      schema: StructType, histEmb: DataFrame,
      sinkDir: String, checkpointDir: String,
      maxFilesPerTrigger: Int = 1, appendAccepted: Boolean = false,
      multiProbe: Boolean = false): Unit = {
    // canonicalized like DocScreen: catalog identity = the physical
    // checkpoint location, not its spelling (a relative-vs-absolute
    // respelling after restart must reattach, not land fresh)
    val cat = VecCatalog.land(spark, histEmb,
      s"scr_${DocScreen.canonical(spark, checkpointDir)}")
    screenAgainstCatalog(spark, srcDir, schema, cat, sinkDir, checkpointDir,
      maxFilesPerTrigger, appendAccepted, multiProbe)
  }

  /** The production entry point: screen against an already-landed
    * catalog (history landed out-of-band).
    *
    * With `appendAccepted` the full ingest loop runs: vectors the
    * screen did NOT flag are recorded into the catalog as ingest
    * partition `batchId + 1` (dynamic partition overwrite — replay
    * rewrites the same partition, exactly-once like the verdict
    * sink), so batch N+1 is screened against batch N's survivors.
    */
  def screenAgainstCatalog(spark: SparkSession, srcDir: String,
      schema: StructType, cat: VecCatalog.Handle,
      sinkDir: String, checkpointDir: String,
      maxFilesPerTrigger: Int = 1, appendAccepted: Boolean = false,
      multiProbe: Boolean = false): Unit = {
    val screen: (DataFrame, Long) => Unit = { (batch, batchId) =>
      val s = batch.sparkSession
      // bounded to ingest partitions <= batchId in the append loop so
      // a crash-replayed batch cannot self-match against its own
      // pre-crash append (see DocScreen)
      val catalogV0 = VecCatalog.screen(s, batch, cat,
        maxIngestId = if (appendAccepted) Some(batchId) else None,
        multiProbe = multiProbe)
      // ingest loop: near-dup the batch WITHIN itself too
      // (component-min survives) — two mutual near-dup vectors in one
      // micro-batch must not both enter the catalog (see DocScreen).
      // The checkpoint exists for the two-reader append path only; the
      // screen-only path writes the verdicts once and a forced
      // materialization job would be pure overhead.
      val verdicts = if (!appendAccepted) catalogV0 else {
        val catalogV = catalogV0.localCheckpoint(true)
        val intra = graft.operators.Dedup.intraBatchVerdicts(
          graft.operators.Similarity.embeddingNearDupLshFrom(batch),
          "vec_id", "cos")
          .join(catalogV.select("vec_id"), Seq("vec_id"), "left_anti")
        catalogV.unionByName(intra).localCheckpoint(true)
      }
      verdicts.write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")
      if (appendAccepted)
        VecCatalog.append(s,
          batch.join(verdicts.select("vec_id"), Seq("vec_id"), "left_anti"),
          cat, batchId + 1)
    }
    // input-derived fan-out for the per-batch screen jobs (AQE is off
    // on the streaming plan; see EventStream.withStateParts)
    EventStream.withStateParts(spark, srcDir) {
      val q = EventStream.fromDirectory(spark, srcDir, schema, maxFilesPerTrigger)
        .writeStream
        .foreachBatch(screen)
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
  }

  /** Driver-gate REPLAY of the STREAMING semantic-decontamination
    * screen (tx_stream_decontam): the benchmark embedding set lands
    * once as [[VecCatalog]] state, the planted corpus slice ≥ 250
    * ([[graft.operators.Decontaminate]]'s shared plant) lands as two
    * mtime-ordered parquet slices ([250, 375) then ≥ 375), and
    * [[screenAgainstCatalog]] consumes them one file per micro-batch
    * with appendAccepted=false — the benchmark catalog is STATIC
    * between releases, so verdicts are batch-independent by
    * construction and the oracle is the batch screen's SQL
    * (StreamingSpec pins the stream == batch equality on the engine
    * side). Exactly-once, checkpointed, batch_id-partitioned sink —
    * the ClsScreen/GramScreen replay discipline on the vector
    * modality.
    */
  def decontamScreenReplayGate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val bench = emb.filter(col("vec_id") % 5 === 0)
    val corpus = graft.operators.Decontaminate.plantedCorpus(emb)
      .filter(col("vec_id") >= 250)
    val srcDir = ReplayGate.slicedSource(spark, dir, "graft_decon_src",
      corpus, "vec_id")
    // the benchmark catalog is fingerprint-named like the slices; a
    // regen prunes the stale catalog too instead of stranding it
    VecCatalog.pruneSiblings(spark, ReplayGate.catalogNamePrefix(srcDir),
      ReplayGate.catalogName(srcDir))
    val cat = VecCatalog.land(spark, bench, ReplayGate.catalogName(srcDir))
    val base = ReplayGate.gateBase(spark, dir, "graft_decon_gate")
    screenAgainstCatalog(spark, srcDir, corpus.schema, cat,
      s"$base/sink", s"$base/ck")
    spark.read.parquet(s"$base/sink")
      .select(col("vec_id").as("doc_id"), col("n_matches").as("n_bench_hits"),
        col("matched_id").as("bench_id"), col("cos"))
      .orderBy("doc_id")
  }

  /** Streaming SemDeDup screen — the ingest loop of
    * [[graft.operators.Similarity.semanticScreenFrom]] over the
    * LANDED semantic catalog: history is assigned once into
    * [[SemCatalog]]'s cid-bucketed cells with its centroid geometry
    * persisted and PINNED (a later arrival can never displace a seed
    * and shift earlier verdicts); each micro-batch screens against
    * the catalog bounded to ingest partitions ≤ batchId (a
    * crash-replayed batch cannot self-match its own pre-crash
    * append), adds the intra-batch lower-id rule under the same
    * geometry, lands verdicts as `batch_id=<n>`, and appends its
    * survivors as ingest partition batchId + 1 — per-batch cost
    * scales with the batch, never the accumulated corpus. Catalog
    * and intra-batch hit verdicts merge through one min-rollup
    * (min kept_by / max max_cos over both surfaces), so the witness
    * matches [[graft.operators.Similarity.semanticScreenFrom]]'s
    * exactly even when a vector has both kinds of mate. Like the
    * gram screen,
    * verdicts are inherently order-dependent (the later copy flags),
    * so the pinned parity contract is stream == the sequential
    * per-batch loop — StreamingSpec asserts it file-by-file, plus
    * checkpoint-replay idempotence.
    */
  def semanticScreen(spark: SparkSession, srcDir: String, schema: StructType,
      histEmb: DataFrame, sinkDir: String, checkpointDir: String,
      nCentroids: Int = 16, threshold: Double = 0.95,
      maxFilesPerTrigger: Int = 1): Unit = {
    val cat = SemCatalog.land(spark, histEmb,
      s"sem_${DocScreen.canonical(spark, checkpointDir)}", nCentroids)
    semanticScreenAgainstCatalog(spark, srcDir, schema, cat, sinkDir,
      checkpointDir, threshold, maxFilesPerTrigger)
  }

  /** The production entry point: semantic-screen against an
    * already-landed [[SemCatalog]] (history landed out-of-band).
    */
  def semanticScreenAgainstCatalog(spark: SparkSession, srcDir: String,
      schema: StructType, cat: SemCatalog.Handle,
      sinkDir: String, checkpointDir: String,
      threshold: Double = 0.95, maxFilesPerTrigger: Int = 1): Unit = {
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    val screen: (DataFrame, Long) => Unit = { (batch, batchId) =>
      val s = batch.sparkSession
      val catalogV = SemCatalog.screen(s, batch, cat, threshold,
          maxIngestId = Some(batchId))
        .localCheckpoint(true)
      val b = Similarity.withAssignedCid(batch, SemCatalog.cents(s, cat))
        .select(col("cid"), col("vec_id").as("b_id"), col("embedding").as("vb"))
      val b2 = b.select(col("cid"), col("b_id").as("h_id"), col("vb").as("vh"))
      val intra = Similarity.semanticRollup(
          Similarity.semanticHits(b, b2, threshold, col("h_id") < col("b_id")))
      // min-rollup over the UNION of catalog and intra-batch verdicts
      // — the exact Similarity.semanticScreenFrom algebra, so a batch
      // vector with both a catalog mate and a LOWER-id intra-batch
      // mate reports the same kept_by witness on both surfaces (the
      // drop set was already identical; this aligns the witness).
      // max_cos rounding commutes with max (round is monotone).
      val verdicts = catalogV.unionByName(intra)
        .groupBy("vec_id", "cid")
        .agg(org.apache.spark.sql.functions.min("kept_by").as("kept_by"),
          org.apache.spark.sql.functions.max("max_cos").as("max_cos"))
        .localCheckpoint(true)
      verdicts.write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")
      SemCatalog.append(s,
        batch.join(verdicts.select("vec_id"), Seq("vec_id"), "left_anti"),
        cat, batchId + 1)
    }
    // input-derived fan-out for the per-batch screen jobs (AQE is off
    // on the streaming plan; see EventStream.withStateParts)
    EventStream.withStateParts(spark, srcDir) {
      val q = EventStream.fromDirectory(spark, srcDir, schema, maxFilesPerTrigger)
        .writeStream
        .foreachBatch(screen)
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
  }
}
