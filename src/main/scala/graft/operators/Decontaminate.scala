package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: flag corpus documents sharing at
  * least `minShared` distinct shingles with a benchmark/holdout set —
  * the decontamination primitive of a training-data curation pipeline.
  *
  * The benchmark side is an explicit argument (the API seam for a real
  * external benchmark table) and carries NO broadcast hint: a real
  * benchmark set is tiny and Spark's size estimate / AQE picks a
  * broadcast join on its own, while a corpus-proportional "benchmark"
  * (like the synthetic every-5th-doc holdout at sf‑whatever) plans a
  * shuffle join instead of OOMing the driver on a forced broadcast.
  * TrainingSpec pins exactly that: with broadcast thresholds disabled
  * the plan contains no broadcast exchange, i.e. nothing in this
  * operator forces one.
  */
object Decontaminate {

  /** @param corpusShingles (doc_id, sg) — one row per distinct shingle
    *                       per corpus doc (see Dedup.shingleTable)
    * @param benchShingles  shingle set of the benchmark/holdout; only
    *                       its `sg` column is read, deduped here
    * @param minShared      flag threshold on distinct shared shingles
    * @return (doc_id, n_shared) for flagged docs, ordered by doc_id
    */
  def overlap(corpusShingles: DataFrame, benchShingles: DataFrame,
      minShared: Int = 3): DataFrame =
    corpusShingles
      .join(benchShingles.select("sg").distinct(), "sg")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("doc_id")
}
