package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.queries.TrainingPack

/** The flagship pipeline's stage-boundary medium is a knob
  * (checkpointDir on [[TrainingPack.pipelineFull]]): None = eager
  * localCheckpoint (the gate's single-node shape), Some(dir) = RELIABLE
  * `df.checkpoint()` under that dir (the cluster-scale shape — durable
  * boundaries that survive executor loss). A checkpoint is a pure
  * materialization boundary, so the two runs must produce IDENTICAL
  * rows; this spec pins that equality and proves the reliable path
  * actually engaged (checkpoint files land under the dir).
  */
class PipelineCheckpointSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("pipelineFull is invariant to the stage-boundary medium and the reliable path engages") {
    val ckDir = java.nio.file.Files.createTempDirectory("graft_pipe_ck")
    try {
      val local = TrainingPack.pipelineFull(spark, dir).collect().toSeq
      Shared.releaseAll(spark); spark.catalog.clearCache()
      val reliable =
        TrainingPack.pipelineFull(spark, dir, Some(ckDir.toString)).collect().toSeq
      Shared.releaseAll(spark); spark.catalog.clearCache()
      assert(local.nonEmpty, "pipeline produced no rows at sf0.001")
      assert(local == reliable,
        s"stage-boundary medium changed the result: ${local.size} local rows vs " +
          s"${reliable.size} reliable rows")
      // the knob must have routed boundaries through the dir — an
      // empty checkpoint tree means the reliable branch silently
      // fell back to local blocks
      val ckFiles = java.nio.file.Files.walk(ckDir).filter(
        java.nio.file.Files.isRegularFile(_)).count()
      assert(ckFiles > 0, s"no checkpoint files under $ckDir — reliable boundaries never engaged")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(ckDir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
