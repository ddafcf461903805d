package graft

import graft.multimodal.MultimodalPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal plumbing: binary payloads survive the round trip, the
  * partition-batched decode is deterministic and partition-count-invariant,
  * and frame fan-out matches the declared frame counts.
  */
class MultimodalSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  test("decode is deterministic and invariant to partitioning") {
    val media = MultimodalPipeline.mediaTable(spark, sf)
    val a = MultimodalPipeline.extractFeatures(media)
      .select("doc_id", "width", "height", "n_frames")
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val b = MultimodalPipeline.extractFeatures(media.repartition(7))
      .select("doc_id", "width", "height", "n_frames")
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("payload bytes round-trip (binary column is opaque, not re-encoded)") {
    val media = MultimodalPipeline.mediaTable(spark, sf)
    val mismatches = media.toDF()
      .join(Tables.documents(spark, sf), "doc_id")
      .filter(col("payload") =!= encode(col("text"), "UTF-8"))
      .count()
    assert(mismatches == 0)
  }

  test("frame fan-out produces exactly n_frames rows per object") {
    val feats = MultimodalPipeline.extractFeatures(
      MultimodalPipeline.mediaTable(spark, sf).filter(col("doc_id") < 50))
    val frames = MultimodalPipeline.sampleFrames(feats)
    val counts = frames.groupBy("doc_id").count()
      .join(feats.select(col("doc_id"), col("n_frames")), "doc_id")
      .filter(col("count") =!= col("n_frames")).count()
    assert(counts == 0)
    assert(frames.select("frame_hash").distinct().count() == frames.count())
  }

  test("media_type routing covers all three modalities") {
    val types = MultimodalPipeline.mediaTable(spark, sf)
      .toDF().select("media_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types == Set("image", "audio", "video"))
  }
}
