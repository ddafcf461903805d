package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.classic
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.graftbridge.{ColumnBridge => CB}

/** Bridge for an eager localCheckpoint that KEEPS a hash-partitioning
  * claim. Under AQE, `Dataset.localCheckpoint` wraps the materialized RDD
  * in a LogicalRDD whose outputPartitioning is unknown (the adaptive
  * plan's partitioning is not visible at checkpoint time), so every
  * downstream operator keyed the same way re-shuffles data that is
  * ALREADY laid out correctly — for an iterative job that joins a large
  * checkpointed table per round, that is one full-table exchange per
  * round for nothing (guide §2.4). The caller repartitions by `keys`
  * immediately before calling, and this bridge re-declares exactly that
  * partitioning on the flat LogicalRDD leaf (lineage stays truncated, so
  * the per-round Catalyst re-analysis cost stays flat — the NOTES #13
  * constraint that rules out plain `.cache()` for loop-invariant tables).
  */
object CheckpointBridge {

  /** Eagerly localCheckpoints `df.repartition(keys)` and returns a frame
    * whose leaf declares HashPartitioning(keys, n): downstream joins and
    * aggregations clustered by `keys` (or a superset) skip their
    * exchange. The claim is true by construction — the repartition runs
    * INSIDE this call, immediately before the checkpoint.
    */
  def localCheckpointPartitionedBy(df: org.apache.spark.sql.DataFrame,
      keys: Seq[String]): org.apache.spark.sql.DataFrame = {
    val session = df.sparkSession.asInstanceOf[classic.SparkSession]
    val ck = df.repartition(keys.map(df.col): _*).localCheckpoint(true)
      .asInstanceOf[classic.DataFrame]
    val attrs = ck.queryExecution.analyzed.output
    val keyAttrs = keys.map(k => attrs.find(_.name == k).getOrElse(
      throw new IllegalArgumentException(s"no column $k in ${attrs.map(_.name)}")))
    val rdd = ck.queryExecution.toRdd
    val part = HashPartitioning(keyAttrs, rdd.getNumPartitions)
    classic.Dataset.ofRows(session,
      LogicalRDD(attrs, rdd, part, Nil, isStreaming = false, None)(
        session, None, None))
  }
}
