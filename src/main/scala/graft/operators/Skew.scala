package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4 / builder mandate: "salting for
  * skew"). AQE's skew-join handles most cases at runtime; explicit salting
  * is for the pathological hot key (one key ≫ a partition) where even a
  * split shuffle block overwhelms a task — the classic power-law user_id.
  *
  * Pattern: spread the LEFT (large, skewed) side over `buckets` salt values
  * and replicate the RIGHT side once per salt, then join on (key, salt).
  * Result is row-identical to the direct join (proved in SkewSpec).
  */
object Skew {

  /** Equi join `left.key == right.key` with the left side salted. `right`
    * is replicated `buckets`× — keep it the smaller side.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int = 16, joinType: String = "inner"): DataFrame = {
    // right/full outer would surface each unmatched (replicated) right row
    // `buckets` times — not row-identical to the direct join
    require(Set("inner", "left", "left_outer", "left_semi", "left_anti")(joinType),
      s"saltedJoin supports left-preserving join types only, got $joinType")
    val salted = left.withColumn("_salt", pmod(monotonically_increasing_id(), lit(buckets)))
    val replicated = right.withColumn("_salt", explode(expr(s"sequence(0, ${buckets - 1})")))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("_salt") === replicated("_salt"),
        joinType)
      .drop("_salt")
  }

  /** Two-phase skewed aggregation: partial-aggregate on (key, salt), then
    * final on key. For algebraic aggs Spark already does this (map-side
    * partial); explicit salting matters for holistic aggs (collect_*,
    * percentile) where one hot key's rows all meet in one task.
    * `partials`: aggregations on the salted stage; `finals`: how to merge.
    */
  def saltedAgg(df: DataFrame, key: String, buckets: Int,
      partials: Seq[Column], finals: Seq[Column]): DataFrame =
    df.withColumn("_salt", pmod(monotonically_increasing_id(), lit(buckets)))
      .groupBy(col(key), col("_salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(finals.head, finals.tail: _*)
}
