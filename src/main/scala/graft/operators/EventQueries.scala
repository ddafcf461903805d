package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Stream-shaped queries over the `events` table — the batch twins of the
  * reference's Kinesis→Lambda aggregation patterns (per-time-bucket keyed
  * counters in DynamoDB). Event-time bucketing here is a semantic upgrade
  * over the reference's arrival-time minute keys.
  */
object EventQueries extends QueryModule {

  /** Flagship: hourly event stats — tumbling-window batch twin (SURVEY §2.H1).
    * The Lambda equivalent: per (metric, hour) DynamoDB ADD counters.
    */
  val hourlyEventStats: QueryDef = QueryDef(
    "q_hourly_event_stats",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          Ql.r(sum(col("value"))).as("sum_value"),
          Ql.r(avg(col("value"))).as("avg_value"))
        .orderBy("hour", "event_type"),
    Some(s"""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             event_type,
             count(*) AS n_events,
             ${Ql.R("sum(value)")} AS sum_value,
             ${Ql.R("avg(value)")} AS avg_value
      FROM events
      GROUP BY 1, 2
      ORDER BY 1, 2
    """))

  override def defs: Seq[QueryDef] = Seq(hourlyEventStats)
}
