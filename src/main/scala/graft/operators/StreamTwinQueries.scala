package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Batch twins of the streaming operators (SURVEY §2.H). The same
  * `window`/`session_window` expressions run unchanged under Structured
  * Streaming (see graft.streaming.StreamingJobs); running them in batch
  * makes them oracle-checkable. Event-time semantics here are the upgrade
  * over the reference's arrival-time minute-bucket counters.
  */
object StreamTwinQueries extends QueryModule {

  /** H2: sliding window (1 h window, 15 min slide — every event lands in 4
    * windows). Oracle enumerates the window starts arithmetically.
    */
  private val windowSliding = QueryDef(
    "q_window_sliding",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(Ql.tstr(col("window.start")).as("w_start"), col("event_type"), col("n"))
        .orderBy("w_start", "event_type"),
    Some("""
      SELECT strftime(make_timestamp(s * 1000000), '%Y-%m-%d %H:%M:%S') AS w_start,
             event_type, count(*) AS n
      FROM (SELECT event_type,
                   (epoch_ns(ts) // 1000000000 // 900) * 900 - j.i * 900 AS s
            FROM events, generate_series(0, 3) j(i))
      GROUP BY 1, 2 ORDER BY 1, 2
    """))

  /** H3: session window (30 min inactivity gap) per user, summarized.
    * Oracle is the classic gaps-and-islands rewrite: a session break is a
    * gap of >= 30 min (Spark's session end bound `last + gap` is exclusive).
    */
  private val windowSession = QueryDef(
    "q_window_session",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_in_session"))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_sessions"),
          sum(col("n_in_session")).as("n_events"),
          max(col("n_in_session")).as("max_session_events"))
        .orderBy("user_id"),
    Some("""
      WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         < INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_s
        FROM events),
      sess AS (
        SELECT user_id,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged),
      counts AS (SELECT user_id, sid, count(*) AS n FROM sess GROUP BY 1, 2)
      SELECT user_id, count(*) AS n_sessions,
             CAST(sum(n) AS BIGINT) AS n_events, max(n) AS max_session_events
      FROM counts GROUP BY 1 ORDER BY 1
    """))

  /** H5/F6: deterministic dedup — keep the first record per
    * (user_id, event_type) by event time. The streaming twin is
    * `withWatermark + dropDuplicates`; batch uses row_number so "first" is
    * well-defined for the oracle.
    */
  private val dedupEvents = QueryDef(
    "q_dedup_events",
    (spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      Tables.events(spark, sfDir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_kept"), sum(col("event_id")).as("sum_kept_ids"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type, count(*) AS n_kept,
             CAST(sum(event_id) AS BIGINT) AS sum_kept_ids
      FROM (SELECT * FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts, event_id) = 1)
      GROUP BY 1 ORDER BY 1
    """))

  /** Session dwell-time distribution — per-session durations from the
    * same 30-min gaps-and-islands sessionization as `q_window_session`'s
    * oracle, rolled up into an event-count-banded report (how long do
    * 1-event vs 5+-event sessions last). Durations subtract exact epoch
    * MICROSECONDS and integer-divide to seconds, so the engines agree to
    * the tick; all windows ride one (user_id, ts, event_id)
    * partition/sort, so the plan is one shuffle + one sort reused by the
    * flag, the session id, and the per-session bounds at any scale.
    */
  private val sessionDwell = QueryDef(
    "q_session_dwell",
    (spark, sfDir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val sess = Tables.events(spark, sfDir)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("new_s",
          when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
            < 1800000000L, 0L).otherwise(1L))
        .withColumn("sid", sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("n_ev"),
          ((max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
            / lit(1000000L)).cast("long").as("dwell_sec"))
      sess.groupBy(least(col("n_ev"), lit(5L)).as("events_band"))
        .agg(count(lit(1)).as("n_sessions"),
          Ql.r(avg(col("dwell_sec")), 2).as("avg_dwell_sec"),
          max(col("dwell_sec")).as("max_dwell_sec"))
        .orderBy("events_band")
    },
    Some(s"""
      WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id))
                         < 1800000000
                    THEN 0 ELSE 1 END AS new_s
        FROM events),
      sess AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged),
      per AS (
        SELECT user_id, sid, count(*) AS n_ev,
               (max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000 AS dwell_sec
        FROM sess GROUP BY 1, 2)
      SELECT least(n_ev, 5) AS events_band, count(*) AS n_sessions,
             ${Ql.R("avg(dwell_sec)", 2)} AS avg_dwell_sec,
             max(dwell_sec) AS max_dwell_sec
      FROM per GROUP BY 1 ORDER BY 1
    """))

  override def defs: Seq[QueryDef] =
    Seq(windowSliding, windowSession, dedupEvents, sessionDwell)
}
