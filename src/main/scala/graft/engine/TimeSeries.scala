package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.{Tables => T}
import graft.engine.Exact._

/** Time-series regularization over the events stream: hourly
  * resampling with gap materialization and forward-fill. The reference
  * renders raw event rows only; an analytics engine needs the
  * dense-grid form for charting, rate computation, and feature
  * windows over irregular streams.
  *
  * Scale posture: the grid explode and the forward-fill window are
  * both PARTITIONED BY the series key (user), so a 100 TB run is
  * embarrassingly parallel per key — no global sort anywhere. Grid
  * size is bounded by span/granularity per key (here ~720 rows per
  * user-month), not by event count.
  */
object TimeSeries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Hourly resample of each user's value stream: materialize every
    // hour from the user's first to last event (sequence + explode —
    // map-side per key), left-join the actual hourly aggregates so
    // silent hours surface as n_events=0 rows, and forward-fill the
    // last observed hourly sum across the gap (the step-function
    // reading a dashboard or a feature pipeline wants). The exact
    // scaled-integer sum keeps the hourly values bit-stable under any
    // partitioning.
    "q94_gapfill_ffill" -> ((s, dir) => {
      import s.implicits._
      val ev = T.events(s, dir).filter($"user_id" < 10)
      val hourly = ev
        .groupBy($"user_id", date_trunc("hour", $"ts").as("h"))
        .agg(msum($"value").as("v_hour"), count(lit(1)).as("n_events"))
      val grid = ev
        .groupBy($"user_id")
        .agg(date_trunc("hour", min($"ts")).as("h0"),
          date_trunc("hour", max($"ts")).as("h1"))
        .select($"user_id",
          explode(sequence($"h0", $"h1", expr("interval 1 hour"))).as("h"))
      val w = Window.partitionBy($"user_id").orderBy($"h")
        .rowsBetween(Window.unboundedPreceding, 0)
      grid.join(hourly, Seq("user_id", "h"), "left")
        .select($"user_id", $"h",
          coalesce($"n_events", lit(0L)).as("n_events"),
          $"v_hour",
          last($"v_hour", ignoreNulls = true).over(w).as("v_ffill"))
        .orderBy($"user_id", $"h")
    }))

  val oracle: Map[String, String] = Map(
    "q94_gapfill_ffill" ->
      s"""WITH ev AS (
         |  SELECT user_id, ts, value FROM events WHERE user_id < 10),
         |hourly AS (
         |  SELECT user_id, date_trunc('hour', ts)::TIMESTAMP AS h,
         |    ${msumSql("value")} AS v_hour, count(*) AS n_events
         |  FROM ev GROUP BY user_id, date_trunc('hour', ts)::TIMESTAMP),
         |grid AS (
         |  SELECT user_id, unnest(generate_series(
         |      date_trunc('hour', min(ts))::TIMESTAMP,
         |      date_trunc('hour', max(ts))::TIMESTAMP,
         |      INTERVAL 1 HOUR)) AS h
         |  FROM ev GROUP BY user_id)
         |SELECT g.user_id, g.h, coalesce(hr.n_events, 0) AS n_events,
         |  hr.v_hour,
         |  last_value(hr.v_hour IGNORE NULLS) OVER (
         |    PARTITION BY g.user_id ORDER BY g.h
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
         |FROM grid g LEFT JOIN hourly hr
         |  ON hr.user_id = g.user_id AND hr.h = g.h
         |ORDER BY g.user_id, g.h""".stripMargin)
}
