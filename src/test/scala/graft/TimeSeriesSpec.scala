package graft

import org.apache.spark.sql.functions._
import graft.operators.TimeSeries
import graft.sources.Tables

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("sliding_window_agg: every event lands in exactly 4 overlapping windows") {
    val slid = TimeSeries.slidingWindowAgg(spark, sf)
    val total = slid.agg(sum($"n")).first().getLong(0)
    val events = Tables.events(spark, sf).count()
    assert(total == 4 * events, s"window fanout: $total != 4 * $events")
  }

  test("sliding_window_agg: on-the-hour windows reproduce the tumbling hourly agg") {
    val hourly = TimeSeries.eventsHourly(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val onHour = TimeSeries.slidingWindowAgg(spark, sf)
      .filter(substring($"w_start", 15, 5) === "00:00").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // every hourly bucket appears as the hour-aligned sliding window
    for ((k, v) <- hourly) assert(onHour.get(k).contains(v), s"bucket $k: ${onHour.get(k)} != $v")
  }
}
