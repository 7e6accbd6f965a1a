package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables

/** SURVEY §2K — the windowed counter view, batch form (oracle-checked;
  * the streaming path over the same transform is driven by
  * StreamingSpec through a file-source stream). */
object StreamQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_counters" -> ((s, d) =>
      StreamOps.windowedCounters(Tables.load(s, d, "events"))
        .orderBy("window_start", "event_type")),
  )

  val oracles: Map[String, String] = Map(
    "stream_counters" ->
      """SELECT date_trunc('day', ts) AS window_start, event_type,
        |       count(*) AS n_events, round(sum(value), 4) AS sum_v
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
  )
}
