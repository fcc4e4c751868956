package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.streaming.EventStream
import graft.streaming.EventStream.Ev

/** Structured Streaming parity: the streaming plans must produce the
  * batch answers once all data is consumed (same code path for windows,
  * keyed-state path for sessions).
  */
class EventStreamSpec extends SparkSpec {

  test("streaming tumbling agg over the file source equals the batch result") {
    // file stream source tails a directory; stage the fixture file into one
    val dir = Files.createTempDirectory("graft-events")
    Files.copy(java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStream.windowedAgg(
        EventStream.readEventsStream(spark, dir.toString), "10 minutes", None)
      .writeStream.format("memory").queryName("tumbling_stream")
      .outputMode("complete")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-t").toString)
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
    val stream = spark.table("tumbling_stream")
      .orderBy("w_start", "event_type").collect()
    val batch = EventOps.tumbling(spark, sf0001)
      .orderBy("w_start", "event_type").collect()
    assert(stream.length == batch.length)
    assert(stream.sameElements(batch))
  }

  test("streaming sessionization equals the batch lag/prefix-sum sessions") {
    import spark.implicits._
    val evs = Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Ev].collect().toSeq
    val maxTs = evs.map(_.ts.getTime).max

    val source = MemoryStream[Ev](spark, numPartitions = 1)
    val q = EventStream.sessionize(source.toDS())
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-s").toString)
      .start()
    def sentinel(off: Long) = Ev(9000000L + off,
      new java.sql.Timestamp(maxTs + off * 3600L * 1000), 999999L, "x", 0.0)
    try {
      source.addData(evs: _*); q.processAllAvailable()
      source.addData(sentinel(2)); q.processAllAvailable() // advance watermark
      source.addData(sentinel(4)); q.processAllAvailable() // fire timeouts
    } finally q.stop()

    val streamed = spark.table("sessions_stream")
      .filter(col("user_id") =!= 999999L)
      .select("user_id", "session_start_us", "n_events", "sum_value")
      .orderBy("user_id", "session_start_us").collect()
    val batch = EventOps.sessions(spark, sf0001)
      .select("user_id", "session_start_us", "n_events", "sum_value")
      .orderBy("user_id", "session_start_us").collect()
    assert(streamed.length == batch.length,
      s"streamed ${streamed.length} vs batch ${batch.length} sessions")
    assert(streamed.sameElements(batch))
  }
}
