package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Batch-twin == streaming-twin on the REAL events fixture (VERDICT r8 §next 6).
  *
  * EventStreamsSpec proves streaming semantics on inline MemoryStream frames;
  * this spec reads `/root/testdata/sf0.001/events.parquet` through BOTH the
  * batch loader ([[graft.engine.Tables.events]]) and the file-stream loader
  * ([[EventStreams.readEvents]]), so a fixture regeneration that changes the
  * physical `ts` type (the round-8 breakage) turns the streaming path red in
  * `sbt test` too, not just the batch path.
  */
class StreamingFixtureTwinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val d = "/root/testdata/sf0.001"

  /** The file-stream source requires a DIRECTORY (a landing zone); the
    * fixture is a single file. Stage an untouched copy into a temp dir —
    * the bytes streamed are exactly the fixture's. */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream_fixture")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$d/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toFile.deleteOnExit()
    dir.toString
  }

  test("hourly window: file-stream twin over the real fixture equals the batch query") {
    val batch = SparkEntry.queries("q_hourly_window")(spark, d)
      .as[(String, Long, Double)].collect().toSeq

    val q = EventStreams.hourlyWindowStream(
        EventStreams.readEvents(spark, eventsDir))
      .writeStream.outputMode("complete").format("memory")
      .queryName("hw_fixture_twin").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hw_fixture_twin")
        .as[(String, Long, Double)].collect().toSeq.sortBy(_._1)
      assert(streamed.nonEmpty, "streaming twin produced no windows")
      assert(streamed == batch,
        s"streaming twin diverged from batch twin: " +
          s"${streamed.size} vs ${batch.size} windows; " +
          s"first diff: ${streamed.zip(batch).find { case (a, b) => a != b }}")
    } finally q.stop()
  }

  test("streamed fixture rows carry session-TZ timestamps identical to the batch loader") {
    val batchTs = graft.engine.Tables.events(spark, d)
      .select($"event_id", $"ts".cast("string")).as[(Long, String)]
      .collect().toMap

    val q = EventStreams.readEvents(spark, eventsDir)
      .select($"event_id", $"ts".cast("string"))
      .writeStream.outputMode("append").format("memory")
      .queryName("ev_fixture_rows").start()
    try {
      q.processAllAvailable()
      val streamedTs = spark.table("ev_fixture_rows")
        .as[(Long, String)].collect().toMap
      assert(streamedTs.size == batchTs.size)
      assert(streamedTs == batchTs, "per-row ts mismatch between loaders")
    } finally q.stop()
  }
}
