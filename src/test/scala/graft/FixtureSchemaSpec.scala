package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.types.TimestampType

/** Fixture-schema drift diagnostics (VERDICT r6 #4): a regenerated
  * testdata fixture must fail in seconds with a message naming the
  * drifted column, never as a silently shrinking correctness board.
  * The events `ts` encodings exercised here are the three the fixture
  * has actually shipped across rounds: nanos-annotated int64 (legacy
  * read path), native timestamp[us], and — as the unabsorbable case —
  * a string column.
  */
class FixtureSchemaSpec extends SparkSpec {

  private def resource(name: String): String =
    getClass.getResource(s"/drift/$name").getPath

  private def stageEvents(src: String): String = {
    val dir = Files.createTempDirectory("graft-drift")
    Files.copy(Paths.get(src), dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("current fixture has zero drift") {
    assert(GraftSession.fixtureSchemaDrift(spark, sf()) == Seq.empty)
  }

  test("nanos-era events fixture is absorbed by the adaptive reader") {
    val dir = stageEvents(resource("nanos-events.parquet"))
    val df = GraftSession.readTable(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    val first = df.orderBy("event_id").select("ts").collect().head.getTimestamp(0)
    // 1704067200e9 ns = 2024-01-01T00:00:00Z; session TZ is UTC
    assert(first.toInstant == java.time.Instant.parse("2024-01-01T00:00:00Z"))
    // and the drift check agrees there is nothing to report for events
    val drift = GraftSession.fixtureSchemaDrift(spark, dir)
    assert(!drift.exists(_.startsWith("events")), drift.mkString("; "))
  }

  test("raw-long ts (no logical type) is treated as epoch nanos") {
    // a long column named ts hits the LongType normalization branch
    import spark.implicits._
    val df = GraftSession.normalizeEventsTs(
      Seq((1L, 1704067200_000_000_000L)).toDF("event_id", "ts"))
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.collect().head.getTimestamp(1).toInstant ==
      java.time.Instant.parse("2024-01-01T00:00:00Z"))
  }

  test("unabsorbable drift names the column: events.ts as string") {
    val dir = stageEvents(resource("stringts-events.parquet"))
    val drift = GraftSession.fixtureSchemaDrift(spark, dir)
    val eventsDrift = drift.filter(_.startsWith("events"))
    assert(eventsDrift.nonEmpty)
    assert(eventsDrift.exists(_.contains("events.ts")), eventsDrift.mkString("; "))
  }
}
