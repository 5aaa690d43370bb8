package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Environment-drift tripwire for the events fixture (r6): the Spark
  * build under /opt/spark changed between rounds and silently flipped
  * what parquet TIMESTAMP(NANOS) infers to (nanosAsLong-BIGINT →
  * TIMESTAMP_NTZ), which broke every events key at the t2 gate until
  * core.events learned to dispatch on the inferred type. These pins
  * make the NEXT such flip fail here, in `sbt test`, with a message
  * that says what moved — not downstream in 46 oracle rows.
  */
class EventsReadSpec extends SparkSuite {
  import spark.implicits._

  test("core.events lands on TimestampType regardless of what the build infers") {
    val ev = ops.core.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType,
      s"core.events produced ${ev.schema("ts").dataType} — " +
        "the environment's parquet-nanos behavior changed again; " +
        "extend the dispatch in core.events (CLAUDE.md r6 gotcha)")
    // the raw inferred type is allowed to be any of the known shapes,
    // but if it is something NEW, say so explicitly
    val raw = spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType
    assert(Set[org.apache.spark.sql.types.DataType](
      LongType, TimestampNTZType, TimestampType).contains(raw),
      s"events.parquet ts inferred as UNSEEN type $raw — audit core.events")
  }

  test("events values are microsecond-exact against the fixture's known range") {
    // TESTDATA.md: events span 30 days from 2024-01-01 (UTC); a
    // truncation or tz shift in the nanos path would move these
    val ev = ops.core.events(spark, sf)
    val (mn, mx) = ev.agg(min($"ts"), max($"ts"))
      .as[(java.sql.Timestamp, java.sql.Timestamp)].head()
    assert(mn.toInstant.toString.startsWith("2024-01-01"),
      s"min ts $mn moved off the fixture epoch")
    assert(mx.toInstant.toString.startsWith("2024-01-3") ||
      mx.toInstant.toString.startsWith("2024-02-0"),
      s"max ts $mx outside the fixture's 30-day window")
    // sub-second components survive the conversion (nanos → µs is
    // lossless on fixtures: every value has zero sub-µs component)
    val nonzeroMicros = ev
      .filter(expr("unix_micros(ts) % 1000000 <> 0")).count()
    assert(nonzeroMicros > 0,
      "every ts lost its sub-second component — a truncation bug, " +
        "not the fixture's shape")
  }
}
