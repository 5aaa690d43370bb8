package graft

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.ops.Streaming

/** Randomized-input property tests (seeded, deterministic):
  * invariants that must hold for ANY event stream, not just the
  * fixture corpus. Uses scalacheck-style generation with a fixed seed
  * so failures reproduce exactly.
  */
class PropertySpec extends SparkSuite {

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private def randomEvents(seed: Long, n: Int) = {
    val rnd = new Random(seed)
    List.fill(n)((rnd.nextLong(1000000L), 1L + rnd.nextLong(5L),
      rnd.nextLong(6L * 3600), rnd.nextInt(3) match {
        case 0 => "click"; case 1 => "view"; case _ => "purchase"
      }, (1 + rnd.nextInt(10000)) / 100.0))
  }

  private def toDf(evs: List[(Long, Long, Long, String, Double)]) = {
    import spark.implicits._
    evs.map { case (id, u, off, tpe, v) =>
      (id, new Timestamp(base + off * 1000), u, tpe, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("sessions never overlap; consecutive sessions of a user are separated") {
    for (seed <- 1L to 5L) {
      import spark.implicits._
      val sess = Streaming.sessions(toDf(randomEvents(seed, 60)))
        .orderBy($"user_id", $"session_start")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
      sess.groupBy(_._1).values.foreach { ss =>
        ss.sortBy(_._2.getTime).sliding(2).foreach {
          case Array((_, _, end1), (_, start2, _)) =>
            // session_end already includes the 30-min gap, so the next
            // session must start strictly after the previous one's end
            assert(start2.getTime > end1.getTime,
              s"seed $seed: sessions touch/overlap: $end1 vs $start2")
          case _ => ()
        }
      }
    }
  }

  test("tumbling window counts always sum to the input row count") {
    for (seed <- 10L to 14L) {
      val evs = randomEvents(seed, 60)
      val total = Streaming.tumbling(toDf(evs)).agg(sum(col("n")))
        .head().getLong(0)
      assert(total == evs.length.toLong, s"seed $seed")
    }
  }

  test("sliding windows contain each event exactly 4 times") {
    for (seed <- 20L to 24L) {
      val evs = randomEvents(seed, 60)
      val total = Streaming.sliding(toDf(evs)).agg(sum(col("n")))
        .head().getLong(0)
      assert(total == 4L * evs.length, s"seed $seed")
    }
  }

  test("dedup: unique keys, keeps min event_id, idempotent — any input") {
    for (seed <- 30L to 32L) {
      import spark.implicits._
      val df = toDf(randomEvents(seed, 60))
      val out = Streaming.dedupBatch(df)
      val dup = out.groupBy($"user_id", $"event_type").count()
        .filter($"count" > 1).count()
      assert(dup == 0, s"seed $seed: duplicate keys survived")
      val mins = df.groupBy($"user_id", $"event_type")
        .agg(min($"event_id").as("m"))
      val wrong = out.join(mins, Seq("user_id", "event_type"))
        .filter($"event_id" =!= $"m").count()
      assert(wrong == 0, s"seed $seed: kept a non-minimal event_id")
      assert(Streaming.dedupBatch(out.withColumn("value",
        $"value_c" / 100.0)).count() == out.count(), "not idempotent")
    }
  }
}
