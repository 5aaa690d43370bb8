package graft

import org.apache.spark.sql.SparkSession

import graft.sources.TxLog

/** Child-process writer for TxLogSpec's CROSS-PROCESS concurrency
  * tests: runs `n` operations tagged `tag` against `table` from its
  * own JVM (its own SparkSession, its own filesystem handles), so the
  * optimistic-commit protocol is exercised across real process
  * boundaries — hard-link exclusive-create is the only coordination.
  * The optional 4th arg picks the op: `append` (default) commits
  * single-row batches and rebases freely; `upsert` replaces
  * per-process keys, RETRYING on the designed
  * ConcurrentModificationException (an upsert racing any non-compact
  * add must lose and retry — the duplicate-key rule); `compact`
  * bin-packs, retrying when a racing rewrite invalidated its read
  * set. Exits 0 only if every op eventually committed.
  */
object TxLogRacer {

  private def retrying[T](what: String)(f: => T): T = {
    var attempts = 0
    while (true) {
      attempts += 1
      require(attempts <= 300, s"$what still conflicted after 300 tries")
      try return f
      catch {
        case _: java.util.ConcurrentModificationException =>
          Thread.sleep(20L + scala.util.Random.nextInt(60))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  def main(args: Array[String]): Unit = {
    val (table, tag, n, mode) = args match {
      case Array(t, g, c)    => (t, g, c.toInt, "append")
      case Array(t, g, c, m) => (t, g, c.toInt, m)
      case _ => sys.error("usage: TxLogRacer <table> <tag> <n> [mode]")
    }
    val spark = SparkSession.builder()
      .master("local[2]").appName(s"txlog-racer-$tag")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    (1 to n).foreach { i =>
      mode match {
        case "append" =>
          TxLog.append(spark, table,
            Seq((i.toLong, s"$tag$i")).toDF("id", "v"))
        case "upsert" =>
          retrying(s"upsert $tag$i") {
            TxLog.upsert(spark, table,
              Seq((i.toLong, s"$tag$i")).toDF("id", "v"), "id")
          }
        case "compact" =>
          retrying(s"compact $i") {
            TxLog.compact(spark, table, targetFiles = 2)
          }
        case other => sys.error(s"unknown racer mode: $other")
      }
    }
    spark.stop()
  }
}
