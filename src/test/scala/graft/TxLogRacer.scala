package graft

import org.apache.spark.sql.SparkSession

import graft.sources.TxLog

/** Child-process writer for TxLogSpec's CROSS-PROCESS concurrency
  * test: appends `n` single-row batches tagged `tag` to `table` from
  * its own JVM (its own SparkSession, its own filesystem handles), so
  * the optimistic-commit protocol is exercised across real process
  * boundaries — hard-link exclusive-create is the only coordination.
  * Exits 0 only if every append committed.
  */
object TxLogRacer {
  def main(args: Array[String]): Unit = {
    val Array(table, tag, nStr) = args
    val n = nStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]").appName(s"txlog-racer-$tag")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    (1 to n).foreach { i =>
      TxLog.append(spark, table, Seq((i.toLong, s"$tag$i")).toDF("id", "v"))
    }
    spark.stop()
  }
}
