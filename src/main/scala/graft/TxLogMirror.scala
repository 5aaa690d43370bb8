package graft

import org.apache.spark.sql.SparkSession

import graft.sources.TxLog

/** Mirror the fixture parquet tables of a scale-factor dir into txlog
  * tables (round-12 facade sweep):
  *
  * {{{
  * tools/run_direct.sh mirror /root/testdata/sf0.01 /tmp/txmirror
  * SPARK_GRAFT_TXLOG_MIRROR=/tmp/txmirror \
  *   tools/run_direct.sh verify /root/testdata/sf0.01 /tmp/v_txlog
  * }}}
  *
  * Each table is read with the exact value-preserving settings
  * `core.t` uses (events keeps its raw NANOS LONG `ts` — the facade
  * branch of core.t rebuilds micros identically to the parquet
  * branch) and lands as one transactional append, so the mirrored
  * txlog table serves byte-equal values through the lakehouse read
  * path.
  */
object TxLogMirror {

  val tables: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: TxLogMirror <sfDir> <mirrorRoot>")
    val (sfDir, root) = (args(0), args(1))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("txlog-mirror")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    tables.foreach { name =>
      val target = s"$root/$name"
      if (TxLog.exists(target)) {
        println(s"[mirror] $name: already mirrored, skipping")
      } else {
        val t0 = System.nanoTime()
        // raw parquet read (NOT core.t): events must keep its nanos
        // LONG ts so the mirror is value-exact at the byte level
        val df = spark.read.parquet(s"$sfDir/$name.parquet")
        val v = TxLog.append(spark, target, df)
        val rows = TxLog.read(spark, target).count()
        println(f"[mirror] $name: v$v%d, $rows%d rows in " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    }
    spark.stop()
  }
}
