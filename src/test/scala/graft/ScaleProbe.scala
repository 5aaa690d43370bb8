package graft

import org.apache.spark.sql.functions._

/** Scale probe for the round-2 operators (dev/judge aid): drives
  * `sessionize` and `connectedComponents` at sizes far above the
  * fixtures using the file-less synthetic source / generated graphs.
  * Run:
  *
  *   sbt "Test/runMain graft.ScaleProbe"
  *
  * Prints one line per probe; update SCALING.md from the output.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // 5M synthetic events -> gap sessionization
    val ev = spark.read.format("graft.sources.SyntheticEventsProvider")
      .option("rows", "5000000").option("partitions", "16").load()
      .select($"user_id", $"event_id", $"ts")
    timed("sessionize 5M events") {
      val n = ops.Windows.sessionize(ev).count()
      print(s"  ($n sessions) ")
    }

    // near-dup-shaped graph: 100k clusters x 10 members, edges chain
    // each cluster (diameter 9 -> converges well under the cap)
    val edges = spark.range(0, 1000000L)
      .filter($"id" % 10 =!= 9)
      .select($"id".as("a_id"), ($"id" + 1).as("b_id"))
    timed("connectedComponents 900k edges / 1M nodes") {
      val comps = ops.TrainingOps.connectedComponents(edges)
      val n = comps.select($"comp").distinct().count()
      print(s"  ($n components) ")
    }

    spark.stop()
  }
}
