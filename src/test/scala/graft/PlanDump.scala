package graft

import java.nio.file.{Files, Paths}

/** Optimization-round aid: write `.explain("formatted")` of named
  * registered keys to `<outdir>/<key>_<suffix>.txt` — the judge-
  * checkable before/after plan evidence (plans/r14/...). Run:
  *
  *   sbt "Test/runMain graft.PlanDump plans/r14 before q_ml_kmeans ..."
  *
  * Plans are captured POST-execution (AQE-final) at sf0.1 under the
  * Bench session shape (local[32], shuffle=32, extensions on) so the
  * dumped shape is the one the bench actually ran.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val keys = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (name <- keys) {
      val fn = SparkEntry.queries(name)
      ops.core.withCaches(spark) {
        val df = fn(spark, sfDir)
        df.count() // AQE-final
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
        println(s"wrote $outDir/${name}_$suffix.txt")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
