package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: run only these keys (dev loop; the driver
    // always passes exactly two args and gets the full set)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // run in CLI-arg order when keys are given (scheduling long scale
    // runs needs cheap-first/heavy-last control; a Map iterates in
    // arbitrary order), and log per-key progress so a stalled scale
    // run is identifiable from the log
    // ADVICE r9: an unknown/typo'd requested key must fail LOUDLY —
    // silently dropping it produces no dump dir, which then silently
    // exits scale-gate coverage (the exact class the gate coverage
    // checks exist to stop)
    val unknown = args.drop(2).distinct.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      unknown.foreach(n => System.err.println(s"[verify] unknown key $n"))
      sys.exit(2)
    }
    val selected: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      if (only.isEmpty) SparkEntry.queries.toSeq
      else args.drop(2).distinct.toSeq.flatMap(n =>
        SparkEntry.queries.get(n).map(n -> _))
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    selected.foreach { case (name, fn) =>
      System.err.println(s"[verify] start $name")
      val t0 = System.nanoTime()
      // withCaches releases this key's tracked caches + localCheckpoint
      // blocks on exit; clearCache stays as a belt-and-braces sweep for
      // anything a future op might pin outside the tracker
      ops.core.withCaches(spark) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
      val sec = (System.nanoTime() - t0) / 1e9
      timings(name) = sec
      System.err.println(f"[verify] done $name in $sec%.1f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // per-key wall seconds, for the scale gates' no-oracle drift probes
    Files.writeString(Paths.get(s"$outDir/timings.json"),
      timings.map { case (k, v) => f""""$k": $v%.2f""" }
        .mkString("{", ",", "}"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
