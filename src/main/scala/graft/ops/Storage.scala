package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned storage layout: hive-style `partitionBy` write plus the
  * two read-side pruning mechanisms every 100 TB table lives by —
  * static partition pruning (a literal predicate on the partition
  * column never touches other partitions' files) and dynamic partition
  * pruning (a selective dim-side filter prunes fact partitions at
  * RUNTIME via a broadcast-reused subquery).
  *
  * Capability contract: /root/reference/README.md:2 ("transformations
  * on ... collections") — at warehouse scale a collection IS a
  * partitioned directory tree, and pruning is what makes reading it
  * tractable. This key converts SURVEY §4.1's "DPP — inert here
  * (single-file fixtures)" row into tested capability.
  *
  * Scale shape: the write repartitions BY the partition column first,
  * so each date's rows land in one task → one file per partition dir
  * instead of (tasks × partitions) small files — the production
  * layout-job shape (at 100 TB you'd add `repartitionByRange` on
  * (event_date, graft_zorder(...)) for intra-partition clustering;
  * `q_zorder_layout` audits that key). The read is a broadcast join
  * whose fact-side scan carries both `PartitionFilters` and a
  * `dynamicpruning` subquery — asserted in StorageLayoutSpec.
  */
object Storage {

  /** One layout write per (fixture dir) per JVM — the written tree is
    * deterministic, so re-running a key re-reads, never re-writes.
    */
  private val written = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Peak-date rule shared by dim-write and oracle: day-offset from
    * 2024-01-01 ≡ 5 (mod 7) — 4 of the fixtures' 30 dates, selective
    * enough that an unpruned scan is visibly wrong in the spec's
    * numFiles assertion.
    */
  private val peakRule = (d: org.apache.spark.sql.Column) =>
    datediff(d, to_date(lit("2024-01-01"))) % 7 === 5

  /** Write (once) the hive-partitioned events tree + a small date dim
    * whose `peak` flag is data — NOT statically derivable by Catalyst
    * from the fact side, so only runtime (dynamic) pruning can skip
    * fact partitions for a `peak` filter. Returns the layout root.
    */
  def layoutDir(s: SparkSession, dir: String): String =
    written.computeIfAbsent(dir, _ => {
      val base = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        "graft_part_layout-" + dir.replaceAll("[^A-Za-z0-9.-]", "_"))
        .getAbsolutePath
      val ev = core.events(s, dir)
        .withColumn("event_date", to_date(col("ts")))
      ev.repartition(col("event_date"))
        .write.mode("overwrite").partitionBy("event_date")
        .parquet(s"$base/events_by_date")
      ev.select(col("event_date")).distinct()
        .withColumn("peak", peakRule(col("event_date")))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$base/date_dim")
      base
    })

  /** The doubly-pruned fact read (shared with StorageLayoutSpec's plan
    * assertions): static `event_date >=` predicate → `PartitionFilters`
    * on the scan; broadcast-joined `peak` dim filter → DPP subquery.
    */
  def prunedRead(s: SparkSession, dir: String): DataFrame = {
    val base = layoutDir(s, dir)
    val fact = s.read.parquet(s"$base/events_by_date")
      .filter(col("event_date") >= lit("2024-01-05").cast("date"))
    val dim = s.read.parquet(s"$base/date_dim").filter(col("peak"))
    fact.join(broadcast(dim.select(col("event_date"))), Seq("event_date"))
  }

  /** Per-type rollup over the pruned read; oracle recomputes from the
    * original single-file events table (round-trip equivalence: the
    * partitioned copy must preserve every row and value exactly).
    */
  def qPartLayout(s: SparkSession, dir: String): DataFrame = {
    prunedRead(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(core.cents(col("value"))).as("sum_c"),
        countDistinct(col("event_date")).as("n_days"))
      .orderBy(col("event_type"))
  }

  /** Write (once) a two-generation parquet dir: generation 1 files
    * lack the `quality_c` column that generation 2 adds — the shape a
    * recurring-ingest table takes the week a new scoring stage ships.
    * Generations split deterministically on doc_id parity so the
    * oracle can recompute from the unevolved source table.
    */
  def evolvedDir(s: SparkSession, dir: String): String =
    written.computeIfAbsent(dir + "#evo", _ => {
      val base = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        "graft_schema_evo-" + dir.replaceAll("[^A-Za-z0-9.-]", "_"))
        .getAbsolutePath
      val docs = core.t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      docs.filter(col("doc_id") % 2 === 0)
        .coalesce(1).write.mode("overwrite").parquet(base)
      docs.filter(col("doc_id") % 2 === 1)
        .withColumn("quality_c", (col("n_chars") % 997).cast("long"))
        .coalesce(1).write.mode("append").parquet(base)
      base
    })

  /** Read across the evolution boundary with `mergeSchema` (footer
    * union — fine at fixture scale) and aggregate per lang; pre-
    * evolution rows surface `quality_c` as NULL, which null-skipping
    * `count`/`sum` handle exactly. 100 TB posture (pinned in
    * SchemaEvolutionSpec): mergeSchema is an O(files) footer sweep —
    * a production table supplies ONE explicit unified schema via
    * `read.schema(...)`, which Spark applies by name with nulls for
    * absent columns; both reads are asserted identical. All outputs
    * are exact integers — no double summation across the boundary.
    */
  def qSchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val evolved = s.read.option("mergeSchema", "true")
      .parquet(evolvedDir(s, dir))
    evolved.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        count(col("quality_c")).as("n_evolved"),
        sum(col("quality_c")).as("sum_q"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_part_layout" -> (qPartLayout _),
    "q_schema_evolution" -> (qSchemaEvolution _))

  val oracle: Map[String, String] = Map(
    "q_part_layout" ->
      """WITH f AS (
        |  SELECT event_type, CAST(ts AS DATE) AS event_date,
        |    CAST(round(value*100) AS BIGINT) AS v_c
        |  FROM events
        |  WHERE CAST(ts AS DATE) >= DATE '2024-01-05'
        |    AND CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) % 7 = 5)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(v_c) AS BIGINT) AS sum_c,
        |  count(DISTINCT event_date) AS n_days
        |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_schema_evolution" ->
      """WITH evo AS (
        |  SELECT lang, n_chars,
        |    CASE WHEN doc_id % 2 = 1
        |         THEN CAST(n_chars % 997 AS BIGINT) END AS quality_c
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  count(quality_c) AS n_evolved,
        |  CAST(sum(quality_c) AS BIGINT) AS sum_q,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM evo GROUP BY lang ORDER BY lang""".stripMargin)
}
