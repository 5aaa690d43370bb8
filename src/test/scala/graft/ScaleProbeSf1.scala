package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf0.1 → sf1 scaling probe for the heaviest key families
  * (VERDICT r4 ask #7): generates synthetic fixtures with sf0.1's
  * schema and row counts at scale S = 1 and S = 10 (≈ sf1), runs the
  * dedup / ANN / graph keys through their REAL SparkEntry entry
  * points on each, and prints the measured scaling exponent
  * log10(t₁₀/t₁) per key — ~1 means linear, ~2 quadratic. Update
  * SCALING.md's table from the output:
  *
  *   sbt "Test/runMain graft.ScaleProbeSf1"
  *
  * Generation is deterministic (hash-derived, no rand()) and mirrors
  * the structure the ops exploit: documents arrive in near-dup
  * clusters of 10 (53 of 54 tokens shared — the candidate-pair load
  * is REAL, not the random-text case where blocking is vacuous) over
  * a Zipf-ish vocabulary (1/3 of tokens from 30 hot words);
  * embeddings are clustered (50/centre + deterministic jitter), the
  * structure IVF/LSH/SemDeDup block on. The O(n²)-by-declared-
  * semantics keys (q_sim_cosine_topk and friends) are intentionally
  * absent — their scale path IS the ANN family probed here.
  */
object ScaleProbeSf1 {

  private def synDir(spark: SparkSession, scale: Int): String = {
    // v2 (r6): FULL sf0.1 schemas — region/nation/customer/supplier/
    // part/events and the complete orders/lineitem column sets — so
    // the 10× correctness gate covers the relational/window/scalar
    // families too, not just the documents/embeddings ops. Everything
    // stays hash-derived and deterministic; money columns are 2-dp
    // (cents-exact); events.ts is written as MICROS TimestampType
    // (core.events' pass-through branch — the real fixtures' NANOS
    // shape is covered by the real tables).
    val base = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_sfsyn_v2_$scale")
    val done = new java.io.File(base, "_DONE")
    if (done.exists()) return base.getAbsolutePath
    val nDocs = 5000L * scale
    val nVecs = 2000L * scale
    val nOrders = 150000L * scale
    val nLines = 600000L * scale
    val nCust = 15000L * scale
    val nSupp = 1000L * scale
    val nPart = 20000L * scale
    val nEvents = 100000L * scale

    val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
    spark.range(0, 5).select(col("id").cast("int").as("r_regionkey"),
        element_at(array(regions.map(lit): _*), col("id").cast("int") + 1)
          .as("r_name"))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/region.parquet")
    spark.range(0, 25).select(col("id").cast("int").as("n_nationkey"),
        concat(lit("NATION_"), col("id")).as("n_name"),
        (col("id") % 5).cast("int").as("n_regionkey"))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/nation.parquet")

    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    spark.range(0, nCust).select((col("id") + 1).as("c_custkey"),
        concat(lit("Customer#"), col("id") + 1).as("c_name"),
        pmod(hash(col("id") * 7), lit(25)).cast("int").as("c_nationkey"),
        (pmod(hash(col("id") * 11), lit(1100000)) / 100.0 - 1000.0)
          .as("c_acctbal"),
        element_at(array(segs.map(lit): _*),
          pmod(hash(col("id") * 13), lit(5)).cast("int") + 1)
          .as("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$base/customer.parquet")
    spark.range(0, nSupp).select((col("id") + 1).as("s_suppkey"),
        concat(lit("Supplier#"), col("id") + 1).as("s_name"),
        pmod(hash(col("id") * 17), lit(25)).cast("int").as("s_nationkey"),
        (pmod(hash(col("id") * 19), lit(1100000)) / 100.0 - 1000.0)
          .as("s_acctbal"))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/supplier.parquet")

    val colors = Seq("red", "blue", "green", "small", "large")
    val things = Seq("widget", "bolt", "ring", "case", "spring")
    val types = Seq("STANDARD", "LARGE", "MEDIUM", "PROMO", "SMALL")
    spark.range(0, nPart).select((col("id") + 1).as("p_partkey"),
        concat(
          element_at(array(colors.map(lit): _*),
            pmod(hash(col("id") * 3), lit(5)).cast("int") + 1),
          lit(" "),
          element_at(array(things.map(lit): _*),
            pmod(hash(col("id") * 5), lit(5)).cast("int") + 1))
          .as("p_name"),
        concat(lit("Brand#"),
          pmod(hash(col("id") * 7), lit(25)) + 1).as("p_brand"),
        element_at(array(types.map(lit): _*),
          pmod(hash(col("id") * 11), lit(5)).cast("int") + 1).as("p_type"),
        (pmod(hash(col("id") * 13), lit(50)) + 1).cast("int").as("p_size"),
        (pmod(hash(col("id") * 17), lit(190000)) / 100.0 + 100.0)
          .as("p_retailprice"))
      .write.mode("overwrite").parquet(s"$base/part.parquet")

    val evTypes = Seq("click", "error", "purchase", "signup", "view")
    spark.range(0, nEvents).select((col("id") + 1).as("event_id"),
        timestamp_micros(lit(1704067200000000L) +
          pmod(hash(col("id") * 23), lit(30L * 86400)) * 1000000L).as("ts"),
        (pmod(hash(col("id") * 29), lit(nCust)) + 1).as("user_id"),
        element_at(array(evTypes.map(lit): _*),
          pmod(hash(col("id") * 31), lit(5)).cast("int") + 1)
          .as("event_type"),
        (pmod(hash(col("id") * 37), lit(100000)) / 100.0).as("value"),
        concat(lit("{\"k\": "), pmod(hash(col("id") * 41), lit(100)),
          lit("}")).as("props"))
      .write.mode("overwrite").parquet(s"$base/events.parquet")

    // documents: clusters of 10 share lang/source and 53/54 tokens
    spark.range(0, nDocs).select(col("id").as("doc_id"))
      .withColumn("base", col("doc_id") % (nDocs / 10))
      .withColumn("lang",
        element_at(array(Seq("de", "en", "es", "fr", "zh").map(lit): _*),
          pmod(col("base"), lit(5)).cast("int") + 1))
      .withColumn("source",
        concat(lit("src"), pmod(col("base"), lit(20))))
      .withColumn("text", concat_ws(" ",
        concat(lit("u"), col("doc_id")) +:
          (1 to 53).map { i =>
            val h = pmod(hash(col("base") * 101 + lit(i * 7)), lit(3000))
            concat(lit("w"), when(pmod(h, lit(3)) === 0,
              pmod(h, lit(30))).otherwise(h))
          }: _*))
      .withColumn("n_chars", length(col("text")))
      .select("doc_id", "lang", "source", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$base/documents.parquet")

    // embeddings: 64-dim float32, 50 vectors per centre + jitter.
    // CENTERED components (±0.5 centre, ±0.01 jitter) matching the
    // real fixtures' distribution (measured ±0.33, mean ≈ 0): with
    // all-positive components every cosine is ≥ ~0.75 and ANY
    // threshold-pair op is output-quadratic BY SEMANTICS — the probe
    // must model the sparse regime where blocking is the claim.
    spark.range(0, nVecs).select(col("id").as("vec_id"))
      .withColumn("c", col("vec_id") % (nVecs / 50))
      .withColumn("label", pmod(hash(col("c")), lit(10)).cast("int"))
      .withColumn("embedding", expr(
        "transform(sequence(1, 64), d -> CAST(" +
          "(pmod(hash(c * 131 + d), 1000) / 1000.0 - 0.5) + " +
          "(pmod(hash(vec_id * 17 + d), 100) / 5000.0 - 0.01) AS FLOAT))"))
      .select("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$base/embeddings.parquet")

    // orders / lineitem: 4 lines per order, hash-spread keys, the
    // FULL sf0.1 column sets (v2) — dates span 1995..2001 like the
    // real fixtures so literal date predicates stay selective
    spark.range(0, nOrders)
      .select((col("id") + 1).as("o_orderkey"),
        (pmod(hash(col("id") * 31), lit(nCust)) + 1).as("o_custkey"),
        element_at(array(Seq("O", "F", "P").map(lit): _*),
          pmod(hash(col("id") * 7), lit(3)).cast("int") + 1)
          .as("o_orderstatus"),
        (pmod(hash(col("id") * 11), lit(900000)) / 100.0 + 100.0)
          .as("o_totalprice"),
        timestamp_micros(lit(788918400000000L) +
          pmod(hash(col("id") * 43), lit(2400L * 86400)) * 1000000L)
          .as("o_orderdate"),
        element_at(array(Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
            "4-NOT SPECIFIED", "5-LOW").map(lit): _*),
          pmod(hash(col("id") * 47), lit(5)).cast("int") + 1)
          .as("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$base/orders.parquet")
    spark.range(0, nLines)
      .select(expr("id DIV 4 + 1").as("l_orderkey"),
        (pmod(hash(col("id") * 53), lit(nPart)) + 1).as("l_partkey"),
        (pmod(hash(col("id") * 13), lit(nSupp)) + 1).as("l_suppkey"),
        (col("id") % 4 + 1).cast("int").as("l_linenumber"),
        (pmod(hash(col("id") * 59), lit(50)) + 1).cast("double")
          .as("l_quantity"),
        (pmod(hash(col("id") * 29), lit(500000)) / 100.0 + 1.0)
          .as("l_extendedprice"),
        (pmod(hash(col("id") * 61), lit(11)) / 100.0).as("l_discount"),
        (pmod(hash(col("id") * 67), lit(9)) / 100.0).as("l_tax"),
        element_at(array(Seq("A", "N", "R").map(lit): _*),
          pmod(hash(col("id") * 71), lit(3)).cast("int") + 1)
          .as("l_returnflag"),
        element_at(array(Seq("F", "O").map(lit): _*),
          pmod(hash(col("id") * 73), lit(2)).cast("int") + 1)
          .as("l_linestatus"),
        timestamp_micros(lit(789004800000000L) +
          pmod(hash(col("id") * 79), lit(2450L * 86400)) * 1000000L)
          .as("l_shipdate"))
      .write.mode("overwrite").parquet(s"$base/lineitem.parquet")

    done.createNewFile()
    base.getAbsolutePath
  }

  /** Probe-only entry points that are not registered t2 keys (the
    * production-τ LSH variant, VERDICT r5 task 3).
    */
  private val Extra: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_dedup_embed_lsh@t.9" ->
      ((s: SparkSession, d: String) => ops.TrainingOps.dedupEmbedLshTau(s, d)))

  private val Keys = Seq(
    "q_dedup_ngram", "q_dedup_minhash",
    "q_sim_ann_lsh", "q_sim_ann_ivf",
    "q_dedup_embed_lsh", "q_dedup_embed_lsh@t.9", "q_dedup_semantic",
    "q_graph_khop", "q_graph_cooccur", "q_sql_recursive",
    "q_text_tfidf",
    // round-5 table-maintenance + ingest keys
    "q_merge_upsert", "q_join_bucketed", "q_dedup_incremental",
    "q_dedup_components")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(dir: String, key: String): (Double, Long) = {
      var n = 0L
      val t0 = System.nanoTime()
      ops.core.withCaches(spark) {
        n = Extra.getOrElse(key, SparkEntry.queries(key))(spark, dir).count()
      }
      ((System.nanoTime() - t0) / 1e9, n)
    }

    if (args.contains("gen10")) {
      // generation-only mode: build the 10× full-schema fixture and
      // print its path (the 10× correctness gate drives Verify+diff
      // against it separately)
      println("SYNDIR10=" + synDir(spark, 10))
      spark.stop(); return
    }
    if (args.contains("gen100")) {
      println("SYNDIR100=" + synDir(spark, 100))
      spark.stop(); return
    }
    if (args.contains("100x")) {
      // Second decade (VERDICT r6 task 6): 10× → 100× the sf0.1 shape
      // (500 k docs / 200 k vectors / 60 M lineitems) across the whole
      // dedup/ANN/graph family, MIN-OF-2 per (key, scale) so the
      // steady-state exponent is separated from one-time costs (first
      // execution carries codegen + the per-JVM persisted ivf/edge
      // index builds — core.persistedIndex logs those separately).
      val d10 = synDir(spark, 10)
      val d100 = synDir(spark, 100)
      run(d10, "q_text_tfidf") // warmup
      val fam = args.filter(_.startsWith("q_")) match {
        case only if only.nonEmpty => only.toSeq
        case _ => Seq(
          "q_dedup_ngram", "q_dedup_minhash", "q_dedup_components",
          "q_dedup_incremental", "q_dedup_embed_lsh@t.9",
          "q_dedup_semantic", "q_sim_ann_lsh", "q_sim_ann_ivf",
          "q_graph_degree", "q_graph_khop", "q_graph_cooccur",
          "q_graph_pagerank", "q_sql_recursive", "q_text_tfidf",
          "q_merge_upsert", "q_join_bucketed")
      }
      println(f"${"key"}%-24s ${"t_10x"}%8s ${"t_100x"}%8s  exponent  (min-of-2; first-run t in parens)")
      for (k <- fam) {
        val (a10, n10) = run(d10, k); val (b10, _) = run(d10, k)
        val (a100, n100) = run(d100, k); val (b100, _) = run(d100, k)
        val t10 = math.min(a10, b10); val t100 = math.min(a100, b100)
        println(f"$k%-24s $t10%7.1fs $t100%7.1fs  ${math.log10(t100 / t10)}%.2f  ($a10%.1f/$a100%.1f)  rows $n10%d/$n100%d")
      }
      spark.stop(); return
    }
    val d1 = synDir(spark, 1)
    val d10 = synDir(spark, 10)
    // one untimed warmup key so codegen/classload lands outside t₁
    run(d1, "q_text_tfidf")
    println(f"${"key"}%-20s ${"t_1x"}%8s ${"t_10x"}%8s  exponent  rows_1x/10x")
    for (k <- Keys) {
      val (t1, n1) = run(d1, k)
      val (t10, n10) = run(d10, k)
      val exp = math.log10(t10 / t1)
      println(f"$k%-20s $t1%7.1fs $t10%7.1fs  $exp%.2f      $n1%d/$n10%d")
    }
    spark.stop()
  }
}
