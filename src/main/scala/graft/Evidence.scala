package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._

/** Quantitative evidence for the five declared no-oracle keys
  * (VERDICT r4 ask #6): the DuckDB oracle cannot replay Spark's
  * sketches (HLL, GK, approx_top_k) or xxhash64-based signatures
  * (minhash, simhash), so their CORRECTNESS rows carry `no_oracle`.
  * This main recomputes each key's accuracy against an EXACT in-Spark
  * baseline and emits one JSON artifact (`EVIDENCE.json`) per round,
  * so the no-oracle rows carry measured numbers instead of a bare
  * marker. EvidenceSpec runs the same computation at sf0.001; the
  * committed artifact is generated at sf0.01 (the t2 gate's scale).
  *
  * Bounds are pinned, not aspirational: each one fails the run (and
  * the spec) if the measured value crosses it.
  */
object Evidence {

  /** One evidence row: `pass` compares value to bound under `cmp`. */
  final case class Row(key: String, metric: String, value: Double,
      bound: Double, cmp: String, n: Long) {
    def pass: Boolean = cmp match {
      case "<=" => value <= bound
      case ">=" => value >= bound
      case _    => value == bound
    }
  }

  def compute(s: SparkSession, dir: String): Seq[Row] = {
    import s.implicits._
    val rows = Seq.newBuilder[Row]

    // ---- q_agg_approx_hll: HLL distinct vs exact distinct ----------
    val exactDistinct = core.t(s, dir, "events").groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact"))
    val hll = Aggregates.qAggApproxHll(s, dir)
    val hllErr = hll.join(exactDistinct, "event_type")
      .select(max(abs($"approx_users" - $"exact") / $"exact"))
      .as[Double].head()
    rows += Row("q_agg_approx_hll", "max_rel_err_vs_exact_distinct",
      hllErr, 0.05, "<=", exactDistinct.count())

    // ---- q_agg_approx_quantile: GK sketch rank guarantee -----------
    // The GK guarantee is on RANK, not value (comparing against the
    // interpolating exact `percentile()` would conflate interpolation
    // with sketch error): the returned element's empirical rank range
    // [frac <, frac ≤] must bracket 0.95 within 1/accuracy = 1e-4.
    val evc = core.t(s, dir, "events")
      .select($"event_type", core.cents($"value").as("value_c"))
    val qViolation = evc
      .join(broadcast(Aggregates.qAggApproxQuantile(s, dir)), "event_type")
      .groupBy($"event_type")
      .agg(
        (sum(when($"value_c" < $"p95_approx", 1L).otherwise(0L)) /
          count(lit(1))).as("rank_lo"),
        (sum(when($"value_c" <= $"p95_approx", 1L).otherwise(0L)) /
          count(lit(1))).as("rank_hi"))
      .select(max(greatest(lit(0.0),
        lit(0.95) - $"rank_hi", $"rank_lo" - lit(0.95))))
      .as[Double].head()
    rows += Row("q_agg_approx_quantile", "max_p95_rank_violation",
      qViolation, 1.0 / 10000, "<=", 5)

    // ---- q_agg_approx_topk: k = cardinality ⇒ must be EXACT --------
    val exactCounts = core.t(s, dir, "events").groupBy($"event_type")
      .agg(count(lit(1)).as("n"))
    val topkDiverging = Aggregates.qAggApproxTopk(s, dir)
      .join(exactCounts, Seq("event_type"), "full")
      .filter($"est_n".isNull || $"n".isNull || $"est_n" =!= $"n")
      .count()
    rows += Row("q_agg_approx_topk", "rows_diverging_from_exact_counts",
      topkDiverging.toDouble, 0.0, "==", exactCounts.count())

    // ---- q_dedup_minhash: est_jaccard vs exact token-set Jaccard ---
    // Exact Jaccard over the SAME token definition the signatures use
    // (distinct words split on ' '): |A∩B| / |A∪B| for every pair
    // sharing at least one word; pairs sharing none have J = 0.
    val docs = core.t(s, dir, "documents")
    val tok = docs.select($"doc_id",
        explode(array_distinct(split($"text", " "))).as("word"))
      .transform(core.cached)
    val sizes = tok.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
    val exactJ = tok.as("a")
      .join(tok.as("b"), col("a.word") === col("b.word") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(sizes.select($"doc_id".as("a_id"), $"sz".as("sza"))), "a_id")
      .join(broadcast(sizes.select($"doc_id".as("b_id"), $"sz".as("szb"))), "b_id")
      .select($"a_id", $"b_id",
        ($"inter" / ($"sza" + $"szb" - $"inter")).as("j"))
      .transform(core.cached)
    val mh = LlmOps.qDedupMinhash(s, dir).transform(core.cached)
    val nEmitted = mh.count()
    // 16-signature estimator: std ≈ sqrt(J(1-J)/16) ≤ 0.125; the mean
    // |est − exact| over emitted pairs must sit well inside one std
    val meanAbsErr = mh.join(exactJ, Seq("a_id", "b_id"), "left")
      .select(avg(abs($"est_jaccard" - coalesce($"j", lit(0.0)))))
      .as[Double].head()
    rows += Row("q_dedup_minhash", "mean_abs_est_vs_exact_jaccard",
      meanAbsErr, 0.125, "<=", nEmitted)
    // Recall in the regime the 2×8 banding targets: at J = 0.95 the
    // collision prob is 1−(1−0.95⁸)² ≈ 0.89, rising to 1 at J = 1
    // (identical signatures), so measured recall over J ≥ 0.95 pairs
    // sits near 0.9 by design — 0.8 is the pinned floor. (At J = 0.9
    // theory gives ≈ 0.67; measured 0.74 at sf0.001 — documented, not
    // a bound, since the op's contract is collision-then-τ-filter.)
    val hi = exactJ.filter($"j" >= 0.95).transform(core.cached)
    val nHi = hi.count()
    val nFound = hi.join(mh, Seq("a_id", "b_id"), "left_semi").count()
    rows += Row("q_dedup_minhash", "recall_of_exact_jaccard_ge_0.95",
      if (nHi == 0) 1.0 else nFound.toDouble / nHi, 0.8, ">=", nHi)

    // ---- q_dedup_simhash: banded recall vs all-pairs ---------------
    // 17-bit signatures in 5 bands, hamming ≤ 4: by pigeonhole at
    // least one band is untouched, so banded recall is EXACTLY 1.
    // Banded ⊆ all-pairs by construction ⇒ count equality = set
    // equality.
    val sig = TrainingOps.simhashSignatures(docs).transform(core.cached)
    val nAll = TrainingOps.simhashPairsAllPairs(sig).count()
    val nBanded = TrainingOps.simhashPairsBanded(sig).count()
    rows += Row("q_dedup_simhash", "banded_recall_vs_all_pairs",
      if (nAll == 0) 1.0 else nBanded.toDouble / nAll, 1.0, ">=", nAll)

    rows.result()
  }

  def toJson(sfDir: String, rows: Seq[Row]): String = {
    val body = rows.map { r =>
      s"""{"key":"${r.key}","metric":"${r.metric}","value":${r.value},""" +
        s""""bound":${r.bound},"cmp":"${r.cmp}","n":${r.n},"pass":${r.pass}}"""
    }.mkString("[", ",", "]")
    s"""{"sf":"$sfDir","rows":$body}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("EVIDENCE.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = core.withCaches(spark) { compute(spark, sfDir) }
    val json = toJson(sfDir, rows)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(json)
    rows.filterNot(_.pass).foreach { r =>
      System.err.println(s"EVIDENCE FAIL ${r.key} ${r.metric}: " +
        s"${r.value} !${r.cmp} ${r.bound}")
    }
    spark.stop()
    if (rows.exists(!_.pass)) sys.exit(1)
  }
}
