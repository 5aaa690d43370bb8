package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import core._

/** Corpus-hygiene operators (round 4 additions to SURVEY §2.11): the
  * repetition/boilerplate filters and sub-document dedup passes a
  * production training-data pipeline runs between ingest and split —
  * re-expressed as declarative Spark plans (capability sentence:
  * `/root/reference/README.md:2`).
  */
object Corpus {

  /** Gopher-style repetition metrics per document: the fraction of
    * tokens taken by the single most frequent token, and the fraction
    * of duplicated bigrams — the two cheapest signals that catch
    * keyword-stuffed / looping machine text. `keep` thresholds on the
    * ROUNDED scores (§5.3 rule) so both engines gate identically.
    *
    * Scale shape: EVERY metric is a per-row array expression — the
    * whole operator is one map stage with zero shuffles (the final
    * orderBy is presentation-only). The top-token count folds over
    * `array_distinct` (O(d·n) per row; per-doc vocabulary d is small
    * for natural text) instead of explode → double-agg, which
    * benchmarked 5× slower here by carrying five doc columns through
    * every exploded token row. Bigram stats use the same `zip_with`
    * trick as [[LlmOps.qTextNgram]].
    */
  def qTextRepetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", $"lang", split($"text", " ").as("toks"))
      .withColumn("bg", LlmOps.bigramsOf($"toks"))
      .select($"doc_id", $"lang",
        size($"toks").cast("long").as("n_tokens"),
        size($"bg").cast("long").as("n_bigrams"),
        size(array_distinct($"bg")).cast("long").as("n_dist_bigrams"),
        expr("""CAST(array_max(transform(array_distinct(toks),
                 x -> size(filter(toks, y -> y = x)))) AS BIGINT)""")
          .as("top_c"))
      .select($"doc_id", $"lang", $"n_tokens",
        r6($"top_c" / $"n_tokens".cast("double")).as("top_tok_frac"),
        r6(when($"n_bigrams" > 0,
            ($"n_bigrams" - $"n_dist_bigrams") / $"n_bigrams".cast("double"))
          .otherwise(lit(0.0))).as("dup_bigram_frac"))
      .withColumn("keep",
        $"top_tok_frac" <= 0.12 && $"dup_bigram_frac" <= 0.05)
      .orderBy($"doc_id")
  }

  /** Sub-document (chunk-level) exact dedup, C4-style: split each doc
    * into disjoint 8-token chunks, keep the globally-first occurrence
    * of each distinct chunk text (ordered by doc_id, chunk_idx), and
    * report per-doc survival. This is the pass that strips repeated
    * boilerplate paragraphs a whole-doc dedup can't see.
    *
    * Scale shape: chunking is a per-row array transform (no shuffle);
    * first-occurrence ranking is ONE hash shuffle keyed by chunk
    * text — exactly the content-keyed partitioning a 100 TB corpus
    * needs (hot identical chunks collapse into single groups); the
    * final rollup re-shuffles by doc_id with map-side combine.
    */
  def qDedupChunk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val chunks = t(s, dir, "documents")
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", posexplode(expr(
        """transform(sequence(0, CAST((size(toks) + 7) DIV 8 AS INT) - 1),
          |          i -> array_join(slice(toks, i * 8 + 1, 8), ' '))"""
          .stripMargin)))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk")
    val w = Window.partitionBy($"chunk").orderBy($"doc_id", $"chunk_idx")
    chunks.withColumn("rn", row_number().over(w))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when($"rn" === 1, 1L).otherwise(0L)).as("n_first"))
      .select($"doc_id", $"n_chunks", $"n_first",
        r6($"n_first" / $"n_chunks".cast("double")).as("frac_unique"))
      .orderBy($"doc_id")
  }

  /** Distinctive vocabulary per language: rank tokens by the share of
    * their global occurrences that fall in this language (an exact
    * integer ratio — both engines compute the identical double, so
    * ranking on the RAW ratio is safe; tok asc breaks ties), top-3
    * per language. The corpus-keyword extraction behind "what is this
    * source actually about" dashboards.
    *
    * Scale shape: ONE scan+explode — the global counts are derived
    * from the per-lang table (Σ c_lang over langs) rather than
    * re-exploding the token stream, so the expensive split+explode
    * stage runs once; the global count table is vocabulary-sized, so
    * Catalyst broadcasts the join back to the per-lang counts.
    */
  def qTextLangKeywords(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = t(s, dir, "documents")
      .select($"lang", explode(split($"text", " ")).as("tok"))
    val byLang = toks.groupBy($"lang", $"tok").agg(count(lit(1)).as("c_lang"))
    val global = byLang.groupBy($"tok").agg(sum($"c_lang").as("c_all"))
    val scored = byLang.join(global, "tok")
      .withColumn("ratio", $"c_lang" / $"c_all".cast("double"))
    val w = Window.partitionBy($"lang").orderBy($"ratio".desc, $"tok".asc)
    scored.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"lang", $"rk", $"tok", $"c_lang", $"c_all",
        r6($"ratio").as("affinity"))
      .orderBy($"lang", $"rk")
  }

  // ------------------------------------------------------------- registries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_repetition" -> (qTextRepetition _),
    "q_dedup_chunk" -> (qDedupChunk _),
    "q_text_lang_keywords" -> (qTextLangKeywords _))

  val oracle: Map[String, String] = Map(
    "q_text_lang_keywords" ->
      """WITH tok AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |bl AS (SELECT lang, tok, count(*) AS c_lang FROM tok GROUP BY 1, 2),
        |g AS (SELECT tok, count(*) AS c_all FROM tok GROUP BY 1),
        |j AS (
        |  SELECT bl.lang, bl.tok, bl.c_lang, g.c_all,
        |    bl.c_lang / CAST(g.c_all AS DOUBLE) AS ratio
        |  FROM bl JOIN g USING (tok)),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY lang ORDER BY ratio DESC, tok ASC) AS rk
        |  FROM j)
        |SELECT lang, rk, tok, c_lang, c_all, round(ratio, 6) AS affinity
        |FROM r WHERE rk <= 3 ORDER BY lang, rk""".stripMargin,

    "q_text_repetition" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok,
        |    len(string_split(text, ' ')) AS n_tokens
        |  FROM documents),
        |tc AS (SELECT doc_id, lang, n_tokens, tok, count(*) AS c
        |       FROM tok GROUP BY 1, 2, 3, 4),
        |top AS (SELECT doc_id, lang, n_tokens, max(c) AS top_c
        |        FROM tc GROUP BY 1, 2, 3),
        |pos AS (
        |  SELECT doc_id,
        |    CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS pos,
        |    unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |bgt AS (SELECT a.doc_id, concat(a.word, ' ', b.word) AS bigram
        |        FROM pos a JOIN pos b
        |          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
        |bg AS (SELECT doc_id, count(*) AS nb, count(DISTINCT bigram) AS nd
        |       FROM bgt GROUP BY 1),
        |scored AS (
        |  SELECT t.doc_id, t.lang, CAST(t.n_tokens AS BIGINT) AS n_tokens,
        |    round(t.top_c / CAST(t.n_tokens AS DOUBLE), 6) AS top_tok_frac,
        |    round(COALESCE((bg.nb - bg.nd) / CAST(bg.nb AS DOUBLE), 0.0), 6)
        |      AS dup_bigram_frac
        |  FROM top t LEFT JOIN bg USING (doc_id))
        |SELECT doc_id, lang, n_tokens, top_tok_frac, dup_bigram_frac,
        |  (top_tok_frac <= 0.12 AND dup_bigram_frac <= 0.05) AS keep
        |FROM scored ORDER BY doc_id""".stripMargin,

    "q_dedup_chunk" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS pos,
        |    unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |ch AS (
        |  SELECT doc_id, (pos - 1) // 8 AS chunk_idx,
        |    string_agg(word, ' ' ORDER BY pos) AS chunk
        |  FROM tok GROUP BY 1, 2),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn
        |  FROM ch)
        |SELECT doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
        |  round(CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |        / CAST(count(*) AS DOUBLE), 6) AS frac_unique
        |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
