package graft

import org.apache.spark.sql.functions._

import graft.ops

/** Schema evolution on read (VERDICT r4 ask #4): a recurring-ingest
  * table gains a column mid-stream; both read mechanisms — the
  * O(files) `mergeSchema` footer union and the 100 TB-scale explicit
  * unified schema — must see one coherent table with NULLs for the
  * pre-evolution files.
  */
class SchemaEvolutionSpec extends SparkSuite {

  test("mergeSchema surfaces the evolved column, null for old files") {
    val s = spark
    import s.implicits._
    val base = ops.Storage.evolvedDir(spark, sf)
    val merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert(merged.columns.toSet ==
      Set("doc_id", "lang", "n_chars", "quality_c"))
    val docs = ops.core.t(spark, sf, "documents")
    val nOdd = docs.filter($"doc_id" % 2 === 1).count()
    assert(merged.count() == docs.count())
    assert(merged.filter($"quality_c".isNotNull).count() == nOdd,
      "exactly the generation-2 (odd doc_id) rows carry the new column")
    assert(merged.filter($"quality_c".isNull)
      .filter($"doc_id" % 2 === 1).count() == 0)
  }

  test("explicit unified schema (the 100 TB path) reads identically to mergeSchema") {
    val base = ops.Storage.evolvedDir(spark, sf)
    val merged = spark.read.option("mergeSchema", "true").parquet(base)
    // production posture: no footer sweep — declare the schema once
    val explicit = spark.read.schema(merged.schema).parquet(base)
    assert(explicit.schema == merged.schema)
    assert(explicit.exceptAll(merged).isEmpty && merged.exceptAll(explicit).isEmpty,
      "explicit-schema read must produce the same rows as mergeSchema")
  }

  test("q_schema_evolution equals recomputation from the source table") {
    val s = spark
    import s.implicits._
    val viaEvolved = ops.Storage.qSchemaEvolution(spark, sf).collect().toSeq
    val direct = ops.core.t(spark, sf, "documents")
      .withColumn("quality_c",
        when($"doc_id" % 2 === 1, ($"n_chars" % 997).cast("long")))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        count($"quality_c").as("n_evolved"),
        sum($"quality_c").as("sum_q"),
        sum($"n_chars").as("sum_chars"))
      .orderBy($"lang").collect().toSeq
    assert(viaEvolved == direct)
  }
}
