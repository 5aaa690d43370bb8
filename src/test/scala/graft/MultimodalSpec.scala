package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** Multimodal binary-column plumbing: the decode stub is fake (no
  * codecs in this container) but the schema, batch iteration,
  * partitioning, and column wiring are real and exact.
  */
class MultimodalSpec extends SparkSuite {

  test("media table carries payload as BinaryType with metadata") {
    val m = Multimodal.mediaTable(spark, sf)
    val f = m.schema("media")
    assert(f.dataType.typeName == "binary")
    assert(m.count() > 0)
  }

  test("decodeAll preserves row count and emits the declared schema") {
    val m = Multimodal.mediaTable(spark, sf)
    val d = Multimodal.decodeAll(m, numPartitions = 8)
    assert(d.count() == m.count())
    assert(d.toDF().schema == Multimodal.decodedSchema)
    assert(d.rdd.getNumPartitions == 8, "decode parallelism knob ignored")
  }

  test("decode stub is deterministic across runs") {
    val m = Multimodal.mediaTable(spark, sf)
    val a = Multimodal.decodeAll(m).collect().map(d => (d.doc_id, d.width,
      d.height, d.mean_byte)).sortBy(_._1)
    val b = Multimodal.decodeAll(m).collect().map(d => (d.doc_id, d.width,
      d.height, d.mean_byte)).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("n_bytes equals the documents' n_chars (ASCII corpus)") {
    import spark.implicits._
    val d = Multimodal.decodeAll(Multimodal.mediaTable(spark, sf)).toDF()
    val docs = graft.ops.core.t(spark, sf, "documents")
      .select($"doc_id", $"n_chars")
    val bad = d.join(docs, "doc_id")
      .filter($"n_bytes" =!= $"n_chars").count()
    assert(bad == 0)
  }

  test("features adds aspect/size_class/head_hex columns") {
    val f = Multimodal.features(
      Multimodal.decodeAll(Multimodal.mediaTable(spark, sf)))
    assert(Seq("aspect", "size_class", "head_hex")
      .forall(f.columns.contains))
    assert(f.filter(col("aspect") <= 0).count() == 0)
  }

  test("resize stub preserves rows and sets target dimensions") {
    import spark.implicits._
    val d = Multimodal.decodeAll(Multimodal.mediaTable(spark, sf))
    val r = Multimodal.resizeAll(d, 32, 32)
    assert(r.count() == d.count())
    val dims = r.toDF().select("width", "height", "n_bytes").distinct().collect()
    assert(dims.length == 1)
    assert(dims.head.getInt(0) == 32 && dims.head.getInt(1) == 32)
    assert(dims.head.getLong(2) == 32L * 32 * 3)
  }

  test("byte sampling shrinks payloads by ~k") {
    import spark.implicits._
    val sampled = Multimodal.sampleBytes(Multimodal.mediaTable(spark, sf), 4)
    val bad = sampled.filter(
      $"sampled_bytes" =!= ceil($"orig_bytes" / 4.0).cast("long")).count()
    assert(bad == 0, "every 4th byte → ceil(n/4) sampled bytes")
  }
}
