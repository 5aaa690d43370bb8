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

  test("decodePpm parses a handcrafted P6 header (comments, multi-digit dims)") {
    // 2x1 image, comment between EVERY header token, CRLF-ish mix —
    // the full netpbm header grammar, not just the generator's shape
    val header = "P6 #c1\n# c2\n 12\t#c3\n1\n#c4\n255\n"
    val px = Array.tabulate[Byte](12 * 1 * 3)(i => (i * 5).toByte)
    val bytes = header.getBytes("US-ASCII") ++ px
    val (w, h, maxv, off) = ops.Multimodal.decodePpm(bytes)
    assert((w, h, maxv) == (12, 1, 255))
    assert(bytes.length - off == 12 * 3)
    val st = ops.Multimodal.ppmStats(7L, bytes)
    assert(st.n_pix == 12)
    assert(st.sum_r == (0 until 36 by 3).map(i => (i * 5) & 0xff).sum)
  }

  test("decodePpm rejects bad magic, 2-byte maxval, truncated plane") {
    val good = ops.Multimodal.ppmBytes(42L)
    intercept[IllegalArgumentException] {
      ops.Multimodal.decodePpm("P5\n2 2\n255\n....".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      ops.Multimodal.decodePpm("P6\n1 1\n65535\nxxxxxx".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      ops.Multimodal.decodePpm(good.dropRight(1))
    }
    // and the generator's own container round-trips
    val (w, h, _, _) = ops.Multimodal.decodePpm(good)
    assert(w == (4 + 42 % 13) && h == (3 + 42 % 7))
  }

  test("byte sampling shrinks payloads by ~k") {
    import spark.implicits._
    val sampled = Multimodal.sampleBytes(Multimodal.mediaTable(spark, sf), 4)
    val bad = sampled.filter(
      $"sampled_bytes" =!= ceil($"orig_bytes" / 4.0).cast("long")).count()
    assert(bad == 0, "every 4th byte → ceil(n/4) sampled bytes")
  }
}
