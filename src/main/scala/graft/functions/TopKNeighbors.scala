package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k-by-cosine typed aggregator for the similarity
  * family: partial buffers hold ≤ 2k candidates (trimmed amortized),
  * so per-group state is O(k) and — unlike the window formulation —
  * NO sort of the full candidate set ever happens: the 4M-pair sort
  * the rank window needs is replaced by an O(n·log k)-ish streaming
  * trim. Determinism matches the window exactly: order by (rawcos
  * desc, b_id asc) on raw doubles that are bit-identical across
  * engines (same fold order — see LlmOps scaladoc).
  *
  * (value, id, label) are packed in [[Neighbor]]; `finish` emits the
  * survivors already ranked, ready for posexplode.
  */
case class Neighbor(bId: Long, bLabel: Int, rawcos: Double)

class TopKNeighbors(k: Int)
    extends Aggregator[Neighbor, ArrayBuffer[Neighbor], Seq[Neighbor]] {

  // java.lang.Double.compare gives a TOTAL order (NaN greater than
  // everything — matching Spark's desc sort, which also ranks NaN
  // first); a bare `>` is not a strict weak ordering under NaN and
  // makes sortWith undefined (or throws in TimSort)
  private def better(a: Neighbor, b: Neighbor): Boolean = {
    val c = java.lang.Double.compare(a.rawcos, b.rawcos)
    c > 0 || (c == 0 && a.bId < b.bId)
  }

  private def trim(buf: ArrayBuffer[Neighbor]): ArrayBuffer[Neighbor] = {
    val kept = buf.sortWith(better).take(k)
    buf.clear()
    buf ++= kept
  }

  override def zero: ArrayBuffer[Neighbor] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[Neighbor], a: Neighbor): ArrayBuffer[Neighbor] = {
    b += a
    if (b.length >= 2 * k) trim(b) else b
  }

  override def merge(x: ArrayBuffer[Neighbor], y: ArrayBuffer[Neighbor]): ArrayBuffer[Neighbor] =
    trim(x ++= y)

  override def finish(r: ArrayBuffer[Neighbor]): Seq[Neighbor] =
    r.sortWith(better).take(k).toSeq

  override def bufferEncoder: Encoder[ArrayBuffer[Neighbor]] =
    Encoders.kryo[ArrayBuffer[Neighbor]]

  override def outputEncoder: Encoder[Seq[Neighbor]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Neighbor]]()
}
