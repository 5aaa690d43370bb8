package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` demonstrating the user-defined-aggregate
  * extension surface (SURVEY §7.2): bounded top-k by value within a
  * group, merged associatively — the partial buffers are ≤ k rows, so
  * unlike sort-based top-k the shuffle carries k·partitions rows
  * regardless of group size (the property that matters at 100 TB).
  *
  * Input: (value, id); output: "value:id,value:id,…" ordered by
  * (value desc, id asc) — flattened to a string so results stay
  * engine-portable.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], String] {

  private def trim(s: Seq[(Long, Long)]): Seq[(Long, Long)] =
    s.sortBy(t => (-t._1, t._2)).take(k)

  override def zero: Seq[(Long, Long)] = Seq.empty

  override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
    trim(b :+ a)

  override def merge(x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] =
    trim(x ++ y)

  override def finish(r: Seq[(Long, Long)]): String =
    trim(r).map { case (v, id) => s"$v:$id" }.mkString(",")

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    Encoders.kryo[Seq[(Long, Long)]]

  override def outputEncoder: Encoder[String] = Encoders.STRING
}
