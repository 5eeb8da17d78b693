package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator: exact top-k most frequent strings within a group,
  * returned as "value:count" descending (count desc, value asc — fully
  * deterministic).
  *
  * The buffer is a bounded count-map (capped at `maxBuffer` distinct keys,
  * space-saving style eviction of the rarest entries when it overflows), so
  * executor memory stays bounded on high-cardinality groups — the property
  * that matters when a group holds billions of rows. Merge is associative
  * and commutative up to the eviction bound; for exact results size
  * `maxBuffer` above the group's distinct-key count (tests pin the exact
  * regime).
  */
class TopKByCount(k: Int, maxBuffer: Int = 4096)
    extends Aggregator[String, Map[String, Long], Seq[String]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], v: String): Map[String, Long] =
    trim(buf.updated(v, buf.getOrElse(v, 0L) + 1L))

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    trim(b.foldLeft(a) { case (m, (v, c)) => m.updated(v, m.getOrElse(v, 0L) + c) })

  // Amortized eviction: only re-sort when the buffer doubles, cutting back
  // to maxBuffer. A per-insert sort would be O(k log k) per input row in
  // exactly the high-cardinality regime this class exists for.
  private def trim(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= 2 * maxBuffer) m
    else m.toSeq.sortBy { case (v, c) => (-c, v) }.take(maxBuffer).toMap

  override def finish(buf: Map[String, Long]): Seq[String] =
    buf.toSeq.sortBy { case (v, c) => (-c, v) }.take(k)
      .map { case (v, c) => s"$v:$c" }

  // Tungsten MapType encoding, not kryo: smaller shuffle payloads and
  // no dependence on JDK module opens (kryo's FieldSerializer needs
  // java.nio opened, which spark-submit injects but a bare JVM may not)
  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
