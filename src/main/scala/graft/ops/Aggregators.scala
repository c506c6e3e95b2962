package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregation functions (the `Aggregator` extension API —
  * the engine's UDAF surface). Buffers merge associatively, so Spark runs
  * them with map-side partial aggregation exactly like built-in aggregates:
  * one shuffle of (group, buffer) pairs, never raw rows. */
object Aggregators {

  /** Deterministic MODE: most frequent value, ties broken by the smallest
    * value — both engines can rank (count desc, value asc), so the result
    * is oracle-checkable, unlike RNG- or order-dependent mode variants.
    * Buffer is a value→count map; at 100 TB scale this is only appropriate
    * for bounded-cardinality columns (enums, categories) — for open-ended
    * domains use a count-min sketch instead. */
  object ModeAgg extends Aggregator[String, Map[String, Long], String] {
    override def zero: Map[String, Long] = Map.empty

    override def reduce(m: Map[String, Long], v: String): Map[String, Long] =
      if (v == null) m else m.updated(v, m.getOrElse(v, 0L) + 1L)

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      b.foldLeft(a) { case (m, (k, n)) => m.updated(k, m.getOrElse(k, 0L) + n) }

    override def finish(m: Map[String, Long]): String =
      if (m.isEmpty) null
      else m.minBy { case (v, n) => (-n, v) }._1

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** One weighted-reservoir entry (q176's A-ES key + payload). */
  case class KeyedDoc(wkey: Double, doc_id: Long, weight: Long)

  /** Bounded TOP-K-BY-KEY — the mergeable buffer that makes weighted
    * reservoir sampling (Efraimidis–Spirakis) a ONE-PASS distributed and
    * STREAMING aggregate: each partition/micro-batch keeps only its k best
    * (key desc, doc_id asc) rows and buffers merge associatively, so Spark
    * runs it with map-side partial aggregation (a shuffle of ≤ k rows per
    * group per task, never the raw corpus) and Structured Streaming can
    * hold it as per-group state of exactly k rows. Deterministic ties via
    * doc_id keep the result oracle-checkable. */
  class TopKByKeyAgg(k: Int)
      extends Aggregator[KeyedDoc, Seq[KeyedDoc], Seq[KeyedDoc]] {
    private def best(xs: Seq[KeyedDoc]): Seq[KeyedDoc] =
      xs.sortBy(d => (-d.wkey, d.doc_id)).take(k)

    override def zero: Seq[KeyedDoc] = Seq.empty
    override def reduce(b: Seq[KeyedDoc], v: KeyedDoc): Seq[KeyedDoc] =
      best(b :+ v)
    override def merge(a: Seq[KeyedDoc], b: Seq[KeyedDoc]): Seq[KeyedDoc] =
      best(a ++ b)
    override def finish(b: Seq[KeyedDoc]): Seq[KeyedDoc] = b

    override def bufferEncoder: Encoder[Seq[KeyedDoc]] =
      ExpressionEncoder[Seq[KeyedDoc]]()
    override def outputEncoder: Encoder[Seq[KeyedDoc]] =
      ExpressionEncoder[Seq[KeyedDoc]]()
  }
}
