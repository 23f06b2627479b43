package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy hitters: a MERGEABLE frequent-items sketch with a
  * hard k-entry memory bound per group (Agarwal et al., "Mergeable
  * Summaries", PODS'12 — the merge used here: sum counters, then subtract
  * the (k+1)-largest count from every counter and drop the non-positive).
  *
  * Why not `groupBy(item).count().orderBy(desc)` — that is exact but
  * shuffles one row PER DISTINCT ITEM; for "top domains in a 100 TB crawl"
  * the distinct count is itself huge. The sketch partial-aggregates
  * map-side with ≤ k counters per partition, so shuffle volume is
  * k × partitions regardless of vocabulary size.
  *
  * Guarantees (order- and partitioning-independent, for n items total):
  *  - every item with true count > n/(k+1) is present in the output;
  *  - each reported count is an UNDER-estimate by at most n/(k+1);
  *  - if a group's distinct-item count never exceeds k, no decrement ever
  *    fires and every count is EXACT (this is what the DuckDB oracle row
  *    checks; the error bounds are property-tested in FreqItemsSpec).
  *
  * When evictions do fire, WHICH sub-threshold items survive depends on
  * merge order (Spark's partition layout) — callers must treat the output
  * as "superset of heavy hitters with count lower bounds", and filter by
  * `minCount` for a deterministic result set.
  */
object FreqItems {

  class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0, s"misraGries needs k > 0, got $k")

    private def compress(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= k) m
      else {
        // decrement by the (k+1)-largest count: at most k survive
        val cut = m.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
        m.collect { case (i, c) if c - cut > 0 => (i, c - cut) }
      }

    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
      if (item == null) b
      else if (b.contains(item) || b.size < k) b.updated(item, b.getOrElse(item, 0L) + 1L)
      else compress(b.updated(item, 1L))
    override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      val summed = b2.foldLeft(b1) { case (acc, (i, c)) =>
        acc.updated(i, acc.getOrElse(i, 0L) + c)
      }
      compress(summed)
    }
    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** Column form: `heavyHitters(64)(col("domain"))` → map<string,bigint> of
    * ≤ 64 items to count lower bounds. Explode + filter to use.
    */
  def heavyHitters(k: Int)(item: Column): Column =
    udaf(new MisraGries(k), ExpressionEncoder[String]()).apply(item)
}
