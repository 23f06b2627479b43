package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Schema evolution for long-lived pipelines: align any snapshot of a
  * dataset to a target schema — old files missing newly-added columns,
  * widened numeric types, retired columns still present — so readers see
  * ONE stable shape across years of layout drift (the `mergeSchema`
  * read-side story, made explicit and auditable).
  */
object Schemas {

  /** Align `df` to `target`: missing columns materialize as typed nulls,
    * compatible type drifts are cast (long→double, int→long, etc. — Spark
    * `Cast.canUpCast` semantics, checked, so a lossy narrowing fails fast
    * instead of corrupting silently), extra columns are dropped, and
    * column order follows the target.
    */
  def align(df: DataFrame, target: StructType): DataFrame = {
    val have = df.schema.map(f => f.name -> f).toMap
    val cols = target.fields.map { case StructField(name, dt, _, _) =>
      have.get(name) match {
        case None => lit(null).cast(dt).as(name)
        case Some(f) if f.dataType == dt => col(name)
        case Some(f) =>
          require(org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(f.dataType, dt),
            s"column '$name': ${f.dataType.simpleString} cannot safely widen " +
              s"to ${dt.simpleString} — migrate explicitly")
          col(name).cast(dt).as(name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Field-level diff of two schemas (added / removed / retyped), for the
    * audit log before running [[align]] over a fleet of snapshots.
    */
  def diff(from: StructType, to: StructType): Seq[(String, String)] = {
    val f = from.map(x => x.name -> x.dataType).toMap
    val t = to.map(x => x.name -> x.dataType).toMap
    val added = (t.keySet -- f.keySet).toSeq.sorted.map(n => n -> s"added ${t(n).simpleString}")
    val removed = (f.keySet -- t.keySet).toSeq.sorted.map(n => n -> "removed")
    val retyped = (f.keySet & t.keySet).toSeq.sorted.collect {
      case n if f(n) != t(n) => n -> s"retyped ${f(n).simpleString} -> ${t(n).simpleString}"
    }
    added ++ removed ++ retyped
  }
}
