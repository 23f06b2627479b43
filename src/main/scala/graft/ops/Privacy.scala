package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-identification audits for training-data releases: k-anonymity and
  * l-diversity over quasi-identifier (QI) columns, plus the minimal
  * suppression transform — the structured-data complement of the regex PII
  * family ([[Text.piiStats]]/[[Text.piiRedact]]): those find identifiers IN
  * text, these bound what the released COLUMNS jointly reveal (Sweeney's
  * k-anonymity; Machanavajjhala's l-diversity for the homogeneity attack a
  * large-but-uniform class still permits).
  *
  * Scale shape: everything reduces per QI equivalence class — one hash
  * shuffle on the QI key, map-side combined. l-diversity deliberately
  * avoids `count_distinct` inside the class aggregation (Spark plans that
  * as an Expand, multiplying the scan): distinct (QI, sensitive) pairs
  * first (shuffle 1, partial-deduped), then a plain count per class
  * (shuffle 2) — two narrow shuffles, no row multiplication, exact.
  * Suppression joins the under-k class list back without a broadcast
  * hint: the violating-class set is usually tiny (AQE broadcasts it), but
  * a pathological release where most classes violate stays a sound
  * shuffle join instead of an OOM.
  */
object Privacy {

  /** One row per QI equivalence class: the QI values, `class_size`, and
    * `is_k_anon` (size ≥ k). Rows in under-k classes are the ones a linkage
    * attack can pin to ≤ k−1 candidates.
    */
  def kAnonymityClasses(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("is_k_anon", col("class_size") >= k)
  }

  /** Dataset-level gate row: total rows, rows/classes violating k, and the
    * smallest class — the number a release sign-off actually reads.
    */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame =
    kAnonymityClasses(df, qiCols, k).agg(
      sum(col("class_size")).as("n_rows"),
      sum(when(!col("is_k_anon"), col("class_size")).otherwise(0L)).as("violating_rows"),
      sum(when(!col("is_k_anon"), 1L).otherwise(0L)).as("violating_classes"),
      min(col("class_size")).as("min_class_size"))

  /** One row per QI class: `n_sensitive` = exact distinct values of
    * `sensitiveCol` in the class, `is_l_diverse` (≥ l). Catches the
    * homogeneity attack k-anonymity misses: a 1000-row class whose
    * sensitive value is uniform reveals it for every member.
    */
  def lDiversityClasses(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      l: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2, got $l")
    df.select((qiCols :+ sensitiveCol).map(col): _*).distinct()
      .groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n_sensitive"))
      .withColumn("is_l_diverse", col("n_sensitive") >= l)
  }

  /** Minimal suppression fix: null out every QI column in rows whose class
    * is under k, leaving compliant rows untouched — the released table is
    * k-anonymous by construction (suppressed rows form one null-QI class;
    * callers wanting them dropped filter on `suppressed`).
    */
  def suppressUnderK(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    // null-SAFE join keys: groupBy puts null QI values in a real class, so
    // an under-k null-QI class must still match its rows here (a plain
    // equi-join would silently never suppress them)
    val bad = kAnonymityClasses(df, qiCols, k)
      .filter(!col("is_k_anon"))
      .select(qiCols.map(c => col(c).as(s"__b_$c")): _*)
      .withColumn("__bad", lit(true))
    val cond = qiCols.map(c => col(c) <=> col(s"__b_$c")).reduce(_ && _)
    val joined = df.join(bad, cond, "left")
    val out = qiCols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c, when(col("__bad"), lit(null)).otherwise(col(c)))
    }
    out.withColumn("suppressed", coalesce(col("__bad"), lit(false)))
      .drop("__bad").drop(qiCols.map(c => s"__b_$c"): _*)
  }
}
