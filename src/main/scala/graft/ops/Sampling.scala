package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Text.h32

/** Deterministic hash-based sampling for training-mix construction.
  *
  * Why not `sample()`/`rand(seed)`: Bernoulli sampling is seeded per
  * partition, so results change whenever partitioning changes — at 100 TB
  * that means a re-run on different cluster shapes samples different rows.
  * Hash sampling (keep iff h(id, salt) mod 10000 < fraction·10000) is a
  * pure per-row predicate: reproducible across runs, engines (the DuckDB
  * oracle reproduces it bit-for-bit), and cluster layouts; changing `salt`
  * draws an independent sample.
  */
object Sampling {

  private def bucket(idCol: Column, salt: String): Column =
    pmod(h32(concat(idCol.cast("string"), lit("_" + salt))), lit(10000))

  /** Keep ~`fraction` of rows, deterministically by id hash. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double, salt: String = "s0"): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    df.filter(bucket(col(idCol), salt) < math.round(fraction * 10000).toInt)
  }

  /** Per-stratum fractions (e.g. language-balanced training mix): strata
    * listed in `fractions` keep their own rate, everything else keeps
    * `default`.
    */
  def stratifiedHashSample(df: DataFrame, strataCol: String, idCol: String,
      fractions: Map[String, Double], default: Double, salt: String = "s0"): DataFrame = {
    val threshold = fractions.foldLeft(lit(math.round(default * 10000).toInt)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(math.round(f * 10000).toInt)).otherwise(acc)
    }
    df.filter(bucket(col(idCol), salt) < threshold)
  }

  /** Hard per-class cap: keep AT MOST `n` rows per class, chosen
    * deterministically by id-hash order (the "no more than N docs per
    * language/domain" mix rule, where a fraction can't bound the absolute
    * count). Selection runs through the bounded [[graft.functions.TopK]]
    * aggregator — each partition contributes ≤ n candidates per class to
    * the shuffle, so a 10-billion-row class costs the same shuffle as a
    * 10-thousand-row one (no per-class global sort).
    */
  def cappedPerClass(df: DataFrame, classCol: String, idCol: String, n: Int,
      salt: String = "s0"): DataFrame = {
    // the TopK encoder is (Double, Long): unlike the fraction samplers the
    // id must be integral — a string id would cast to null and collapse
    graft.functions.TopK.requireIntegralId(df.schema, idCol, "cappedPerClass")
    // TopK keeps the LARGEST scores; negate the hash to keep the smallest
    val score = -h32(concat(col(idCol).cast("string"), lit("_" + salt))).cast("double")
    val grouped = df.select(col(classCol), col(idCol).cast("long").as("__id"), score.as("__s"))
      .groupBy(classCol)
      .agg(graft.functions.TopK.topK(n)(col("__s"), col("__id")).as("topk"))
    grouped.select(col(classCol), explode(col("topk")).as("item"))
      .select(col(classCol), col("item._2").as(idCol))
  }
}
