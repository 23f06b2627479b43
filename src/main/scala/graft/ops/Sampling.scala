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
}
