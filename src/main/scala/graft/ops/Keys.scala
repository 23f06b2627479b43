package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Surrogate long keys for string/UUID ids, so the TopK-based operators
  * (cosineTopK, bucketedTopK, cappedPerClass — all (Double, Long)-encoded)
  * accept any key type.
  *
  * The surrogate is a HASH, not zipWithIndex/monotonically_increasing_id:
  * a pure per-row projection (no extra stage, no driver coordination,
  * stable across runs/partitionings — the same reasons [[Sampling]] hashes)
  * at the price of a collision risk. 60 bits keep that negligible
  * (birthday bound: p ≈ n²/2^61, about 5e-5 at a billion keys) and
  * engine-portable: DuckDB reproduces it as
  * `('0x' || substr(md5(k), 1, 15))::BIGINT`, so surrogate-keyed operators
  * keep exact oracle rows. [[surrogateCollisions]] audits the risk for
  * callers who must rule it out rather than bound it.
  */
object Keys {

  /** Portable 60-bit surrogate: first 15 hex digits of md5 as a
    * non-negative long (15, not 16 — a 16th digit could set the sign bit,
    * and an unsigned 64-bit decimal string overflows a LONG cast to null).
    */
  def surrogateId64(key: Column): Column =
    conv(substring(md5(key), 1, 15), 16, 10).cast("long")

  /** Attach the surrogate id column (default name `__sid`). */
  def withSurrogateId(df: DataFrame, keyCol: String, outCol: String = "__sid"): DataFrame =
    df.withColumn(outCol, surrogateId64(col(keyCol)))

  /** Collision audit: one row per surrogate id carrying >1 distinct key —
    * empty means the surrogate is injective over this data. Run it (or
    * sink it) alongside a surrogate-keyed job when a collision would be
    * unacceptable rather than just improbable.
    */
  def surrogateCollisions(df: DataFrame, keyCol: String): DataFrame =
    df.select(col(keyCol), surrogateId64(col(keyCol)).as("__sid"))
      .groupBy("__sid")
      .agg(countDistinct(col(keyCol)).as("n_keys"))
      .filter(col("n_keys") > 1)

  /** [[Sampling.cappedPerClass]] for arbitrary key types: route through
    * the surrogate, then map back to the original keys. Selection stays
    * deterministic and TopK-bounded (a 10-billion-row class shuffles ≤ n
    * candidates per partition). Duplicate (class, key) rows are collapsed
    * before the map-back so the cap counts KEYS, not rows.
    */
  def cappedPerClassByKey(df: DataFrame, classCol: String, keyCol: String,
      n: Int, salt: String = "s0"): DataFrame = {
    val keyed = df.select(col(classCol), col(keyCol),
      surrogateId64(col(keyCol)).as("__sid")).dropDuplicates(classCol, keyCol)
    Sampling.cappedPerClass(keyed, classCol, "__sid", n, salt)
      .join(keyed, Seq(classCol, "__sid"))
      .select(col(classCol), col(keyCol))
  }
}
