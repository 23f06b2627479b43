package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.DotProduct

/** Public facade over the engine's native Catalyst expressions (which live
  * in the `org.apache.spark.sql.graft` bridge package — see
  * [[org.apache.spark.sql.graft.DotProduct]] for why).
  */
object Native {
  /** Codegen'd sequential dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column = DotProduct.dot(a, b)

  /** Codegen'd winnowing fingerprints over a normalized ASCII string
    * (length ≥ k; caller guards shorter docs).
    */
  def winnow(norm: Column, k: Int = 8, w: Int = 4): Column =
    org.apache.spark.sql.graft.WinnowFps.winnow(norm, k, w)

  /** Native 63-bit image dHash of a BMP payload (BINARY → LONG, null for
    * undecodable payloads).
    */
  def dhash(payload: Column): Column =
    org.apache.spark.sql.graft.ImageDHash.dhash(payload)

  /** Native 63-bit audio fingerprint of a PCM WAV payload (BINARY →
    * LONG, null for undecodable payloads).
    */
  def audioFp(payload: Column): Column =
    org.apache.spark.sql.graft.AudioFp.fp(payload)

  /** Native nearest-neighbor BMP resize (BINARY → BINARY 24bpp BMP, null
    * for undecodable payloads; target dims are plan-time constants).
    */
  def resizeBmp(payload: Column, w2: Int, h2: Int): Column =
    org.apache.spark.sql.graft.ImageResize.resize(payload, w2, h2)

  /** Register the SQL surface (`graft_dot`, `graft_winnow_fps`,
    * `graft_dhash`, `graft_audio_fp`, `graft_resize`, and the curation
    * pack `graft_h32`/`graft_tokens`/`graft_token_count`/
    * `graft_lang_pred`/`graft_cleanse`).
    */
  /** Mergeable KLL quantile sketch of a double column (BINARY result;
    * persist it, union later with [[kllMerge]]). Exact while ≤ k values.
    */
  def kllAgg(value: Column, k: Int = org.apache.spark.sql.graft.KllOps.DefaultK): Column =
    org.apache.spark.sql.graft.KllOps.kllAgg(value, k)

  /** Union of serialized KLL sketches (BINARY → BINARY rollup). */
  def kllMerge(sketch: Column, k: Int = org.apache.spark.sql.graft.KllOps.DefaultK): Column =
    org.apache.spark.sql.graft.KllOps.kllMerge(sketch, k)

  /** INCLUSIVE-rank quantiles from a serialized KLL sketch (`cume_dist`
    * semantics); null for an empty sketch.
    */
  def kllQuantiles(sketch: Column, ranks: Seq[Double]): Column =
    org.apache.spark.sql.graft.KllOps.kllQuantiles(sketch, ranks)

  /** Theta sketch of a column's distinct values (BINARY; union/intersect/
    * diff later — the set-operation-capable distinct sketch).
    */
  def thetaAgg(value: Column, lgK: Int = org.apache.spark.sql.graft.ThetaOps.DefaultLgK): Column =
    org.apache.spark.sql.graft.ThetaOps.thetaAgg(value, lgK)

  /** Union of serialized theta sketches (BINARY → BINARY rollup). */
  def thetaMerge(sketch: Column, lgK: Int = org.apache.spark.sql.graft.ThetaOps.DefaultLgK): Column =
    org.apache.spark.sql.graft.ThetaOps.thetaMerge(sketch, lgK)

  /** Intersection across serialized theta sketches; null over zero rows
    * (the identity is the universal set, which has no sketch).
    */
  def thetaIntersectAgg(sketch: Column): Column =
    org.apache.spark.sql.graft.ThetaOps.thetaIntersectAgg(sketch)

  /** Distinct-count estimate from a serialized theta sketch. */
  def thetaEstimate(sketch: Column): Column =
    org.apache.spark.sql.graft.ThetaOps.thetaEstimate(sketch)

  /** Pairwise sketch set ops (BINARY, BINARY → BINARY). */
  def thetaIntersect(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ThetaOps.thetaIntersect(a, b)
  def thetaUnionPair(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ThetaOps.thetaUnionPair(a, b)
  def thetaANotB(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ThetaOps.thetaANotB(a, b)

  def register(spark: SparkSession): Unit = {
    DotProduct.register(spark)
    org.apache.spark.sql.graft.WinnowFps.register(spark)
    org.apache.spark.sql.graft.ImageDHash.register(spark)
    org.apache.spark.sql.graft.AudioFp.register(spark)
    org.apache.spark.sql.graft.ImageResize.register(spark)
    org.apache.spark.sql.graft.CurationFns.register(spark)
    org.apache.spark.sql.graft.KllOps.register(spark)
    org.apache.spark.sql.graft.ThetaOps.register(spark)
  }
}
