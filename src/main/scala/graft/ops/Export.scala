package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Text.h32

/** Training-data delivery: deterministic sharding plus an
  * order-independent integrity manifest — the hand-off contract between
  * the curation pipeline and the trainer's data loader.
  *
  * Sharding is `h32(id + salt) mod shards`: a pure per-row projection, so
  * shard membership is reproducible from the id alone (no global sort, no
  * sequence numbers that shift when a doc is dropped upstream), and every
  * engine that can md5 agrees on it.
  *
  * The manifest row per shard carries `n_docs`, `total_chars`, and
  * `content_sum` — the SUM of a per-row portable content hash. A sum (not
  * a hash-of-concatenation) makes the checksum ORDER-INDEPENDENT: two
  * exports of the same rows match no matter how partitions interleaved,
  * while any dropped/duplicated/mutated row shifts the sum. (Adversarial
  * collisions are out of scope — this is a transport-integrity check, the
  * md5-sum analogue, not an authenticity proof.) All map-side-combined:
  * the shuffle is |shards| rows of three longs.
  *
  * `content_sum` is exact below ~2³¹ rows per shard (sums of 2³²-bounded
  * hashes stay inside a long until then). PAST that envelope the two
  * engines diverge LOUDLY, not silently: Spark's long sum wraps in 64-bit
  * two's-complement, while DuckDB always aggregates BIGINT in HUGEINT, so
  * the oracle's post-aggregation `::BIGINT` cast raises out-of-range
  * instead of wrapping — a failed gate, never a quietly-matching wrong
  * number. At 2³¹ rows per shard, re-shard (shards is the lever; a 100 TB
  * corpus at 2³¹ docs/shard is a misconfigured export, not a limit).
  */
object Export {

  /** (everything, shard): deterministic shard assignment. */
  def assignShards(df: DataFrame, idCol: String, shards: Int,
      salt: String = "shard1"): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    df.withColumn("shard",
      pmod(h32(concat(col(idCol).cast("string"), lit("_" + salt))), lit(shards)))
  }

  /** Per-shard integrity manifest over (id, content). */
  def shardManifest(df: DataFrame, idCol: String, contentCol: String,
      shards: Int, salt: String = "shard1"): DataFrame =
    assignShards(df, idCol, shards, salt)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(length(col(contentCol)).cast("long"), lit(0L))).as("total_chars"),
        sum(h32(concat(col(idCol).cast("string"), lit("|"),
          coalesce(col(contentCol), lit(""))))).as("content_sum"))
}
