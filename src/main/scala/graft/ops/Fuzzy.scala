package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / fuzzy matching: blocked edit-distance pairing — the
  * entity-resolution primitive (dedupe "Jon Smith Inc" vs "John Smith Inc")
  * that exact- and minhash-dedup can't express (edit distance is not a
  * set-overlap measure).
  *
  * Scale shape: the classic blocking design — candidate pairs come from an
  * EQUI-join on a cheap blocking key (first token, soundex, prefix, …), so
  * pairwise work is Σ|block|² instead of N². The expensive `levenshtein`
  * runs only on block-mates. Same hot-bucket discipline as the LSH paths:
  * audit block occupancy with [[blockStats]] before running a quadratic
  * step on skewed keys (a degenerate blocking key is a cross join).
  */
object Fuzzy {

  /** Pairs (id_a < id_b) sharing `block` whose edit distance lies in
    * [minDist, maxDist]. `idCol` may be any orderable type (string ids
    * fine — ordering only needs `<`). minDist = 1 excludes exact
    * duplicates, which [[Dedup.exactDupGroups]] already handles cheaper.
    *
    * ENFORCED hot-block cap (same discipline as
    * [[Similarity.thinHotBuckets]] / the minhash candidate caps — a
    * degenerate blocking key is otherwise a cross join): the RIGHT side of
    * a block larger than `maxBlock` is thinned deterministically by id
    * hash (keep iff h32(id·salt) lands on the ceil(size/maxBlock) stride),
    * bounding expected pair fan-out per block to ~size × maxBlock while
    * every left-side row still meets a uniform sample of its block-mates.
    * Only OVER-cap blocks enter the (broadcast) size lookup, so the
    * broadcast is bounded by the hot-block count, not the block-key
    * cardinality. Audit what was thinned with [[blockStats]];
    * `Int.MaxValue` disables.
    */
  def blockedEditPairs(df: DataFrame, textCol: String, idCol: String,
      block: Column, maxDist: Int, minDist: Int = 0,
      maxBlock: Int = 1000): DataFrame = {
    require(maxDist >= minDist && minDist >= 0, s"bad dist range [$minDist,$maxDist]")
    val a = df.select(block.as("blk"), col(textCol).as("text_a"), col(idCol).as("id_a"))
    val bBase = df.select(block.as("blk"), col(textCol).as("text_b"), col(idCol).as("id_b"))
    val b =
      if (maxBlock == Int.MaxValue) bBase
      else {
        require(maxBlock > 0, s"maxBlock must be positive, got $maxBlock")
        val hot = bBase.groupBy("blk").agg(count(lit(1)).as("__bsize"))
          .filter(col("__bsize") > maxBlock)
        val stride = ceil(col("__bsize").cast("double") / maxBlock).cast("long")
        bBase.join(broadcast(hot), Seq("blk"), "left")
          .filter(col("__bsize").isNull ||
            pmod(Text.h32(concat(col("id_b").cast("string"), lit("_blkthin"))), stride) === 0)
          .drop("__bsize")
      }
    a.join(b, "blk")
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("text_a"), col("text_b")).cast("long"))
      .filter(col("dist") >= minDist && col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  /** Golden-record survivorship: collapse each entity cluster (from
    * [[blockedEditPairs]] + [[Graph.connectedComponents]], or any cluster
    * key) to ONE merged record — per attribute, the value from the
    * highest-`priorityCol` row that has it NON-NULL (`max_by` with a
    * null-masked ordinal: both Spark's `max_by` and the oracle's `arg_max`
    * skip null ordinals, so a null attribute never wins just because its
    * row is newest). Classic post-linkage merge (latest-wins with
    * null fallback).
    *
    * `priorityCol` must be unique within a cluster (an id or offset — the
    * same totality contract as [[Cdc.scd2]]'s tie column): max_by between
    * equal ordinals is tie-broken arbitrarily, uniqueness makes the merge
    * deterministic. Scale: one groupBy(cluster) with mergeable max_by
    * partials.
    */
  def goldenRecords(df: DataFrame, clusterCol: String, priorityCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "goldenRecords needs at least one value column")
    val aggs = valueCols.map { c =>
      max_by(col(c), when(col(c).isNotNull, col(priorityCol))).as(c)
    } :+ count(lit(1)).as("n_members")
    df.groupBy(clusterCol).agg(aggs.head, aggs.tail: _*)
  }

  /** Block-occupancy audit (rows + implied pair count per block), largest
    * first — run before [[blockedEditPairs]] on an untrusted blocking key.
    */
  def blockStats(df: DataFrame, block: Column): DataFrame =
    df.groupBy(block.as("blk"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("n_pairs", (col("n_rows") * (col("n_rows") - 1) / 2).cast("long"))
      .orderBy(col("n_rows").desc)
}
