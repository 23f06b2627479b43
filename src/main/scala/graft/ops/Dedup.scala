package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Text.{floor6, h32, tokens}

/** Deduplication operators for web-scale corpus cleaning: exact (hash
  * groupBy), MinHash+LSH banding, SimHash, and n-gram Jaccard.
  *
  * Scale design (the whole point):
  *  - NEVER all-pairs. Candidate pairs come only from LSH band buckets —
  *    an equi-join on (band, band_key), i.e. a shuffle join whose fan-out is
  *    bounded by bucket size, not corpus size.
  *  - signatures/fingerprints are pure per-row expressions (narrow, codegen)
  *    built on the portable md5-based [[Text.h32]] so the DuckDB oracle can
  *    reproduce every hash bit-for-bit.
  *  - skew: a degenerate band key (e.g. empty docs) would hot-spot one
  *    reducer; callers can pre-filter empties or salt by length bucket.
  */
object Dedup {

  /** Word n-gram shingles of the lowercased token stream; documents shorter
    * than n tokens collapse to a single whole-doc shingle.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j + 1))): _*)))
      .otherwise(array(array_join(toks, " ")))
  }

  /** Exact-duplicate groups over the normalized-text fingerprint: one row per
    * distinct content, with the keeper (min id) and the duplicate count.
    */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    Text.fingerprint(df, textCol, idCol)
      .groupBy("fp_md5")
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_docs"))

  /** MinHash signatures: per seed s, min over shingles of h32(shingle, s).
    * k independent portable hash families; one narrow projection, no shuffle.
    */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String, k: Int = 8): DataFrame = {
    val sh = shingles(col(textCol))
    val sigs = (0 until k).map(s => array_min(transform(sh, x => h32(x, s))).as(s"sig_$s"))
    df.select(col(idCol) +: sigs: _*)
  }

  /** LSH banding: split the k-sig MinHash into `bands` bands of `k/bands`
    * rows each; docs sharing any (band, band-key) are candidate pairs.
    * Returns (idCol, band, band_key) — the exploded band index.
    */
  def lshBands(df: DataFrame, textCol: String, idCol: String, k: Int = 8, bands: Int = 2): DataFrame = {
    require(k % bands == 0, "k must divide into equal bands")
    val r = k / bands
    val sigs = minhashSignatures(df, textCol, idCol, k)
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("_", (b * r until (b + 1) * r).map(i => col(s"sig_$i")): _*)).as("band_key"))
    }
    sigs.select(col(idCol), explode(array(bandStructs: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
  }

  /** Near-duplicate candidate pairs: equi-join on (band, band_key), id_a <
    * id_b, deduped across bands. This is the scale path — pair fan-out is
    * bounded per bucket, never corpus-quadratic.
    */
  def minhashCandidatePairs(df: DataFrame, textCol: String, idCol: String,
      k: Int = 8, bands: Int = 2): DataFrame = {
    val b = lshBands(df, textCol, idCol, k, bands)
    val a = b.select(col(idCol).as("doc_a"), col("band"), col("band_key"))
    val c = b.select(col(idCol).as("doc_b"), col("band").as("band2"), col("band_key").as("band_key2"))
    a.join(c, col("band") === col("band2") && col("band_key") === col("band_key2") &&
        col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** 16-bit SimHash over the token multiset: bit b is the sign of the sum of
    * ±1 votes from each token's h32 bit b. Hash each token once, then 16
    * per-bit array folds — still one narrow projection.
    */
  def simhash16(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val hs = transform(tokens(col(textCol)), x => h32(x))
    val withHs = df.select(col(idCol), hs.as("hs"))
    val bits = (0 until 16).map { b =>
      val vote = aggregate(col("hs"), lit(0),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }
    withHs.select(col(idCol), bits.reduce(_ + _).cast("long").as("simhash"))
  }

  /** n-gram Jaccard similarity on candidate pairs (here: consecutive doc ids,
    * a deterministic demo pairing; production pairs come from
    * [[minhashCandidatePairs]]). Set semantics via distinct shingles.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val sh = df.select(col(idCol), array_distinct(shingles(col(textCol))).as("shs"))
    val a = sh.select(col(idCol).as("doc_a"), col("shs").as("sh_a"))
    val b = sh.select((col(idCol) - 1).as("join_id"), col(idCol).as("doc_b"), col("shs").as("sh_b"))
    a.join(b, col("doc_a") === col("join_id"))
      .select(col("doc_a"), col("doc_b"),
        floor6(
          when(size(array_union(col("sh_a"), col("sh_b"))) > 0,
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
              size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
            .otherwise(lit(0.0))).as("jaccard"))
  }
}
