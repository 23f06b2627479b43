package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hybrid retrieval: per-query lexical ranking (BM25 against a query-term
  * TABLE, not a fixed term list) fused with semantic ANN lists via
  * reciprocal-rank fusion (RRF, Cormack et al. 2009) — the standard
  * lexical ⊕ embedding hybrid-search shape of RAG / training-data
  * curation stacks ("find everything relevant to X, by words or by
  * meaning"). Complements [[Text.bm25]] (corpus scoring against one fixed
  * query) and [[Similarity.cosineTopK]] (pure embedding side).
  *
  * Scale shape:
  *  - the QUERY SET is the small side everywhere: query terms broadcast
  *    into the token-stream filter, per-list ranks come from the bounded
  *    [[graft.functions.TopK]] aggregation (map-side partial top-k, ≤ k
  *    rows per query per partition on the shuffle — no one-reducer-per-
  *    query window), and fusion aggregates (query, doc) pairs drawn from
  *    lists already bounded by k·|queries|.
  *  - nothing in the corpus-sized path depends on |queries|·|corpus|:
  *    the only corpus scans are the token explode (shared by tf and dl)
  *    and the ANN side's own scan.
  *
  * Portability: BM25 contributions reuse [[Text.bm25]]'s integer-micro
  * flooring (exact long sums, engine-identical); RRF contributions are
  * floor(10⁶/(c+rank)) longs, so fused scores are exact integer sums and
  * rank order is never a double-tie gamble.
  */
object Retrieval {

  /** Per-query BM25 top-k: `queryTerms` is a (query_id, term) DataFrame —
    * each query scores documents against ITS OWN terms. Only documents
    * hitting ≥ 1 query term are candidates (search semantics, unlike
    * [[Text.bm25]]'s corpus-wide scoring). Output: (query_id, idCol, rnk,
    * bm25_micro), rnk 1-based by (score desc, id asc).
    *
    * The query-term table is broadcast (a query workload is KB-sized next
    * to a corpus; a million-query batch is still MBs). df_t is the
    * per-term document frequency over the whole corpus, as in the fixed
    * variant.
    */
  def bm25TopKPerQuery(df: DataFrame, textCol: String, idCol: String,
      queryTerms: DataFrame, k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    graft.functions.TopK.requireIntegralId(df.schema, idCol, "bm25TopKPerQuery")
    val terms = queryTerms.select(col("term")).distinct()
    val tok = df.select(col(idCol), explode(split(lower(col(textCol)), "\\W+")).as("t"))
      .filter(length(col("t")) > 0)
    // r22 (guide §1.2/§6 read once): the r21 plan tokenized the corpus
    // in FOUR independent subtrees (dl under stats, dl under the contrib
    // join, tf under dft, tf under contrib — Spark duplicates unshared
    // subtrees). Now every consumer derives from ONE (doc, term) group
    // table: tag each token with its matching query term (broadcast LEFT
    // join — terms is distinct so a token matches at most one row;
    // non-matching tokens keep term NULL), aggregate once per (doc, term)
    // with the NULL group absorbing every non-matching token. dl rides
    // each row via a doc-partitioned window over the GROUP table
    // (doc-bounded partitions — matched terms + 1 rows per doc), which
    // deletes both the token-level dl aggregation and the dl join from
    // contrib; stats aggregates the group table directly (sum of group
    // counts = token count; distinct ids = docs with ≥ 1 token). Three
    // tokenize subtrees remain (contrib, dft, stats) and each aggregates
    // the group table, not the token stream. Values are identical.
    val g = tok.join(broadcast(terms), col("t") === col("term"), "left")
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("cnt"))
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy(idCol)
    val tf = g.withColumn("dl", sum("cnt").over(wDoc))
      .filter(col("term").isNotNull)
      .select(col(idCol), col("term").as("t"), col("cnt").as("tf"), col("dl"))
    val dft = tf.groupBy("t").agg(count(lit(1)).as("df_t"))
    val stats = g.agg(sum("cnt").as("sum_dl"),
      count_distinct(col(idCol)).as("n_docs"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df_t").cast("double") + lit(0.5)) /
        (col("df_t").cast("double") + lit(0.5)))
    val tfPart = col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    val contrib = tf
      .join(broadcast(queryTerms.select(col("query_id"), col("term"))),
        col("t") === col("term"))
      .join(broadcast(dft), Seq("t"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col(idCol),
        floor(idf * tfPart * lit(1000000.0)).cast("long").as("c_micro"))
    val scored = contrib.groupBy(col("query_id"), col(idCol))
      .agg(sum("c_micro").as("bm25_micro"))
    rankTopK(scored, idCol, col("bm25_micro"), k)
      .withColumn("bm25_micro", col("score").cast("long")).drop("score")
  }

  /** Fuse ranked lists with reciprocal-rank fusion: each list contributes
    * floor(10⁶/(c+rank)) per (query, doc); lists are (query_id, idCol,
    * rnk) DataFrames. Output: (query_id, idCol, rnk, rrf_micro) — the
    * fused top-k per query, re-ranked by (rrf_micro desc, id asc).
    *
    * A doc absent from a list simply contributes nothing for it (the
    * usual RRF convention); `c` damps the head-of-list dominance (60 is
    * the paper's default).
    */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, c: Int = 60, k: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(c >= 0, s"rrf damping c=$c must be >= 0")
    val tagged = lists.map(_.select(col("query_id"), col(idCol), col("rnk")))
      .reduce(_ unionAll _)
    val fused = tagged
      .select(col("query_id"), col(idCol),
        floor(lit(1000000.0) / (lit(c).cast("double") + col("rnk").cast("double")))
          .cast("long").as("c_micro"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum("c_micro").as("rrf_micro"))
    rankTopK(fused, idCol, col("rrf_micro"), k)
      .withColumn("rrf_micro", col("score").cast("long")).drop("score")
  }

  /** Bounded per-query top-k of (query_id, idCol, scoreCol) → (query_id,
    * idCol, rnk, score): the TopK-aggregator ranking shared by both list
    * builders. Integer-micro scores ride the aggregator's double slot
    * exactly (|score| < 2⁵² always holds for 10⁶-scaled ranks/idf terms).
    */
  private def rankTopK(scored: DataFrame, idCol: String, scoreCol: Column, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(graft.functions.TopK.topK(k)(scoreCol.cast("double"), col(idCol)).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "item")))
      .select(col("query_id"), col("item._2").as(idCol),
        (col("pos") + 1).cast("int").as("rnk"), col("item._1").as("score"))
}
