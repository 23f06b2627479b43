package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (no Scala UDFs): per-row narrow transforms that scale linearly with input
  * and keep whole-stage codegen intact. The word-count/tokenize shape mirrors
  * the reference's flagship topology
  * (reference `KafkaWordCount.java:56-67`: lower → split `\W+` → filter
  * non-empty → groupBy word → count).
  */
object Text {

  /** Portable 32-bit hash: first 8 hex digits of md5 as a long in [0, 2^32).
    * Deterministic and engine-portable (DuckDB: `('0x'||substr(md5(s),1,8))::BIGINT`),
    * which lets the driver's oracle reproduce minhash/simhash exactly.
    * Implemented as the native [[org.apache.spark.sql.graft.H32]]
    * expression (first 4 digest bytes read directly — identical values,
    * no hex round-trip); the column composition
    * `conv(substring(md5(c), 1, 8), 16, 10)` is the reference twin,
    * pinned equal in TextOpsSpec.
    */
  def h32(c: Column): Column = org.apache.spark.sql.graft.H32.h32(c)

  /** The column-composition reference twin of [[h32]] (what every DuckDB
    * oracle literally replays).
    */
  private[graft] def h32Columns(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Seeded variant: family of independent portable hashes. Null-propagating
    * (concat, not concat_ws): h32(null, seed) is null, matching the unseeded
    * form — otherwise all-null docs would share one minhash signature.
    */
  def h32(c: Column, seed: Int): Column =
    h32(concat(lit(seed.toString), c))

  /** Tokenize to lowercase words, dropping empties. Close to the reference's
    * `KafkaWordCount.java:61-62` (`lower(s).split("\\W+")`), but intentionally
    * diverges on leading non-word chars: Java's split yields a leading ""
    * token that the reference counts; we drop all empties (better behavior).
    *
    * Native kernel (r21, [[org.apache.spark.sql.graft.Tokens]]): the
    * split+filter column form ([[tokensRef]], spec-pinned equal) paid an
    * interpreted `filter` HOF — dropping nearly every text-operator
    * projection out of whole-stage codegen — plus a regex pass per call.
    */
  def tokens(text: Column): Column =
    org.apache.spark.sql.graft.Tokens.tokens(text)

  /** REFERENCE FORM of [[tokens]] (the split+filter transliteration). */
  private[graft] def tokensRef(text: Column): Column =
    filter(split(lower(text), "\\W+"), t => length(t) > 0)

  /** Word frequency over a corpus — the reference's flagship query
    * (`KafkaWordCount.java:56-67`) re-expressed declaratively: explode is a
    * narrow op; the single shuffle is the groupBy(word), with map-side
    * partial aggregation supplied by Catalyst.
    */
  def wordCount(df: DataFrame, textCol: String): DataFrame =
    // explode-then-filter (not the tokens() array HOF): Filter+Explode stay
    // inside whole-stage codegen; an array filter lambda is interpreted
    df.select(explode(split(lower(col(textCol)), "\\W+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Corpus-wide adjacent-token-pair (bigram) counts, top `topN` by count —
    * the inner statistic of BPE/WordPiece vocabulary induction (each BPE
    * round merges the argmax pair) and of collocation mining.
    *
    * Shape: per-row pair construction (`transform` over the token array —
    * no self-join on position), one explode, one groupBy(pair) with
    * map-side combine, then `orderBy(cnt desc, pair).limit(topN)` which
    * Spark plans as TakeOrderedAndProject: each partition ships only its
    * own top-N, so the coordinator sees ≤ N × partitions rows regardless of
    * vocabulary size. Ties at the cut are total-ordered (cnt desc, w1, w2)
    * — deterministic across engines and layouts.
    */
  def bigramCounts(df: DataFrame, textCol: String, topN: Int = 100): DataFrame = {
    // arrays_zip of the two shifted slices, NOT transform+element_at: the
    // zip/slice chain stays inside whole-stage codegen where the
    // transform lambda is interpreted per element (the learnBpeMerges
    // pair shape; r21 — same rows, same field names)
    val pairs = df.select(tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1).as("w1"),
        slice(col("toks"), lit(2), size(col("toks")) - 1).as("w2"))).as("p"))
    pairs.groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w1"), col("w2"))
      .limit(topN)
  }

  /** Deflate compression ratio per document — the repetition/quality
    * signal several corpus-filtering recipes use alongside the Gopher
    * rules ([[repetitionStats]]): highly repetitive or templated text
    * compresses far below prose, machine-generated noise barely at all.
    * Returns (id, n_raw, n_compressed, ratio = compressed/raw).
    *
    * Per-row typed map (Deflater level 6, fresh per partition via
    * mapPartitions so the native zlib state is reused across a partition's
    * rows, not reallocated per doc). Deterministic for a fixed zlib level
    * and JVM; the spec asserts ORDERING properties (repetitive < prose <
    * random), not exact byte counts, so a zlib upgrade can't break it.
    */
  def compressionRatio(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6)
        // release the native zlib state at task end — finalization-only
        // reclaim lets many short concurrent tasks pile up native memory
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => deflater.end()))
        val buf = new Array[Byte](64 * 1024)
        it.map { case (id, text) =>
          val raw = Option(text).getOrElse("").getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var compressed = 0L
          while (!deflater.finished()) compressed += deflater.deflate(buf)
          val ratio = if (raw.length == 0) 1.0 else compressed.toDouble / raw.length
          (id, raw.length.toLong, compressed, ratio)
        }
      }
      .toDF(idCol, "n_raw", "n_compressed", "ratio")
  }

  /** Inverted-index posting statistics: per term — document frequency,
    * total term frequency, and the posting-list id range. The build step
    * of a distributed search index (the BM25 scorer consumes the same df
    * statistic); posting LISTS themselves would be
    * `collect_list(sorted)` per term — unbounded for stopword-grade terms,
    * so the engine surface exposes the bounded statistics and leaves list
    * materialization to a sink that can spill (the classic
    * index-segment writer split).
    *
    * One explode + two keyed aggregations, both with map-side combine; the
    * (doc, term) tf pre-aggregation also caps the second shuffle at the
    * per-doc vocabulary, not token count.
    */
  /** Positional phrase search over the token stream — the inverted-index
    * path to "docs containing this exact word sequence" (vs. a substring
    * scan of every document, which at 100 TB re-reads the full corpus per
    * query; here only PHRASE-TERM postings survive the explode, so the
    * shuffle is bounded by the phrase terms' posting lists).
    *
    * Algorithm (single shuffle, no (phrase-length)-way self-join): each
    * posting (doc, pos, term) emits one (doc, anchor = pos − slot, slot)
    * row per phrase slot holding that term; an anchor seen with ALL
    * |phrase| slots is a match (a slot fixes pos = anchor + slot, so a
    * (doc, anchor, slot) row is unique and a plain count suffices —
    * repeated words in the phrase are handled by construction).
    *
    * Output: (idCol, match_pos) — 1-based token position of each
    * occurrence. `.select(idCol).distinct()` for presence.
    */
  def phraseSearch(df: DataFrame, textCol: String, idCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val terms = phrase.map(_.toLowerCase)
    require(terms.forall(_.matches("\\w+")),
      s"phrase terms must be single tokens, got $phrase")
    val slotArr = array(terms.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("t"), lit(i).as("i"))
    }: _*)
    df.select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("pos", "term")))
      .select(col(idCol), col("pos"),
        explode(filter(slotArr, s => s.getField("t") === col("term"))).as("s"))
      .select(col(idCol), (col("pos") - col("s.i")).as("anchor"))
      .where(col("anchor") >= 0)
      .groupBy(col(idCol), col("anchor"))
      .agg(count(lit(1)).as("n_slots"))
      .where(col("n_slots") === terms.length)
      .select(col(idCol), (col("anchor") + 1).cast("int").as("match_pos"))
  }

  def postingStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tf = df.select(col(idCol), explode(split(lower(col(textCol)), "\\W+")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    tf.groupBy("term").agg(
      count(lit(1)).as("df"),
      sum("tf").as("tf_total"),
      min(col(idCol)).as("first_doc"),
      max(col(idCol)).as("last_doc"))
  }

  /** Per-doc keyword extraction by tf-idf rank, ENGINE-EXACT: the idf is
    * the LINEAR surrogate N/df (score = tf·N div df, truncating integer
    * division) instead of the float logarithm — same descending order per
    * doc wherever log-idf and linear-idf agree on df ordering at equal tf,
    * and exactly reproducible cross-engine where ln() is not. Ties break
    * (score desc, term asc).
    *
    * Scale shape: (doc, term) tf pre-agg → one vocab-keyed join against
    * the df table → corpus count as a 1-row broadcast → per-doc
    * row_number window whose partition is ONE DOC's distinct terms
    * (bounded by document length, not the corpus — the legitimate
    * per-doc window).
    */
  def keywords(df: DataFrame, textCol: String, idCol: String,
      k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", expr("(tf * __n) div df"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"), col("rnk"))
  }

  /** Distributed BPE-style merge learning at the token level: each round
    * finds the corpus argmax adjacent pair (one shuffle, TakeOrdered(1))
    * and greedily merges its non-overlapping occurrences left-to-right
    * (one narrow map over the token arrays), exactly the BPE training
    * loop's structure. Returns the learned merge table
    * (rank, w1, w2, cnt) — bounded at `nMerges` rows, which is why the
    * per-round single-row collect is driver-safe at any corpus size.
    *
    * Merged tokens join with '+' (never inside a `\w+` token, so merge
    * products can't collide with source tokens). Per-round
    * `localCheckpoint` truncates the lineage — without it round N replans
    * N nested aggregate() lambdas.
    */
  /** @param checkpointEvery how many merge rounds ride on ONE
    *        checkpointed token table before the accumulated (gated,
    *        interpreted) merge folds are materialized and the lineage
    *        truncated. r22 (guide §5 / §2.6): checkpointing EVERY round
    *        paid a corpus-sized block write + re-read per merge purely to
    *        keep plan depth at 1; letting k folds stack re-computes at
    *        most k−1 gated folds inside each pair-count job — each fold
    *        skips every doc not containing its winner pair — in exchange
    *        for k−1 fewer corpus checkpoints per k merges. The default 4
    *        bounds both plan depth and the fold stack; results are
    *        identical for any value (the fold order is unchanged).
    */
  def learnBpeMerges(df: DataFrame, textCol: String, nMerges: Int,
      checkpointEvery: Int = 4): Seq[(Int, String, String, Long)] = {
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    // checkpoint the tokenized corpus up front: round 1 otherwise
    // re-tokenizes it per pair-count pass (and under the fold stack)
    var anchor = df.select(tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2).localCheckpoint(true)
    var cur = anchor
    var sinceCkpt = 0
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      // adjacent pairs via arrays_zip of the two shifted slices: pure
      // codegen'd expressions (a transform+element_at HOF here is
      // interpreted and measures ~25% slower warm)
      val top = cur
        .select(explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1).as("w1"),
          slice(col("toks"), lit(2), size(col("toks")) - 1).as("w2"))).as("p"))
        .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w1"), col("w2"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < 2) done = true
      else {
        val (w1, w2, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += ((r, w1, w2, cnt))
        val merged = lit(w1 + "+" + w2)
        val fold = aggregate(col("toks"),
          array().cast("array<string>"),
          (acc, x) => when(
            size(acc) > 0 && element_at(acc, -1) === lit(w1) && x === lit(w2),
            concat(slice(acc, lit(1), size(acc) - 1), array(merged)))
            .otherwise(concat(acc, array(x))))
        // the fold is an interpreted HOF over every token — gate it behind
        // a codegen'd containment check so docs without the winner pair
        // (the overwhelming majority once pairs get specific) skip it
        cur = cur.select(when(
            array_contains(col("toks"), w1) && array_contains(col("toks"), w2),
            fold).otherwise(col("toks")).as("toks"))
        sinceCkpt += 1
        // truncate lineage every k rounds (not every round): superseded-
        // checkpoint release as before (the Lloyd/pageRank discipline) —
        // each round's token table is corpus-sized and non-recomputable,
        // so exactly ONE anchor is ever pinned
        if (sinceCkpt == checkpointEvery && r < nMerges) {
          val next = cur.localCheckpoint(true)
          Lineage.release(anchor)
          anchor = next
          cur = next
          sinceCkpt = 0
        }
        r += 1
      }
    }
    Lineage.release(anchor) // the merge table is driver-side; nothing lazy reads it
    out.toSeq
  }

  /** Apply a learned merge table ([[learnBpeMerges]] output) to the
    * corpus — the tokenizer-APPLY step: repeatedly merge the
    * lowest-rank pair present in each document (all non-overlapping
    * occurrences, left-to-right) until no table pair remains, exactly the
    * standard BPE encode loop. Returns (id, toks).
    *
    * Per-row imperative loop over a typed Dataset map — the documented
    * mapPartitions-tier exception (SURVEY §7.3): the merge loop is
    * genuinely iterative per row and the rank table rides the closure
    * (bounded by vocabulary size, like any tokenizer's merges file).
    * Tokenization matches [[tokens]] (`lower` → split `\W+` → drop
    * empties) so learn→apply compose.
    */
  def applyBpeMerges(df: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val table = merges.toIndexedSeq
    val ranks: Map[(String, String), Int] = table.zipWithIndex.toMap
    def applyAll(toks: Array[String]): Array[String] = {
      var cur = toks
      var done = false
      while (!done) {
        var best = Int.MaxValue
        var i = 0
        while (i < cur.length - 1) {
          val r = ranks.getOrElse((cur(i), cur(i + 1)), Int.MaxValue)
          if (r < best) best = r
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          val (w1, w2) = table(best)
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var j = 0
          while (j < cur.length) {
            if (j < cur.length - 1 && cur(j) == w1 && cur(j + 1) == w2) {
              out += (w1 + "+" + w2); j += 2
            } else { out += cur(j); j += 1 }
          }
          cur = out.toArray
        }
      }
      cur
    }
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = Option(text).getOrElse("")
          .toLowerCase.split("\\W+").filter(_.nonEmpty)
        (id, applyAll(toks).toSeq)
      }
      .toDF(idCol, "toks")
  }

  /** Whitespace token count + a BPE-ish subword count (letter runs, digit
    * runs, single punctuation marks — the GPT-2 pre-tokenizer shape).
    */
  def tokenStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    // same split-size arithmetic as [[tokenCount]] (leading AND trailing
    // empty artifacts — Spark split keeps trailing empties), codegen'd —
    // no per-element lambda
    val ws = split(t, "\\s+")
    val wsRaw = size(ws) - when(element_at(ws, 1) === "", 1).otherwise(0) -
      when(element_at(ws, -1) === "", 1).otherwise(0)
    df.select(
      col(idCol),
      when(size(ws).isNull, lit(null).cast("int"))
        .otherwise(greatest(wsRaw, lit(0))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(lower(t), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
        .cast("long").as("bpe_tokens"),
      length(t).cast("long").as("n_chars_obs"))
  }

  /** Stopword sets used by the n-gram language-ID heuristic. Tiny,
    * broadcast-inlined as literals (no shuffle, no side tables).
    */
  private val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "les", "des", "est"))

  /** All marker-word occurrences (any language) extracted in ONE
    * codegen'd regex pass. `\b`-bounded whole-word matches on the
    * lowercased text ≡ membership of a `\W+` token in the marker set for
    * these ASCII markers (`\w`/`\W` complement, so a token equals a
    * marker exactly when it occurs with non-word characters or string
    * edges on both sides); the trailing `\b` forces full-token matches,
    * so alternation order is irrelevant even for prefix pairs like
    * de/des, is/ist. All four [[langScore]] columns reference this SAME
    * expression, so whole-stage codegen's subexpression elimination runs
    * the regex once per row.
    */
  /** The full marker vocabulary / per-language marker lists — exposed for
    * the kernel-equivalence spec (TextOpsSpec pins the native kernels ≡
    * these regex reference forms).
    */
  private[graft] def stopwordSet: Seq[String] = langMarkers.values.flatten.toSeq.distinct
  private[graft] def markersOf(lang: String): Seq[String] = langMarkers(lang)

  /** REFERENCE FORM (spec-pinned twin of the native MarkerCounts/TextStats
    * kernels; production paths run the kernels).
    */
  private[graft] def markerMatches(text: Column): Column =
    regexp_extract_all(lower(text),
      lit("\\b(" + langMarkers.values.flatten.toSeq.distinct.mkString("|") + ")\\b"),
      lit(0))

  /** Marker-word score for one language as a PURE codegen'd column (one
    * `\b` alternation per language — same token-membership equivalence as
    * [[markerMatches]]). This is the inline form the SQL pack's
    * `graft_lang_pred` composes: fully compiled, so whole-stage codegen's
    * subexpression elimination dedups the tie-break fold's duplicate
    * references (an HOF here would re-evaluate per reference,
    * interpreted). DataFrame surfaces ([[langId]], [[withLangPred]],
    * [[qualityScore]]) stage the shared [[markerMatches]] extract instead
    * — one regex pass total. The DuckDB oracle keeps its
    * list_filter-over-tokens form and the gate pins the equality.
    */
  /** REFERENCE FORM (spec-pinned twin of the native MarkerCounts kernel). */
  private[graft] def langScore(text: Column, lang: String): Column =
    size(regexp_extract_all(lower(text),
      lit("\\b(" + langMarkers(lang).mkString("|") + ")\\b"), lit(0)))

  /** Heuristic language ID: count language-marker stopwords, pick the argmax
    * (ties broken by fixed language order en>es>de>fr, then "und" if no
    * marker hits at all). Pure per-row expression — scales embarrassingly.
    */
  /** The tie-break fold, defined ONCE for every lang-id surface: with
    * strict `>`, the FIRST language reaching the max score wins, so ties
    * break en>es>de>fr as documented. `score` supplies each language's
    * score column (a pre-projected column in [[langId]]; the inline
    * [[langScore]] in the SQL function pack — codegen CSE dedups the
    * repeats there).
    */
  private def bestLang(score: String => Column): (Column, Column) =
    Seq("en", "es", "de", "fr").foldLeft((lit("und"), lit(0)): (Column, Column)) {
      case ((bl, bs), l) =>
        val s = score(l)
        (when(s > bs, lit(l)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }

  /** Per-row language prediction as a pure Column over the raw text —
    * the [[langId]] semantics servable from SQL (`graft_lang_pred`).
    */
  def langPredOf(text: Column): Column = {
    // one opaque struct expression referenced 2× per language — codegen
    // CSE dedups deterministic duplicates within the projection, so the
    // scan still runs once per row
    val mc = markerCountsCol(text)
    bestLang(l => mc(s"n_$l"))._1
  }

  /** Attach `outCol` = predicted language in TWO projections: the
    * single-pass marker-count struct materializes as a real column first,
    * and only then do the per-language reads consume it. The staging is
    * load-bearing, not style — CollapseProject declines to inline a
    * non-cheap expression used this many times, so the projection
    * boundary pins the scan to once per row (the round-12 staged-dHash
    * discipline; ~20× measured at 10×-corpus scale, SCALE.md round 13).
    */
  /** The native one-pass marker counter (token → language-bitmask map,
    * [[org.apache.spark.sql.graft.MarkerCountsKernel]]) — replaces the
    * union-alternation extract (DataFrame path) and the per-language
    * alternation scans (SQL-pack path) with one char scan. Measured at
    * the 167×-chars corpus: 14.6 → ~1.5 s (SCALE.md session-4).
    */
  private def markerCountsCol(text: Column): Column =
    org.apache.spark.sql.graft.TextStatsFns.markerCounts(text,
      Seq("en", "es", "de", "fr").map(l => l -> langMarkers(l)))

  def withLangPred(df: DataFrame, textCol: String, outCol: String = "lang_pred"): DataFrame = {
    val mc = "__graft_mc"
    require(!df.columns.contains(mc), s"column name '$mc' is reserved by withLangPred")
    df.withColumn(mc, markerCountsCol(col(textCol)))
      .withColumn(outCol, bestLang(l => col(mc)(s"n_$l"))._1)
      .drop(mc)
  }

  def langId(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val scored = df
      .withColumn("__graft_mc", markerCountsCol(col(textCol)))
      .select(col(idCol) +: langMarkers.keys.toSeq.sorted
        .map(l => col("__graft_mc")(s"n_$l").as(s"s_$l")): _*)
    val best = bestLang(l => col(s"s_$l"))
    scored.select(col(idCol), best._1.as("lang_pred"), best._2.cast("long").as("lang_score"))
  }

  /** Stabilize a non-negative fraction to 6 dp via floor(x*1e6)/1e6: both
    * engines run the identical IEEE double sequence, so results are bit-equal
    * (round()'s half-up tie handling is engine-specific; floor is not).
    */
  def floor6(c: Column): Column = floor(c * lit(1000000)) / lit(1000000.0)

  /** Token count without the per-element lambda: `size` of the raw
    * `\W+` split minus its empty edge artifacts — Spark's `split` uses
    * limit=-1, so unlike Java's it KEEPS a trailing empty when the text
    * ends with a separator, and a leading empty appears when it starts
    * with one (or is empty). `\W+` matches runs, so empties never occur
    * mid-array; the `greatest` clamp covers the single-`""` array (empty
    * text), where both edge checks see the same element. Equal to
    * `size(tokens(text))` for every string, in codegen'd expressions;
    * null text propagates null, as `size(filter(null))` did.
    */
  private[graft] def tokenCount(text: Column): Column = {
    val sp = split(lower(text), "\\W+")
    val raw = size(sp) - when(element_at(sp, 1) === "", 1).otherwise(0) -
      when(element_at(sp, -1) === "", 1).otherwise(0)
    // greatest() SKIPS nulls, so guard explicitly to keep null-in/null-out
    when(size(sp).isNull, lit(null).cast("int")).otherwise(greatest(raw, lit(0)))
  }

  /** Quality scoring: document length, punctuation ratio, stopword ratio,
    * mean word length — the standard cheap pre-filters for web-scale corpus
    * cleaning. All per-row arithmetic; fractions stabilized to 6 dp so the
    * DuckDB oracle hash-matches despite double formatting.
    *
    * Every measure is a codegen'd expression — no array-lambda HOFs on
    * this path (the former filter/aggregate forms cost 6.2 s at
    * 10×-corpus scale, same class as the [[langScore]] rework; the
    * oracle keeps its list-form SQL and pins the equalities):
    * stopword hits via the one-pass `\b` marker alternation (≡ token
    * membership, see [[markerMatches]]); summed token length =
    * word-character count (tokens are maximal `\w+` runs, so their
    * lengths sum to exactly the `\w` chars of the text).
    */
  def qualityScore(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    // ONE native scan replaces four regex passes (split + N-alternative
    // extract_all + two replace copies) — semantics-equivalence contract
    // documented at [[org.apache.spark.sql.graft.TextStatsKernel]];
    // measured 112 s → ~2 s on the 100×-perturbed corpus (SCALE.md). The
    // struct is STAGED as a real column so the four field reads share one
    // evaluation regardless of projection collapsing.
    val staged = df.select(col(idCol), length(t).cast("double").as("__nc"),
      org.apache.spark.sql.graft.TextStatsFns.textStats(t,
        langMarkers.values.flatten.toSeq.distinct).as("__ts"))
    val nChars = col("__nc")
    val nTok = col("__ts")("n_tokens").cast("double")
    val nStop = col("__ts")("n_stop").cast("double")
    val nPunct = col("__ts")("n_punct").cast("double")
    val sumTokLen = col("__ts")("n_wordchars").cast("double")
    staged.select(
      col(idCol),
      nChars.cast("long").as("n_chars_obs"),
      nTok.cast("long").as("n_tokens"),
      floor6(when(nChars > 0, nPunct / nChars).otherwise(lit(0.0))).as("punct_ratio"),
      floor6(when(nTok > 0, nStop / nTok).otherwise(lit(0.0))).as("stop_ratio"),
      floor6(when(nTok > 0, sumTokLen / nTok).otherwise(lit(0.0))).as("mean_word_len"))
  }

  /** Corpus cleansing: strip HTML tags, redact URLs and e-mail addresses,
    * collapse whitespace, trim. Pure chained regexp_replace (codegen'd,
    * per-row narrow); patterns are ASCII-safe in both Java and RE2 regex
    * dialects so the DuckDB oracle reproduces the output byte-for-byte.
    */
  /** The cleansing chain as a pure Column (SQL surface: `graft_cleanse`) —
    * the native 4-pass kernel ([[org.apache.spark.sql.graft.CleanseKernel]],
    * exact-equivalence contract in its scaladoc; [[cleanseOfRef]] is the
    * spec-pinned regex twin). 37.8 → ~3 s at the 167×-chars corpus.
    */
  def cleanseOf(text: Column): Column =
    org.apache.spark.sql.graft.CleanseFns.cleanseText(text)

  /** REFERENCE FORM (spec-pinned twin of the native cleanse kernel). */
  private[graft] def cleanseOfRef(text: Column): Column = {
    val noHtml = regexp_replace(text, "<[^>]*>", " ")
    val noUrl = regexp_replace(noHtml, "https?://[^\\s]+", "<URL>")
    val noMail = regexp_replace(noUrl, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    trim(regexp_replace(noMail, "\\s+", " "))
  }

  def cleanse(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val squashed = cleanseOf(col(textCol))
    df.select(col(idCol), squashed.as("clean_text"),
      (length(squashed) > 0).as("non_empty"))
  }

  /** Winnowing document fingerprints (the MOSS scheme): hash every k-gram of
    * the normalized text, then keep the minimum hash of each w-wide window —
    * guarantees any shared substring ≥ k+w-1 chars yields a shared
    * fingerprint. Output: one (id, fp) row per distinct selected hash.
    *
    * The k-gram hash is a polynomial over per-char codes
    * (Σ c_{i+j}·B^(k-1-j) mod 2^32), computed by the native codegen'd
    * [[org.apache.spark.sql.graft.WinnowFps]] expression. Normalized text
    * is word-chars only, so codes are ASCII and every intermediate fits a
    * long exactly in both engines — DuckDB reproduces each fingerprint
    * with the identical sum over `ord` (see TextQueries.winnowFpsSql).
    * Docs shorter than k fall back to one md5-based whole-doc hash (rare
    * path, already portable).
    */
  def winnowFingerprints(df: DataFrame, textCol: String, idCol: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    val norm = regexp_replace(lower(col(textCol)), "\\W+", "")
    val normed = df.select(col(idCol), norm.as("norm"))
    // hot path is the native codegen'd expression (two primitive loops in
    // whole-stage codegen — the interpreted transform/slice HOF pipeline
    // was the measured cost, not the hash); short docs take the portable
    // md5 fallback
    val fps = when(length(col("norm")) >= k,
      graft.functions.Native.winnow(col("norm"), k, w))
      .otherwise(array(h32(col("norm"))))
    normed.select(col(idCol), explode(fps).as("fp"))
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text, plus a
    * 32-bit rolling-hash-style bucket. Groupable for exact near-identity
    * dedup; the hex digest is engine-portable.
    */
  def fingerprint(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val norm = regexp_replace(lower(col(textCol)), "\\s+", " ")
    df.select(
      col(idCol),
      md5(norm).as("fp_md5"),
      h32(norm).as("fp_h32"))
  }

  /** Repetition quality signals (the Gopher-rules family): fraction of the
    * document occupied by its most frequent word, fraction of duplicate
    * words, fraction of duplicate 2-grams. High values flag boilerplate /
    * SEO spam / degenerate generations for corpus filtering.
    *
    * Shape: word stats via explode → two keyed aggregations (codegen,
    * map-side combine); the 2-gram stat is per-row array arithmetic
    * (narrow). Everything keyed by doc id — no corpus-wide shuffle skew.
    */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // per-document statistics are per-ROW work: the native kernel
    // ([[org.apache.spark.sql.graft.TokenRepStatsKernel]]) computes all
    // five counts in one scan — the previous explode + groupBy(doc, token)
    // form shuffled ~80 rows per document to aggregate numbers that never
    // leave the row (31.3 → ~3 s at the 167×-chars corpus, and the only
    // exchange left is whatever the caller adds)
    val staged = df.select(col(idCol),
      org.apache.spark.sql.graft.TextStatsFns.tokenRepStats(col(textCol)).as("__rs"))
    val nTok = col("__rs")("n_tok").cast("double")
    val nDist = col("__rs")("n_distinct").cast("double")
    val top = col("__rs")("top_cnt").cast("double")
    val n2 = col("__rs")("n_2grams").cast("double")
    val d2 = col("__rs")("n_2gram_distinct").cast("double")
    staged.select(col(idCol),
      coalesce(col("__rs")("n_tok").cast("long"), lit(0L)).as("n_tokens"),
      coalesce(floor6(when(nTok > 0, top / nTok)), lit(0.0)).as("top_word_frac"),
      coalesce(floor6(when(nTok > 0, lit(1.0) - nDist / nTok)), lit(0.0)).as("dup_word_frac"),
      coalesce(floor6(when(n2 > 0, lit(1.0) - d2 / n2).otherwise(lit(0.0))), lit(0.0))
        .as("dup_2gram_frac"))
  }

  /** BM25 relevance of every document against a fixed query-term set — the
    * lexical retrieval complement to the embedding ANN operators (used for
    * targeted corpus slicing: "all docs relevant to X").
    *
    * Scale shape: tf and dl are both keyed by doc id (one co-partitioned
    * join); the per-term document frequencies and the corpus stats are
    * query-term-sized / single-row and broadcast. One corpus scan feeds
    * both aggregates.
    *
    * Portability: per-(doc,term) contributions are floored to integer
    * MICRO-units before the per-doc sum, so the sum is exact long
    * addition — partition-order-independent and engine-identical (a raw
    * double sum would drift with aggregation order; cf. the DECIMAL rule
    * for money sums). The one transcendental (ln in the idf) is computed
    * on only |queryTerms| distinct values.
    */
  def bm25(df: DataFrame, textCol: String, idCol: String, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tok = df.select(col(idCol), explode(split(lower(col(textCol)), "\\W+")).as("t"))
      .filter(length(col("t")) > 0)
    // dl and tf deliberately branch BEFORE aggregation: a shared (doc,term)
    // pre-agg looks cheaper but Catalyst pushes tf's term filter through it
    // into the scan, splitting the "shared" subplan and ADDING two
    // exchanges (measured: 6 → 8). Here the tf branch filters tokens before
    // its tiny (doc,term) agg, and dl's token-stream shuffle map-side
    // combines to one row per (doc, partition) — the plan you want.
    val dl = tok.groupBy(idCol).agg(count(lit(1)).as("dl"))
    val tf = tok.filter(col("t").isInCollection(queryTerms))
      .groupBy(col(idCol), col("t")).agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("t").agg(count(lit(1)).as("df_t"))
    val stats = dl.agg(sum("dl").as("sum_dl"), count(lit(1)).as("n_docs"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df_t").cast("double") + lit(0.5)) /
        (col("df_t").cast("double") + lit(0.5)))
    val tfPart = col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    val contrib = tf.join(dl, Seq(idCol))
      .join(broadcast(dft), Seq("t"))
      .crossJoin(broadcast(stats))
      .select(col(idCol), floor(idf * tfPart * lit(1000000.0)).cast("long").as("c_micro"))
    val scored = contrib.groupBy(idCol)
      .agg(sum("c_micro").as("sum_micro"), count(lit(1)).as("n_hit"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        (coalesce(col("sum_micro"), lit(0L)).cast("double") / lit(1000000.0)).as("bm25"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit_terms"))
  }

  /** Cross-document boilerplate removal (the RefinedWeb/CCNet line-dedup
    * family, at sentence granularity): a normalized sentence appearing in
    * `minDocs` or more DISTINCT documents is boilerplate (headers, cookie
    * banners, nav text) and is dropped from every document; remaining
    * sentences are rejoined in original order.
    *
    * Scale shape: sentence frequencies are one explode + keyed count; the
    * removal is a left-anti equi-join on the sentence key with NO broadcast
    * hint (boilerplate volume is corpus-dependent — AQE broadcasts when it
    * is actually small, same reasoning as Dedup.dropNearDuplicates).
    * Reassembly groups by doc id, so state is bounded per document.
    */
  def removeBoilerplate(df: DataFrame, textCol: String, idCol: String,
      minDocs: Int = 3): DataFrame = {
    val sents = df.select(col(idCol),
        posexplode(split(col(textCol), "\\. ")).as(Seq("pos", "s")))
      .withColumn("key", lower(trim(col("s"))))
      .filter(length(col("key")) > 0)
    val boiler = sents.select(col(idCol), col("key")).distinct()
      .groupBy("key").agg(count(lit(1)).as("n_docs_with"))
      .filter(col("n_docs_with") >= minDocs)
      .select("key")
    val kept = sents.join(boiler, Seq("key"), "left_anti")
    val rebuilt = kept.groupBy(idCol)
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("s")))),
          x => x.getField("s")), ". ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    val nSent = sents.groupBy(idCol).agg(count(lit(1)).as("n_sent"))
    df.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .join(nSent, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (coalesce(col("n_sent"), lit(0L)) - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** PII detection stats: counts of email / URL / phone / SSN-shaped spans
    * per document, plus the `has_pii` verdict — the filter gate a corpus
    * runs before training (detection complement to [[cleanse]]'s
    * redaction). Pure per-row regex counting, codegen'd, ASCII-safe in
    * both Java and RE2 dialects (`\b` is the ASCII word boundary in both).
    */
  def piiStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    val emails = size(regexp_extract_all(t,
      lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit(0)))
    val urls = size(regexp_extract_all(t, lit("https?://[^\\s]+"), lit(0)))
    val phones = size(regexp_extract_all(t,
      lit("\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"), lit(0)))
    val ssns = size(regexp_extract_all(t,
      lit("\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"), lit(0)))
    df.select(col(idCol),
      emails.cast("long").as("n_emails"),
      urls.cast("long").as("n_urls"),
      phones.cast("long").as("n_phones"),
      ssns.cast("long").as("n_ssn"),
      (emails + urls + phones + ssns > 0).as("has_pii"))
  }

  /** Decontamination REMOVAL: the corpus minus benchmark-contaminated docs
    * — [[contaminationCheck]]'s verdict applied as the filter a training
    * run actually ships. Same broadcast-benchmark shape; the kept set is a
    * per-row filter over the check's output (no extra shuffle).
    */
  def decontaminatedKept(corpus: DataFrame, benchmark: DataFrame, textCol: String,
      idCol: String, k: Int = 8, w: Int = 4, minShared: Int = 3): DataFrame =
    contaminationCheck(corpus, benchmark, textCol, idCol, k, w, minShared)
      .filter(!col("contaminated"))
      .select(col(idCol))

  /** PII redaction: replace email / phone / SSN spans with typed
    * placeholder tokens — the transform complement of [[piiStats]]: a
    * corpus policy that can't afford to DROP a flagged doc redacts it and
    * keeps the text. Span grammar is identical to piiStats, so
    * detect(redact(x)) reports zero emails/phones/SSNs (fixpoint,
    * spec-asserted). SSN (3-2-4) rewrites before phone (3-3-4): the
    * patterns are disjoint, but ordering makes that independence explicit
    * rather than incidental.
    *
    * Scale: a pure per-row `regexp_replace` chain inside whole-stage
    * codegen — no shuffle, no state; 100 TB cost is one corpus scan.
    */
  def piiRedact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol),
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
          "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
        "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b", "<PHONE>")
    df.select(col(idCol), redacted.as("text_redacted"))
  }

  /** Benchmark-contamination check: count shared winnowing fingerprints
    * between each corpus document and a benchmark/eval set — the standard
    * decontamination pass before training. Shared-substring guarantee comes
    * from winnowing (any common run ≥ k+w-1 chars shares a fingerprint).
    *
    * Scale: benchmark sets are small by definition, so their fingerprint
    * set is broadcast (bounded by the benchmark, unlike a dedup drop set);
    * the corpus side stays a per-row fingerprint projection + one keyed
    * count. Returns every corpus doc with its shared-fp count and the
    * `contaminated` verdict.
    */
  def contaminationCheck(corpus: DataFrame, benchmark: DataFrame, textCol: String,
      idCol: String, k: Int = 8, w: Int = 4, minShared: Int = 3): DataFrame = {
    val cfp = winnowFingerprints(corpus, textCol, idCol, k, w)
    val bfp = winnowFingerprints(benchmark, textCol, idCol, k, w)
      .select(col("fp")).distinct()
    val shared = cfp.join(broadcast(bfp), Seq("fp"))
      .groupBy(idCol).agg(count(lit(1)).as("n_shared"))
    corpus.select(col(idCol))
      .join(shared, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) >= minShared).as("contaminated"))
  }

  /** Overlapping token-window chunking — the "split long documents into
    * embedding/context-window sized pieces" step of retrieval and training
    * pipelines. Chunk starts advance by `chunk - overlap`; the final chunk
    * may be shorter. Tokenless docs produce no chunks.
    *
    * Pure per-row explode (narrow, corpus-linear); the token array is
    * staged through a real projection so the tokenizer isn't re-inlined
    * per chunk (the Dedup.scala trap).
    */
  def chunkDocs(df: DataFrame, textCol: String, idCol: String,
      chunk: Int, overlap: Int): DataFrame = {
    require(chunk > 0 && overlap >= 0 && overlap < chunk,
      s"need 0 <= overlap < chunk, got chunk=$chunk overlap=$overlap")
    val step = chunk - overlap
    df.select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), col("toks"),
        // explode(NULL) emits no rows — the tokenless-doc guard WITHOUT a
        // Filter node: a filter on size(toks) pushes through the staging
        // projection (PushDownPredicate has no cost check) and re-inlines
        // the tokenizer into the predicate — every row tokenized TWICE
        // (measured: 2 split(lower(...)) instances in the r14 plan;
        // PlanSpec pins it back to 1)
        explode(when(size(col("toks")) > 0,
          sequence(lit(0), size(col("toks")) - 1, lit(step)))).as("start"))
      .select(col(idCol),
        (col("start") / step).cast("long").as("chunk_id"),
        size(slice(col("toks"), col("start") + 1, lit(chunk))).cast("long").as("n_toks"),
        array_join(slice(col("toks"), col("start") + 1, lit(chunk)), " ").as("chunk_text"))
  }

  /** FIM (fill-in-the-middle) transform — Bavarian et al. 2022, "Efficient
    * Training of Language Models to Fill in the Middle": rearrange a
    * deterministic `fimRate`% of documents as
    * `<|fim_pre|>prefix<|fim_suf|>suffix<|fim_mid|>middle` (PSM mode) so a
    * plain next-token objective learns infilling; the rest pass through
    * unchanged (`mode = 'plain'` — the paper trains on a mixture). Cut
    * points and the apply/skip choice derive from the portable [[h32]] of
    * (id, salt): reproducible across engines, runs, and partitionings —
    * the same stable-sampling discipline as every sampler here, and what
    * lets the DuckDB oracle replay every byte. Both cut points are uniform
    * over [0, n] (empty prefix/middle/suffix are legal, as in the paper's
    * character-level splitting); docs under 2 chars stay plain.
    *
    * Scale: a pure per-row projection — no shuffle, whole-stage codegen,
    * nothing to tune at 100 TB. Sentinel collisions with document content
    * are the caller's concern, exactly as in production FIM pipelines
    * (reserved tokens exist for this).
    */
  def fimTransform(df: DataFrame, textCol: String, idCol: String,
      fimRate: Int = 50, salt: String = "fim1"): DataFrame = {
    require(fimRate >= 0 && fimRate <= 100, s"fimRate in [0,100], got $fimRate")
    val txt = col(textCol)
    val n = length(txt)
    val id = col(idCol).cast("string")
    val pick = pmod(h32(concat(id, lit(s"_$salt"))), lit(100)) < fimRate
    val u1 = pmod(h32(concat(id, lit(s"_${salt}_a"))), n + 1)
    val u2 = pmod(h32(concat(id, lit(s"_${salt}_b"))), n + 1)
    val a = least(u1, u2)
    val b = greatest(u1, u2)
    val fim = concat(
      lit("<|fim_pre|>"), txt.substr(lit(1), a),
      lit("<|fim_suf|>"), txt.substr(b + 1, n - b),
      lit("<|fim_mid|>"), txt.substr(a + 1, b - a))
    val applied = pick && n >= 2
    df.select(col(idCol),
      when(applied, fim).otherwise(txt).as("fim_text"),
      when(applied, lit("fim")).otherwise(lit("plain")).as("mode"))
  }

  /** T5-style span corruption (Raffel et al., "Exploring the Limits of
    * Transfer Learning..."): mask token spans with ordinal sentinels and
    * emit the (inputs, targets) denoising pair —
    * `inputs = ... <extra_id_0> ... <extra_id_1> ...`,
    * `targets = <extra_id_0> span0 <extra_id_1> span1 ...`.
    * Deterministic grid variant: tokens group into cells of `cellTokens`;
    * a cell is masked iff the portable h32(id, cell, salt) lands on
    * `1/maskDenom` (defaults ⇒ ~20% of tokens in ~3-token spans — the
    * paper's 15% ballpark; grid alignment keeps spans non-overlapping so
    * the whole transform is one per-row fold, and every byte replays in
    * the DuckDB oracle).
    *
    * Scale: pure per-row work — a single O(cells) `aggregate` fold per
    * document, no shuffle anywhere (the repetitionStats lesson: if the
    * key is the row's own id it is a kernel, not an aggregation). The
    * fold concatenates arrays, not strings, so per-step cost is the
    * piece, not the running document. Docs longer than the training
    * context should be [[chunkDocs]]-chunked first, as in production.
    */
  def spanCorrupt(df: DataFrame, textCol: String, idCol: String,
      cellTokens: Int = 3, maskDenom: Int = 5,
      salt: String = "sc1"): DataFrame = {
    require(cellTokens >= 1 && maskDenom >= 1,
      s"need cellTokens>=1, maskDenom>=1; got $cellTokens/$maskDenom")
    val id = col(idCol).cast("string")
    val zero = struct(lit(0).as("k"),
      array().cast("array<string>").as("inp"),
      array().cast("array<string>").as("tgt"))
    df.select(col(idCol), tokens(col(textCol)).as("toks"))
      // coalesce: a NULL text tokenizes to NULL, and size(NULL) is NULL —
      // which would skip the n===0 guard and null out every output column
      // while the oracle's LEFT JOIN coalesces the same doc to ''/''/0
      .withColumn("n", coalesce(size(col("toks")), lit(0)))
      // empty/tokenless docs skip the fold (sequence(0, -1) would DESCEND
      // in Spark — negative-step sequences are a real trap)
      .withColumn("st", when(col("n") === 0, zero).otherwise(aggregate(
        // int division (Column `/` is DOUBLE division; positive operands
        // so the cast truncation IS the floor)
        sequence(lit(0),
          ((col("n") + (cellTokens - 1)) / cellTokens).cast("int") - 1),
        zero,
        (acc, c) => {
          val piece = array_join(
            slice(col("toks"), c * cellTokens + 1, lit(cellTokens)), " ")
          val masked = pmod(
            h32(concat(id, lit(s"_${salt}_"), c.cast("string"))),
            lit(maskDenom)) === 0
          val sentinel = concat(lit("<extra_id_"),
            acc.getField("k").cast("string"), lit(">"))
          struct(
            when(masked, acc.getField("k") + 1)
              .otherwise(acc.getField("k")).as("k"),
            concat(acc.getField("inp"),
              array(when(masked, sentinel).otherwise(piece))).as("inp"),
            when(masked, concat(acc.getField("tgt"), array(sentinel, piece)))
              .otherwise(acc.getField("tgt")).as("tgt"))
        })))
      .select(col(idCol),
        array_join(col("st.inp"), " ").as("inputs_text"),
        array_join(col("st.tgt"), " ").as("targets_text"),
        col("st.k").cast("long").as("n_masked_cells"))
  }

  /** Corpus-unigram language-model scoring: train a unigram LM on the corpus
    * itself (token frequencies), then score every doc by its mean token
    * log-probability — the cheap perplexity proxy used to rank documents
    * for quality-based selection (high avg log-prob = ordinary text, very
    * low = gibberish/OCR noise).
    *
    * Two corpus passes, both canonical at scale: (1) vocab = explode →
    * groupBy(token) count with map-side combine — the word-count shuffle;
    * (2) score = exploded tokens ⋈ vocab on the token key (plain shuffle
    * hash join; Catalyst/AQE broadcasts instead when the vocab is small) →
    * groupBy(doc) mean. No driver-side vocab, no collect.
    *
    * Probabilities are unsmoothed corpus MLE (every scored token is in the
    * vocab by construction — the LM is trained on the same corpus). Tokenless
    * docs score NULL, surfaced rather than defaulted. Output stabilized to
    * 6 dp ([[floor6]]) for cross-engine comparability of log/division.
    */
  /** Interpolated bigram language-model score per document — the stronger
    * perplexity-style quality signal beside [[unigramLogProb]] (the classic
    * Jelinek-Mercer two-gram mix): per doc, the mean over its bigrams of
    *   ln( λ·c(w1,w2)/c(w1) + (1−λ)·c(w2)/total ).
    * The unigram backoff term keeps unseen-context probabilities nonzero,
    * so ln never sees 0. Counts are exact corpus integers; the float work
    * is the same ln+avg+floor6 recipe the oracle already matches for the
    * unigram model. Returns (id, n_bigrams, avg_logprob — null for docs
    * with fewer than 2 tokens, mirroring SQL's empty-group avg).
    *
    * Scale: bigram/unigram count tables are keyed aggregations with
    * map-side combine; the scoring joins are equi-joins on the vocab keys
    * (never corpus-crossing); the only corpus-sized shuffle is the per-doc
    * final agg. λ enters the oracle as the exact Scala double string, so
    * both engines compute the identical IEEE expression tree.
    */
  def bigramLogProb(df: DataFrame, textCol: String, idCol: String,
      lambda: Double = 0.7): DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1), got $lambda")
    // codegen'd zip-of-shifted-slices pair shape (see [[bigramCounts]])
    val pairs = df.select(col(idCol), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col(idCol), explode(arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1).as("w1"),
        slice(col("toks"), lit(2), size(col("toks")) - 1).as("w2"))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val uni = df.select(explode(tokens(col(textCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("ucnt"))
    val total = uni.agg(sum("ucnt").as("total"))
    val bi = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("bcnt"))
    val prob = lit(lambda) * col("bcnt").cast("double") / col("c1").cast("double") +
      lit(1.0 - lambda) * col("c2").cast("double") / col("total").cast("double")
    val scored = pairs
      .join(bi, Seq("w1", "w2"))
      .join(uni.select(col("t").as("w1"), col("ucnt").as("c1")), "w1")
      .join(uni.select(col("t").as("w2"), col("ucnt").as("c2")), "w2")
      .crossJoin(broadcast(total))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), avg(log(prob)).as("raw"))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        floor6(col("raw")).as("avg_logprob"))
  }

  def unigramLogProb(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = df.select(col(idCol), explode(tokens(col(textCol))).as("t"))
    val vocab = tok.groupBy("t").agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("total"))
    val scored = tok.join(vocab, "t")
      .crossJoin(broadcast(total))
      .groupBy(idCol)
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        avg(log(col("cnt").cast("double") / col("total").cast("double")))
          .as("raw_lp"))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        floor6(col("raw_lp")).as("avg_logprob"))
  }

  /** Per-doc out-of-vocabulary audit against the corpus's own top-V
    * vocabulary — the tokenizer-coverage QA every vocab re-train decision
    * reads (a rising OOV rate means the corpus drifted past the
    * tokenizer). Vocab = the V most frequent tokens, ties broken by token
    * ascending so the boundary is deterministic cross-engine; the rate is
    * exact micro units (`10⁶·n_oov div n_tok`), 0 for tokenless docs.
    *
    * Scale shape: vocab derivation is a map-side-combined token groupBy
    * followed by a bounded TakeOrdered (V rows on the driver — a model,
    * like the IVF centroids); membership is a BROADCAST left join on the
    * exploded tokens (no token-keyed shuffle); the only data-sized
    * exchange is the groupBy(doc) rollup. Docs with zero tokens rejoin
    * through the id set with (0, 0, 0).
    */
  def oovStats(df: DataFrame, textCol: String, idCol: String,
      vocabSize: Int = 1000): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val tok = df.select(col(idCol), explode(tokens(col(textCol))).as("t"))
    val vocab = tok.groupBy("t").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("t").asc).limit(vocabSize)
      .select(col("t"), lit(1).as("__in"))
    val perDoc = tok.join(broadcast(vocab), Seq("t"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("oov_micro",
        when(col("n_tok") > 0, expr("(1000000 * n_oov) div n_tok"))
          .otherwise(lit(0L)))
  }
}
