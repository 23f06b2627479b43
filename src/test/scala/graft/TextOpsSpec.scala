package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Text}

/** Unit-level behavior of the text/dedup operators (tie-breaks, null
  * semantics, hash portability) — the cases the oracle can't isolate.
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens lowercases, splits on \\W+ and drops empties") {
    val out = Seq("To be, or NOT to be!").toDF("t")
      .select(Text.tokens($"t").as("toks")).as[Seq[String]].head()
    assert(out === Seq("to", "be", "or", "not", "to", "be"))
  }

  test("split-size tokenCount ≡ size(tokens) on every edge shape") {
    // adversarial shapes for Spark split's limit=-1 semantics: leading,
    // trailing, and both-edge separators, empty, all-separator, null,
    // unicode separators, single token
    val cases = Seq("", "!", "!!!", "a", "!a", "a!", "!a!", "a b", " a b ",
      "To be, or NOT to be!", "x\n\ny!", "...the end.", "a_b-c", "¡hola!",
      "tab\tsep", null)
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val got = df.select($"id", Text.tokenCount($"t").as("n"),
        size(Text.tokens($"t")).as("ref"))
      .collect()
    got.foreach { r =>
      val n = if (r.isNullAt(1)) null else r.getInt(1)
      val ref = if (r.isNullAt(2)) null else r.getInt(2)
      assert(n === ref, s"case '${cases(r.getLong(0).toInt)}'")
    }
  }

  test("native TextStats/MarkerCounts kernels ≡ the regex reference forms") {
    // the regex Columns (markerMatches / langScore / the four quality
    // scans) are retained as REFERENCE implementations; the native
    // one-pass kernels must match them on every adversarial shape:
    // edge separators, empty/null, punctuation-only, marker repeats,
    // markers glued to word chars (no \b inside a \w+ run), multi-lang
    // ties, unicode, and the ScaleGen `_cNN` suffix form
    val cases = Seq("", "!", "a", "the the THE el el und", "the_c37 el_c2",
      "la cosa der the", "?!.,;: the; el! und?", " to be, or NOT to be! ",
      "x\n\nder y!", "...the end.", "a_b-c el", "¡hola! el día",
      "tab\tthe\tsep", "étude the naïve el", null)
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val stop = Text.stopwordSet
    val native = df.select($"id",
      org.apache.spark.sql.graft.TextStatsFns.textStats($"t", stop).as("ts"),
      org.apache.spark.sql.graft.TextStatsFns.markerCounts($"t",
        Seq("en", "es", "de", "fr").map(l => l -> Text.markersOf(l))).as("mc"))
    val ref = df.select($"id",
      Text.tokenCount($"t").as("n_tokens"),
      size(Text.markerMatches($"t")).as("n_stop"),
      length(regexp_replace($"t", "[^.,;:!?]", "")).as("n_punct"),
      length(regexp_replace(lower($"t"), "\\W", "")).as("n_wordchars"),
      Text.langScore($"t", "en").as("s_en"), Text.langScore($"t", "es").as("s_es"),
      Text.langScore($"t", "de").as("s_de"), Text.langScore($"t", "fr").as("s_fr"))
    val joined = native.join(ref, "id").collect()
    joined.foreach { r =>
      val c = cases(r.getLong(0).toInt)
      def nn(i: Int): Any = if (r.isNullAt(i)) null else r.get(i)
      val (ts, mc) = (nn(1), nn(2))
      if (c == null) assert(ts == null && mc == null, "null text → null structs")
      else {
        val t = ts.asInstanceOf[org.apache.spark.sql.Row]
        val m = mc.asInstanceOf[org.apache.spark.sql.Row]
        assert(t.getInt(0) === r.getInt(3), s"n_tokens '$c'")
        assert(t.getInt(1) === r.getInt(4), s"n_stop '$c'")
        assert(t.getInt(2) === r.getInt(5), s"n_punct '$c'")
        assert(t.getInt(3) === r.getInt(6), s"n_wordchars '$c'")
        assert(m.getInt(0) === r.getInt(7), s"s_en '$c'")
        assert(m.getInt(1) === r.getInt(8), s"s_es '$c'")
        assert(m.getInt(2) === r.getInt(9), s"s_de '$c'")
        assert(m.getInt(3) === r.getInt(10), s"s_fr '$c'")
      }
    }
  }

  test("native cleanse kernel ≡ the regexp_replace chain on adversarial shapes") {
    // stage interactions and regex corner semantics: unclosed tags, tag
    // whitespace terminating a URL, xhttp prefix match, https backtrack,
    // greedy email domains that end before the run does, consecutive @,
    // dotless domains, resume-after-match overlap, control chars, CRLF,
    // unicode, leading/trailing whitespace, null
    val cases = Seq(
      "", " ", "plain text.", "<b>bold</b> text", "a<unclosed tag",
      "see https://x.co/a?b=1 now", "xhttps://a.b end", "http:// nope",
      "httpss://nope", "https://end-of-string",
      "<a href='http://t.co'>link</a>",
      "mail me@example.com!", "a@b.cc-x tail", "a@@b.cc", "a@b a@b.cc",
      "a@.cc", "a@b.c", "x@y.zz.wwp q@r.s-t.uu", "pre me@ex.com me2@ex.com post",
      "first@a.bb second@c.dd", "\t multi \n\n space \r\n", "ctl keep",
      "étude naïve ¡hola!", "<t>a@b.cc</t> http://u v@w.xyz", null)
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val got = df.select($"id", Text.cleanseOf($"t").as("k"),
        Text.cleanseOfRef($"t").as("r")).collect()
    got.foreach { r =>
      val c = cases(r.getLong(0).toInt)
      assert((if (r.isNullAt(1)) null else r.getString(1)) ===
        (if (r.isNullAt(2)) null else r.getString(2)), s"case '$c'")
    }
    // and corpus-wide: every sf0.001 document cleans identically
    val docs = Tables.documents(spark, sf())
    val diff = docs.select(Text.cleanseOf($"text").as("k"),
        Text.cleanseOfRef($"text").as("r"))
      .filter(!($"k" <=> $"r")).count()
    assert(diff === 0, s"$diff corpus docs clean differently")
  }

  test("langId breaks score ties in en>es>de>fr priority order") {
    // "la" (es) vs "la" (fr): identical single marker → es wins over fr
    val df = Seq((1L, "la cosa"), (2L, "der the")).toDF("id", "text")
    // doc 1: s_es = 1 (la), s_fr = 1 (la) → es by priority
    assert(Text.langId(df, "text", "id").filter($"id" === 1).select("lang_pred").as[String].head() === "es")
    // doc 2: s_de = 1 (der), s_en = 1 (the) → en by priority
    assert(Text.langId(df, "text", "id").filter($"id" === 2).select("lang_pred").as[String].head() === "en")
  }

  test("langId yields 'und' when no marker hits") {
    val df = Seq((1L, "xyzzy plugh")).toDF("id", "text")
    val row = Text.langId(df, "text", "id").collect().head
    assert(row.getString(1) === "und" && row.getLong(2) === 0L)
  }

  test("seeded h32 propagates nulls (no shared signature for null docs)") {
    val df = Seq(Tuple1[String](null)).toDF("t")
    assert(df.select(Text.h32($"t", 3)).collect().head.isNullAt(0))
    // and equals the md5-prefix construction for non-null input
    val v = Seq("abc").toDF("t").select(Text.h32($"t", 0)).as[Long].head()
    val expected = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("0abc".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    assert(v === expected)
  }

  test("native h32 ≡ the md5-prefix column twin (what every oracle replays)") {
    // ASCII, unicode (UTF-8 multibyte), empty, long, null — the native
    // kernel must agree value-for-value with conv(substring(md5,1,8),16,10)
    val inputs = Seq("hello world", "héllo wörld ünïcode 漢字", "",
      "x" * 10000, null).map(Tuple1[String](_))
    val df = inputs.toDF("t")
    val both = df.select(Text.h32($"t").as("native"),
      Text.h32Columns($"t").as("cols")).collect()
    both.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1))
    }
    assert(both.count(!_.isNullAt(0)) === 4)
    // range invariant holds through the native path
    both.filter(!_.isNullAt(0)).foreach(r =>
      assert(r.getLong(0) >= 0L && r.getLong(0) < (1L << 32)))
  }

  test("shinglesOfTokens emits n-grams, whole-doc fallback for short docs") {
    val df = Seq("a b c d", "a b").toDF("t")
      .select(Dedup.shinglesOfTokens(Text.tokens($"t")).as("sh"))
    val out = df.as[Seq[String]].collect()
    assert(out(0) === Seq("a b c", "b c d"))
    assert(out(1) === Seq("a b"))
  }

  test("exact-dup groups collapse identical normalized text") {
    val df = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other")).toDF("id", "text")
    val groups = Dedup.exactDupGroups(df, "text", "id")
    assert(groups.count() === 2)
    val dup = groups.filter($"n_docs" === 2).collect().head
    assert(dup.getAs[Long]("keeper_id") === 1L)
  }

  test("native shingle-base kernel ≡ the HOF column reference, hash for hash") {
    // the bases feed every minhash signature and LSH band key, so they
    // must be BIT-identical to the column form (same per-token H32 md5,
    // same masked combine, same <3-token whole-doc fallback, same
    // array(NULL) row for null text)
    val cases = Seq(null, "", "one", "one two", "one two three",
      "a b c d e f g", "dup dup dup dup", " x  y  z ", "Thé QUICK brown-fox.",
      "a_b c-d e.f", "123 456 789 0")
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val kernel = graft.ops.Dedup.explodedShingleHashes(df, "text", "id")
      .orderBy("id", "base").collect().map(r => (r.getLong(0), r.get(1))).toSeq
    val ref = graft.ops.Dedup.explodedShingleHashesRef(df, "text", "id")
      .orderBy("id", "base").collect().map(r => (r.getLong(0), r.get(1))).toSeq
    assert(kernel === ref)
    // corpus-wide at sf0.001: identical multisets
    val docs = Tables.documents(spark, sf())
    val kc = graft.ops.Dedup.explodedShingleHashes(docs, "text", "doc_id")
      .groupBy("base").count()
    val rc = graft.ops.Dedup.explodedShingleHashesRef(docs, "text", "doc_id")
      .groupBy("base").count()
    assert(kc.exceptAll(rc).count() === 0 && rc.exceptAll(kc).count() === 0)
  }

  test("native tokenizer ≡ split+filter reference, token for token") {
    val cases = Seq(null, "", "one", "  leading", "trailing  ", "a--b__c",
      "Thé QUICK brown-fox.", "ΑΒΓ δεζ", "123 x_9", "a\tb\nc", "!!!", "_")
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (d <- Seq(df, Tables.documents(spark, sf()).toDF())) {
      val idc = if (d.columns.contains("doc_id")) "doc_id" else "id"
      val kern = d.select(col(idc), graft.ops.Text.tokens(col("text")).as("t"))
      val ref = d.select(col(idc), graft.ops.Text.tokensRef(col("text")).as("t"))
      assert(kern.exceptAll(ref).isEmpty && ref.exceptAll(kern).isEmpty,
        "tokenizer kernel/reference divergence")
    }
  }

  test("per-row minhash signatures ≡ explode/groupBy reference, sig for sig") {
    // the r21 per-row SeedMins kernel must reproduce the aggregation
    // form's signatures exactly — including the all-null signature row
    // for null text and the whole-doc fallback for short docs
    val cases = Seq(null, "", "one", "one two", "one two three",
      "a b c d e f g", "dup dup dup dup", " x  y  z ", "Thé QUICK brown-fox.",
      "a_b c-d e.f", "123 456 789 0")
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (k <- Seq(2, 8, 16); d <- Seq(df, Tables.documents(spark, sf()).toDF())) {
      val idc = if (d.columns.contains("doc_id")) "doc_id" else "id"
      val kern = Dedup.minhashSignatures(d, "text", idc, k)
      val ref = Dedup.minhashSignaturesRef(d, "text", idc, k)
        .select(kern.columns.map(org.apache.spark.sql.functions.col): _*)
      assert(kern.exceptAll(ref).isEmpty && ref.exceptAll(kern).isEmpty,
        s"signature kernel/reference divergence at k=$k")
    }
  }

  test("native distinct-shingle kernel ≡ the HOF column reference, set for set") {
    val cases = Seq(null, "", "one", "one two", "one two three",
      "a b a b a b", "dup dup dup dup", " x  y  z ", "Thé QUICK brown-fox.",
      "a_b c-d e.f", "123 456 789 0")
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (d <- Seq(df, Tables.documents(spark, sf()).toDF())) {
      val idc = if (d.columns.contains("doc_id")) "doc_id" else "id"
      val kern = Dedup.distinctShingleSets(d, "text", idc)
      val ref = Dedup.distinctShingleSetsRef(d, "text", idc)
      // exact arrays INCLUDING element order (array_distinct keeps first
      // occurrence; the stored index sets must not reorder across the
      // kernel swap)
      assert(kern.exceptAll(ref).isEmpty && ref.exceptAll(kern).isEmpty,
        "distinct-shingle kernel/reference divergence")
    }
  }

  test("minhash candidate pairs surface planted near-duplicates, not random docs") {
    val near1 = "the quick brown fox jumps over the lazy dog again and again today"
    val near2 = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    val far = "completely unrelated text about spark catalyst optimizer internals"
    val df = Seq((1L, near1), (2L, near2), (3L, far)).toDF("id", "text")
    val pairs = Dedup.minhashCandidatePairs(df, "text", "id", k = 8, bands = 4)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("dropNearDuplicates removes the planted near-dup, keeps distinct docs") {
    val near1 = "the quick brown fox jumps over the lazy dog again and again today"
    val near2 = "the quick brown fox jumps over the lazy dog again and again today extra"
    val far = "completely unrelated text about spark catalyst optimizer internals"
    val df = Seq((1L, near1), (2L, near2), (3L, far)).toDF("id", "text")
    val kept = graft.ops.Dedup.dropNearDuplicates(df, "text", "id", minJaccard = 0.5, bands = 4)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L))  // keeper = lower id; distinct doc survives
  }

  test("dropNearDuplicates at a 33% dup rate: correct keepers, no broadcast hint") {
    // 100 base docs, 50 planted near-dups (id+1000 = base text + one token):
    // a web-crawl-like dup rate where a forced broadcast of the drop set
    // would be O(corpus). The anti-join must leave strategy choice to AQE.
    val base = (1L to 100L).map(i =>
      (i, s"doc$i alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i iota$i"))
    val dups = (1L to 50L).map(i =>
      (i + 1000L, s"doc$i alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i iota$i extra"))
    val df = (base ++ dups).toDF("id", "text")
    val kept = Dedup.dropNearDuplicates(df, "text", "id", minJaccard = 0.5, bands = 4)
    assert(kept.queryExecution.optimizedPlan.toString.toLowerCase.indexOf("hint") === -1,
      "drop-set anti-join must not carry a broadcast hint")
    val ids = kept.select("id").as[Long].collect().toSet
    assert((1L to 100L).forall(ids.contains), "all lower-id keepers survive")
    assert((1L to 50L).forall(i => !ids.contains(i + 1000L)), "all planted dups dropped")
  }

  test("LSH hot-bucket cap bounds poison-bucket fan-out and is surfaced in stats") {
    // 500 empty docs share the whole-doc-fallback signature → one 500-doc
    // bucket per band. Uncapped that is ~125k quadratic pairs; with the cap
    // the bucket is skipped (reported, not silent) and real dups still pair.
    val empties = (1L to 500L).map(i => (i, ""))
    val real = Seq(
      (9001L, "the quick brown fox jumps over the lazy dog again and again today"),
      (9002L, "the quick brown fox jumps over the lazy dog again and again tomorrow"))
    val df = (empties ++ real).toDF("id", "text")
    val pairs = Dedup.minhashCandidatePairs(df, "text", "id", k = 8, bands = 4, maxBucket = 50)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((9001L, 9002L)), "real near-dups still surfaced")
    assert(!pairs.exists(p => p._1 <= 500L || p._2 <= 500L), "poison bucket contributes no pairs")
    val stats = Dedup.candidateBucketStats(df, "text", "id", k = 8, bands = 4, maxBucket = 50)
      .agg(sum("skipped_buckets"), sum("skipped_docs"), max("max_bucket"))
      .as[(Long, Long, Long)].head()
    assert(stats._1 >= 4L, "one over-cap bucket per band reported")
    assert(stats._2 >= 2000L && stats._3 === 500L)
  }

  test("hot-bucket skips are observed inside the pair job (no separate audit pass)") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val metrics = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("graft_minhash_buckets")) metrics.add(row)
        }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // 100 empty docs share the fallback signature: one 100-doc bucket per
      // band, all over the cap — the pair job itself must report the skips.
      // Two real near-dups keep the output non-empty: AQE folds an
      // all-empty result to EmptyRelation, which discards CollectMetrics
      // (documented Spark quirk, see minhashCandidatePairs scaladoc).
      val real = Seq(
        (9001L, "the quick brown fox jumps over the lazy dog again and again today"),
        (9002L, "the quick brown fox jumps over the lazy dog again and again tomorrow"))
      val df = ((1L to 100L).map(i => (i, "")) ++ real).toDF("id", "text")
      Dedup.minhashCandidatePairs(df, "text", "id", k = 8, bands = 4, maxBucket = 10).count()
      val deadline = System.currentTimeMillis() + 30000
      while (metrics.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(!metrics.isEmpty, "observed metrics were delivered to the listener")
      val row = metrics.peek()
      assert(row.getAs[Long]("skipped_buckets") === 4L)
      assert(row.getAs[Long]("skipped_docs") === 400L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("bm25: more query-term mass ranks higher, termless docs score zero") {
    val df = Seq(
      (1L, "spark spark spark fast engine"),
      (2L, "spark is one word here with lots of other filler text padding"),
      (3L, "completely unrelated words only")).toDF("id", "text")
    val scored = graft.ops.Text.bm25(df, "text", "id", Seq("spark", "engine"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(scored(3L) === ((0.0, 0L)))
    assert(scored(1L)._2 === 2L && scored(2L)._2 === 1L)
    assert(scored(1L)._1 > scored(2L)._1, "tf-heavy short doc outranks one-hit long doc")
    assert(scored(2L)._1 > 0.0)
  }

  test("boilerplate removal: shared sentences dropped, order kept, all-boiler docs empty") {
    val df = Seq(
      (1L, "Cookie banner here. Real content one. All rights reserved"),
      (2L, "Cookie banner here. Unique thoughts two. All rights reserved"),
      (3L, "Cookie banner here. Third body text. All rights reserved"),
      (4L, "Cookie banner here. All rights reserved"),
      (5L, "Fully original document with nothing shared")).toDF("id", "text")
    val out = graft.ops.Text.removeBoilerplate(df, "text", "id", minDocs = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) === (("Real content one", 2L)))
    assert(out(2L) === (("Unique thoughts two", 2L)))
    assert(out(3L) === (("Third body text", 2L)))
    assert(out(4L) === (("", 2L)), "all-boilerplate doc comes back empty, not missing")
    assert(out(5L) === (("Fully original document with nothing shared", 0L)))
  }

  test("boilerplate removal preserves multi-sentence order") {
    val shared = "nav menu"
    val df = (1L to 3L).map(i => (i, s"$shared. alpha $i. $shared. omega $i"))
      .toDF("id", "text")
    val out = graft.ops.Text.removeBoilerplate(df, "text", "id", minDocs = 3)
      .filter($"id" === 2L).collect().head
    assert(out.getString(1) === "alpha 2. omega 2")
    assert(out.getLong(2) === 2L)
  }

  test("temperature mixture: T=1 reproduces flat target, higher T boosts small classes") {
    val rows = (1L to 900L).map(i => (i, "big")) ++ (901L to 1000L).map(i => (i, "small"))
    val df = rows.toDF("id", "cls")
    val t1 = graft.ops.Sampling.temperatureMixture(df, "cls", "id", 0.2, temperature = 1.0)
      .select("cls", "rate_micro").distinct().as[(String, Long)].collect().toMap
    // T=1: every class keeps ~ the target fraction (micro-floor rounding only)
    assert(math.abs(t1("big") - 200000L) <= 5L && math.abs(t1("small") - 200000L) <= 5L)
    val t4 = graft.ops.Sampling.temperatureMixture(df, "cls", "id", 0.2, temperature = 4.0)
      .select("cls", "rate_micro").distinct().as[(String, Long)].collect().toMap
    assert(t4("small") > t4("big"), "flattening oversamples the minority class")
    assert(t4("small") > t1("small") && t4("big") < t1("big"))
    // a tiny class with an aggressive target caps at rate 1
    val tiny = ((1L to 995L).map(i => (i, "big")) ++ (996L to 1000L).map(i => (i, "rare")))
      .toDF("id", "cls")
    val capped = graft.ops.Sampling.temperatureMixture(tiny, "cls", "id", 0.9, temperature = 8.0)
      .select("cls", "rate_micro").distinct().as[(String, Long)].collect().toMap
    assert(capped("rare") === 1000000L)
  }

  test("bigram counts: adjacency within doc only, top-N total order") {
    val df = Seq((1L, "to be or not to be"), (2L, "to be is to do"), (3L, "x")).toDF("id", "text")
    val top = graft.ops.Text.bigramCounts(df, "text", topN = 3)
      .as[(String, String, Long)].collect().toSeq
    // "to be" appears 3× (docs 1+1+1... doc1 twice, doc2 once); next "be or"/"not to"... ties by name
    assert(top.head === (("to", "be", 3L)))
    assert(top.size === 3)
    // single-token doc contributes nothing; no cross-doc pairs ("be"→"to" across docs)
    val all = graft.ops.Text.bigramCounts(df, "text", topN = 1000)
      .as[(String, String, Long)].collect()
    assert(all.map(_._3).sum === (5 + 4))  // (n_tokens - 1) per multi-token doc
  }

  test("BPE merge learning: argmax pair merges greedily, non-overlapping") {
    val df = Seq(
      (1L, "a b a b a b c"),
      (2L, "a b c d"),
      (3L, "a a a")).toDF("id", "text")
    val merges = graft.ops.Text.learnBpeMerges(df, "text", nMerges = 2)
    // round 1: "a b" occurs 4 times (3 in doc1 non-overlap... actually 3: pos 1,3,5; 1 in doc2)
    assert(merges.head._2 === "a" && merges.head._3 === "b" && merges.head._4 === 4L)
    // round 2 operates on the MERGED stream: doc1 = [a+b, a+b, a+b, c] so
    // (a+b,a+b)=2 ties with (a,a)=2 and (a+b,c)=2 — w1-asc tie-break picks (a,a)
    assert(merges(1) === ((2, "a", "a", 2L)))
    // greedy non-overlap: "a a a" yields one (a,a) pair occurrence when merging,
    // and merge products never re-pair within the same round
    val one = graft.ops.Text.learnBpeMerges(
      Seq((1L, "a a a")).toDF("id", "text"), "text", nMerges = 5)
    assert(one.isEmpty || one.head._4 >= 2L)
  }

  test("text ops tolerate null, empty, and whitespace-only documents") {
    val df = Seq((1L, null: String), (2L, ""), (3L, "   \t  "), (4L, "normal text here"))
      .toDF("doc_id", "text")
    // every per-doc text op must execute; none may throw on degenerate docs
    val outputs = Seq(
      graft.ops.Text.wordCount(df, "text"),
      graft.ops.Text.qualityScore(df, "text", "doc_id"),
      graft.ops.Text.langId(df, "text", "doc_id"),
      graft.ops.Text.tokenStats(df, "text", "doc_id"),
      graft.ops.Text.piiStats(df, "text", "doc_id"),
      graft.ops.Text.piiRedact(df, "text", "doc_id"),
      graft.ops.Text.cleanse(df, "text", "doc_id"),
      graft.ops.Text.repetitionStats(df, "text", "doc_id"),
      graft.ops.Text.fingerprint(df, "text", "doc_id"),
      graft.ops.Text.bigramCounts(df, "text"),
      graft.ops.Text.postingStats(df, "text", "doc_id"),
      graft.ops.Text.compressionRatio(df, "text", "doc_id"),
      graft.ops.Dedup.simhash16(df, "text", "doc_id"),
      graft.ops.Dedup.exactDupGroups(df, "text", "doc_id"))
    outputs.foreach(_.collect())
    // the corpus-level ops only see doc 4's tokens
    assert(graft.ops.Text.wordCount(df, "text").count() === 3)
    assert(graft.ops.Text.bigramCounts(df, "text").count() === 2)
  }

  test("compression ratio orders repetitive < prose < high-entropy") {
    val rng = new scala.util.Random(7)
    val noise = Seq.fill(2000)(rng.nextPrintableChar()).mkString
    val df = Seq(
      (1L, "spam " * 400),
      (2L, ("the quick brown fox jumps over the lazy dog and then wanders " +
        "through unfamiliar streets seeking novel phrases every time ") * 8),
      (3L, noise),
      (4L, "")).toDF("id", "text")
    val r = graft.ops.Text.compressionRatio(df, "text", "id")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(1L)._3 < r(2L)._3 && r(2L)._3 < r(3L)._3,
      s"expected repetitive < prose < noise, got $r")
    assert(r(1L)._3 < 0.05, s"repetitive text should crush: ${r(1L)._3}")
    assert(r(3L)._3 > 0.5, s"high-entropy should resist: ${r(3L)._3}")
    assert(r(4L) === ((0L, r(4L)._2, 1.0)))
    // deterministic across partitionings
    val again = graft.ops.Text.compressionRatio(df.repartition(3), "text", "id")
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(again === r.view.mapValues(_._3).toMap)
  }

  test("BPE apply: learned merges encode the corpus to a merge-free fixpoint") {
    val df = Seq(
      (1L, "a b a b a b c"),
      (2L, "a b c d"),
      (3L, "a a a")).toDF("id", "text")
    val merges = graft.ops.Text.learnBpeMerges(df, "text", nMerges = 3)
      .map(m => (m._2, m._3))
    val encoded = graft.ops.Text.applyBpeMerges(df, "text", "id", merges)
      .as[(Long, Seq[String])].collect().toMap
    // doc1: (a,b) merges everywhere → [a+b, a+b, a+b, c]; later merges may
    // apply on top — whatever remains, no table pair may survive adjacent
    val rankSet = merges.toSet
    encoded.values.foreach { toks =>
      toks.sliding(2).foreach { p =>
        if (p.size == 2) assert(!rankSet.contains((p(0), p(1))),
          s"unapplied merge $p in $toks") }
    }
    assert(encoded(2L).startsWith(Seq("a+b", "c")))
    assert(encoded(1L).forall(t => t.contains("a+b") || t == "c"))
    // empty/degenerate docs survive
    val edge = graft.ops.Text.applyBpeMerges(
      Seq((9L, ""), (10L, "???"), (11L, "a")).toDF("id", "text"), "text", "id", merges)
      .as[(Long, Seq[String])].collect().toMap
    assert(edge(9L).isEmpty && edge(10L).isEmpty && edge(11L) === Seq("a"))
  }

  test("weighted per-class sampling: k per class, weight-biased, layout-independent") {
    // two classes; weights strongly skewed within each (ids 1..100 weight 1,
    // ids 101..200 weight 1000) — heavy items should dominate the sample
    val rows = (1L to 200L).map(i => (i, if (i <= 100) "a" else "b",
      if (i % 100 <= 49) 1L else 5000L))
    val df = rows.toDF("id", "cls", "w")
    val out = graft.ops.Sampling.weightedPerClass(df, "cls", "id", "w", k = 20, salt = "t")
    val picked = out.as[(String, Long, Long)].collect()
    assert(picked.count(_._1 == "a") === 20 && picked.count(_._1 == "b") === 20)
    val heavyShare = picked.count(p => p._2 % 100 >= 50 && p._2 % 100 <= 99)
    assert(heavyShare >= 30, s"heavy-weight items should dominate, got $heavyShare/40")
    // deterministic across partitioning layouts
    val re = graft.ops.Sampling.weightedPerClass(df.repartition(7), "cls", "id", "w",
      k = 20, salt = "t").as[(String, Long, Long)].collect()
    assert(re.sortBy(r => (r._1, r._2)).toSeq === picked.sortBy(r => (r._1, r._2)).toSeq)
    // zero/negative weights are excluded, never sampled
    val withZero = rows.map { case (i, c, w) => (i, c, if (i % 10 == 0) 0L else w) }
      .toDF("id", "cls", "w")
    val z = graft.ops.Sampling.weightedPerClass(withZero, "cls", "id", "w", k = 200, salt = "t")
      .as[(String, Long, Long)].collect()
    assert(z.forall(_._2 % 10 != 0))
  }

  test("epoch shuffle: epochs differ, replays agree, ranks are a permutation") {
    val df = (1L to 200L).map(i => (i, 10L + i % 5)).toDF("id", "toks")
    def run(epoch: Int, parts: Int = 1) = {
      val in = if (parts > 1) df.repartition(parts) else df
      graft.ops.Sampling.epochShuffle(in, "id", "toks", epoch)
        .select("id", "rank").as[(Long, Long)].collect().toMap
    }
    val e1 = run(1)
    assert(e1.values.toSeq.sorted === (1L to 200L))
    assert(run(1, parts = 7) === e1, "same epoch must replay identically")
    val e2 = run(2)
    assert(e2 !== e1, "different epochs must draw different orders")
    // running totals line up with the rank order
    val cum = graft.ops.Sampling.epochShuffle(df, "id", "toks", 1)
      .orderBy("rank").select("n_tok", "cum_tok").as[(Long, Long)].collect()
    assert(cum.scanLeft(0L)(_ + _._1).tail.toSeq === cum.map(_._2).toSeq)
  }

  test("token budget per class: prefix within budget, first doc never dropped") {
    val rows = (1L to 300L).map(i => (i, if (i % 2 == 0) "a" else "b", 100L + (i % 7) * 10))
    val df = rows.toDF("id", "cls", "toks")
    val out = graft.ops.Sampling.tokenBudgetPerClass(df, "cls", "id", "toks", budget = 3000L)
      .as[(String, Long, Long, Long)].collect()
    val byCls = out.groupBy(_._1)
    byCls.foreach { case (cls, picked) =>
      val maxCum = picked.map(_._4).max
      assert(maxCum <= 3000L, s"$cls busts budget: $maxCum")
      // greedy prefix: adding ANY unpicked doc would exceed the budget
      // (cheap proxy: picked token sum is within one max-doc of the budget)
      assert(maxCum >= 3000L - 160L, s"$cls underfills: $maxCum")
    }
    // a budget below the smallest doc still keeps exactly one doc per class
    val tiny = graft.ops.Sampling.tokenBudgetPerClass(df, "cls", "id", "toks", budget = 1L)
      .as[(String, Long, Long, Long)].collect()
    assert(tiny.groupBy(_._1).forall(_._2.length == 1))
    // layout-independent
    val again = graft.ops.Sampling.tokenBudgetPerClass(df.repartition(9), "cls", "id",
      "toks", budget = 3000L).as[(String, Long, Long, Long)].collect()
    assert(again.sortBy(r => (r._1, r._2)).toSeq === out.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("token budget pre-thin: giant class bounded, small classes exact, first doc kept") {
    // one dominant class (10k rows) beside a small one — the giant-class
    // reducer scenario the preSampleOver guard exists for
    val rows = (1L to 10000L).map(i => (i, "giant", 50L)) ++
      (20001L to 20020L).map(i => (i, "small", 100L))
    val df = rows.toDF("id", "cls", "toks")
    def run(pre: Long) = graft.ops.Sampling.tokenBudgetPerClass(
      df, "cls", "id", "toks", budget = 100000L, salt = "s0", preSampleOver = pre)
      .as[(String, Long, Long, Long)].collect()
    val full = run(Long.MaxValue)
    val thinned = run(500L)
    // the small class is untouched by the pre-thin
    assert(thinned.filter(_._1 == "small").sortBy(_._2).toSeq ===
      full.filter(_._1 == "small").sortBy(_._2).toSeq)
    // the giant class window saw ~500 rows, not 10k: kept count is bounded
    // by what survived the stride (and still respects the budget)
    val g = thinned.filter(_._1 == "giant")
    assert(g.nonEmpty && g.map(_._4).max <= 100000L)
    assert(g.length < full.count(_._1 == "giant"),
      "pre-thin must bite on the giant class")
    // the FULL class's first doc in hash order survives the thin: the
    // budget=1 degenerate keeps exactly that doc, thinned or not
    val first = graft.ops.Sampling.tokenBudgetPerClass(
      df, "cls", "id", "toks", budget = 1L).as[(String, Long, Long, Long)]
      .collect().filter(_._1 == "giant").map(_._2).toSet
    val firstThinned = graft.ops.Sampling.tokenBudgetPerClass(
      df, "cls", "id", "toks", budget = 1L, preSampleOver = 500L)
      .as[(String, Long, Long, Long)].collect().filter(_._1 == "giant").map(_._2).toSet
    assert(firstThinned === first, "first-in-hash-order doc must survive the pre-thin")
    // deterministic across layouts
    val again = graft.ops.Sampling.tokenBudgetPerClass(df.repartition(13), "cls", "id",
      "toks", budget = 100000L, preSampleOver = 500L)
      .as[(String, Long, Long, Long)].collect()
    assert(again.sortBy(r => (r._1, r._2)).toSeq === thinned.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("bigram LM: hand-computed interpolated log-probs, short docs null out") {
    val df = Seq((1L, "a b a b"), (2L, "a a"), (3L, "solo")).toDF("doc_id", "text")
    val out = graft.ops.Text.bigramLogProb(df, "text", "doc_id", lambda = 0.7)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), Option(r.get(2))))).toMap
    // corpus: uni a=4+2=... doc1 [a,b,a,b], doc2 [a,a], doc3 [solo]
    // uni: a→4, b→2, solo→1, total 7; bi: (a,b)→2, (b,a)→1, (a,a)→1
    val lam = 0.7; val mu = 1.0 - lam
    def p(bc: Long, c1: Long, c2: Long): Double =
      lam * bc / c1.toDouble + mu * c2 / 7.0
    val d1 = (2 * math.log(p(2, 4, 2)) + math.log(p(1, 2, 4))) / 3.0
    val d2 = math.log(p(1, 4, 4))
    assert(out(1)._1 === 3L)
    assert(math.abs(out(1)._2.get.asInstanceOf[Double] - math.floor(d1 * 1e6) / 1e6) < 1e-9)
    assert(out(2)._1 === 1L)
    assert(math.abs(out(2)._2.get.asInstanceOf[Double] - math.floor(d2 * 1e6) / 1e6) < 1e-9)
    // a 1-token doc has no bigrams: count 0, score null (empty-group avg)
    assert(out(3) === ((0L, None)))
    // repetitive text scores HIGHER (less surprising) than varied text on a
    // realistic corpus — the filtering signal the op exists for
    val docs = Tables.documents(spark, sf()).limit(200)
    val scored = graft.ops.Text.bigramLogProb(docs, "text", "doc_id")
    assert(scored.filter(col("avg_logprob").isNotNull).count() > 0)
  }

  test("pack offsets: every span extracts its exact document from the packed text") {
    val df = (1L to 120L)
      .map(i => (i, s"doc$i " + ("x" * (i % 37).toInt), 5L + (i % 37)))
      .toDF("id", "text", "toks")
    val packed = graft.ops.Packing.packTexts(df, "id", "text", "toks",
      budget = 300, buckets = 8).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val offs = graft.ops.Packing.packOffsets(df, "id", "text", "toks",
      budget = 300, buckets = 8)
      .as[(Long, Long, Long, Long, Long)].collect()
    val textOf = df.select("id", "text").as[(Long, String)].collect().toMap
    assert(offs.length === 120)
    offs.foreach { case (bin, id, _, start, end) =>
      val extracted = packed(bin).substring(start.toInt, end.toInt)
      assert(extracted === textOf(id), s"bin $bin doc $id: '$extracted'")
    }
  }

  test("oversampling mixture: rare class multiplies, head subsamples, copies enumerated") {
    val rows = (1L to 950L).map(i => (i, "big")) ++ (951L to 1000L).map(i => (i, "rare"))
    val df = rows.toDF("id", "cls")
    val out = graft.ops.Sampling.temperatureMixtureOversample(df, "cls", "id",
      targetFraction = 0.5, temperature = 8.0, salt = "t")
    val byCls = out.groupBy("cls").count().as[(String, Long)].collect().toMap
    // rare class should emit MORE rows than it has members (with replacement)
    assert(byCls("rare") > 50L, s"rare emitted ${byCls("rare")}")
    assert(byCls("big") < 950L, s"head must subsample, emitted ${byCls("big")}")
    // copy_id enumerates 1..n per id with no gaps
    val copies = out.filter(col("cls") === "rare")
      .groupBy("id").agg(count(lit(1)).as("n"), max("copy_id").as("mx"),
        min("copy_id").as("mn"))
      .as[(Long, Long, Long, Long)].collect()
    copies.foreach { case (id, n, mx, mn) =>
      assert(mn === 1L && mx === n, s"id $id copies $n range [$mn,$mx]") }
    // deterministic under repartitioning
    val again = graft.ops.Sampling.temperatureMixtureOversample(df.repartition(7),
      "cls", "id", targetFraction = 0.5, temperature = 8.0, salt = "t")
      .select("id", "copy_id").as[(Long, Long)].collect().toSet
    assert(again === out.select("id", "copy_id").as[(Long, Long)].collect().toSet)
  }

  test("sequence packing: bins respect budget+straddle, ids cover, layout-independent") {
    val df = (1L to 400L).map(i => (i, 50L + (i % 7) * 30L)).toDF("id", "n_toks")
    val packed = graft.ops.Packing.assignBins(df, "id", "n_toks", budget = 1000, buckets = 8)
    val rows = packed.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 400, "every doc assigned exactly once")
    // bins are contiguous from 0
    val bins = rows.map(_._4).distinct.sorted
    assert(bins.head === 0L && bins === (bins.head to bins.last).toArray.toSeq)
    // each bin's total ≤ budget + one straddling doc (contiguous chunking)
    val maxDoc = rows.map(_._3).max
    rows.groupBy(_._4).foreach { case (bin, rs) =>
      val tot = rs.map(_._3).sum
      assert(tot <= 1000L + maxDoc, s"bin $bin holds $tot tokens")
    }
    // deterministic across physical layout
    val reshuffled = graft.ops.Packing.assignBins(
      df.repartition(13), "id", "n_toks", budget = 1000, buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(rows.forall(r => reshuffled(r._1) === r._4))
  }

  test("packed sequences concatenate docs in packing order with exact totals") {
    val df = (1L to 60L).map(i => (i, s"doc$i", 40L)).toDF("id", "text", "n_toks")
    val packed = graft.ops.Packing.packTexts(df, "id", "text", "n_toks",
      budget = 200, buckets = 4, sep = "|")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(packed.map(_._3).sum === 60L, "every doc lands in exactly one sequence")
    assert(packed.map(_._4).sum === 60L * 40L)
    // each bin's text is its docs joined in the assignBins global order
    val order = graft.ops.Packing.assignBins(df, "id", "n_toks", 200, 4)
      .withColumn("h", graft.ops.Text.h32(concat($"id".cast("string"), lit("_pack"))))
      .orderBy("bucket", "h", "id")
      .select("id", "bin").as[(Long, Long)].collect()
    val expected = order.groupBy(_._2).view
      .mapValues(_.map(p => s"doc${p._1}").mkString("|")).toMap
    packed.foreach { case (bin, text, _, _) => assert(text === expected(bin), s"bin $bin") }
  }

  test("pii stats count each span type, word-boundaries reject embedded fakes") {
    val df = Seq(
      (1L, "mail a_b@x.co and c@d.org plus https://x.y/z"),
      (2L, "call 555-123-4567 but not 12345-678-90123"),
      (3L, "ssn 123-45-6789 here"),
      (4L, "perfectly clean text")).toDF("id", "text")
    val out = graft.ops.Text.piiStats(df, "text", "id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(out(1L) === ((2L, 1L, 0L, 0L, true)))
    assert(out(2L) === ((0L, 0L, 1L, 0L, true)), "embedded long-digit fake not counted")
    assert(out(3L) === ((0L, 0L, 0L, 1L, true)))
    assert(out(4L) === ((0L, 0L, 0L, 0L, false)))
  }

  test("piiRedact: placeholders substituted; detect(redact(x)) is clean") {
    val df = Seq(
      (1L, "mail a@b.com and c.d@e.org thanks"),
      (2L, "call 555-123-4567 or 555.123.4567"),
      (3L, "ssn 123-45-6789 here"),
      (4L, "perfectly clean text")).toDF("id", "text")
    val red = graft.ops.Text.piiRedact(df, "text", "id")
    val m = red.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) === "mail <EMAIL> and <EMAIL> thanks")
    assert(m(2L) === "call <PHONE> or <PHONE>")
    assert(m(3L) === "ssn <SSN> here")
    assert(m(4L) === "perfectly clean text")
    // fixpoint: rerunning detection over redacted text finds nothing
    val redetect = graft.ops.Text.piiStats(
      red.withColumnRenamed("text_redacted", "text"), "text", "id")
      .filter(col("n_emails") + col("n_phones") + col("n_ssn") > 0)
    assert(redetect.count() === 0)
  }

  test("ngram jaccard: identical docs 1.0, disjoint docs 0.0") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w v")).toDF("id", "text")
    val j = Dedup.ngramJaccardPairs(df, "text", "id")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(j((1L, 2L)) === 1.0)
    assert(j((2L, 3L)) === 0.0)
  }

  test("simhash of near-identical docs differs in few bits") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "entirely different words everywhere nothing shared")).toDF("id", "text")
    val h = Dedup.simhash16(df, "text", "id").as[(Long, Long)].collect().toMap
    def bits(x: Long): Int = java.lang.Long.bitCount(x)
    assert(bits(h(1L) ^ h(2L)) <= bits(h(1L) ^ h(3L)))
  }

  test("negative sampling: k without-self draws per anchor, layout-independent, salt-fresh") {
    val ids = (1L to 40L).map(i => Tuple1(i * 7)).toDF("doc_id") // non-contiguous ids
    val neg = graft.ops.Sampling.negativeSamples(ids, "doc_id", k = 4, salt = "a")
      .as[(Long, Int, Long)].collect()
    val valid = (1L to 40L).map(_ * 7).toSet
    // exactly k rows per anchor, never the anchor itself, always a real id
    val byAnchor = neg.groupBy(_._1)
    assert(byAnchor.size === 40 && byAnchor.values.forall(_.length === 4))
    neg.foreach { case (a, _, n) => assert(n != a && valid(n), s"($a, $n)") }
    // deterministic under any partitioning
    val reparted = graft.ops.Sampling.negativeSamples(
      ids.repartition(13), "doc_id", k = 4, salt = "a").as[(Long, Int, Long)].collect()
    assert(neg.toSet === reparted.toSet)
    // a new salt is a fresh draw (an epoch's negatives differ)
    val fresh = graft.ops.Sampling.negativeSamples(ids, "doc_id", k = 4, salt = "b")
      .as[(Long, Int, Long)].collect()
    assert(fresh.toSet !== neg.toSet)
  }

  test("hash sampling is deterministic, layout-independent, and ~proportional") {
    val df = (1L to 2000L).map(i => (i, if (i % 4 == 0) "en" else "other")).toDF("id", "lang")
    val s1 = graft.ops.Sampling.hashSample(df, "id", 0.3).select("id").as[Long].collect().toSet
    val s2 = graft.ops.Sampling.hashSample(df.repartition(7), "id", 0.3)
      .select("id").as[Long].collect().toSet
    assert(s1 === s2)                                      // layout-independent
    assert(math.abs(s1.size - 600) < 80, s1.size.toString) // ~30%
    val s3 = graft.ops.Sampling.hashSample(df, "id", 0.3, salt = "other")
      .select("id").as[Long].collect().toSet
    assert(s3 !== s1)                                      // independent draw per salt
    val strat = graft.ops.Sampling.stratifiedHashSample(df, "lang", "id",
      Map("en" -> 0.8), default = 0.1).as[(Long, String)].collect()
    val en = strat.count(_._2 == "en"); val other = strat.length - en
    assert(math.abs(en - 400) < 80, en.toString)           // 80% of 500
    assert(math.abs(other - 150) < 60, other.toString)     // 10% of 1500
  }

  test("cleanse strips html, redacts urls/emails, collapses whitespace") {
    val df = Seq(
      (1L, "<p>Hello <b>world</b></p>  visit https://example.com/x?q=1 now"),
      (2L, "contact alice.smith+test@example.co.uk   for  details"),
      (3L, "   ")).toDF("id", "text")
    val out = graft.ops.Text.cleanse(df, "text", "id")
      .as[(Long, String, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1 === "Hello world visit <URL> now")
    assert(out(2L)._1 === "contact <EMAIL> for details")
    assert(out(3L) === (("", false)))
  }

  test("chunking: stride boundaries, short tail, sub-chunk docs, empty docs") {
    val eleven = (1 to 11).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, eleven),          // chunk=5, overlap=2 → starts 0,3,6,9: lens 5,5,5,2
      (2L, "a b"),           // shorter than one chunk → one 2-token chunk
      (3L, "")               // tokenless → no chunks
    ).toDF("id", "text")
    val out = graft.ops.Text.chunkDocs(df, "text", "id", chunk = 5, overlap = 2)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(c => (c._3, c._4)).toSeq).toMap
    assert(out(1L).map(_._1) === Seq(5L, 5L, 5L, 2L))
    assert(out(1L).head._2 === "w1 w2 w3 w4 w5")
    assert(out(1L)(1)._2 === "w4 w5 w6 w7 w8", "overlap of 2 tokens carries over")
    assert(out(1L).last._2 === "w10 w11")
    assert(out(2L) === Seq((2L, "a b")))
    assert(!out.contains(3L))
  }

  test("winnowing: shared long substring yields shared fingerprints, disjoint text doesn't") {
    val shared = "the quick brown fox jumps over the lazy dog near the river bank"
    val df = Seq(
      (1L, s"PREFIX ONE $shared SUFFIX ONE"),
      (2L, s"totally different opening $shared and another ending"),
      (3L, "no overlap here at all just unrelated words everywhere")).toDF("id", "text")
    val fps = graft.ops.Text.winnowFingerprints(df, "text", "id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty)   // winnowing guarantee
    assert((fps(1L) intersect fps(3L)).isEmpty)
  }

  test("cosine topK ranks an identical vector first") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.9f, 0.1f, 0.0f))).toDF("vec_id", "embedding")
    val top = ops.Similarity.cosineTopK(df, df.filter($"vec_id" === 0), "vec_id", "embedding", k = 2)
      .orderBy("rnk").as[(Long, Long, Int, Double)].collect()
    assert(top.head._2 === 1L)   // identical vector is rank 1
    assert(top.head._4 === 1.0)
    assert(top(1)._2 === 3L)
  }

  test("phrase search finds every anchored occurrence, 1-based") {
    val d = Seq(
      (1L, "the cat sat on the cat mat"),
      (2L, "cat mat here"),
      (3L, "the mat cat"),
      (4L, "CAT  MAT, punctuation! ignored")
    ).toDF("doc_id", "text")
    val got = Text.phraseSearch(d, "text", "doc_id", Seq("cat", "mat"))
      .orderBy("doc_id", "match_pos").as[(Long, Int)].collect()
    assert(got.toSeq == Seq((1L, 6), (2L, 1), (4L, 1)))
  }

  test("phrase search handles repeated words in the phrase by construction") {
    val d = Seq((1L, "a b a b a"), (2L, "a b b a")).toDF("doc_id", "text")
    val got = Text.phraseSearch(d, "text", "doc_id", Seq("a", "b", "a"))
      .orderBy("doc_id", "match_pos").as[(Long, Int)].collect()
    // overlapping token-anchored matches both count: positions 1 and 3
    assert(got.toSeq == Seq((1L, 1), (1L, 3)))
  }

  test("single-term phrase degenerates to term postings; no-match is empty") {
    val d = Seq((1L, "x y x")).toDF("doc_id", "text")
    val one = Text.phraseSearch(d, "text", "doc_id", Seq("x"))
      .orderBy("match_pos").as[(Long, Int)].collect()
    assert(one.toSeq == Seq((1L, 1), (1L, 3)))
    assert(Text.phraseSearch(d, "text", "doc_id", Seq("x", "z")).isEmpty)
    intercept[IllegalArgumentException] {
      Text.phraseSearch(d, "text", "doc_id", Seq("two words"))
    }
  }

  test("phrase search agrees with the substring scan on the real corpus") {
    val d = Tables.documents(spark, sf("sf0.01"))
    val viaIndex = Text.phraseSearch(d, "text", "doc_id", Seq("table", "hash"))
      .select("doc_id").distinct()
    val viaScan = d.where(concat(lit(" "),
        trim(regexp_replace(lower(col("text")), "\\W+", " ")), lit(" "))
        .contains(" table hash ")).select("doc_id")
    assert(viaIndex.exceptAll(viaScan).count() == 0 &&
      viaScan.exceptAll(viaIndex).count() == 0)
    assert(viaIndex.count() > 0, "fixture phrase must occur")
  }

  // one row per (class, unit-weight doc): class sizes become class totals
  private def mixCorpus(sizes: Map[String, Int]) = {
    val rows = for {
      (c, n) <- sizes.toSeq.sortBy(_._1)
      i <- 1 to n
    } yield (s"${c}_$i".hashCode.toLong.abs + i, c, 1L)
    rows.toDF("doc_id", "lang", "w")
  }

  test("waterfill: below-line classes kept whole, above-line capped at tau") {
    // totals 10/40/100, budget 70 → k*=1 (10 + 2·10=30 ≤ 70; 50+40 ≤ 70
    // fails at k=2: 50 + 1·40 = 90 > 70) → tau = (70-10)/2 = 30
    val d = mixCorpus(Map("small" -> 10, "mid" -> 40, "big" -> 100))
    val r = ops.Sampling.waterfillRates(d, "lang", "w", budget = 70L)
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(r("small") == (10L, 1000000L), s"below-line class must keep all: $r")
    assert(r("mid") == (40L, 750000L), s"tau/40 = 30/40: $r")
    assert(r("big") == (100L, 300000L), s"tau/100 = 30/100: $r")
  }

  test("waterfill: budget >= total keeps every class whole (infinite waterline)") {
    val d = mixCorpus(Map("a" -> 5, "b" -> 9))
    val r = ops.Sampling.waterfillRates(d, "lang", "w", budget = 14L)
      .as[(String, Long, Long)].collect()
    assert(r.forall(_._3 == 1000000L), r.mkString(","))
    // and one unit less caps exactly one class (the larger)
    val r13 = ops.Sampling.waterfillRates(d, "lang", "w", budget = 13L)
      .as[(String, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    assert(r13("a") == 1000000L && r13("b") < 1000000L, r13.toString)
  }

  test("waterfill: budget below m*min caps every class at tau = B/m") {
    val d = mixCorpus(Map("a" -> 20, "b" -> 30, "c" -> 40))
    val r = ops.Sampling.waterfillRates(d, "lang", "w", budget = 30L)
      .as[(String, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    // tau = 10 → rates 10/20, 10/30, 10/40
    assert(r == Map("a" -> 500000L, "b" -> 333333L, "c" -> 250000L), r.toString)
  }

  test("waterfill sample admits by class rate and stays near budget in expectation") {
    val d = Tables.documents(spark, sf("sf0.01"))
    val kept = ops.Sampling.waterfillSample(d, "lang", "doc_id", "n_chars",
      budget = 30000L, salt = "wf1")
    val keptChars = kept.join(d, Seq("doc_id"))
      .agg(sum("n_chars")).as[Long].head()
    assert(keptChars > 15000L && keptChars < 45000L,
      s"kept $keptChars chars vs budget 30000 — hash admission far off expectation")
    // rate bounds: every class's rate in (0, 1e6]
    val rates = ops.Sampling.waterfillRates(d, "lang", "n_chars", 30000L)
      .as[(String, Long, Long)].collect()
    assert(rates.forall(r => r._3 > 0 && r._3 <= 1000000L))
  }

  test("waterfill guards the exactness envelope loudly") {
    val d = mixCorpus(Map("a" -> 1))
    intercept[IllegalArgumentException] {
      ops.Sampling.waterfillRates(d, "lang", "w", budget = 10000000000L)
    }
    intercept[IllegalArgumentException] {
      ops.Sampling.waterfillRates(d, "lang", "w", budget = 0L)
    }
  }

  test("lengthBuckets: hand-exact pad/truncate economics per rung") {
    // ladder (4, 8): 3,4 → rung 4; 5 → rung 8; 9,20 → rung 8 TRUNCATED
    val d = Seq(3L, 4L, 5L, 9L, 20L).toDF("n_tok")
    val out = ops.Packing.lengthBuckets(d, "n_tok", ladder = Seq(4L, 8L))
      .collect().map(r => r.getAs[Long]("bucket_len") -> ((
        r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
        r.getAs[Long]("padding_tokens"), r.getAs[Long]("truncated_docs"),
        r.getAs[Long]("cut_tokens"), r.getAs[Long]("util_micro")))).toMap
    assert(out(4L) === ((2L, 7L, 1L, 0L, 0L, 875000L)))   // kept 7 of 2·4
    assert(out(8L) === ((3L, 34L, 3L, 2L, 13L, 875000L))) // kept 21 of 3·8
    intercept[IllegalArgumentException] {
      ops.Packing.lengthBuckets(d, "n_tok", ladder = Seq(8L, 4L))
    }
    intercept[IllegalArgumentException] {
      ops.Packing.lengthBuckets(d, "n_tok", ladder = Seq.empty)
    }
  }

  test("negativeSamples on under-2-row input returns empty, not a throw") {
    val one = Seq(1L).toDF("doc_id")
    assert(ops.Sampling.negativeSamples(one, "doc_id", k = 2).count() === 0L)
    assert(ops.Sampling.negativeSamples(one.where(lit(false)), "doc_id", k = 2)
      .count() === 0L)
  }

  test("shardManifest: order-independent checksum catches every mutation class") {
    val d = Seq((1L, "aa"), (2L, "bb"), (3L, "cc"), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    def m(df: org.apache.spark.sql.DataFrame) =
      ops.Export.shardManifest(df, "doc_id", "text", shards = 4)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toSet
    val base = m(d)
    assert(base.toSeq.map(_._2._1).sum === 4L) // every doc lands in some shard
    assert(m(d.repartition(5)) === base) // partition interleaving is invisible
    assert(m(d.orderBy(col("doc_id").desc)) === base) // row order is invisible
    assert(m(d.filter(col("doc_id") =!= 2L)) !== base) // a dropped row shifts it
    assert(m(d.withColumn("text",
      when(col("doc_id") === 1L, "aX").otherwise(col("text")))) !== base) // a mutated row too
    // shard assignment itself is a pure function of (id, salt)
    val s1 = ops.Export.assignShards(d, "doc_id", 4).select("doc_id", "shard")
      .collect().toSet
    assert(ops.Export.assignShards(d.repartition(3), "doc_id", 4)
      .select("doc_id", "shard").collect().toSet === s1)
  }

  test("stratifiedSplit: exact per-stratum quotas, thin strata keep eval docs") {
    // signal bands of width 1.00 (100 cents): stratum 0 holds 10 docs,
    // stratum 1 holds 3, stratum 2 holds 1; trainPct 50 → train quotas
    // 5/1/0 exactly (floor), eval gets the rest — the 1-doc stratum is
    // GUARANTEED an eval doc where a plain hash split gets one by luck
    val d = ((1 to 10).map(i => (i.toLong, 0.5)) ++
      Seq((21L, 1.5), (22L, 1.5), (23L, 1.5)) ++ Seq((31L, 2.5)))
      .toDF("doc_id", "sig")
    val out = ops.Sampling.stratifiedSplit(d, "doc_id", "sig",
      loCents = 0L, widthCents = 100L, buckets = 8, trainPct = 50)
    val counts = out.groupBy("stratum", "split").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(counts((0L, "train")) === 5L && counts((0L, "eval")) === 5L)
    assert(counts((1L, "train")) === 1L && counts((1L, "eval")) === 2L)
    assert(counts.get((2L, "train")).isEmpty && counts((2L, "eval")) === 1L)
    // deterministic and layout-independent
    val again = ops.Sampling.stratifiedSplit(d.repartition(7), "doc_id", "sig",
      loCents = 0L, widthCents = 100L, buckets = 8, trainPct = 50)
    assert(out.collect().toSet === again.collect().toSet)
  }

  test("oovStats: top-V vocab with ascending-token tie-break, tokenless zero") {
    // counts: a=2, b=1, c=1 → V=2 vocab = {a, b} (tie b<c by token asc)
    val d = Seq((1L, "a a b"), (2L, "c"), (3L, "")).toDF("doc_id", "text")
    val out = Text.oovStats(d, "text", "doc_id", vocabSize = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((3L, 0L, 0L)))
    assert(out(2L) === ((1L, 1L, 1000000L)))
    assert(out(3L) === ((0L, 0L, 0L)))
    // V=1: only 'a' survives; b becomes OOV → rate 333333 micro on doc 1
    val v1 = Text.oovStats(d, "text", "doc_id", vocabSize = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(v1(1L) === 333333L)
  }

  test("domainReweight: one multiplicative-weights round replays by hand") {
    // a: losses (2,2) → L=2e6 micro; b: (1) → 1e6. η=1:
    // lbar=1.5e6, rel=±333333, factors 1333333/666667, renorm → 666666/333333
    val d = Seq(("a", 2L), ("a", 2L), ("b", 1L)).toDF("cls", "loss")
    val out = ops.Sampling.domainReweight(d, "cls", "loss",
      rounds = 1, etaNum = 1, etaDen = 1)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("a") === ((2000000L, 666666L)))
    assert(out("b") === ((1000000L, 333333L)))
  }

  test("domainReweight: more rounds keep pushing weight at the hard domain") {
    val d = Seq(("a", 2L), ("a", 2L), ("b", 1L)).toDF("cls", "loss")
    def wA(r: Int) = ops.Sampling.domainReweight(d, "cls", "loss", r, 1, 2)
      .collect().map(x => x.getString(0) -> x.getLong(2)).toMap
    val (r1, r3) = (wA(1), wA(3))
    assert(r3("a") > r1("a") && r1("a") > 500000L)
    assert(r3("a") + r3("b") >= 999998L) // renormalized (floor slack ≤ 2)
  }

  test("effectiveSampleSize: Kish formula exact, bad weights excluded") {
    val d = Seq(("x", 1L), ("x", 1L), ("y", 3L), ("y", 1L),
      ("z", 5L), ("z", 0L)).toDF("cls", "w")
      .union(Seq(("z", null.asInstanceOf[java.lang.Long])).toDF("cls", "w"))
    val out = ops.Sampling.effectiveSampleSize(d, "cls", "w")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("x") === ((2L, 2L, 2000L, 1000000L)))   // equal weights: ESS = n
    assert(out("y") === ((2L, 4L, 1600L, 800000L)))    // 16/10, 16e6/(2·10)
    assert(out("z") === ((1L, 5L, 1000L, 1000000L)))   // 0/null weights dropped
  }

  test("spanCorrupt: splicing targets into inputs reconstructs the token stream") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"), col("text"))
    val out = ops.Text.spanCorrupt(docs, "text", "doc_id")
      .join(docs, "doc_id").collect()
    assert(out.nonEmpty)
    var masked = 0L
    out.foreach { r =>
      val (inp, tgt, k) = (r.getAs[String]("inputs_text"),
        r.getAs[String]("targets_text"), r.getAs[Long]("n_masked_cells"))
      // the engine tokenizer (lower → \W+ split → drop empties) replayed
      val origToks = r.getAs[String]("text").toLowerCase
        .split("\\W+").filter(_.nonEmpty).mkString(" ")
      masked += k
      // parse targets into span map, splice into inputs
      val spans = (0L until k).map { i =>
        val s = s"<extra_id_$i>"
        val start = tgt.indexOf(s) + s.length
        val end = if (i + 1 < k) tgt.indexOf(s"<extra_id_${i + 1}>") else tgt.length
        i -> tgt.substring(start, end).trim
      }.toMap
      val spliced = spans.foldLeft(inp) { case (acc, (i, span)) =>
        acc.replace(s"<extra_id_$i>", span)
      }
      assert(spliced === origToks, s"doc ${r.getLong(0)} does not reconstruct")
      // ordinals are dense 0..k-1 in both streams
      (0L until k).foreach { i =>
        assert(inp.contains(s"<extra_id_$i>") && tgt.contains(s"<extra_id_$i>"))
      }
    }
    assert(masked > 0, "fixture vacuous — no cell masked anywhere")
    // deterministic under partitioning
    val a = ops.Text.spanCorrupt(docs.repartition(5), "text", "doc_id")
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = ops.Text.spanCorrupt(docs, "text", "doc_id")
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a === b)
    // null and empty text both take the empty-struct branch (''/''/0) —
    // the oracle's LEFT JOIN coalesces a null-text doc the same way;
    // size(tokens(null)) is NULL in Spark, which unguarded skips the n===0
    // branch and nulls every output
    import spark.implicits._
    val edge = ops.Text.spanCorrupt(
      Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "   ")).toDF("doc_id", "text"),
      "text", "doc_id").orderBy("doc_id")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(edge === Seq((1L, "", "", 0L), (2L, "", "", 0L), (3L, "", "", 0L)),
      s"null/empty text must yield the empty struct, got $edge")
  }

  test("fimTransform: PSM parts reconstruct every document; rate and edges hold") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"), col("text"))
    val out = ops.Text.fimTransform(docs, "text", "doc_id", fimRate = 50)
      .join(docs, "doc_id")
      .collect()
    assert(out.nonEmpty)
    var fim = 0
    out.foreach { r =>
      val (t, mode, orig) = (r.getAs[String]("fim_text"),
        r.getAs[String]("mode"), r.getAs[String]("text"))
      if (mode == "plain") assert(t === orig)
      else {
        fim += 1
        // <|fim_pre|>P<|fim_suf|>S<|fim_mid|>M reconstructs as P+M+S
        val pre = t.stripPrefix("<|fim_pre|>")
        val Array(p, rest) = pre.split(java.util.regex.Pattern.quote("<|fim_suf|>"), -1)
        val Array(sfx, m) = rest.split(java.util.regex.Pattern.quote("<|fim_mid|>"), -1)
        assert(t.startsWith("<|fim_pre|>"))
        assert(p + m + sfx === orig, s"doc ${r.getLong(0)} does not reconstruct")
      }
    }
    // h32 is uniform: the 50% rate lands in a broad band
    assert(fim > out.length / 4 && fim < out.length * 3 / 4,
      s"fim rate wildly off: $fim of ${out.length}")
    // deterministic under re-evaluation and partitioning
    val again = ops.Text.fimTransform(docs.repartition(7), "text", "doc_id", 50)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val first = ops.Text.fimTransform(docs, "text", "doc_id", 50)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(again === first)
    // 0- and 1-char docs and rate 100/0 edges
    val tiny = Seq((1L, ""), (2L, "x"), (3L, "ab")).toDF("doc_id", "text")
    val t100 = ops.Text.fimTransform(tiny, "text", "doc_id", fimRate = 100)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(t100(1L) === "plain" && t100(2L) === "plain" && t100(3L) === "fim")
    assert(ops.Text.fimTransform(tiny, "text", "doc_id", fimRate = 0)
      .filter(col("mode") === "fim").isEmpty)
  }
}
