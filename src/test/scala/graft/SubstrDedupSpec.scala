package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.SubstrDedup

/** Exact substring (span-level) dedup: window enumeration, maximal span
  * merging, span removal, and the hashed-key scale path's equivalence to
  * the exact-key oracle path.
  */
class SubstrDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("windows enumerates every k-gram at 1-based positions; short docs emit none") {
    val w = SubstrDedup.windows(docsDf(1L -> "abcdef", 2L -> "abc"), "text", "doc_id", k = 4)
      .orderBy("doc_id", "pos").as[(Long, Int, String)].collect()
    assert(w.toSeq == Seq((1L, 1, "abcd"), (1L, 2, "bcde"), (1L, 3, "cdef")))
  }

  test("native gram kernel ≡ substr reference form (corpus + edge cases)") {
    // the r21 native kernel (GramStrings) must be byte-identical to the
    // substr transliteration — positions AND gram content, including
    // non-BMP code points (substr counts code points, not UTF-16 units),
    // short docs (no rows) and null text (no rows)
    val edge = Seq[(Long, String)](
      1L -> "abcdef", 2L -> "abc", 3L -> null, 4L -> "",
      5L -> "a😀bcd😁ef", 6L -> "ααββγγδδ")
      .toDF("doc_id", "text")
    for (d <- Seq(edge, Tables.documents(spark, sf())); k <- Seq(2, 4, 20)) {
      val kern = SubstrDedup.windows(d, "text", "doc_id", k)
      val ref = SubstrDedup.windowsRef(d, "text", "doc_id", k)
      assert(kern.exceptAll(ref).isEmpty && ref.exceptAll(kern).isEmpty,
        s"kernel/reference window divergence at k=$k")
    }
  }

  test("duplicated spans merge overlapping windows into one maximal span") {
    // "0123456789" shared prefix of length 6 in docs 1 and 2 → with k=4,
    // windows at pos 1,2,3 are duplicated → one merged span [1, 6]
    val d = docsDf(1L -> "012345xxxx", 2L -> "012345yyyy")
    val spans = SubstrDedup.dupSpans(d, "text", "doc_id", k = 4, hashed = false)
      .orderBy("doc_id").as[(Long, Int, Int)].collect()
    assert(spans.toSeq == Seq((1L, 1, 6), (2L, 1, 6)))
  }

  test("adjacent duplicated windows merge; a 1-char gap keeps spans separate") {
    // doc 3 shares "abcd" (pos 1-4) and "wxyz" (pos 6-9) with doc 4, but
    // the middle char differs → two spans separated by the gap at pos 5
    val d = docsDf(3L -> "abcd.wxyz", 4L -> "abcd_wxyz")
    val spans = SubstrDedup.dupSpans(d, "text", "doc_id", k = 4, hashed = false)
      .orderBy("doc_id", "span_start").as[(Long, Int, Int)].collect()
    assert(spans.toSeq == Seq((3L, 1, 4), (3L, 6, 9), (4L, 1, 4), (4L, 6, 9)))
  }

  test("within-document repetition is cut (any-repeat rule, one doc corpus)") {
    val d = docsDf(9L -> "abcdefabcdef")
    val spans = SubstrDedup.dupSpans(d, "text", "doc_id", k = 6, hashed = false)
      .as[(Long, Int, Int)].collect()
    // "abcdef" occurs at pos 1 and 7; all windows of the repeated region
    // merge into one span covering the whole doubled text
    assert(spans.toSeq == Seq((9L, 1, 12)))
  }

  test("removeDupSpans cuts spans, passes clean docs through, empties full dups") {
    val d = docsDf(1L -> "0123456789AB", 2L -> "0123456789CD",
      3L -> "unique text here", 4L -> "0123456789", 5L -> "0123456789")
    val clean = SubstrDedup.removeDupSpans(d, "text", "doc_id", k = 4, hashed = false)
      .orderBy("doc_id").as[(Long, String)].collect().toMap
    assert(clean(1L) == "AB")
    assert(clean(2L) == "CD")
    assert(clean(3L) == "unique text here")
    assert(clean(4L) == "" && clean(5L) == "")
  }

  test("clean text is the doc minus its spans on the real corpus (invariant)") {
    val d = Tables.documents(spark, sf())
    val spans = SubstrDedup.dupSpans(d, "text", "doc_id", k = 20, hashed = false)
    val cut = spans.groupBy("doc_id")
      .agg(sum(col("span_end") - col("span_start") + 1).as("cut_chars"))
    val got = SubstrDedup.removeDupSpans(d, "text", "doc_id", k = 20, hashed = false)
      .join(d.select(col("doc_id"), length(col("text")).as("n")), "doc_id")
      .join(cut, Seq("doc_id"), "left")
      .where(length(col("clean_text")) =!= col("n") - coalesce(col("cut_chars"), lit(0L)))
      .count()
    assert(got == 0L, "clean_text length must equal original minus cut spans")
  }

  test("hashed scale path is span-identical to the exact-key path on the corpus") {
    val d = Tables.documents(spark, sf())
    val exact = SubstrDedup.dupSpans(d, "text", "doc_id", k = 20, hashed = false)
    val hashed = SubstrDedup.dupSpans(d, "text", "doc_id", k = 20, hashed = true)
    assert(exact.count() > 0, "fixture must make the operator fire")
    assert(exact.exceptAll(hashed).count() == 0 && hashed.exceptAll(exact).count() == 0)
  }

  test("stats roll up per source and fractions stay in [0, 1]") {
    val d = Tables.documents(spark, sf())
    val st = SubstrDedup.dupCharStats(d, "text", "doc_id", "source", k = 20)
      .as[(String, Long, Long, Double)].collect()
    assert(st.nonEmpty)
    st.foreach { case (_, total, dup, frac) =>
      assert(dup >= 0 && dup <= total)
      assert(frac >= 0.0 && frac <= 1.0)
    }
  }

  test("span detection never plans a cartesian product or nested-loop join") {
    val d = Tables.documents(spark, sf())
    Seq(true, false).foreach { h =>
      val p = SubstrDedup.dupSpans(d, "text", "doc_id", k = 20, hashed = h)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"hashed=$h all-pairs leak")
    }
  }
}
