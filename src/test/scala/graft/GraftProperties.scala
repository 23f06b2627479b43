package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Text}
import graft.streaming.StreamJoins

/** ScalaCheck properties (SURVEY §5 — the property tests the reference
  * lacks). Iteration counts are small because every trial runs Spark jobs.
  */
object GraftProperties extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withInitialSeed(org.scalacheck.rng.Seed(42L))

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "to", "be", "or")
  private val line = Gen.listOfN(6, word).map(_.mkString(" "))

  /** A4/associativity: word counts are invariant to how the corpus is
    * batched — count(a ++ b) == merge(count(a), count(b)).
    */
  property("wordcount.batching-invariant") =
    Prop.forAll(Gen.listOfN(4, line), Gen.listOfN(4, line)) { (a, b) =>
      def counts(ls: Seq[String]): Map[String, Long] =
        if (ls.isEmpty) Map.empty
        else Text.wordCount(ls.toDF("text"), "text").as[(String, Long)].collect().toMap
      val whole = counts(a ++ b)
      val merged = (counts(a).toSeq ++ counts(b).toSeq)
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      whole == merged
    }

  /** J4: a no-op rekey upstream of the windowed join leaves results
    * invariant (batch twin of testInnerRepartitioned).
    */
  property("join.rekey-invariant") = {
    val rec = for {
      k <- Gen.choose(0L, 2L); v <- word; t <- Gen.choose(0L, 20000L)
    } yield (k, v, new Timestamp(1700000000000L + t))
    Prop.forAll(Gen.listOfN(6, rec), Gen.listOfN(6, rec)) { (ls, rs) =>
      val l = ls.toDF("key", "value", "ts")
      val r = rs.toDF("key", "value", "ts")
      def results(left: org.apache.spark.sql.DataFrame): Set[String] =
        StreamJoins.windowed(left, r, "key", "ts", 10000, "inner")
          .select(StreamJoins.dashJoin(col("l_value"), col("r_value")))
          .as[String].collect().toSet
      results(l) == results(l.select((col("key") + 0).as("key"), col("value"), col("ts")))
    }
  }

  /** MinHash estimates Jaccard: per-seed signature collision probability is
    * the shingle-set Jaccard, so with k=16 the match fraction should land
    * within a generous tolerance of the true value.
    */
  property("minhash.estimates-jaccard") = {
    val doc = Gen.listOfN(12, word).map(_.mkString(" "))
    Prop.forAll(doc, doc) { (d1, d2) =>
      val df = Seq((1L, d1), (2L, d2)).toDF("id", "text")
      val k = 16
      val sigs = Dedup.minhashSignatures(df, "text", "id", k)
        .collect().map(r => r.getLong(0) -> (1 until k + 1).map(r.getLong)).toMap
      val matches = sigs(1L).zip(sigs(2L)).count { case (x, y) => x == y }.toDouble / k
      val sh = df.select(col("id"), array_distinct(
        Dedup.shinglesOfTokens(Text.tokens(col("text")))).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
      val union = (sh(1L) union sh(2L)).size
      val jaccard = if (union == 0) 1.0 else (sh(1L) intersect sh(2L)).size.toDouble / union
      math.abs(matches - jaccard) <= 0.45
    }
  }

  /** TopK aggregator: partition/merge-order invariant and equal to the
    * brute-force top-k of distinct ids. Scores are a function of id (the
    * equal-score-duplicates contract candidate generation guarantees).
    * Pure buffer logic — no Spark jobs, so iterations are cheap.
    */
  property("topk.partition-and-order-invariant") = {
    def scoreOf(id: Long): Double = ((id * 7) % 13).toDouble / 4.0
    val ids = Gen.listOf(Gen.choose(0L, 30L))
    Prop.forAll(ids, Gen.choose(1, 6), Gen.choose(1, 5), Gen.choose(0, 100)) {
      (xs, k, nparts, shuffleSeed) =>
        val agg = new graft.functions.TopK.TopKByScore(k)
        val pairs = xs.map(id => (scoreOf(id), id))
        val parts = pairs.grouped(math.max(1, (pairs.size + nparts - 1) / nparts)).toList
        val bufs = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        val mergeOrder = new scala.util.Random(shuffleSeed).shuffle(bufs)
        val got = agg.finish(mergeOrder.foldLeft(agg.zero)(agg.merge))
        val want = pairs.distinct
          .sorted(Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long]))
          .take(k)
        got == want
    }
  }

  /** Winnowing guarantee: two docs sharing a substring of length ≥ k+w-1
    * (post-normalization) share at least one fingerprint.
    */
  property("winnow.shared-substring-guarantee") = {
    val chunk = Gen.listOfN(4, word).map(_.mkString(" "))
    // shared run must normalize to ≥ k+w-1 = 11 chars for the guarantee to
    // apply; the general word pool has 2-char words ("to","be","or") that
    // could normalize to only 10, so draw from ≥4-char words (min 20)
    val longWord = Gen.oneOf("alpha", "beta", "gamma", "delta")
    val shared = Gen.listOfN(5, longWord).map(_.mkString(" "))
    Prop.forAll(chunk, chunk, shared) { (pre, post, sh) =>
      val df = Seq((1L, s"$pre $sh"), (2L, s"$sh $post")).toDF("id", "text")
      val fps = Text.winnowFingerprints(df, "text", "id")
        .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      (fps(1L) intersect fps(2L)).nonEmpty
    }
  }

  /** Salted two-phase aggregation must equal the plain groupBy — for any
    * data, any salt count.
    */
  property("skew.salted-agg-equivalence") = {
    val row = for {
      k <- Gen.oneOf("a", "b", "hot"); id <- Gen.choose(0L, 1000L)
      v <- Gen.choose(0, 500)
    } yield (k, id, BigDecimal(v) / 100)
    Prop.forAll(Gen.nonEmptyListOf(row), Gen.choose(1, 16)) { (rows, salts) =>
      val df = rows.toDF("k", "id", "v")
        .select($"k", $"id", $"v".cast("decimal(18,2)").as("v"))
      val salted = graft.ops.Skew.saltedAgg(df, "k", "id", salts, ("v", "v"))
        .select($"k", $"cnt", $"v".cast("double"))
        .as[(String, Long, Double)].collect().toSet
      val plain = df.groupBy("k")
        .agg(count(lit(1)).as("cnt"), sum("v").cast("double").as("v"))
        .as[(String, Long, Double)].collect().toSet
      salted == plain
    }
  }

  /** Salted fact-dim join must equal the unsalted join — for any key
    * distribution (duplicate fact keys, dim keys with no match, fact keys
    * absent from the dim), any salt count.
    */
  property("skew.salted-join-equivalence") = {
    val factRow = for {
      k <- Gen.oneOf("a", "b", "hot", "orphan"); id <- Gen.choose(0L, 1000L)
    } yield (k, id)
    val dimRow = for {
      k <- Gen.oneOf("a", "b", "hot", "unused"); label <- word
    } yield (k, label)
    Prop.forAll(Gen.nonEmptyListOf(factRow), Gen.nonEmptyListOf(dimRow),
      Gen.choose(1, 16)) { (fs, ds, salts) =>
      val fact = fs.toDF("k", "id")
      // dim keys unique (the dimension contract saltedJoin replicates)
      val dim = ds.distinct.groupBy(_._1).map(_._2.head).toSeq.toDF("k", "label")
      val salted = graft.ops.Skew.saltedJoin(fact, dim, "k", "id", salts)
        .select($"k", $"id", $"label").as[(String, Long, String)].collect()
      val plain = fact.join(dim, "k")
        .select($"k", $"id", $"label").as[(String, Long, String)].collect()
      salted.sorted.toSeq == plain.sorted.toSeq
    }
  }

  /** Sequence packing: every doc assigned exactly once, every bin's total
    * bounded by budget + one straddling doc, bins non-negative — for any
    * doc-size distribution, budget, and bucket count.
    */
  property("packing.coverage-and-budget") = {
    val doc = for { id <- Gen.choose(1L, 10000L); t <- Gen.choose(1L, 400L) } yield (id, t)
    Prop.forAll(Gen.nonEmptyListOf(doc), Gen.choose(100L, 1200L), Gen.choose(1, 12)) {
      (docsIn, budget, buckets) =>
        val docs = docsIn.distinctBy(_._1)
        val out = graft.ops.Packing.assignBins(
          docs.toDF("id", "n_toks"), "id", "n_toks", budget, buckets)
          .select($"id", $"toks", $"bin").as[(Long, Long, Long)].collect()
        val coverage = out.map(_._1).sorted.toSeq == docs.map(_._1).sorted
        val maxDoc = docs.map(_._2).max
        val bounded = out.groupBy(_._3).forall { case (_, rs) =>
          rs.map(_._2).sum <= budget + maxDoc
        }
        coverage && bounded && out.forall(_._3 >= 0L)
    }
  }

  /** Temperature mixture rates: always within [0, 1e6] micro-units, equal
    * classes get equal rates, and (for T ≥ 1) a smaller class never gets a
    * lower rate than a bigger one — modulo 1 micro-unit of floor slop.
    */
  property("mixture.rate-laws") = {
    val sizes = Gen.listOfN(4, Gen.choose(1, 300))
    Prop.forAll(sizes, Gen.choose(0.05, 1.0), Gen.choose(1.0, 8.0)) { (ns, target, t) =>
      val rows = ns.zipWithIndex.flatMap { case (n, c) =>
        (1 to n).map(i => (c.toLong * 100000L + i, s"c$c"))
      }
      val rates = graft.ops.Sampling
        .temperatureMixture(rows.toDF("id", "cls"), "cls", "id", target, t)
        .select($"cls", $"rate_micro").distinct().as[(String, Long)].collect().toMap
      val byClass = ns.zipWithIndex.map { case (n, c) => n -> rates.getOrElse(s"c$c", 0L) }
      val inRange = byClass.forall { case (_, r) => r >= 0L && r <= 1000000L }
      val monotone = byClass.combinations(2).forall {
        case Seq((n1, r1), (n2, r2)) =>
          if (n1 == n2) r1 == r2
          else if (n1 < n2) r1 + 1 >= r2
          else r2 + 1 >= r1
        case _ => true
      }
      inRange && monotone
    }
  }

  /** Boilerplate removal is idempotent: what one pass keeps, a second pass
    * keeps verbatim (a kept sentence's doc-frequency is unchanged by the
    * removal of OTHER sentences, so it stays under threshold).
    */
  property("boilerplate.idempotent") = {
    val sentence = Gen.listOfN(3, word).map(_.mkString(" "))
    val doc = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, sentence).map(_.mkString(". ")))
    Prop.forAll(Gen.nonEmptyListOf(doc), Gen.choose(2, 4)) { (texts, minDocs) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val once = graft.ops.Text.removeBoilerplate(df, "text", "id", minDocs)
        .select($"id", $"clean_text")
      val twice = graft.ops.Text.removeBoilerplate(
        once.withColumnRenamed("clean_text", "text"), "text", "id", minDocs)
        .select($"id", $"clean_text")
      once.as[(Long, String)].collect().sorted.toSeq ==
        twice.as[(Long, String)].collect().sorted.toSeq
    }
  }

  /** h32 stays within [0, 2^32) and is deterministic. */
  property("h32.range-and-determinism") =
    Prop.forAll(Gen.alphaNumStr) { s =>
      val v = Seq(s, s).toDF("t").select(Text.h32(col("t"))).as[Long].collect()
      v(0) == v(1) && v(0) >= 0L && v(0) < (1L << 32)
    }

  /** Global rank/prefix sum equals the sequential definition for any data
    * and any partition count.
    */
  property("ordered.matches-sequential") = {
    val row = for { k <- Gen.choose(0L, 50L); v <- Gen.choose(0L, 9L) } yield (k, v)
    Prop.forAll(Gen.nonEmptyListOf(row).map(_.distinctBy(_._1)),
      Gen.choose(1, 9)) { (rows, parts) =>
      val out = graft.ops.Ordered.rankedPrefixSum(
        rows.toDF("k", "v"), Seq(col("v").desc, col("k")), col("v"), parts)
        .select("k", "rank", "cum").as[(Long, Long, Long)].collect()
        .sortBy(_._2).toSeq
      val sorted = rows.sortBy { case (k, v) => (-v, k) }
      val expected = sorted.zipWithIndex.map { case ((k, _), i) =>
        (k, i + 1L, sorted.take(i + 1).map(_._2).sum)
      }
      out == expected
    }
  }

  /** The two CC algorithms (min-label propagation, large-star/small-star)
    * compute identical components on random graphs.
    */
  property("graph.cc-algorithms-agree") = {
    val edge = for { a <- Gen.choose(0L, 20L); b <- Gen.choose(0L, 20L) } yield (a, b)
    Prop.forAll(Gen.nonEmptyListOf(edge)) { es =>
      val df = es.toDF("a", "b")
      def toMap(out: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        out.as[(Long, Long)].collect().toMap
      val hasRealEdge = es.exists { case (a, b) => a != b }
      !hasRealEdge || {
        toMap(graft.ops.Graph.connectedComponents(df, "a", "b", maxIter = 60)) ==
          toMap(graft.ops.Graph.connectedComponentsStar(df, "a", "b"))
      }
    }
  }

  /** k-means assignment (rounds=0) is the brute-force integer argmin over
    * the init centroids, ties to the lowest cluster id.
    */
  property("kmeans.assignment-is-argmin") = {
    val vec = Gen.listOfN(4, Gen.choose(-1000, 1000).map(_ / 500.0f))
    Prop.forAll(Gen.choose(3, 8).flatMap(n => Gen.listOfN(n, vec))) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("vec_id", "embedding")
      val k = 2
      val out = graft.ops.KMeans.fitAssign(df, "embedding", "vec_id", k, rounds = 0)
        .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
      val q = vecs.map(_.map(x => math.floor(x.toDouble * 1000).toLong))
      val cents = q.take(k)
      val expected = q.zipWithIndex.map { case (v, i) =>
        val d = cents.map(c => v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
        i.toLong -> d.zipWithIndex.minBy { case (dist, c) => (dist, c) }._2.toLong
      }.toMap
      out == expected
    }
  }

  /** snapshotDiff matches a reference classification for arbitrary
    * old/new snapshots with nullable values.
    */
  property("cdc.snapshot-diff-matches-reference") = {
    val snap = Gen.mapOf(Gen.zip(Gen.choose(1L, 15L), Gen.option(Gen.choose(0, 3))))
    Prop.forAll(snap, snap) { (o, n) =>
      def df(m: Map[Long, Option[Int]]) =
        m.toSeq.map { case (k, v) => (k, v) }.toDF("k", "v")
      if (o.isEmpty || n.isEmpty) true // empty snapshots are covered by EmptyInputSpec
      else {
        val got = graft.ops.Cdc.snapshotDiff(df(o), df(n), "k")
          .as[(Long, String)].collect().toMap
        val expected = (o.keySet ++ n.keySet).map { k =>
          k -> ((o.get(k), n.get(k)) match {
            case (None, Some(_)) => "added"
            case (Some(_), None) => "removed"
            case (Some(a), Some(b)) if a == b => "unchanged"
            case _ => "changed"
          })
        }.toMap
        got == expected
      }
    }
  }

  /** goldenRecords matches a brute-force survivorship reference: per
    * cluster and attribute, the value of the highest-priority non-null row.
    */
  property("linkage.golden-records-match-reference") = {
    val row = for {
      c <- Gen.oneOf("x", "y"); pri <- Gen.choose(1L, 40L)
      brand <- Gen.option(Gen.oneOf("a", "b", "c"))
    } yield (c, pri, brand)
    Prop.forAll(Gen.nonEmptyListOf(row)) { rowsRaw =>
      // unique priorities per cluster (the documented totality contract)
      val rows = rowsRaw.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val got = graft.ops.Fuzzy.goldenRecords(
        rows.toDF("c", "pri", "brand"), "c", "pri", Seq("brand"))
        .collect().map(r => r.getString(0) -> (Option(r.get(1)), r.getLong(2))).toMap
      val want = rows.groupBy(_._1).map { case (c, rs) =>
        val winner = rs.filter(_._3.isDefined).sortBy(-_._2).headOption.flatMap(_._3)
        c -> ((winner: Option[Any]), rs.size.toLong)
      }
      got == want
    }
  }

  /** Morton interleave is a bijection on [0,2^bits)²: decode ∘ encode = id,
    * and the reference bit-gather agrees.
    */
  property("zorder.roundtrip-bijection") = {
    val coord = Gen.choose(0L, 4095L)
    Prop.forAll(Gen.listOfN(6, Gen.zip(coord, coord))) { pts =>
      val df = pts.toDF("x", "y")
      val out = df.select(col("x"), col("y"),
          graft.ops.Layout.deZOrder2(
            graft.ops.Layout.zOrderKey2(col("x"), col("y"), 12), 12).as("d"))
        .select(col("x"), col("y"), col("d.x"), col("d.y"))
        .as[(Long, Long, Long, Long)].collect()
      out.forall { case (x, y, rx, ry) => rx == x && ry == y } && {
        // independent reference implementation of the interleave
        def ref(x: Long, y: Long): Long =
          (0 until 12).foldLeft(0L) { (acc, i) =>
            acc | (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i)) }
        val zs = df.select(graft.ops.Layout.zOrderKey2(col("x"), col("y"), 12))
          .as[Long].collect().sorted
        zs.sameElements(pts.map { case (x, y) => ref(x, y) }.sorted)
      }
    }
  }

  /** Hot-bucket thinning is a PURE per-row predicate given the bucket
    * sizes: an independent JVM-side md5 replica of the stride predicate
    * reproduces the survivor set exactly (so under-cap buckets pass
    * untouched and survivors are trivially a subset), and the kept set is
    * invariant under repartitioning. Survivor COUNT is only expected-bounded
    * (it's a hash stride), so exact-set equality is the stronger check.
    */
  property("annthin.predicate-exact-and-layout-invariant") = {
    def h32Ref(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val bucketSizes = Gen.listOfN(4, Gen.choose(1, 40))
    val capGen = Gen.choose(1, 12)
    Prop.forAll(bucketSizes, capGen) { (sizes, cap) =>
      // ids globally unique; bucket b gets sizes(b) consecutive ids
      val rows = sizes.zipWithIndex.flatMap { case (n, b) =>
        (0 until n).map(i => (b * 1000L + i, b.toLong))
      }
      val base = rows.toDF("vec_id", "bucket")
        .withColumn("v", array(lit(1.0))).withColumn("n", lit(1.0))
      def kept(d: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
        graft.ops.Similarity.thinHotBuckets(d, "vec_id", cap)
          .select("bucket", "vec_id").as[(Long, Long)].collect()
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val out = kept(base)
      val expected = sizes.zipWithIndex.map { case (n, b) =>
        val ids = (0 until n).map(i => b * 1000L + i)
        val stride = math.ceil(n.toDouble / cap).toLong
        b.toLong -> (if (n <= cap) ids.toSet
                     else ids.filter(id => h32Ref(s"${id}_annthin") % stride == 0).toSet)
      }.toMap
      val expectedNonEmpty = expected.filter(_._2.nonEmpty)
      out == expectedNonEmpty && kept(base.repartition(5)) == out
    }
  }

  /** Fuzzy hot-block thinning obeys the same exact predicate contract as
    * the ANN thinning: pairs from a thinned block are exactly the pairs
    * whose RIGHT id survives the md5 stride (left side never thinned),
    * under-cap blocks emit all pairs, layout-invariant.
    */
  property("blkthin.predicate-exact-and-layout-invariant") = {
    def h32Ref(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val blockSizes = Gen.listOfN(3, Gen.choose(1, 14))
    val capGen = Gen.choose(1, 6)
    Prop.forAll(blockSizes, capGen) { (sizes, cap) =>
      // block b holds sizes(b) one-char-different texts under key "b<b>"
      val rows = sizes.zipWithIndex.flatMap { case (n, b) =>
        (0 until n).map(i => (b * 100L + i, s"b$b x$i"))
      }
      val df = rows.toDF("id", "txt")
      val blk = substring(col("txt"), 1, 2)
      def pairs(d: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        graft.ops.Fuzzy.blockedEditPairs(d, "txt", "id", blk,
          maxDist = 4, minDist = 0, maxBlock = cap)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val out = pairs(df)
      val expected = sizes.zipWithIndex.flatMap { case (n, b) =>
        val ids = (0 until n).map(i => b * 100L + i)
        val stride = math.ceil(n.toDouble / cap).toLong
        val kept = if (n <= cap) ids.toSet
                   else ids.filter(id => h32Ref(s"${id}_blkthin") % stride == 0).toSet
        for (a <- ids; bId <- ids if a < bId && kept.contains(bId)) yield (a, bId)
      }.toSet
      out == expected && pairs(df.repartition(5)) == out
    }
  }

  /** A-ES weighted sampling is a pure function of (ids, weights, salt):
    * invariant under repartitioning AND under duplicating other classes
    * (per-class independence).
    */
  property("sampling.weighted-layout-and-class-independent") = {
    val row = Gen.zip(Gen.choose(1L, 500L), Gen.oneOf("a", "b"), Gen.choose(1L, 99L))
    Prop.forAll(Gen.listOfN(30, row)) { rowsRaw =>
      val rows = rowsRaw.distinctBy(_._1)
      val df = rows.toDF("id", "cls", "w")
      def run(d: org.apache.spark.sql.DataFrame): Set[(String, Long)] =
        graft.ops.Sampling.weightedPerClass(d, "cls", "id", "w", k = 5, salt = "p")
          .select("cls", "id").as[(String, Long)].collect().toSet
      val base = run(df)
      val aOnly = base.filter(_._1 == "a")
      run(df.repartition(7)) == base &&
        run(df.filter(col("cls") === "a")) == aOnly
    }
  }

  /** The chi-square drift statistic is symmetric: swapping the snapshots
    * swaps the count columns but leaves every per-bin term identical
    * ((c_a·N_B − c_b·N_A)² is sign-invariant), and identical snapshots
    * score zero.
    */
  property("drift.symmetric-and-zero-on-identical") = {
    val vals = Gen.listOfN(12, Gen.choose(0.0, 160.0))
    Prop.forAll(vals, vals) { (as, bs) =>
      def terms(x: Seq[Double], y: Seq[Double]): Map[Long, (Long, Long, Long)] =
        graft.ops.Stats.chiSquareDrift(x.toDF("v"), y.toDF("v"), "v", 0L, 500L, 32)
          .collect().map(r => r.getLong(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val ab = terms(as, bs)
      val ba = terms(bs, as)
      val swapped = ba.map { case (b, (ca, cb, t)) => b -> ((cb, ca, t)) }
      val self = terms(as, as)
      ab == swapped && self.values.forall(_._3 == 0L)
    }
  }

  /** The truncated EWMA is a weighted mean of its frame: it always lands
    * within the frame's [min, max] band of cent-quantized values.
    */
  property("ewma.bounded-by-frame-extremes") = {
    val series = Gen.listOfN(10, Gen.choose(-50.0, 50.0))
    Prop.forAll(series) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
        .toDF("k", "bucket", "v")
      val out = graft.ops.TimeSeries.ewma(df, "k", "bucket", "v", 4, 1, 2)
        .orderBy("bucket").select("ewma_cents").as[Long].collect()
      val cents = vs.map(v => math.floor(v * 100).toLong)
      out.zipWithIndex.forall { case (e, i) =>
        val frame = cents.slice(math.max(0, i - 3), i + 1)
        // truncating division can land one cent below the exact mean band
        e >= frame.min - 1 && e <= frame.max
      }
    }
  }

  /** stratifiedSplit holds EXACT quotas: every stratum's train count is
    * floor(n_s·pct/100) regardless of how ids and strata are drawn, and
    * the assignment is a pure function of (id, signal, salt).
    */
  property("split.exact-quota-per-stratum") = {
    val row = Gen.zip(Gen.choose(1L, 10000L), Gen.choose(0, 5))
    Prop.forAll(Gen.listOfN(25, row), Gen.choose(1, 99)) { (rowsRaw, pct) =>
      val rows = rowsRaw.distinctBy(_._1).map { case (id, s) => (id, s + 0.5) }
      val df = rows.toDF("id", "sig")
      val out = graft.ops.Sampling.stratifiedSplit(df, "id", "sig",
        loCents = 0L, widthCents = 100L, buckets = 8, trainPct = pct)
      val perStratum = out.groupBy("stratum").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val trains = out.filter(col("split") === "train").groupBy("stratum").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      perStratum.forall { case (st, n) =>
        trains.getOrElse(st, 0L) == n * pct / 100
      }
    }
  }

  /** The shard manifest is a pure content function: invariant under
    * repartition AND row reorder, and any single-row drop changes it.
    */
  property("export.manifest-content-pure") = {
    val row = Gen.zip(Gen.choose(1L, 100000L), Gen.alphaNumStr.map(_.take(12)))
    Prop.forAll(Gen.listOfN(12, row)) { rowsRaw =>
      val rows = rowsRaw.distinctBy(_._1)
      val df = rows.toDF("id", "text")
      def m(d: org.apache.spark.sql.DataFrame) =
        graft.ops.Export.shardManifest(d, "id", "text", shards = 4)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
      val base = m(df)
      m(df.repartition(5)) == base &&
        m(df.orderBy(col("id").desc)) == base &&
        (rows.size < 2 || m(df.filter(col("id") =!= rows.head._1)) != base)
    }
  }

  /** lengthBuckets conserves the corpus: Σ n_docs and Σ total_tokens over
    * the rungs equal the input, and per rung kept + cut == total.
    */
  property("lengthbuckets.conserves-corpus") = {
    val lens = Gen.listOfN(20, Gen.choose(1L, 40L))
    Prop.forAll(lens) { ls =>
      val out = graft.ops.Packing.lengthBuckets(ls.toDF("n"), "n", Seq(8L, 16L, 32L))
        .collect()
      val nDocs = out.map(_.getAs[Long]("n_docs")).sum
      val total = out.map(_.getAs[Long]("total_tokens")).sum
      val keptPlusCut = out.map(r =>
        r.getAs[Long]("n_docs") * r.getAs[Long]("bucket_len") -
          r.getAs[Long]("padding_tokens") + r.getAs[Long]("cut_tokens")).sum
      nDocs == ls.length && total == ls.sum && keptPlusCut == ls.sum
    }
  }

  /** r16 window-rank port: the KEPT-SET candidate panel (row_number over
    * the bucket + rank-filtered equi-join) emits EXACTLY the pair set of
    * the collect_list reference form it replaced (kept here as a
    * test-only twin — in the engine that shape is an OOM cliff at
    * mass-dup bucket sizes), on arbitrary dup-heavy corpora and panel
    * widths including maxReps=1 truncation.
    */
  property("dedup.rank-panel-shape-equivalence") = {
    val docGen = for {
      id <- Gen.choose(1L, 60L)
      n <- Gen.choose(1, 6)
      ws <- Gen.listOfN(n, word)
    } yield (id, ws.mkString(" "))
    Prop.forAll(Gen.listOfN(12, docGen), Gen.choose(1, 3)) { (rows0, maxReps) =>
      val rows = rows0.distinctBy(_._1)
      val df = rows.toDF("doc_id", "text")
      val got = Dedup.repCandidatePairs(df, "text", "doc_id",
        k = 8, bands = 2, maxReps = maxReps)
        .as[(Long, Long)].collect().toSet
      val want = Dedup.lshBands(df, "text", "doc_id", 8, 2)
        .groupBy("band", "band_key").agg(collect_list(col("doc_id")).as("docs"))
        .filter(size(col("docs")) > 1)
        .withColumn("sorted", array_sort(col("docs")))
        .select(explode(slice(col("sorted"), 1, maxReps)).as("doc_a"), col("sorted"))
        .select(col("doc_a"), explode(col("sorted")).as("doc_b"))
        .filter(col("doc_a") < col("doc_b"))
        .distinct()
        .as[(Long, Long)].collect().toSet
      got == want
    }
  }

  /** [[graft.ops.Dsir.weightsPerDomain]] over ANY generated corpus —
    * including null text and a domain whose target slice comes up EMPTY
    * (the smoothing keeps its λ finite) — equals running single-target
    * weights once per domain: the shared-hash multi fold introduces no
    * cross-domain coupling, and D never changes any domain's numbers.
    */
  property("dsir.multi-domain-equals-single-domain") = {
    val docGen = for {
      id <- Gen.choose(1L, 80L)
      n <- Gen.choose(0, 5)
      ws <- Gen.listOfN(n, word)
      text <- Gen.frequency(7 -> Gen.const(ws.mkString(" ")),
        1 -> Gen.const(null: String))
    } yield (id, text)
    Prop.forAll(Gen.listOfN(10, docGen), Gen.choose(0L, 80L)) { (rows0, seed) =>
      val rows = rows0.distinctBy(_._1)
      val df = rows.toDF("doc_id", "text")
      val t1 = df.filter(col("doc_id") % 3 === seed % 3)
      val t2 = df.filter(col("doc_id") % 7 === seed % 7) // often empty
      val multi = graft.ops.Dsir.weightsPerDomain(df,
        Seq("a" -> t1, "b" -> t2), "text", "doc_id", buckets = 64)
        .orderBy("doc_id").collect().toSeq
      def single(t: org.apache.spark.sql.DataFrame) =
        graft.ops.Dsir.weights(df, t, "text", "doc_id", buckets = 64)
          .orderBy("doc_id").collect().toSeq
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      multi.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) == single(t1) &&
        multi.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))) == single(t2)
    }
  }

  /** The distributed DSIR op (B-row stats collect + per-row λ fold)
    * equals a FULLY LOCAL pure-Scala re-derivation — tokenization,
    * uni+bigram features, md5 bucket hashing, smoothed totals, and the
    * exact-long dot product all recomputed without Spark — on ANY corpus,
    * including empty docs, null text, and single-token docs (no bigrams).
    * This is the cross-implementation twin of the DuckDB oracle rows.
    */
  property("dsir.weights-equal-local-rederivation") = {
    val B = 64
    def toksOf(s: String): Seq[String] =
      if (s == null) Seq.empty
      else s.toLowerCase.split("\\W+").toSeq.filter(_.nonEmpty)
    def featsOf(s: String): Seq[String] = {
      val t = toksOf(s)
      t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    def h32Local(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val docGen = for {
      id <- Gen.choose(1L, 80L)
      n <- Gen.choose(0, 5)
      ws <- Gen.listOfN(n, word)
      text <- Gen.frequency(7 -> Gen.const(ws.mkString(" ")),
        1 -> Gen.const(null: String))
    } yield (id, text)
    Prop.forAll(Gen.listOfN(10, docGen), Gen.choose(1L, 80L)) { (rows0, tgtMod) =>
      val rows = rows0.distinctBy(_._1)
      val df = rows.toDF("doc_id", "text")
      val target = df.filter(col("doc_id") % 3 === tgtMod % 3)
      val got = graft.ops.Dsir.weights(df, target, "text", "doc_id",
        buckets = B)
        .as[(Long, Long, Long)].collect().toSet
      // local re-derivation
      val tgtRows = rows.filter { case (id, _) => id % 3 == tgtMod % 3 }
      def totals(rs: Seq[(Long, String)]): Map[Long, Long] =
        rs.flatMap(r => featsOf(r._2)).groupBy(f => h32Local(f) % B)
          .view.mapValues(_.size.toLong).toMap
      val (rawB, tgtB) = (totals(rows), totals(tgtRows))
      val (nr, nt) = (rawB.values.sum, tgtB.values.sum)
      val lam = (0 until B).map { b =>
        math.floor((math.log((tgtB.getOrElse(b.toLong, 0L) + 0.5) / (nt + 0.5 * B)) -
          math.log((rawB.getOrElse(b.toLong, 0L) + 0.5) / (nr + 0.5 * B))) *
          1000000.0).toLong
      }
      val want = rows.map { case (id, text) =>
        val fs = featsOf(text)
        (id, fs.size.toLong, fs.map(f => lam((h32Local(f) % B).toInt)).sum)
      }.toSet
      got == want
    }
  }
}
