package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Text.h32

/** Deterministic hash-based sampling for training-mix construction.
  *
  * Why not `sample()`/`rand(seed)`: Bernoulli sampling is seeded per
  * partition, so results change whenever partitioning changes — at 100 TB
  * that means a re-run on different cluster shapes samples different rows.
  * Hash sampling (keep iff h(id, salt) mod 10000 < fraction·10000) is a
  * pure per-row predicate: reproducible across runs, engines (the DuckDB
  * oracle reproduces it bit-for-bit), and cluster layouts; changing `salt`
  * draws an independent sample.
  */
object Sampling {

  private def bucket(idCol: Column, salt: String): Column =
    pmod(h32(concat(idCol.cast("string"), lit("_" + salt))), lit(10000))

  /** Keep ~`fraction` of rows, deterministically by id hash. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double, salt: String = "s0"): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    df.filter(bucket(col(idCol), salt) < math.round(fraction * 10000).toInt)
  }

  /** Per-stratum fractions (e.g. language-balanced training mix): strata
    * listed in `fractions` keep their own rate, everything else keeps
    * `default`.
    */
  def stratifiedHashSample(df: DataFrame, strataCol: String, idCol: String,
      fractions: Map[String, Double], default: Double, salt: String = "s0"): DataFrame = {
    val threshold = fractions.foldLeft(lit(math.round(default * 10000).toInt)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(math.round(f * 10000).toInt)).otherwise(acc)
    }
    df.filter(bucket(col(idCol), salt) < threshold)
  }

  /** Temperature-weighted mixture sampling (the multilingual/domain
    * rebalancing rule from the mT5/data-mixture literature): class c with
    * share p_c is sampled so the RESULTING mix follows p_c^(1/T)
    * (normalized), with expected total = `targetFraction` of the corpus.
    * T=1 reproduces the natural distribution; T→∞ approaches uniform;
    * rates are capped at 1 (a tiny class can't be oversampled without
    * replacement).
    *
    * Deterministic end to end: per-class weights are floored to integer
    * micro-units before normalization (the sum over classes is exact long
    * addition — a double sum would depend on aggregation order), and row
    * selection is the same hash predicate as [[hashSample]]. The per-class
    * rate table is tiny and broadcast; the corpus sees one scan + one
    * broadcast join.
    *
    * Weights are relative to the LARGEST class (not the corpus total), and
    * floor UP to 1 micro-unit: a web-scale corpus's rarest language —
    * share below 1e-6 — must round to a tiny rate, never silently to an
    * all-zero rate that drops the class from the mix entirely.
    */
  def temperatureMixture(df: DataFrame, classCol: String, idCol: String,
      targetFraction: Double, temperature: Double, salt: String = "s0"): DataFrame = {
    val rates = mixtureRatesUncapped(df, classCol, targetFraction, temperature)
      .select(col(classCol), least(lit(1000000L), col("rate_micro")).as("rate_micro"))
    df.join(broadcast(rates), Seq(classCol))
      .filter(pmod(h32(concat(col(idCol).cast("string"), lit("_" + salt))), lit(1000000))
        < col("rate_micro"))
      .select(col(idCol), col(classCol), col("rate_micro"))
  }

  /** Per-class micro-unit sampling rates for the p^(1/T) mixture, WITHOUT
    * the at-most-1 cap — shared by the with/without-replacement samplers.
    */
  private def mixtureRatesUncapped(df: DataFrame, classCol: String,
      targetFraction: Double, temperature: Double): DataFrame = {
    require(targetFraction > 0 && targetFraction <= 1,
      s"targetFraction must be in (0,1], got $targetFraction")
    require(temperature > 0, s"temperature must be positive, got $temperature")
    val cls = df.groupBy(classCol).agg(count(lit(1)).as("n_c"))
    val tot = cls.agg(sum("n_c").as("n_total"), max("n_c").as("n_max"))
    val withW = cls.crossJoin(broadcast(tot))
      .withColumn("w_micro",
        greatest(lit(1L),
          floor(pow(col("n_c").cast("double") / col("n_max").cast("double"),
            lit(1.0 / temperature)) * lit(1000000.0)).cast("long")))
    val sumW = withW.agg(sum("w_micro").as("sum_w_micro"))
    withW.crossJoin(broadcast(sumW))
      .select(col(classCol),
        floor(lit(targetFraction) * col("n_total").cast("double")
          * col("w_micro").cast("double") / col("sum_w_micro").cast("double")
          / col("n_c").cast("double") * lit(1000000.0)).cast("long").as("rate_micro"))
  }

  /** Temperature mixture WITH replacement: where [[temperatureMixture]]
    * caps a class's rate at 1 (can't oversample by dropping), this variant
    * EMITS COPIES — each row yields `rate div 1` whole copies plus one more
    * with probability `rate mod 1` (hash-decided, so deterministic), making
    * the expected per-class multiplicity exactly the uncapped p^(1/T) rate.
    * This is the standard oversampling arm of multilingual data mixing
    * (rare languages repeat epochs while the head is subsampled).
    *
    * Output carries `copy_id` (1..n) so downstream shuffles/packing treat
    * copies as distinct rows. Same scale shape as the other samplers: the
    * rate table broadcasts, copies come from a per-row
    * `explode(sequence())` — no shuffle.
    */
  def temperatureMixtureOversample(df: DataFrame, classCol: String, idCol: String,
      targetFraction: Double, temperature: Double, salt: String = "s0"): DataFrame = {
    val rates = mixtureRatesUncapped(df, classCol, targetFraction, temperature)
    val u = pmod(h32(concat(col(idCol).cast("string"), lit("_" + salt))), lit(1000000))
    df.join(broadcast(rates), Seq(classCol))
      .withColumn("n_copies",
        expr("rate_micro div 1000000") +
          when(u < pmod(col("rate_micro"), lit(1000000L)), lit(1L)).otherwise(lit(0L)))
      .filter(col("n_copies") > 0)
      .select(col(idCol), col(classCol), col("rate_micro"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy_id"))
  }

  /** Deterministic epoch shuffle: a reproducible pseudo-random GLOBAL
    * order for training — `rank` is each row's 1-based position in the
    * hash order of (id, epoch), and `cum_tok` the running token total
    * through it (so "rank ≤ R" and "cum_tok ≤ B" both cut reproducible
    * training prefixes). Different epochs draw independent orders; the
    * same epoch always replays identically, on any cluster layout.
    *
    * Scale: global order WITHOUT a single-reducer sort — delegates to
    * [[Ordered.rankedPrefixSum]]'s range-partitioned two-level rank
    * (PlanSpec pins that shape for zipf ranks; same machinery here).
    */
  def epochShuffle(df: DataFrame, idCol: String, tokenCol: String,
      epoch: Int, salt: String = "ep"): DataFrame = {
    val h = h32(concat(col(idCol).cast("string"), lit(s"_${salt}_$epoch")))
    Ordered.rankedPrefixSum(
      df.select(col(idCol), col(tokenCol).cast("long").as("n_tok"), h.as("__h")),
      Seq(col("__h"), col(idCol)), col("n_tok"))
      .select(col(idCol), col("n_tok"), col("rank"), col("cum").as("cum_tok"))
  }

  /** Token-budget selection: per class, keep the hash-ordered prefix of
    * docs whose cumulative token count stays within `budget` — "give me
    * ~1B tokens of each language, sampled reproducibly", the budget-shaped
    * complement of [[cappedPerClass]]'s row cap. The first doc of a class
    * is always kept (a budget smaller than the first doc would otherwise
    * silently empty the class — same never-drop-the-class stance as
    * temperatureMixture's rate floor).
    *
    * Scale: one cumulative-sum window partitioned BY CLASS in hash order —
    * reducer state is a running long, partition size is the class. A class
    * far larger than its budget would still sort in full on one reducer, so
    * `preSampleOver` makes the documented pre-thin MECHANICAL: classes with
    * more than that many rows are first thinned by a deterministic md5
    * stride (same discipline as [[graft.ops.Similarity.thinHotBuckets]]) to
    * ~preSampleOver rows before the exact budget window. The class's FIRST
    * doc in hash order always survives the thin (its identity comes from a
    * cheap mergeable min-struct agg, not a window), so the
    * never-empty-a-class guarantee is unchanged. Only OVER-threshold
    * classes enter the broadcast lookup. The kept prefix of a thinned
    * class walks the same hash order, just sparser — still reproducible on
    * any layout. Long.MaxValue (default) disables.
    */
  def tokenBudgetPerClass(df: DataFrame, classCol: String, idCol: String,
      tokenCol: String, budget: Long, salt: String = "s0",
      preSampleOver: Long = Long.MaxValue): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    import org.apache.spark.sql.expressions.Window
    val h = h32(concat(col(idCol).cast("string"), lit("_" + salt)))
    val base = df.select(col(classCol), col(idCol),
      col(tokenCol).cast("long").as("n_tok"), h.as("__h"))
    val thinned =
      if (preSampleOver == Long.MaxValue) base
      else {
        require(preSampleOver > 0, s"preSampleOver must be positive, got $preSampleOver")
        val hot = base.groupBy(classCol).agg(
            count(lit(1)).as("__csize"),
            min(struct(col("__h"), col(idCol).as("__id"))).as("__first"))
          .filter(col("__csize") > preSampleOver)
        val stride = ceil(col("__csize").cast("double") / preSampleOver).cast("long")
        base.join(broadcast(hot), Seq(classCol), "left")
          .filter(col("__csize").isNull ||
            (col("__first.__h") === col("__h") && col("__first.__id") === col(idCol)) ||
            pmod(h32(concat(col(idCol).cast("string"), lit(s"_${salt}_pre"))), stride) === 0)
          .select(col(classCol), col(idCol), col("n_tok"), col("__h"))
      }
    // both windows share ONE (partition, order) spec so they ride a single
    // sort + exchange, not two
    val w = Window.partitionBy(classCol).orderBy(col("__h"), col(idCol))
    thinned
      .withColumn("cum_tok", sum("n_tok").over(w))
      .withColumn("rn", row_number().over(w))
      .filter(col("cum_tok") <= budget || col("rn") === 1)
      .select(col(classCol), col(idCol), col("n_tok"), col("cum_tok"))
  }

  /** Keep the top `frac` of rows per class by `scoreCol` — the "top X% by
    * quality per language/domain" selection rule — WITHOUT a per-class
    * sort: the cutoff is the histogram-interpolated (1−frac) percentile
    * from [[Stats.histogramPercentiles]] (two scans, every agg partial and
    * mergeable, reducer state bounded by the bucket count), broadcast back
    * and compared per row. The cutoff is a pure, floor6-stabilized function
    * of (min, width, bucket counts), so both engines make identical keep
    * calls. The kept fraction is approximate within one bucket width of
    * the exact order statistic — the standard trade for not sorting a
    * 100 TB class on one reducer.
    */
  def topFracByClass(df: DataFrame, classCol: String, scoreCol: String,
      frac: Double, buckets: Int = 256): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0,1], got $frac")
    val thr = Stats.histogramPercentiles(df, classCol, scoreCol,
      Seq(("cut", 1.0 - frac)), buckets)
    df.join(broadcast(thr), classCol)
      .filter(col(scoreCol) >= col("p_cut"))
      .drop("p_cut")
  }

  /** Hard per-class cap: keep AT MOST `n` rows per class, chosen
    * deterministically by id-hash order (the "no more than N docs per
    * language/domain" mix rule, where a fraction can't bound the absolute
    * count). Selection runs through the bounded [[graft.functions.TopK]]
    * aggregator — each partition contributes ≤ n candidates per class to
    * the shuffle, so a 10-billion-row class costs the same shuffle as a
    * 10-thousand-row one (no per-class global sort).
    */
  /** Weighted sampling WITHOUT replacement, k per class, deterministic —
    * Efraimidis–Spirakis A-ES: item i draws u_i ∈ (0,1) and gets priority
    * u_i^(1/w_i); the k largest priorities per class are exactly a weighted
    * sample without replacement. Here u_i is hash-derived (same portable
    * md5 scheme as [[hashSample]]) so the draw is reproducible across runs,
    * engines, and cluster layouts.
    *
    * Priorities are floored to 1e-6 units before ranking (ties → id asc),
    * so a libm ulp difference between engines can only matter if it crosses
    * a micro boundary (~1e-10/row) — the same guard `temperatureMixture`
    * uses for its pow.
    *
    * Scale: per-row priority + the bounded [[graft.functions.TopK]]
    * aggregator — each partition ships ≤ k candidates per class, never the
    * class's full population. Rows with non-positive weight are excluded
    * (A-ES is undefined there), matching the oracle's WHERE.
    */
  def weightedPerClass(df: DataFrame, classCol: String, idCol: String,
      weightCol: String, k: Int, salt: String = "s0"): DataFrame = {
    graft.functions.TopK.requireIntegralId(df.schema, idCol, "weightedPerClass")
    val u = (pmod(h32(concat(col(idCol).cast("string"), lit("_" + salt))), lit(1000000))
      .cast("double") + lit(0.5)) / lit(1000000.0)
    val prio = floor(pow(u, lit(1.0) / col(weightCol).cast("double")) * lit(1000000.0))
    val grouped = df.filter(col(weightCol) > 0)
      .select(col(classCol), col(idCol).cast("long").as("__id"), prio.cast("double").as("__p"))
      .groupBy(classCol)
      .agg(graft.functions.TopK.topK(k)(col("__p"), col("__id")).as("topk"))
    grouped.select(col(classCol), explode(col("topk")).as("item"))
      .select(col(classCol), col("item._2").as(idCol),
        col("item._1").cast("long").as("prio_micro"))
  }

  def cappedPerClass(df: DataFrame, classCol: String, idCol: String, n: Int,
      salt: String = "s0"): DataFrame = {
    // the TopK encoder is (Double, Long): unlike the fraction samplers the
    // id must be integral — a string id would cast to null and collapse
    graft.functions.TopK.requireIntegralId(df.schema, idCol, "cappedPerClass")
    // TopK keeps the LARGEST scores; negate the hash to keep the smallest
    val score = -h32(concat(col(idCol).cast("string"), lit("_" + salt))).cast("double")
    val grouped = df.select(col(classCol), col(idCol).cast("long").as("__id"), score.as("__s"))
      .groupBy(classCol)
      .agg(graft.functions.TopK.topK(n)(col("__s"), col("__id")).as("topk"))
    grouped.select(col(classCol), explode(col("topk")).as("item"))
      .select(col(classCol), col("item._2").as(idCol))
  }

  /** Waterfilling (max-min fair) token-budget allocation: solve the
    * waterline τ with Σ_c min(tot_c, τ) = budget, keep every class below
    * the line whole, and sample each class above it down to τ weight —
    * the allocation that spends a fixed training-token budget while
    * flattening the head as little as necessary and never touching the
    * tail (the cap-based complement to [[temperatureMixture]]'s
    * exponential rebalancing).
    *
    * Distributed solve: per-class totals (one shuffle), then the waterline
    * comes from the SORTED prefix sums via [[Ordered.rankedPrefixSum]] —
    * for ascending totals t₁ ≤ … ≤ t_m, class k is fully kept iff
    * cum_k + (m−k)·t_k ≤ B; with k* the largest such k,
    * τ = (B − cum_{k*})/(m − k*). No driver-side loop, no m-sized
    * single-reducer sort (the prefix sum is the two-level range-partitioned
    * form). Output: (classCol, tot, rate_micro).
    *
    * Exactness: τ is floored to micro-units (`budget·10⁶` must stay under
    * 2⁵³ for the floor to be exact — hence the 9·10⁹ budget bound; at
    * trillion-token scale pass kilotokens as the weight unit) and per-class
    * rates are exact integer floors of τ_micro/tot (a double quotient of
    * longs this size cannot round across an integer boundary).
    */
  /** Deterministic NEGATIVE SAMPLING for contrastive training: for every
    * row (the anchor), `k` pseudo-random OTHER rows drawn uniformly by
    * portable hash — the negatives a contrastive objective pairs against
    * each positive. Never the anchor itself: the draw is over [1, N−1]
    * and shifts past the anchor's own rank (the classic
    * sample-without-self construction), so it's exactly uniform over the
    * other N−1 rows. Deterministic under any partitioning (hash of
    * (anchor, slot, salt)); change `salt` per epoch for fresh negatives.
    *
    * Scale shape: ranks come from [[Ordered.rankedPrefixSum]]'s two-level
    * distributed prefix sum (row_number-by-id without a global window);
    * the draw is a per-row projection; resolution is one equi-join on
    * rank. The N needed for the modulus is one count job (a long on the
    * driver — the documented model-bounded collect class). Modulo bias
    * over the 2³² hash domain is ≤ N/2³² — negligible below ~10⁷ rows per
    * sampled table and irrelevant to training at any size.
    */
  def negativeSamples(df: DataFrame, idCol: String, k: Int,
      salt: String = "neg1"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val ranked = Ordered.rankedPrefixSum(df.select(col(idCol)),
      Seq(col(idCol)), lit(1L)).select(col(idCol), col("rank"))
    val n = ranked.count()
    if (n < 2)
      // no negatives can exist without a second row — empty result with
      // the contract schema, not a throw (the EmptyInput contract every
      // registered query keeps)
      return ranked.select(col(idCol).as("anchor_id"),
        lit(0).as("neg_idx"), col(idCol).as("neg_id")).where(lit(false))
    val probes = ranked
      .select(col(idCol).as("anchor_id"), col("rank").as("__arnk"),
        explode(sequence(lit(1), lit(k))).as("neg_idx"))
      .withColumn("__t",
        pmod(Text.h32(concat(col("anchor_id").cast("string"), lit("_"),
          col("neg_idx").cast("string"), lit("_" + salt))), lit(n - 1)) + 1)
      .withColumn("__nrnk",
        when(col("__t") >= col("__arnk"), col("__t") + 1).otherwise(col("__t")))
    probes
      .join(ranked.select(col(idCol).as("neg_id"), col("rank").as("__nrnk")), "__nrnk")
      .select("anchor_id", "neg_idx", "neg_id")
  }

  def waterfillRates(df: DataFrame, classCol: String, weightCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    require(budget <= 9000000000L,
      s"budget=$budget: budget·10⁶ must stay below 2⁵³ for exact micro " +
        "flooring — rescale the weight unit (e.g. kilotokens) instead")
    val cls = df.groupBy(col(classCol)).agg(sum(col(weightCol)).as("tot"))
    val ranked = Ordered.rankedPrefixSum(cls,
      Seq(col("tot").asc, col(classCol).asc), col("tot"))
    val m = cls.agg(count(lit(1)).as("m"))
    val kst = ranked.crossJoin(broadcast(m))
      .where(col("cum") + (col("m") - col("rank")) * col("tot") <= budget)
      .agg(coalesce(max(col("rank")), lit(0L)).as("kstar"),
        coalesce(max_by(col("cum"), col("rank")), lit(0L)).as("pre"))
    val params = m.crossJoin(broadcast(kst))
      .select(col("m"), col("kstar"),
        when(col("kstar") >= col("m"), lit(null).cast("long"))
          .otherwise(floor((lit(budget) - col("pre")).cast("double") * lit(1000000.0) /
            (col("m") - col("kstar")).cast("double")).cast("long"))
          .as("tau_micro"))
    ranked.crossJoin(broadcast(params))
      .select(col(classCol), col("tot"),
        when(col("tau_micro").isNull || col("rank") <= col("kstar"), lit(1000000L))
          .otherwise(least(lit(1000000L),
            floor(col("tau_micro").cast("double") / col("tot").cast("double"))
              .cast("long")))
          .as("rate_micro"))
  }

  /** Row admission under the waterfill allocation: the rate table
    * broadcasts, each row keeps iff its id hash lands under its class's
    * rate — one corpus scan, one broadcast join, the [[hashSample]]
    * determinism contract. Output: (idCol, classCol, rate_micro).
    */
  def waterfillSample(df: DataFrame, classCol: String, idCol: String,
      weightCol: String, budget: Long, salt: String = "s0"): DataFrame = {
    val rates = waterfillRates(df, classCol, weightCol, budget)
      .select(col(classCol), col("rate_micro"))
    df.join(broadcast(rates), Seq(classCol))
      .filter(pmod(h32(concat(col(idCol).cast("string"), lit("_" + salt))), lit(1000000))
        < col("rate_micro"))
      .select(col(idCol), col(classCol), col("rate_micro"))
  }

  /** Stratified train/eval split with EXACT per-stratum quotas — the
    * eval-set construction that cannot starve a thin band: docs are
    * bucketed into caller-fixed strata (the drift grid's fixed-bin trick,
    * [[Stats.gridBin]] on any numeric signal — quality score, length,
    * classifier score), and WITHIN each stratum exactly
    * ⌊n_s·trainPct/100⌋ docs (first in salted-hash order) go to train,
    * the rest to eval. A plain hash split only hits the rate in
    * expectation — a 50-doc tail stratum can easily land 0 eval docs; the
    * quota form guarantees coverage, deterministically and
    * layout-independently (the order is (hash, id), never partition
    * order).
    *
    * Scale shape: per-stratum positions come from the range-partitioned
    * two-level prefix sum ([[Ordered.rankedPrefixSum]] over
    * (stratum, hash, id)) — NO per-stratum single-reducer window, which
    * is what a naive row_number() OVER (PARTITION BY stratum) would pin
    * at corpus scale; stratum offsets/quotas ride back as a
    * |strata|-row broadcast.
    *
    * Output: (idCol, stratum, split ∈ {train, eval}).
    */
  def stratifiedSplit(df: DataFrame, idCol: String, signalCol: String,
      loCents: Long, widthCents: Long, buckets: Int, trainPct: Int,
      salt: String = "strat1"): DataFrame = {
    require(trainPct > 0 && trainPct < 100, s"trainPct in (0,100), got $trainPct")
    val base = df.filter(col(signalCol).isNotNull)
      .select(col(idCol),
        Stats.gridBin(signalCol, loCents, widthCents, buckets).as("stratum"))
      .withColumn("__h", h32(concat(col(idCol).cast("string"), lit("_" + salt))))
    val ranked = Ordered.rankedPrefixSum(base,
      Seq(col("stratum").asc, col("__h").asc, col(idCol).asc), lit(1L))
    val stats = ranked.groupBy("stratum")
      .agg(count(lit(1)).as("__n_s"), min(col("rank")).as("__r0"))
    ranked.join(broadcast(stats), Seq("stratum"))
      .withColumn("split",
        when(col("rank") - col("__r0") < expr(s"(__n_s * $trainPct) div 100"),
          lit("train")).otherwise(lit("eval")))
      .select(col(idCol), col("stratum"), col("split"))
  }

  /** Effective sample size of each class under its example weights —
    * Kish's ESS = (Σw)²/Σw², the audit that tells a weighted-mixture
    * pipeline when a class's draw is dominated by a few giant documents
    * (ESS ≪ n ⟹ the temperature/waterfill math is being steered by a
    * handful of rows, re-chunk or cap before sampling). ENGINE-EXACT:
    * integer weights, (Σw)² and n·Σw² ride DECIMAL(38,0)/HUGEINT, outputs
    * are truncating integer divisions —
    *   ess_milli      = 10³·(Σw)²  div Σw²        (≈ 1000·ESS, ≤ 10³·n)
    *   ess_frac_micro = 10⁶·(Σw)² div (n·Σw²)    (≈ 10⁶·ESS/n, ≤ 10⁶).
    * One map-side-combined groupBy carrying three numbers per class;
    * nothing downstream is data-sized. Non-positive / null weights are
    * excluded (they'd poison the quadratic term).
    */
  /** DoReMi-lite domain reweighting: multiplicative-weights updates that
    * upweight HIGH-LOSS domains — the data-mixing optimizer family
    * (DoReMi, Xie et al. 2023) with the proxy-model retrain replaced by
    * static per-example losses, so the update dynamics are the paper's
    * while everything stays ENGINE-EXACT and replayable:
    *
    *   round r:  Lbar = Σ_c w_c·L_c / Σ_c w_c           (weighted mean)
    *             rel_c = 10⁶·(L_c − Lbar) / Lbar         (dimensionless)
    *             w_c  ← w_c · max(0, 10⁶ + η·rel_c)/10⁶, renormalized to
    *                    Σ = 10⁶
    *
    * in truncating integer micro-units (η = etaNum/etaDen rational,
    * products on DECIMAL(38,0)) — every round floors identically on any
    * engine, so a DuckDB oracle replays the full trajectory bit-for-bit.
    *
    * Scale shape: ONE data-sized aggregation (per-domain mean loss,
    * map-side combined to |domains| rows); the |domains|-row table is then
    * a MODEL — collected once (the IVF-centroid / PCA-component
    * precedent) and iterated on the driver in exact long arithmetic, so
    * rounds cost literally nothing at corpus scale and the plan holds no
    * per-round subtree for Spark to re-execute. Exactness envelope:
    * per-domain Σloss must stay under ~9.2·10¹² so the 10⁶ scaling fits a
    * long (pre-average or subsample past that), and per-domain mean loss
    * under 10¹² (guarded) so every driver product stays in a long.
    *
    * Output: (classCol, loss_micro, w_micro) after `rounds` updates; a
    * domain above the (positive) mean loss gets w_micro > 10⁶/|domains|.
    */
  def domainReweight(df: DataFrame, classCol: String, lossCol: String,
      rounds: Int, etaNum: Int, etaDen: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"rounds must be in [1,16], got $rounds")
    require(etaNum > 0 && etaDen > 0, s"eta must be positive, got $etaNum/$etaDen")
    val spark = df.sparkSession
    val dom = df.filter(col(lossCol).isNotNull && col(lossCol) > 0)
      .groupBy(classCol)
      .agg(expr(s"(1000000 * sum(`$lossCol`)) div count(1)").as("loss_micro"))
      .collect().map(r => (r.get(0), r.getAs[Long]("loss_micro")))
    dom.foreach { case (c, l) => require(l <= 1000000000000L,
      s"domainReweight: mean loss $l for domain $c exceeds the 10¹² exact-" +
        "long envelope — rescale the loss unit") }
    // driver replay of the multiplicative-weights rounds in BigInt —
    // BigInt `/` truncates toward zero exactly like Spark `div` (on
    // DECIMAL) and DuckDB `//` (on HUGEINT), and sums of products cannot
    // overflow no matter how skewed the losses are
    val M = BigInt(1000000)
    var w = dom.map { case (c, l) => (c, BigInt(l), M) }
    for (_ <- 1 to rounds) {
      val wsum = w.map(_._3).sum.max(BigInt(1))
      val lbar = w.map { case (_, l, wc) => wc * l }.sum / wsum
      val raw = w.map { case (c, l, wc) =>
        val rel = (M * (l - lbar)) / lbar.max(BigInt(1))
        val factor = (M + (BigInt(etaNum) * rel) / BigInt(etaDen)).max(BigInt(0))
        (c, l, wc * factor / M)
      }
      val ws = raw.map(_._3).sum.max(BigInt(1))
      w = raw.map { case (c, l, wr) => (c, l, M * wr / ws) }
    }
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      df.schema(classCol).copy(name = classCol),
      org.apache.spark.sql.types.StructField("loss_micro",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("w_micro",
        org.apache.spark.sql.types.LongType)))
    spark.createDataFrame(
      w.map { case (c, l, wc) => org.apache.spark.sql.Row(c, l.toLong, wc.toLong) }
        .toSeq.asJava, schema)
  }

  def effectiveSampleSize(df: DataFrame, classCol: String,
      weightCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(classCol), col(weightCol).cast("long").as("__w"))
      .groupBy(classCol)
      .agg(count(lit(1)).as("n"), sum(col("__w")).as("w_tot"),
        sum(col("__w").cast(dec) * col("__w").cast(dec)).cast(dec).as("__w2"))
      .withColumn("ess_milli",
        expr(s"cast((1000 * cast(w_tot as $dec) * w_tot) div __w2 as bigint)"))
      .withColumn("ess_frac_micro",
        expr(s"cast((1000000 * cast(w_tot as $dec) * w_tot) div (n * __w2) as bigint)"))
      .drop("__w2")
  }
}
