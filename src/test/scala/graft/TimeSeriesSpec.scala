package graft

import org.apache.spark.sql.functions.col
import graft.ops.TimeSeries

/** Resample/forward-fill semantics on a hand fixture: gaps carry the last
  * observation, in-bucket ties resolve by (ts, ord), nulls are not
  * observations, and each key's grid spans exactly its own range.
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  // step=10: u1 observes buckets 0 and 3 (gap 1-2), bucket 0 has a tie at
  // ts=5 resolved by ord; u2 is a single point; the null value row is noise
  private def events = Seq(
    ("u1", 5L, 1L, Some(1.0)), ("u1", 5L, 2L, Some(2.0)), ("u1", 3L, 9L, Some(9.0)),
    ("u1", 31L, 3L, Some(7.0)), ("u1", 12L, 4L, None),
    ("u2", 100L, 5L, Some(5.0))
  ).toDF("k", "ts", "ord", "v")

  test("gaps forward-fill, ties break by (ts, ord), nulls are ignored") {
    val out = TimeSeries.resampleFill(events, "k", "ts", "ord", "v", stepUs = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toSet
    assert(out === Set(
      ("u1", 0L, 2.0, true),   // tie at ts=5: ord 2 wins over ord 1; ts=3 loses
      ("u1", 1L, 2.0, false),  // gap (the null at ts=12 is not an observation)
      ("u1", 2L, 2.0, false),  // gap
      ("u1", 3L, 7.0, true),
      ("u2", 10L, 5.0, true))) // grid starts at u2's own first bucket
  }

  test("cohortRetention: cohort = first bucket, periods are distinct offsets") {
    // step=10: u1 → buckets {0,1,3}; u4 → {0,3} (same cohort as u1);
    // u2 → {1} twice (within-bucket repeat dedups); u3 → {2}
    val ev = Seq(
      ("u1", 5L), ("u1", 15L), ("u1", 35L),
      ("u4", 7L), ("u4", 38L),
      ("u2", 12L), ("u2", 19L),
      ("u3", 25L)
    ).toDF("k", "ts")
    val out = TimeSeries.cohortRetention(ev, "k", "ts", stepUs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set(
      (0L, 0L, 2L),  // u1+u4 active in their cohort bucket
      (0L, 1L, 1L),  // only u1 back in bucket 1
      (0L, 3L, 2L),  // both back in bucket 3
      (1L, 0L, 1L),  // u2's repeat inside bucket 1 counts once
      (2L, 0L, 1L)))
  }

  test("cusum: closed form equals the sequential recursion, both sides") {
    // key a ramps up (10,10,10,100,100), key b steps down (10,10,2,2);
    // target=10.00, slack=0 — hand recursion: a's s⁺ = 0,0,0,9000,18000
    // (cents), b's s⁻ = 0,0,800,1600
    val ev = Seq(
      ("a", 1L, 1L, 10.0), ("a", 2L, 2L, 10.0), ("a", 3L, 3L, 10.0),
      ("a", 4L, 4L, 100.0), ("a", 5L, 5L, 100.0),
      ("b", 1L, 6L, 10.0), ("b", 2L, 7L, 10.0),
      ("b", 3L, 8L, 2.0), ("b", 4L, 9L, 2.0)
    ).toDF("k", "ts", "ord", "v")
    val out = TimeSeries.cusum(ev, "k", "ts", "ord", "v",
        targetCents = 1000L, slackCents = 0L, hCents = 1000L)
      .select("ord", "cusum_pos", "cusum_neg", "shift_up", "shift_down")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getBoolean(4)))).toMap
    // exhaustive sequential-recursion replay (the op computes these via
    // the closed form; any divergence is a correctness bug)
    assert(out(3L) === ((0L, 0L, false, false)))
    assert(out(4L) === ((9000L, 0L, true, false)))
    assert(out(5L) === ((18000L, 0L, true, false)))
    assert(out(7L) === ((0L, 0L, false, false)))
    assert(out(8L) === ((0L, 800L, false, false)))
    assert(out(9L) === ((0L, 1600L, false, true)))
    // a recovery after a dip must CLAMP at zero, not go negative: replay
    // 10,2,10,10 — s⁺ stays 0 through the dip and after
    val ev2 = Seq(("c", 1L, 1L, 10.0), ("c", 2L, 2L, 2.0),
      ("c", 3L, 3L, 10.0), ("c", 4L, 4L, 10.0)).toDF("k", "ts", "ord", "v")
    val got2 = TimeSeries.cusum(ev2, "k", "ts", "ord", "v", 1000L, 0L, 100L)
      .select("ord", "cusum_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("rollingAnomalies: exact integer flag matches the hand z-score calls") {
    // one key, width=3, k=2; values in half-unit steps so cent quantization
    // is float-unambiguous. After warmup: frame {1,2,3} → stddev_pop
    // ≈ 0.8165, mean 2 → x=4 is z≈2.45 (flag); a zero-variance frame flags
    // ANY deviation (and never flags zero deviation)
    val ev = Seq(
      ("a", 1L, 1L, 1.0), ("a", 2L, 2L, 2.0), ("a", 3L, 3L, 3.0),
      ("a", 4L, 4L, 4.0),  // z ≈ 2.45 > 2 → anomaly
      ("a", 5L, 5L, 3.0),  // frame {2,3,4}: mean 3, x=3 → z=0 → not
      ("b", 1L, 6L, 5.0), ("b", 2L, 7L, 5.0), ("b", 3L, 8L, 5.0),
      ("b", 4L, 9L, 5.0),  // zero variance, zero deviation → 0 > 0 false
      ("b", 5L, 10L, 5.5)  // zero variance, any deviation → anomaly
    ).toDF("k", "ts", "ord", "v")
    val out = TimeSeries.rollingAnomalies(ev, "k", "ts", "ord", "v",
      width = 3, k = 2)
      .select("ord", "anomaly", "hist_n")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    // warmup rows (fewer than `width` predecessors) never flag
    Seq(1L -> 0L, 2L -> 1L, 3L -> 2L, 6L -> 0L, 7L -> 1L, 8L -> 2L).foreach {
      case (o, n) => assert(out(o) === (false, n), s"warmup ord $o") }
    assert(out(4L) === (true, 3L))
    assert(out(5L) === (false, 3L))
    assert(out(9L) === (false, 3L))
    assert(out(10L) === (true, 3L))
  }

  test("trendingTopN: per-bucket counts, count-then-item tie-break, nulls out") {
    // bucket 0 (ts 0-9): items 7×3, 5×2, 9×1 → top2 = 7, 5
    // bucket 1: 5 and 9 tie at 2 → item asc wins: 5 rank1, 9 rank2
    val ev = Seq((1L, Some(7L)), (2L, Some(7L)), (3L, Some(7L)),
      (4L, Some(5L)), (5L, Some(5L)), (6L, Some(9L)), (7L, None),
      (11L, Some(5L)), (12L, Some(5L)), (13L, Some(9L)), (14L, Some(9L)))
      .toDF("ts", "item")
    val out = TimeSeries.trendingTopN(ev, "ts", col("item"), stepUs = 10L, n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out === Map(
      (0L, 1L) -> ((7L, 3L)), (0L, 2L) -> ((5L, 2L)),
      (1L, 1L) -> ((5L, 2L)), (1L, 2L) -> ((9L, 2L))))
  }

  test("ewma: integer weight fold matches the hand computation, per key") {
    // width=4, decay 1/2 → weight table (lag 0..3) = [8,4,2,1]; key a has
    // buckets 0,1,2 with 1.00/2.00/3.00; 1.005 on key b floors to 100 cents
    val g = Seq(
      ("a", 2L, 3.0), ("a", 0L, 1.0), ("a", 1L, 2.0), // unsorted on purpose
      ("b", 0L, 1.005)
    ).toDF("k", "bucket", "v")
    val out = TimeSeries.ewma(g, "k", "bucket", "v",
      width = 4, decayNum = 1, decayDen = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(out(("a", 0L)) === 100L)            // 8·100 / 8
    assert(out(("a", 1L)) === 2000L / 12L)     // (8·200 + 4·100) / 12 = 166
    assert(out(("a", 2L)) === 3400L / 14L)     // (8·300+4·200+2·100)/14 = 242
    assert(out(("b", 0L)) === 100L)            // floor(100.5) = 100
  }

  test("ewma: null values are dropped, weight-budget guard trips") {
    val g = Seq(("a", 0L, Some(1.0)), ("a", 1L, None), ("a", 2L, Some(3.0)))
      .toDF("k", "bucket", "v")
    val out = TimeSeries.ewma(g, "k", "bucket", "v", 4, 1, 2)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // the null bucket vanishes; bucket 2's frame holds only buckets {0,2}
    assert(out === Map(0L -> 100L, 2L -> (8L * 300 + 4L * 100) / 12L))
    val e = intercept[IllegalArgumentException](
      TimeSeries.ewma(g, "k", "bucket", "v", width = 40, decayNum = 1, decayDen = 7))
    assert(e.getMessage.contains("overflows"))
  }
}
