package graft

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
}
