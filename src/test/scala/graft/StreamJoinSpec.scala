package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.streaming.StreamJoins

/** Windowed stream-stream joins driven by the reference's 15-step golden
  * input script (FIXTURES.md F3; reference
  * `AbstractJoinIntegrationTest.java:100-116` — interleaved null values,
  * timestamps +1ms per record, JoinWindows.of(10000), valueJoiner v1-"-"-v2):
  *
  *   step: 1      2      3   4   5   6   7      8      9   10  11     12     13     14  15
  *   in:   L:null R:null L:A R:a L:B R:b L:null R:null L:C R:c R:null L:null R:null R:d L:D
  *
  * Null-valued records never join (KS drops them; we filter before the
  * join, SURVEY §2.4). Inner-join per-step emissions must match the golden
  * sequence of `StreamStreamJoinIntegrationTest.java:64-80` exactly.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  case class Ev(key: Long, value: String, ts: Timestamp)

  private val base = 1700000000000L
  private def ev(v: String, step: Int): Ev = Ev(0L, v, new Timestamp(base + step))

  /** (side, value, step): side L or R; null value encoded as null. */
  private val script: Seq[(Char, String, Int)] = Seq(
    ('L', null, 1), ('R', null, 2), ('L', "A", 3), ('R', "a", 4), ('L', "B", 5),
    ('R', "b", 6), ('L', null, 7), ('R', null, 8), ('L', "C", 9), ('R', "c", 10),
    ('R', null, 11), ('L', null, 12), ('R', null, 13), ('R', "d", 14), ('L', "D", 15))

  /** Golden inner-join emissions per step (reference `:64-80`). */
  private val goldenInnerSteps: Map[Int, Set[String]] = Map(
    4 -> Set("A-a"), 5 -> Set("B-a"), 6 -> Set("A-b", "B-b"),
    9 -> Set("C-a", "C-b"), 10 -> Set("A-c", "B-c", "C-c"),
    14 -> Set("A-d", "B-d", "C-d"), 15 -> Set("D-a", "D-b", "D-c", "D-d"))

  private def joined(l: DataFrame, r: DataFrame, joinType: String,
      watermarkMs: Option[Long] = None): DataFrame =
    StreamJoins.windowed(
      l.filter(col("value").isNotNull), r.filter(col("value").isNotNull),
      "key", "ts", 10000, joinType, watermarkMs)
      .select(StreamJoins.dashJoin(col("l_value"), col("r_value")).as("v"))

  private def collected(name: String): Set[String] =
    spark.table(name).as[String].collect().toSet

  test("J1: inner windowed join reproduces the golden per-step emissions") {
    implicit val ctx = spark.sqlContext
    val left = MemoryStream[Ev]; val right = MemoryStream[Ev]
    val q = joined(left.toDF(), right.toDF(), "inner")
      .writeStream.format("memory").queryName("j_inner").outputMode("append").start()
    try {
      var seen = Set.empty[String]
      script.foreach { case (side, v, step) =>
        if (side == 'L') left.addData(ev(v, step)) else right.addData(ev(v, step))
        q.processAllAvailable()
        val now = collected("j_inner")
        assert(now -- seen === goldenInnerSteps.getOrElse(step, Set.empty),
          s"step $step emissions")
        seen = now
      }
      assert(seen.size === 16)
    } finally q.stop()
  }

  test("J4: rekey before the join leaves results invariant") {
    implicit val ctx = spark.sqlContext
    val left = MemoryStream[Ev]; val right = MemoryStream[Ev]
    // noOp rekey+revalue upstream (reference testInnerRepartitioned :88-115)
    val rekeyedLeft = left.toDF().select((col("key") + 0).as("key"), col("value"), col("ts"))
    val q = joined(rekeyedLeft, right.toDF(), "inner")
      .writeStream.format("memory").queryName("j_rekey").outputMode("append").start()
    try {
      script.foreach { case (side, v, step) =>
        if (side == 'L') left.addData(ev(v, step)) else right.addData(ev(v, step))
      }
      q.processAllAvailable()
      assert(collected("j_rekey") ===
        goldenInnerSteps.values.flatten.toSet)
    } finally q.stop()
  }

  test("J2: left join emits null-padded row only for a truly unmatched left (post-watermark)") {
    implicit val ctx = spark.sqlContext
    val left = MemoryStream[Ev]; val right = MemoryStream[Ev]
    val q = joined(left.toDF(), right.toDF(), "left_outer", watermarkMs = Some(0))
      .writeStream.format("memory").queryName("j_left").outputMode("append").start()
    try {
      // X at t0 with key 7 never matches (only key-8 records on the right)
      left.addData(Ev(7L, "X", new Timestamp(base)))
      right.addData(Ev(8L, "y", new Timestamp(base + 1000)))
      q.processAllAvailable()
      assert(collected("j_left") === Set.empty[String])
      // advance the right watermark beyond base+10s so X's window closes
      right.addData(Ev(8L, "z", new Timestamp(base + 60000)))
      q.processAllAvailable()
      left.addData(Ev(9L, "w", new Timestamp(base + 60000)))
      q.processAllAvailable()
      assert(collected("j_left").contains("X-null"))
    } finally q.stop()
  }

  test("J3: outer join final state = inner matches + unmatched both sides") {
    implicit val ctx = spark.sqlContext
    val left = MemoryStream[Ev]; val right = MemoryStream[Ev]
    val q = joined(left.toDF(), right.toDF(), "full_outer", watermarkMs = Some(0))
      .writeStream.format("memory").queryName("j_outer").outputMode("append").start()
    try {
      left.addData(Ev(1L, "A", new Timestamp(base)))
      right.addData(Ev(1L, "a", new Timestamp(base + 5)))
      left.addData(Ev(2L, "B", new Timestamp(base + 10)))   // no right match
      right.addData(Ev(3L, "c", new Timestamp(base + 20)))  // no left match
      q.processAllAvailable()
      // close all windows
      left.addData(Ev(99L, "zz", new Timestamp(base + 120000)))
      right.addData(Ev(98L, "zz", new Timestamp(base + 120000)))
      q.processAllAvailable()
      left.addData(Ev(99L, "zz2", new Timestamp(base + 240000)))
      right.addData(Ev(98L, "zz2", new Timestamp(base + 240000)))
      q.processAllAvailable()
      val res = collected("j_outer")
      assert(res.contains("A-a"))
      assert(res.contains("B-null"))
      assert(res.contains("null-c"))
    } finally q.stop()
  }

  test("J5: multi-way chained join (L join R) join R final state") {
    implicit val ctx = spark.sqlContext
    val left = MemoryStream[Ev]; val right = MemoryStream[Ev]
    val l = left.toDF().filter(col("value").isNotNull)
    val r = right.toDF().filter(col("value").isNotNull)
    val first = StreamJoins.windowed(l, r, "key", "ts", 10000, "inner")
      .select(col("l_key").as("key"),
        StreamJoins.dashJoin(col("l_value"), col("r_value")).as("value"),
        col("l_ts").as("ts"))
    val second = StreamJoins.windowed(first, r, "key", "ts", 10000, "inner")
      .select(StreamJoins.dashJoin(col("l_value"), col("r_value")).as("v"))
    val q = second.writeStream.format("memory").queryName("j_multi")
      .outputMode("append").start()
    try {
      script.foreach { case (side, v, step) =>
        if (side == 'L') left.addData(ev(v, step)) else right.addData(ev(v, step))
      }
      q.processAllAvailable()
      val expected = (for {
        lv <- Seq("A", "B", "C", "D"); r1 <- Seq("a", "b", "c", "d"); r2 <- Seq("a", "b", "c", "d")
      } yield s"$lv-$r1-$r2").toSet
      assert(collected("j_multi") === expected)
    } finally q.stop()
  }
}
