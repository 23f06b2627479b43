package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.Text

/** BPE encode on a stream: the apply step is stateless (the merge table
  * rides the closure like any tokenizer's merges file), so the SAME
  * [[Text.applyBpeMerges]] drives batch and streaming — this pins that the
  * typed-map path actually plans on a streaming Dataset and that each
  * micro-batch's output equals the batch encode of the same rows.
  */
class BpeStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming encode per micro-batch equals batch applyBpeMerges") {
    implicit val ctx = spark.sqlContext
    val merges = Seq(("a", "b"), ("a+b", "c"))
    val in = MemoryStream[(Long, String)]
    val q = Text.applyBpeMerges(in.toDF().toDF("doc_id", "text"), "text", "doc_id", merges)
      .writeStream.format("memory").queryName("bpe_stream").outputMode("append").start()
    try {
      val rows = Seq(1L -> "a b c d", 2L -> "a b a b c", 3L -> "", 4L -> "c a b")
      in.addData(rows.take(2): _*); q.processAllAvailable()
      in.addData(rows.drop(2): _*); q.processAllAvailable()
      val streamed = spark.table("bpe_stream").as[(Long, Seq[String])].collect().toMap
      val batch = Text.applyBpeMerges(rows.toDF("doc_id", "text"), "text", "doc_id", merges)
        .as[(Long, Seq[String])].collect().toMap
      assert(streamed === batch)
      assert(streamed(2L) === Seq("a+b", "a+b+c"), "rank-order fixpoint on the stream")
    } finally q.stop()
  }
}
