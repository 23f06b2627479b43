package graft.api

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Queryable state over an update-mode streaming aggregate — the analogue
  * of Kafka Streams' interactive queries
  * (`streams.store(name, QueryableStoreTypes.keyValueStore())` +
  * `store.all()`, reference `AbstractJoinIntegrationTest.java:268-281`).
  *
  * Each micro-batch's updates upsert into a driver-local map, so `get`/
  * `all` observe the latest value per key — exactly what KS's local store
  * exposes per instance. This is a SERVING surface, deliberately
  * driver-local like KS's per-instance RocksDB; the at-scale paths are
  * [[QueryableState.fromCheckpoint]] (distributed read of the operator's
  * StateStore files) and the update stream upserted into an external store
  * ([[graft.sinks.JdbcSink]]) or a lakehouse table.
  */
object QueryableState {

  /** Production-grade state read — Spark's state data source over a
    * stateful query's checkpoint: every (key, value) pair of the operator's
    * StateStore as a distributed DataFrame, no driver materialization and
    * no running query required. This is the at-scale analogue of KS's
    * `store.all()`: state files are read where they sit (HDFS/S3), so a
    * 1000-executor job can scan TB-scale state in parallel.
    *
    * Returns columns `key` (struct of the grouping columns), `value`
    * (struct of the aggregate buffer), `partition_id`.
    */
  def fromCheckpoint(spark: org.apache.spark.sql.SparkSession, checkpointDir: String,
      operatorId: Int = 0, storeName: String = "default"): DataFrame =
    spark.read.format("statestore")
      .option("operatorId", operatorId.toString)
      .option("storeName", storeName)
      .load(checkpointDir)
}

/** @param maxKeys hard cap on the driver-local store — growing past it
  *                 FAILS the query loudly (the foreachBatch throw stops the
  *                 stream) instead of OOMing the driver hours later. The
  *                 default fits the serving use case (per-instance lookups
  *                 over a bounded key space); someone pointing a 100 TB
  *                 aggregate at a driver map should be told at key
  *                 1,000,001, not by the kernel.
  */
class QueryableState(keyCols: Seq[String], maxKeys: Int = 1000000) {
  private val store = TrieMap[Seq[Any], Row]()

  /** Start consuming an update-mode aggregate into this store. */
  def serve(df: DataFrame, checkpointLocation: Option[String] = None): StreamingQuery = {
    val w0 = df.writeStream.outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val keyIdx = keyCols.map(batch.schema.fieldIndex)
        batch.collect().foreach(r => store.put(keyIdx.map(r.get), r))
        if (store.size > maxKeys)
          throw new IllegalStateException(
            s"QueryableState grew past maxKeys=$maxKeys distinct keys — " +
              "this is a driver-local SERVING store; for state this large " +
              "read the checkpoint distributively (QueryableState" +
              ".fromCheckpoint) or sink updates to an external store")
        ()
      }
    checkpointLocation.fold(w0)(c => w0.option("checkpointLocation", c)).start()
  }

  def get(key: Any*): Option[Row] = store.get(key.toSeq)
  def all(): Map[Seq[Any], Row] = store.toMap
  def size: Int = store.size
}
