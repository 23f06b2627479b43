package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * `events.ts` has shipped in two encodings across testdata generations:
  *   - legacy: parquet TIMESTAMP(NANOS), which Spark's vectorized reader
  *     rejects ([PARQUET_TYPE_ILLEGAL]); we read it via
  *     `spark.sql.legacy.parquet.nanosAsLong` as an epoch-nanos long
  *   - current: parquet timestamp[us] (no UTC adjustment → read as
  *     TIMESTAMP_NTZ by default)
  * The loader branches on the READ type and normalizes both to the same
  * two columns: `ts` (TIMESTAMP, µs precision, UTC session) and `ts_ns`
  * (epoch-nanos long — matches DuckDB `epoch_ns(ts)` exactly in both
  * encodings, since µs-precision data yields nanos that are µs·1000 on
  * both engines). Every downstream events query keys off these two.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session defaults shared by Verify/Bench/tests. Call once per session.
    * maxPartitionBytes is lowered so the small single-file test tables still
    * scan in parallel on local[32]; at production scale the many input
    * splits provide parallelism naturally and this only caps partition RAM.
    */
  def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1048576")
    spark.conf.set("spark.sql.files.openCostInBytes", "65536")
  }

  /** ts_ns: exact epoch nanos (matches DuckDB epoch_ns(ts));
    * ts: µs-precision timestamp for window()/watermark use.
    *
    * Legacy nanos-long path: `div` truncates toward zero, which equals
    * floor division only for post-epoch data — the driver's testdata
    * starts in 1995, and DuckDB's ns→µs read-time truncation behaves
    * identically there, so the two engines agree. Pre-1970 nanos would
    * need floor() in both.
    *
    * Current timestamp[us] path: the column arrives as TIMESTAMP_NTZ
    * (parquet isAdjustedToUTC=false); cast to TIMESTAMP under the UTC
    * session reinterprets the same wall-clock as a UTC instant, matching
    * DuckDB's naive-timestamp read, then ts_ns = unix_micros·1000.
    */
  private def transformEvents(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    name match {
      case "events" => transformEvents(df)
      case _ => df
    }
  }

  /** `events` as a file-source STREAM (same derived columns as the batch
    * loader; streaming reads need the raw schema declared up front).
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    configure(spark)
    val raw = spark.read.parquet(s"$dir/events.parquet").schema
    // the file stream source wants a directory; glob-filter to the one table
    transformEvents(spark.readStream.schema(raw)
      .option("pathGlobFilter", "events.parquet").parquet(dir))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
