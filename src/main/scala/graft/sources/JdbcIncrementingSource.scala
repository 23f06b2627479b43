package graft.sources

import java.sql.{Connection, DriverManager, ResultSet}
import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Streaming JDBC **incrementing** source (DataSource V2 micro-batch) — the
  * Spark-native re-expression of Kafka Connect's JDBC source in
  * `MODE_INCREMENTING` (reference config `DatabaseFlatMap.java:96-97`,
  * offset bookkeeping `ConnectSourceConsumer.java:292-295`):
  * each micro-batch reads only rows with `incCol > lastSeen`, and the
  * high-water mark is the streaming offset — persisted in the query's
  * checkpoint, recovered on restart (the reference needed a hand-rolled
  * file offset store; Spark's WAL does it for free).
  *
  * Scale notes:
  *  - the `incCol > start AND incCol <= end` predicate is pushed into the
  *    generated SQL, so the database does the scan pruning;
  *  - `numPartitions` splits each batch's id range into parallel JDBC reads
  *    (the reference's Connect source was single-partition by construction,
  *    `WrappedPartitionGrouper.java:80-86` — this is our scale-out path);
  *  - `maxRowsPerTrigger` caps batch size (≙ Connect's bounded 5000-record
  *    queue, `ConnectSourceConsumer.java:169`).
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft.sources.JdbcIncrementingSource")
  *   .schema("id INT, lines STRING")            // required
  *   .option("url", "jdbc:derby:memory:db")
  *   .option("table", "INPUT")                   // table or (subquery) alias
  *   .option("incrementingColumn", "id")
  *   .load()
  * }}}
  */
class JdbcIncrementingSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft jdbc-incrementing requires an explicit .schema(...) (streaming sources cannot infer)")

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new JdbcIncTable(schema, properties)
}

private[sources] class JdbcIncTable(schema: StructType, props: util.Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"jdbc-incrementing(${props.get("table")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new JdbcIncScan(schema, options)
}

private[sources] class JdbcIncScan(schema: StructType, options: CaseInsensitiveStringMap)
    extends Scan {
  override def readSchema(): StructType = schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new JdbcIncMicroBatchStream(schema, options)
}

/** Offset = high-water mark of the incrementing column. */
case class MaxIdOffset(max: Long) extends Offset {
  override def json(): String = s"""{"max":$max}"""
}

private[sources] class JdbcIncMicroBatchStream(
    schema: StructType, options: CaseInsensitiveStringMap) extends MicroBatchStream {

  private val url = options.get("url")
  // validated once here; the reader factory receives these same values
  private val table = graft.SqlIdent.tableOrSubquery(options.get("table"))
  private val incCol = graft.SqlIdent.column(options.get("incrementingColumn"))
  private val numPartitions = math.max(1, options.getInt("numPartitions", 1))
  private val maxRowsPerTrigger = options.getLong("maxRowsPerTrigger", Long.MaxValue)
  private val startingOffset = options.getLong("startingOffset", 0L)

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  override def initialOffset(): Offset = MaxIdOffset(startingOffset)

  /** Monotonic high-water mark of offsets this stream has HANDED OUT (not
    * merely committed) — latestOffset must advance past the previous
    * latestOffset even before the engine commits, or a rate-capped stream
    * stalls after its first batch. Bumped by every offset-bearing callback
    * so checkpoint recovery (deserializeOffset/commit) fast-forwards it.
    */
  @volatile private var highWater: Long = startingOffset
  private def bump(v: Long): Unit = synchronized { if (v > highWater) highWater = v }

  override def latestOffset(): Offset = withConn { c =>
    val prev = highWater
    def maxWhere(cond: String): Option[Long] = {
      val rs = c.createStatement().executeQuery(
        s"SELECT MAX($incCol) FROM $table WHERE $cond")
      rs.next()
      val m = rs.getLong(1)
      if (rs.wasNull()) None else Some(m)
    }
    val end =
      if (maxRowsPerTrigger == Long.MaxValue)
        maxWhere(s"$incCol > $prev").getOrElse(prev)
      else maxWhere(s"$incCol > $prev AND $incCol <= ${prev + maxRowsPerTrigger}")
        .orElse {
          // id GAP wider than the cap (identity rollbacks, high starting
          // ids): jump the window to the next existing id, else the
          // capped query returns NULL forever and the stream stalls
          val rs = c.createStatement().executeQuery(
            s"SELECT MIN($incCol) FROM $table WHERE $incCol > $prev")
          rs.next()
          val mn = rs.getLong(1)
          if (rs.wasNull()) None
          else maxWhere(s"$incCol >= $mn AND $incCol < $mn + $maxRowsPerTrigger")
        }
        .getOrElse(prev)
    bump(end)
    MaxIdOffset(math.max(prev, end))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[MaxIdOffset].max
    val hi = end.asInstanceOf[MaxIdOffset].max
    bump(hi)
    if (hi <= lo) Array.empty
    else {
      // split (lo, hi] into up to numPartitions contiguous id ranges
      val span = hi - lo
      val n = math.min(numPartitions.toLong, span).toInt
      (0 until n).map { i =>
        val s = lo + span * i / n
        val e = lo + span * (i + 1) / n
        JdbcIncPartition(s, e): InputPartition
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JdbcIncReaderFactory(url, table, incCol, schema)

  override def deserializeOffset(json: String): Offset = {
    val m = """"max"\s*:\s*(-?\d+)""".r.findFirstMatchIn(json)
      .getOrElse(throw new IllegalArgumentException(s"bad offset json: $json"))
    val v = m.group(1).toLong
    bump(v)
    MaxIdOffset(v)
  }

  override def commit(end: Offset): Unit = bump(end.asInstanceOf[MaxIdOffset].max)
  override def stop(): Unit = ()
}

private[sources] case class JdbcIncPartition(startExclusive: Long, endInclusive: Long)
    extends InputPartition

private[sources] class JdbcIncReaderFactory(
    url: String, table: String, incCol: String, schema: StructType)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[JdbcIncPartition]
    new PartitionReader[InternalRow] {
      private val conn = DriverManager.getConnection(url)
      // user-declared schema names are interpolated too — validate them
      private val cols = schema.fields.map(f => graft.SqlIdent.column(f.name)).mkString(", ")
      // incremental predicate pushed into the database scan
      private val rs: ResultSet = conn.createStatement().executeQuery(
        s"SELECT $cols FROM $table WHERE $incCol > ${p.startExclusive} " +
          s"AND $incCol <= ${p.endInclusive} ORDER BY $incCol")

      override def next(): Boolean = rs.next()

      override def get(): InternalRow = {
        val row = new GenericInternalRow(schema.length)
        var i = 0
        while (i < schema.length) {
          val v: Any = schema.fields(i).dataType match {
            case IntegerType => rs.getInt(i + 1)
            case LongType => rs.getLong(i + 1)
            case DoubleType => rs.getDouble(i + 1)
            case FloatType => rs.getFloat(i + 1)
            case BooleanType => rs.getBoolean(i + 1)
            case StringType => UTF8String.fromString(rs.getString(i + 1))
            case TimestampType =>
              val t = rs.getTimestamp(i + 1)
              if (t == null) null else t.getTime * 1000L + (t.getNanos / 1000) % 1000
            case d: DecimalType =>
              val b = rs.getBigDecimal(i + 1)
              if (b == null) null
              else org.apache.spark.sql.types.Decimal(b, d.precision, d.scale)
            case other =>
              throw new UnsupportedOperationException(s"jdbc-incrementing: $other")
          }
          row.update(i, if (rs.wasNull()) null else v)
          i += 1
        }
        row
      }

      override def close(): Unit = { rs.close(); conn.close() }
    }
  }
}
