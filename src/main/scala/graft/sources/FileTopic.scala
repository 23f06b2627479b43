package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** "File-topic": a DataSource V2 micro-batch source/sink that serves the
  * EXACT Kafka record envelope ([[Kafka.envelopeSchema]]) from local JSONL
  * segment files — so the full
  * `readStream.format("file-topic").load() → decode → sink` path executes
  * through a REAL provider lookup (registered via `DataSourceRegister` +
  * META-INF/services, the same registry `format("kafka")` resolves
  * through). The Kafka connector jar is absent from this environment; this
  * provider exercises every seam around it (lookup, fixed source schema,
  * offset tracking, admission control, streaming write) with identical
  * downstream column logic.
  *
  * Topic model: a directory of `<topic>-<partition>[.segment].jsonl` files;
  * each line is one record `{"key": s|null, "value": s, "timestamp": ms,
  * "headers": [{"key": k, "value": v}]}` (text payloads; binary columns are
  * the UTF-8 bytes). Files are append-only logs: the stream offset is the
  * per-file line count, so appended lines become the next micro-batch,
  * replayable from the checkpoint like any DSv2 offset. Emitted record
  * offsets are `segment_index << 32 | line`, unique and monotone per
  * (topic, partition) across segment files — Kafka's per-partition offset
  * contract — provided segment names sort in append order (the epoch-named
  * sink guarantees this; hand-written fixtures should too).
  *
  * Options: `path` (required), `maxOffsetsPerTrigger` (admission control,
  * name-compatible with the Kafka source), write side also `topic` and
  * `numPartitions` (key-hash partitioner, null keys → partition 0).
  */
class FileTopicSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "file-topic"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Kafka.envelopeSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FileTopicTable(properties)
}

private[sources] object FileTopic {
  def dir(options: java.util.Map[String, String]): Path = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "file-topic requires .option(\"path\", dir)")
    Paths.get(p)
  }

  /** `<topic>-<partition>` from a segment filename (before the first '.',
    * partition after the last '-').
    */
  def topicPartition(fileName: String): (String, Int) = {
    val stem = fileName.takeWhile(_ != '.')
    val cut = stem.lastIndexOf('-')
    require(cut > 0 && cut < stem.length - 1, s"not a <topic>-<partition> segment: $fileName")
    (stem.substring(0, cut), stem.substring(cut + 1).toInt)
  }

  def segments(dir: Path): Seq[Path] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      // Files.list holds an open DirectoryStream until closed — exhausting
      // the iterator does NOT release it, and this runs on every trigger
      val s = Files.list(dir)
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".jsonl"))
        .toSeq.sortBy(_.getFileName.toString)
      finally s.close()
    }
}

private[sources] class FileTopicTable(props: util.Map[String, String])
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"file-topic(${props.get("path")})"
  override def schema(): StructType = Kafka.envelopeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = Kafka.envelopeSchema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new FileTopicStream(FileTopic.dir(options),
          options.getLong("maxOffsetsPerTrigger", Long.MaxValue))
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new FileTopicWrite(info.schema(), props)
    }
}

/** Offset = line count per segment file, JSON-stable (sorted keys). */
private[sources] case class FileLinesOffset(lines: Map[String, Long]) extends Offset {
  override def json(): String =
    lines.toSeq.sortBy(_._1)
      .map { case (f, n) => s"${FileLinesOffset.quote(f)}:$n" }
      .mkString("{\"files\":{", ",", "}}")
}

private[sources] object FileLinesOffset {
  def quote(s: String): String = {
    val m = new ObjectMapper
    m.writeValueAsString(m.getNodeFactory.textNode(s))
  }
  def fromJson(s: String): FileLinesOffset = {
    val node = new ObjectMapper().readTree(s).get("files")
    require(node != null, s"bad file-topic offset: $s")
    FileLinesOffset(node.properties().asScala
      .map(e => e.getKey -> e.getValue.asLong()).toMap)
  }
}

private[sources] class FileTopicStream(dir: Path, maxOffsetsPerTrigger: Long)
    extends MicroBatchStream {

  override def initialOffset(): Offset = FileLinesOffset(Map.empty)

  /** High-water mark of offsets handed out (see JdbcIncMicroBatchStream:
    * latestOffset must advance past what was already served, not what was
    * committed, or a rate-capped stream re-serves its last window).
    */
  @volatile private var served: Map[String, Long] = Map.empty
  private def bump(o: FileLinesOffset): Unit = synchronized {
    served = (served.keySet ++ o.lines.keySet).map { f =>
      f -> math.max(served.getOrElse(f, 0L), o.lines.getOrElse(f, 0L))
    }.toMap
  }

  override def latestOffset(): Offset = {
    val counts = FileTopic.segments(dir).map { p =>
      val s = Files.lines(p)
      try p.getFileName.toString -> s.count() finally s.close()
    }
    // admission control: grant at most maxOffsetsPerTrigger new lines,
    // filename order (the analogue of Kafka's maxOffsetsPerTrigger)
    var budget = maxOffsetsPerTrigger
    val granted = counts.map { case (f, n) =>
      val from = served.getOrElse(f, 0L)
      val take = math.min(math.max(n - from, 0L), budget)
      budget -= take
      f -> (from + take)
    }.toMap
    val o = FileLinesOffset(granted)
    bump(o)
    o
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FileLinesOffset].lines
    val e = end.asInstanceOf[FileLinesOffset]
    bump(e)
    // record offsets must be unique+monotone per (topic, partition) ACROSS
    // segment files (Kafka's contract) — base = segment index << 32, so a
    // second epoch's file continues the sequence instead of restarting at 0.
    // Segment names must sort in append order (the epoch-named sink
    // guarantees it); indices derive from the offset's own file set, so a
    // checkpoint replay reproduces identical offsets.
    val segIndex: Map[String, Long] = e.lines.keys.toSeq.sorted
      .groupBy(f => FileTopic.topicPartition(f))
      .values.flatMap(_.zipWithIndex.map { case (f, i) => f -> i.toLong })
      .toMap
    e.lines.toSeq.sortBy(_._1).flatMap { case (f, hi) =>
      val lo = s.getOrElse(f, 0L)
      if (hi <= lo) None
      else {
        val (topic, part) = FileTopic.topicPartition(f)
        Some(FileTopicPartition(dir.resolve(f).toString, topic, part, lo, hi,
          segIndex(f) << 32): InputPartition)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new FileTopicReaderFactory
  override def deserializeOffset(json: String): Offset = {
    val o = FileLinesOffset.fromJson(json)
    bump(o)
    o
  }
  override def commit(end: Offset): Unit = bump(end.asInstanceOf[FileLinesOffset])
  override def stop(): Unit = ()
}

private[sources] case class FileTopicPartition(file: String, topic: String,
    partition: Int, startLine: Long, endLine: Long,
    baseOffset: Long) extends InputPartition

private[sources] class FileTopicReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FileTopicPartition]
    new PartitionReader[InternalRow] {
      private val mapper = new ObjectMapper
      private val reader = Files.newBufferedReader(Paths.get(p.file), UTF_8)
      private var line: String = _
      private var lineNo: Long = {
        var skipped = 0L
        while (skipped < p.startLine && reader.readLine() != null) skipped += 1
        p.startLine
      }

      override def next(): Boolean = {
        if (lineNo >= p.endLine) return false
        line = reader.readLine()
        line != null
      }

      override def get(): InternalRow = {
        val node = mapper.readTree(line)
        def bytes(field: String): Array[Byte] = {
          val v = node.get(field)
          if (v == null || v.isNull) null else v.asText().getBytes(UTF_8)
        }
        val headers = node.get("headers") match {
          case null => null
          case hs if hs.isNull => null
          case hs => new GenericArrayData(hs.elements().asScala.map { h =>
            new GenericInternalRow(Array[Any](
              UTF8String.fromString(h.get("key").asText()),
              h.get("value").asText().getBytes(UTF_8)))
          }.toArray[Any])
        }
        val tsMs = if (node.has("timestamp")) node.get("timestamp").asLong() else 0L
        val row = new GenericInternalRow(Array[Any](
          bytes("key"), bytes("value"),
          UTF8String.fromString(p.topic), p.partition, p.baseOffset + lineNo,
          tsMs * 1000L, 0, headers))
        lineNo += 1
        row
      }

      override def close(): Unit = reader.close()
    }
  }
}

// ---- write side ----

private[sources] class FileTopicWrite(schema: StructType, props: util.Map[String, String])
    extends Write {
  override def toStreaming: StreamingWrite = {
    val topic = props.get("topic")
    require(topic != null && topic.nonEmpty && !topic.contains('.') && !topic.contains('/'),
      "file-topic sink requires .option(\"topic\", name) (no '.' or '/')")
    new FileTopicStreamingWrite(FileTopic.dir(props).toString, topic,
      math.max(1, Option(props.get("numPartitions")).map(_.toInt).getOrElse(1)), schema)
  }
}

private[sources] class FileTopicStreamingWrite(dir: String, topic: String,
    numPartitions: Int, schema: StructType) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new FileTopicWriterFactory(dir, topic, numPartitions, schema)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] case object FileTopicCommitted extends WriterCommitMessage

private[sources] class FileTopicWriterFactory(dir: String, topic: String,
    numPartitions: Int, schema: StructType) extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val mapper = new ObjectMapper
      private val buffers = scala.collection.mutable.Map.empty[Int, StringBuilder]
      private def idx(name: String): Int = schema.fieldNames.indexOf(name)
      private val (ki, vi, hi, ti) = (idx("key"), idx("value"), idx("headers"), idx("timestamp"))
      require(vi >= 0, s"file-topic sink needs a 'value' column, got ${schema.simpleString}")

      private def str(row: InternalRow, i: Int): String =
        if (i < 0 || row.isNullAt(i)) null
        else schema(i).dataType match {
          case BinaryType => new String(row.getBinary(i), UTF_8)
          case StringType => row.getUTF8String(i).toString
          case other => throw new UnsupportedOperationException(
            s"file-topic sink: ${schema(i).name} must be STRING or BINARY, got $other")
        }

      override def write(row: InternalRow): Unit = {
        val key = str(row, ki)
        // Kafka's sticky/default partitioner is key-hash; null keys pin to 0
        // here (determinism beats round-robin for a replayable fixture)
        val part = if (key == null) 0
          else math.floorMod(util.Arrays.hashCode(key.getBytes(UTF_8)), numPartitions)
        val node = mapper.createObjectNode()
        if (key == null) node.putNull("key") else node.put("key", key)
        node.put("value", str(row, vi))
        if (ti >= 0 && !row.isNullAt(ti)) node.put("timestamp", row.getLong(ti) / 1000L)
        if (hi >= 0 && !row.isNullAt(hi)) {
          val arr = node.putArray("headers")
          val hs = row.getArray(hi)
          (0 until hs.numElements()).foreach { j =>
            val h = hs.getStruct(j, 2)
            val o = arr.addObject()
            o.put("key", h.getUTF8String(0).toString)
            o.put("value", new String(h.getBinary(1), UTF_8))
          }
        }
        buffers.getOrElseUpdate(part, new StringBuilder)
          .append(mapper.writeValueAsString(node)).append('\n')
      }

      /** One segment per (epoch, task, partition); the deterministic name
        * makes task retries idempotent (same file, same content).
        */
      override def commit(): WriterCommitMessage = {
        buffers.foreach { case (part, sb) =>
          val target = Paths.get(dir, s"$topic-$part.e${epochId}t$taskId.jsonl")
          val tmp = Paths.get(dir, s".$topic-$part.e${epochId}t$taskId.tmp")
          Files.createDirectories(target.getParent)
          Files.write(tmp, sb.toString.getBytes(UTF_8))
          Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
            StandardCopyOption.ATOMIC_MOVE)
        }
        FileTopicCommitted
      }

      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
