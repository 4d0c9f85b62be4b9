package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming orchestration (reference:
  * runtime/streaming/base.py:17-175): output modes, the 4-trigger
  * matrix, watermark pass-through, and a source→transform→sink pipeline
  * that either blocks (run) or returns the query handle (startStream).
  */

sealed abstract class OutputMode(val value: String)
object OutputMode {
  case object Append extends OutputMode("append")
  case object Complete extends OutputMode("complete")
  case object Update extends OutputMode("update")
}

/** Trigger config (base.py:25-50); interval validated for the modes that
  * need one.
  */
sealed trait TriggerConfig { def toSpark: Trigger }
object TriggerConfig {
  final case class ProcessingTime(interval: String) extends TriggerConfig {
    require(interval.trim.nonEmpty, "processing-time trigger requires an interval")
    def toSpark: Trigger = Trigger.ProcessingTime(interval)
  }
  case object Once extends TriggerConfig {
    def toSpark: Trigger = Trigger.Once()
  }
  case object AvailableNow extends TriggerConfig {
    def toSpark: Trigger = Trigger.AvailableNow()
  }
  final case class Continuous(interval: String) extends TriggerConfig {
    require(interval.trim.nonEmpty, "continuous trigger requires an interval")
    def toSpark: Trigger = Trigger.Continuous(interval)
  }
}

/** Streaming source abstraction (runtime/streaming/sources.py). Each
  * built-in maps 1:1 to a readStream format; watermark column/delay are
  * applied by the pipeline between read and transform (base.py:147-151).
  */
trait StreamingSource {
  def readStream(spark: SparkSession): DataFrame
  def watermarkColumn: Option[String] = None
  def watermarkDelay: Option[String] = None
}

final case class KafkaStreamingSource(
    bootstrapServers: String,
    topics: String,
    startingOffsets: String = "latest",
    options: Map[String, String] = Map.empty,
    override val watermarkColumn: Option[String] = None,
    override val watermarkDelay: Option[String] = None) extends StreamingSource {
  def readStream(spark: SparkSession): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics)
      .option("startingOffsets", startingOffsets)
      .options(options)
      .load()
}

final case class FileStreamingSource(
    path: String,
    fileFormat: String = "parquet",
    schemaDdl: Option[String] = None,
    options: Map[String, String] = Map.empty,
    override val watermarkColumn: Option[String] = None,
    override val watermarkDelay: Option[String] = None) extends StreamingSource {
  def readStream(spark: SparkSession): DataFrame = {
    val r = spark.readStream.format(fileFormat).options(options)
    schemaDdl.foreach(r.schema)
    r.load(path)
  }
}

final case class DeltaStreamingSource(
    path: String, options: Map[String, String] = Map.empty) extends StreamingSource {
  def readStream(spark: SparkSession): DataFrame =
    spark.readStream.format("delta").options(options).load(path)
}

final case class IcebergStreamingSource(
    table: String, options: Map[String, String] = Map.empty) extends StreamingSource {
  def readStream(spark: SparkSession): DataFrame =
    spark.readStream.format("iceberg").options(options).load(table)
}

/** Synthetic benchmark/test source (sources.py:108-128). */
final case class RateStreamingSource(
    rowsPerSecond: Long = 1, numPartitions: Int = 1) extends StreamingSource {
  def readStream(spark: SparkSession): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .option("numPartitions", numPartitions.toString)
      .load()
}

/** External-connector sources (EventHubs/Kinesis in the reference,
  * sources.py:136-245): representable as format+options pass-throughs;
  * the connector jars are deployment-specific.
  */
final case class ConnectorStreamingSource(
    format: String, options: Map[String, String]) extends StreamingSource {
  def readStream(spark: SparkSession): DataFrame =
    spark.readStream.format(format).options(options).load()
}

/** Azure Event Hubs source (sources.py:136-191) — typed options over
  * the external `eventhubs` connector format.
  */
final case class EventHubsStreamingSource(
    connectionString: String,
    eventHubName: String,
    consumerGroup: String = "$Default",
    startingPosition: String = "latest",
    maxEventsPerTrigger: Option[Long] = None,
    receiverTimeoutSeconds: Option[Int] = None,
    operationTimeoutSeconds: Option[Int] = None) extends StreamingSource {
  def readStream(spark: SparkSession): DataFrame = {
    val base = Map(
      "eventhubs.connectionString" -> connectionString,
      "eventhubs.name" -> eventHubName,
      "eventhubs.consumerGroup" -> consumerGroup,
      "eventhubs.startingPosition" -> startingPosition) ++
      maxEventsPerTrigger.map("maxEventsPerTrigger" -> _.toString) ++
      receiverTimeoutSeconds.map(s => "eventhubs.receiverTimeout" -> s.toString) ++
      operationTimeoutSeconds.map(s => "eventhubs.operationTimeout" -> s.toString)
    ConnectorStreamingSource("eventhubs", base).readStream(spark)
  }
}

/** AWS Kinesis source (sources.py:199-245) — typed options over the
  * external `kinesis` connector format.
  */
final case class KinesisStreamingSource(
    streamName: String,
    region: String,
    startingPosition: String = "latest",
    endpointUrl: Option[String] = None,
    maxFetchRecordsPerShard: Option[Long] = None,
    maxFetchTimePerShardSec: Option[Int] = None) extends StreamingSource {
  def readStream(spark: SparkSession): DataFrame = {
    val base = Map(
      "streamName" -> streamName,
      "region" -> region,
      "startingPosition" -> startingPosition) ++
      endpointUrl.map("endpointUrl" -> _) ++
      maxFetchRecordsPerShard.map("maxFetchRecordsPerShard" -> _.toString) ++
      maxFetchTimePerShardSec.map(s => "maxFetchTimePerShardSec" -> s.toString)
    ConnectorStreamingSource("kinesis", base).readStream(spark)
  }
}

/** Streaming sink abstraction (runtime/streaming/sinks.py). */
trait StreamingSink {
  def writeStream(df: DataFrame): DataStreamWriter[Row]
}

final case class KafkaStreamingSink(
    bootstrapServers: String, topic: String) extends StreamingSink {
  def writeStream(df: DataFrame): DataStreamWriter[Row] =
    df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
}

final case class FileStreamingSink(
    path: String, fileFormat: String = "parquet",
    partitionBy: Seq[String] = Nil) extends StreamingSink {
  def writeStream(df: DataFrame): DataStreamWriter[Row] = {
    val w = df.writeStream.format(fileFormat).option("path", path)
    if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
  }
}

/** Delta Lake sink (sinks.py:41-61); requires the delta connector on
  * the classpath at runtime.
  */
final case class DeltaStreamingSink(
    path: String, partitionBy: Seq[String] = Nil) extends StreamingSink {
  def writeStream(df: DataFrame): DataStreamWriter[Row] = {
    val w = df.writeStream.format("delta").option("path", path)
    if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
  }
}

/** Iceberg table sink (sinks.py:82-103). */
final case class IcebergStreamingSink(
    table: String, partitionBy: Seq[String] = Nil) extends StreamingSink {
  def writeStream(df: DataFrame): DataStreamWriter[Row] = {
    val w = df.writeStream.format("iceberg").option("path", table)
    if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
  }
}

final case class ConsoleStreamingSink(truncate: Boolean = true) extends StreamingSink {
  def writeStream(df: DataFrame): DataStreamWriter[Row] =
    df.writeStream.format("console").option("truncate", truncate.toString)
}

final case class MemoryStreamingSink(queryName: String) extends StreamingSink {
  def writeStream(df: DataFrame): DataStreamWriter[Row] =
    df.writeStream.format("memory").queryName(queryName)
}

/** Cloud-storage sink with format/compression options
  * (sinks.py:136-179); path schemes (s3a/gs/abfss) are transparent to
  * Spark.
  */
final case class CloudStorageStreamingSink(
    path: String, fileFormat: String = "parquet",
    compression: Option[String] = None,
    partitionBy: Seq[String] = Nil,
    options: Map[String, String] = Map.empty) extends StreamingSink {
  private val Allowed = Set("parquet", "json", "csv", "avro", "orc")
  require(Allowed.contains(fileFormat), s"unsupported format $fileFormat")
  def writeStream(df: DataFrame): DataStreamWriter[Row] = {
    var w = df.writeStream.format(fileFormat).option("path", path).options(options)
    compression.foreach(c => w = w.option("compression", c))
    if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
  }
}

/** foreachBatch escape hatch (sinks.py:187-206) — the extension point
  * for MERGE/upsert/multi-sink fan-out.
  */
final case class ForeachBatchSink(
    process: (DataFrame, Long) => Unit) extends StreamingSink {
  def writeStream(df: DataFrame): DataStreamWriter[Row] =
    df.writeStream.foreachBatch(process)
}

/** Per-query lifecycle callbacks (runtime/streaming/hooks.py:13-175).
  * Unlike the reference — which defines the protocol but never wires a
  * listener — StreamingPipeline registers a real StreamingQueryListener
  * scoped to its own query.
  */
trait StreamingHooks {
  def onQueryStart(queryId: String, name: String): Unit = ()
  def onBatchProgress(batchId: Long, numInputRows: Long, durationMs: Long): Unit = ()
  def onQueryTerminated(queryId: String, error: Option[String]): Unit = ()
}
object NoOpStreamingHooks extends StreamingHooks

final class LoggingStreamingHooks extends StreamingHooks {
  private val log = org.slf4j.LoggerFactory.getLogger("graft.streaming")
  override def onQueryStart(id: String, name: String): Unit =
    log.info(s"query $name ($id) started")
  override def onBatchProgress(batchId: Long, rows: Long, ms: Long): Unit =
    log.info(s"batch $batchId: $rows rows in ${ms}ms")
  override def onQueryTerminated(id: String, error: Option[String]): Unit =
    log.info(s"query $id terminated${error.fold("")(e => s" with error: $e")}")
}

final class CompositeStreamingHooks(hooks: Seq[StreamingHooks]) extends StreamingHooks {
  private def each(f: StreamingHooks => Unit): Unit =
    hooks.foreach(h => try f(h) catch { case _: Throwable => () })
  override def onQueryStart(id: String, name: String): Unit = each(_.onQueryStart(id, name))
  override def onBatchProgress(b: Long, r: Long, d: Long): Unit = each(_.onBatchProgress(b, r, d))
  override def onQueryTerminated(id: String, e: Option[String]): Unit = each(_.onQueryTerminated(id, e))
}

/** Source → watermark → transform → sink assembly (base.py:96-175). */
final class StreamingPipeline(
    source: StreamingSource,
    sink: StreamingSink,
    transform: DataFrame => DataFrame = identity,
    outputMode: OutputMode = OutputMode.Append,
    trigger: TriggerConfig = TriggerConfig.ProcessingTime("10 seconds"),
    checkpointLocation: Option[String] = None,
    queryName: Option[String] = None,
    hooks: StreamingHooks = NoOpStreamingHooks) {

  /** Hook-forwarding StreamingQueryListener. Scoped to ONE query by the
    * id captured from `writer.start()` (never by name — a name match
    * could latch onto a foreign query on a shared session), and
    * self-deregistering on termination so restarts don't stack
    * listeners.
    */
  private final class HookListener
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    @volatile private[streaming] var myId: Option[java.util.UUID] = None
    @volatile private[streaming] var owner: SparkSession = _
    // onQueryStarted fires synchronously inside writer.start(), before the
    // caller can know the id — so onQueryStart is invoked from
    // startStream() with the returned handle, not from here.
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit =
      if (myId.contains(e.progress.id)) {
        val totalMs = scala.jdk.CollectionConverters
          .CollectionHasAsScala(e.progress.durationMs.values).asScala
          .map(_.toLong).sum
        hooks.onBatchProgress(e.progress.batchId, e.progress.numInputRows, totalMs)
      }
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
      if (myId.contains(e.id)) {
        hooks.onQueryTerminated(e.id.toString, e.exception)
        if (owner != null) owner.streams.removeListener(this)
      }
  }

  /** Start and return the query handle (base.py:143-175). */
  def startStream(spark: SparkSession): StreamingQuery = {
    val listener =
      if (hooks != NoOpStreamingHooks) {
        val l = new HookListener
        l.owner = spark
        spark.streams.addListener(l)
        Some(l)
      } else None
    val raw = source.readStream(spark)
    val watermarked = (source.watermarkColumn, source.watermarkDelay) match {
      case (Some(c), Some(d)) => raw.withWatermark(c, d)
      case _ => raw
    }
    val transformed = transform(watermarked)
    var writer = sink.writeStream(transformed)
      .outputMode(outputMode.value)
      .trigger(trigger.toSpark)
    checkpointLocation.foreach(cp => writer = writer.option("checkpointLocation", cp))
    queryName.foreach(n => writer = writer.queryName(n))
    val query = writer.start()
    listener.foreach { l =>
      l.myId = Some(query.id)
      hooks.onQueryStart(query.id.toString, String.valueOf(query.name))
    }
    query
  }

  /** Blocking run (base.py:138-141). */
  def run(spark: SparkSession): Unit = startStream(spark).awaitTermination()
}
