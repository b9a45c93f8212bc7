package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.config.{DataflowConf, AddFieldsConf, ValidateFieldsConf}
import graft.operators.{AddFields, ValidationSplit}
import graft.sinks.Sinks

/** Structured Streaming path — the BASELINE north star the batch-only
  * reference lacks (its Kafka use is a batch producer,
  * `PipelineProcessor.scala:148-156`; no `readStream` anywhere).
  *
  * Design: one `readStream` source → the SAME transform operators as the
  * batch path (AddFields / ValidationSplit are plain `DataFrame =>
  * DataFrame` so they compose into streaming plans unchanged) → a
  * `foreachBatch` fan-out that writes every sink split per micro-batch.
  * `foreachBatch` is the one-scan fan-out: the micro-batch is persisted
  * once and each sink filters it, mirroring the batch runner's cache
  * discipline; checkpointing makes the file sinks effectively exactly-once
  * (idempotent per-batch overwrite by batchId is the standard recipe),
  * Kafka at-least-once like the reference.
  */
object StreamingPipeline {

  /** Kafka source → typed columns. Not exercisable offline (no broker);
    * the code path mirrors the tested file-source path after this
    * projection. */
  def kafkaSource(spark: SparkSession, bootstrapServers: String, topic: String,
                  schema: StructType): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .select(from_json(col("value").cast("string"), schema).as("r"))
      .select(col("r.*"))

  /** File-based streaming source (json/parquet directory). */
  def fileSource(spark: SparkSession, path: String, format: String,
                 schema: StructType): DataFrame =
    spark.readStream.format(format.toLowerCase).schema(schema).load(path)

  /** Streaming dataflow: validation-split fan-out per micro-batch.
    * Returns the started query (caller awaits/stops). */
  def runDataflow(source: DataFrame, conf: DataflowConf,
                  checkpointDir: String,
                  kafkaServer: Option[String] = None): StreamingQuery = {
    val fields = conf.transformations.collect { case a: AddFieldsConf => a.fields }.flatten
    val rules = conf.transformations.collect { case v: ValidateFieldsConf => v.rules }.flatten
    val transformed = AddFields(fields)(source)
    transformed.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val split = ValidationSplit.split(batch, rules)
        try {
          val splits = Map("ok_with_date" -> split.ok, "validation_ko" -> split.ko)
          Sinks.persist(conf.sinks, splits, kafkaServer)
        } finally split.unpersist()
      }
      .start()
  }

  /** Watermarked sliding-window aggregation over an event stream —
    * append-mode-safe (results emitted once the watermark passes). */
  def windowedCounts(events: DataFrame,
                     watermark: String = "10 minutes",
                     window_ : String = "5 minutes",
                     slide: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("total_value"))

  final case class SessionState(count: Long, lastTsUs: Long, totalEvents: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Stateful sessionization via mapGroupsWithState: the streaming
    * equivalent of the batch q19 (30-minute gap). State per user survives
    * across micro-batches; ProcessingTimeTimeout would evict idle users in
    * production (no timeout fires in the synchronous test harness). */
  def sessionize(spark: SparkSession, events: DataFrame,
                 gapUs: Long = 1800L * 1000000L): DataFrame = {
    import spark.implicits._
    val typed = events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Long)]
    typed.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[(Long, Long)], state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L))
          var sessions = prev.count
          var last = prev.lastTsUs
          var total = prev.totalEvents
          rows.map(_._2).toArray.sorted.foreach { ts =>
            if (last == Long.MinValue || ts - last > gapUs) sessions += 1
            last = ts
            total += 1
          }
          state.update(SessionState(sessions, last, total))
          UserSessions(userId, sessions, total)
      }
      .toDF()
  }
}
