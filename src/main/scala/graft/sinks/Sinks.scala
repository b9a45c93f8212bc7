package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, struct, to_json}
import graft.config.SinkConf

/** File + Kafka sinks (reference `PipelineProcessor.scala:115-156`).
  *
  * Routing is by the sink's `input` name against a map of NAMED splits —
  * exhaustive with a descriptive error (the reference `MatchError`s on
  * anything but `ok_with_date`/`validation_ko`, `:120-144`).
  *
  * Scale posture: an optional `repartition` before write (the reference
  * writes whatever partitioning the plan yields — at 100 TB that is
  * either millions of small files or a handful of giant ones).
  */
object Sinks {

  /** Kafka payload projection (reference `:150`): all columns packed into
    * one JSON string column `value` — the exact shape the `kafka`
    * DataSource requires. */
  def kafkaPayload(df: DataFrame): DataFrame =
    df.select(to_json(struct(col("*"))).as("value"))

  /** Write `df` to every configured path (reference `:122-128`).
    * `sink.partitionBy` lays the output out hive-style
    * (`col=value/...`): at 100 TB, readers filtering on the partition
    * column scan ONLY matching directories (partition pruning — the
    * single biggest read-cost lever for time- or source-partitioned
    * corpora). When partitioning, repartition by the same columns first
    * so each partition directory is written by the tasks owning its
    * rows — otherwise every task writes a file into every directory
    * (tasks × partitions small files). */
  def writeFiles(df: DataFrame, sink: SinkConf, repartition: Option[Int] = None,
                 batchSubdir: Option[Long] = None): Unit = {
    val out =
      if (sink.partitionBy.nonEmpty)
        repartition.fold(df.repartition(sink.partitionBy.map(col): _*))(
          n => df.repartition(n, sink.partitionBy.map(col): _*))
      else repartition.fold(df)(df.repartition(_))
    sink.paths.foreach { path =>
      // streaming fan-out: each micro-batch owns a batch=<id> subdir and
      // OVERWRITES it, so a crash-replayed batch rewrites its own output
      // instead of duplicating (append) or wiping prior batches
      // (overwrite) — the idempotent per-batch recipe. Batch mode writes
      // the flat reference layout with the configured save mode.
      val target = batchSubdir.fold(s"$path/${sink.name}")(
        b => s"$path/${sink.name}/batch=$b")
      val mode = if (batchSubdir.isDefined) "overwrite" else sink.saveMode
      val w = out.write.mode(mode).format(sink.format.toLowerCase)
      (if (sink.partitionBy.nonEmpty) w.partitionBy(sink.partitionBy: _*) else w)
        .save(target)
    }
  }

  /** Batch Kafka publish (reference `:148-156`). Topic defaults follow the
    * reference's hardcoded `pipeline-ok`/`pipeline-ko` unless the sink
    * overrides. Not exercised in the offline test env (no broker); the
    * payload projection is what gets unit-tested. */
  def publishKafka(df: DataFrame, bootstrapServers: String, topic: String): Unit =
    kafkaPayload(df).write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .save()

  /** Route every sink to its named split; file paths always, Kafka when a
    * broker is configured. */
  def persist(sinks: Seq[SinkConf], splits: Map[String, DataFrame],
              kafkaServer: Option[String],
              defaultTopics: Map[String, String] = Map(
                "ok_with_date" -> "pipeline-ok", "validation_ko" -> "pipeline-ko"),
              repartition: Option[Int] = None,
              batchSubdir: Option[Long] = None): Unit =
    sinks.foreach { sink =>
      val df = splits.getOrElse(sink.input, throw new IllegalArgumentException(
        s"sink '${sink.name}' references unknown input '${sink.input}' " +
        s"(available: ${splits.keys.mkString(", ")})"))
      // a topic-only sink with no broker configured would write nowhere
      // and raise nothing — the data silently vanishes; fail fast instead
      if (sink.paths.isEmpty && kafkaServer.isEmpty)
        throw new IllegalArgumentException(
          s"sink '${sink.name}' has no file paths and no Kafka server is " +
          "configured — its output would be silently dropped")
      writeFiles(df, sink, repartition, batchSubdir)
      kafkaServer.foreach { ks =>
        val topic = sink.topic.orElse(defaultTopics.get(sink.input))
          .getOrElse(throw new IllegalArgumentException(
            s"sink '${sink.name}': no Kafka topic configured for input '${sink.input}'"))
        publishKafka(df, ks, topic)
      }
    }
}
