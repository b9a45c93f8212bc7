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
  def writeFiles(df: DataFrame, sink: SinkConf, repartition: Option[Int] = None): Unit = {
    val out =
      if (sink.partitionBy.nonEmpty)
        repartition.fold(df.repartition(sink.partitionBy.map(col): _*))(
          n => df.repartition(n, sink.partitionBy.map(col): _*))
      else repartition.fold(df)(df.repartition(_))
    sink.paths.foreach { path =>
      val w = out.write.mode(sink.saveMode).format(sink.format.toLowerCase)
      (if (sink.partitionBy.nonEmpty) w.partitionBy(sink.partitionBy: _*) else w)
        .save(s"$path/${sink.name}")
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
              repartition: Option[Int] = None): Unit =
    sinks.foreach { sink =>
      val df = splits.getOrElse(sink.input, throw new IllegalArgumentException(
        s"sink '${sink.name}' references unknown input '${sink.input}' " +
        s"(available: ${splits.keys.mkString(", ")})"))
      writeFiles(df, sink, repartition)
      kafkaServer.foreach { ks =>
        val topic = sink.topic.orElse(defaultTopics.get(sink.input))
          .getOrElse(throw new IllegalArgumentException(
            s"sink '${sink.name}': no Kafka topic configured for input '${sink.input}'"))
        publishKafka(df, ks, topic)
      }
    }
}
