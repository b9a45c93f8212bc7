package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import graft.config.MetadataReader
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming behavior driven synchronously: file sources stand in for the
  * Kafka topic (no broker offline); the transform/fan-out code is shared
  * with the batch path. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDir: String = {
    // readStream wants a directory — stage the events parquet into one
    val dir = Files.createTempDirectory("graft_stream_events_").toString
    Tables.events(spark, sf()).write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming dataflow: validation fan-out lands OK/KO per micro-batch") {
    val in = Files.createTempDirectory("graft_stream_in_").toString
    val out = Files.createTempDirectory("graft_stream_out_").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt_").toString
    Files.writeString(java.nio.file.Paths.get(s"$in/batch1.json"),
      """{"name":"Xabier","age":39,"office":""}
        |{"name":"Miguel","office":"RIO"}
        |{"name":"Fran","age":31,"office":"RIO"}
        |""".stripMargin)
    val conf = MetadataReader.parse(s"""{
      "dataflows": [{
        "name": "stream-flow",
        "sources": [{"name": "in", "path": "$in", "format": "json",
                     "schema": "name STRING, age BIGINT, office STRING"}],
        "transformations": [
          {"name": "validation", "type": "validate_fields",
           "params": {"validations": [
             {"field": "office", "validations": ["notEmpty"]},
             {"field": "age", "validations": ["notNull"]}]}},
          {"name": "stamp", "type": "add_fields",
           "params": {"addFields": [{"name": "dt", "function": "current_timestamp"}]}}
        ],
        "sinks": [
          {"input": "ok_with_date", "name": "ok", "paths": ["$out/ok"],
           "format": "json", "saveMode": "append"},
          {"input": "validation_ko", "name": "ko", "paths": ["$out/ko"],
           "format": "json", "saveMode": "append"}
        ]
      }]}""").dataflows.head
    val source = StreamingPipeline.fileSource(spark, in, "json",
      org.apache.spark.sql.types.StructType.fromDDL("name STRING, age BIGINT, office STRING"))
    val q = StreamingPipeline.runDataflow(source, conf, ckpt)
    q.processAllAvailable()
    // second micro-batch arrives
    Files.writeString(java.nio.file.Paths.get(s"$in/batch2.json"),
      """{"name":"Ana","age":28,"office":"LIS"}""" + "\n")
    q.processAllAvailable()
    q.stop()
    val ok = spark.read.json(s"$out/ok/ok")
    assert(ok.select("name").as[String].collect().toSet == Set("Fran", "Ana"))
    assert(ok.columns.contains("dt"))
    val ko = spark.read.json(s"$out/ko/ko")
    assert(ko.select("name").as[String].collect().toSet == Set("Xabier", "Miguel"))
  }

  test("watermarked windowed aggregation matches the batch computation") {
    val dir = eventsDir
    val stream = spark.readStream.schema(Tables.events(spark, sf()).schema).parquet(dir)
    val agg = StreamingPipeline.windowedCounts(stream, watermark = "0 seconds",
      window_ = "1 hour", slide = "1 hour")
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("win_counts").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("win_counts")
      .groupBy().agg(sum("n")).as[Long].head()
    // append mode holds back windows the watermark hasn't passed — the
    // final (max-ts) window stays open, so emitted count ≤ total and
    // covers all closed windows
    val total = Tables.events(spark, sf()).count()
    assert(got > 0 && got <= total)
    // per-window values match the batch groupBy for emitted windows
    val batch = Tables.events(spark, sf())
      .groupBy(date_trunc("hour", col("ts")).as("w_start"), col("event_type"))
      .agg(count(lit(1)).as("n_batch"))
    val joined = spark.table("win_counts").join(batch, Seq("w_start", "event_type"))
    assert(joined.filter(col("n") =!= col("n_batch")).count() == 0)
  }

  test("stateful sessionization equals the batch q19 result") {
    val dir = eventsDir
    val stream = spark.readStream.schema(Tables.events(spark, sf()).schema).parquet(dir)
    val sessions = StreamingPipeline.sessionize(spark, stream)
    val q = sessions.writeStream.outputMode("update").format("memory")
      .queryName("sessions").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // last update per user is the final state
    val got = spark.table("sessions")
      .groupBy("user_id").agg(max("n_sessions").as("gs"), max("n_events").as("ge"))
    val batch = graft.operators.Relational.q19UserSessions(spark, sf())
    val diff = got.join(batch, "user_id")
      .filter(col("gs") =!= col("n_sessions") || col("ge") =!= col("n_events"))
    assert(batch.count() == got.count())
    assert(diff.count() == 0)
  }

  test("kafka payload projection keeps the reference shape") {
    val payload = graft.sinks.Sinks.kafkaPayload(Tables.region(spark, sf()))
    assert(payload.columns.toSeq == Seq("value"))
    val v = payload.orderBy("value").as[String].head()
    assert(v.startsWith("""{"r_regionkey":"""))
  }
}
