package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SemiStructuredSpec extends SparkSpec {
  import spark.implicits._

  test("malformed / missing / null payloads become NULL fields, not job kills") {
    // the synthetic corpus is all well-formed, so the PERMISSIVE
    // contract the scaladoc claims is pinned here with planted rows
    val df = Seq(
      ("click", """{"k": 3}"""),
      ("click", """{"k": 5}"""),
      ("click", "not json"),
      ("view", """{"other": 1}"""),
      ("view", null)
    ).toDF("event_type", "props")
    val got = df.select($"event_type",
        from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"), count($"k").as("n_with_k"))
      .as[(String, Long, Long)].collect()
      .map { case (t, a, b) => t -> ((a, b)) }.toMap
    assert(got("click") == ((3L, 2L)), "corrupt row counted, field null")
    assert(got("view") == ((2L, 0L)), "missing key and null payload both null")
  }

  test("one-parse promotion equals the per-field get_json_object plan") {
    val ev = graft.sources.Tables.events(spark, sf())
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"), count($"k").as("n_with_k"),
        sum($"k").cast("long").as("sum_k"), min($"k").as("min_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")
    val viaGet = agg(ev.select($"event_type",
      get_json_object($"props", "$.k").cast("int").as("k")))
    assert(SemiStructured.evJsonExtract(spark, sf()).collect().toSeq ==
      viaGet.collect().toSeq)
  }
}
