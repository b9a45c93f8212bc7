package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config._
import graft.sinks.Sinks
import graft.sources.{SourceReader, Tables}

/** SURVEY §2 parity operators exposed as oracled queries over the driver's
  * test tables: file scan (S1), multi-source union (S2), add_fields (P1),
  * Kafka payload projection (P2), validation split (F1–F5), file sink (K1).
  * Each runs through the REAL pipeline operator implementations
  * (SourceReader / AddFields / ValidationSplit / Sinks), not ad-hoc
  * re-implementations, so the correctness gate covers the production code
  * paths.
  */
object Parity {

  /** S1 — format-generic file scan with explicit schema, projection and
    * filter pushed to the parquet reader (reference scan:
    * `PipelineProcessor.scala:111`, schema always inferred there). */
  def s1ScanPruneFilter(spark: SparkSession, dir: String): DataFrame = {
    val src = SourceConf("lineitem", s"$dir/lineitem.parquet", "parquet",
      Some(Tables.lineitemSchema.toDDL))
    SourceReader.readOne(spark, src)
      .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val s1Sql: String = """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
    ORDER BY l_orderkey, l_linenumber"""

  /** S2 — multi-source union. Deviation from the reference's positional
    * `reduce(_ union _)` (`PipelineProcessor.scala:113`): by-name union
    * with missing columns null-filled, the safe semantics for
    * schema-drifting sources (SURVEY §2.1 S2). */
  def s2UnionByName(spark: SparkSession, dir: String): DataFrame = {
    val sources = Seq(
      SourceConf("customer", s"$dir/customer.parquet", "parquet", Some(Tables.customerSchema.toDDL)),
      SourceConf("supplier", s"$dir/supplier.parquet", "parquet", Some(Tables.supplierSchema.toDDL)))
    SourceReader.read(spark, sources, SourceReader.UnionMode.ByName)
      .orderBy(col("c_custkey").asc_nulls_last, col("s_suppkey").asc_nulls_last)
  }

  val s2Sql: String = """
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           NULL::BIGINT AS s_suppkey, NULL::VARCHAR AS s_name,
           NULL::INTEGER AS s_nationkey, NULL::DOUBLE AS s_acctbal
    FROM customer
    UNION ALL
    SELECT NULL, NULL, NULL, NULL, NULL, s_suppkey, s_name, s_nationkey, s_acctbal
    FROM supplier
    ORDER BY c_custkey NULLS LAST, s_suppkey NULLS LAST"""

  /** Fixed absolute path for the quarantine gate's mixed fixture: the
    * oracle SQL is a static string, so the path must be known at compile
    * time, shared between the Spark read and DuckDB's `read_csv`. */
  val QuarantineFixturePath = "/tmp/graft_fixtures/quarantine_mixed.csv"
  val QuarantineSchemaDdl = "id BIGINT, name STRING, val DOUBLE"

  /** Deterministic mixed clean/corrupt CSV: 80 clean rows and 20 corrupt
    * lines (every 5th), cycling the four malformation arms a 100 TB
    * ingest actually sees — unparseable key, missing column, bad
    * numeric, extra column. Rewritten (same bytes) on every call so the
    * gate never compares against a stale fixture. CSV rather than JSON:
    * DuckDB's `read_csv` is core (no extension-load risk in the
    * driver's offline sandbox) and its `ignore_errors` skip set matches
    * Spark's PERMISSIVE corrupt set on these arms, which the gate
    * hash-proves. */
  def writeQuarantineFixture(): Unit = {
    val lines = (0 until 100).map { i =>
      if (i % 5 == 4) (i / 5) % 4 match {
        case 0 => s"bad$i,doc_$i,1.5"
        case 1 => s"$i,doc_$i"
        case 2 => s"$i,doc_$i,notadouble"
        case 3 => s"$i,doc_$i,1.0,extra"
      }
      else s"$i,doc_$i,${i * 0.25}"
    }
    val p = java.nio.file.Paths.get(QuarantineFixturePath)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, lines.mkString("", "\n", "\n"))
  }

  /** S3b — malformed-record quarantine gate: the clean split of the
    * mixed fixture through the production [[SourceReader.readWithQuarantine]]
    * PERMISSIVE read. The oracle reads the same file with DuckDB
    * `read_csv(..., ignore_errors := true)` — hash-equality proves the
    * two engines agree on which records are clean. The quarantine-side
    * count (20) is asserted in `PipelineRunnerSpec`. */
  def s3QuarantineSplit(spark: SparkSession, dir: String): DataFrame = {
    writeQuarantineFixture()
    val src = SourceConf("mixed", QuarantineFixturePath, "csv",
      Some(QuarantineSchemaDdl))
    val (good, _) = SourceReader.readWithQuarantine(spark, src)
    good.orderBy(col("id"))
  }

  val s3Sql: String = s"""
    SELECT id, name, val
    FROM read_csv('$QuarantineFixturePath',
      columns = {'id': 'BIGINT', 'name': 'VARCHAR', 'val': 'DOUBLE'},
      header = false, ignore_errors = true)
    ORDER BY id"""

  /** P1 — add_fields: computed columns from Spark SQL expression strings,
    * run through the production AddFields operator (reference
    * `PipelineProcessor.scala:89-103`). */
  def p1AddFields(spark: SparkSession, dir: String): DataFrame = {
    val fields = Seq(
      FieldDef("order_year", "year(o_orderdate)"),
      FieldDef("priority_class", "substring(o_orderpriority, 1, 1)"),
      FieldDef("is_big", "o_totalprice > 300000.0"),
      FieldDef("key_mod", "pmod(o_orderkey, 7)"))
    AddFields(fields)(Tables.orders(spark, dir)).orderBy(col("o_orderkey"))
  }

  val p1Sql: String = """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
           o_orderpriority,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           substring(o_orderpriority, 1, 1) AS priority_class,
           o_totalprice > 300000.0 AS is_big,
           o_orderkey % 7 AS key_mod
    FROM orders ORDER BY o_orderkey"""

  /** P2 — Kafka payload projection `to_json(struct(*)) as value`
    * (reference `PipelineProcessor.scala:150`), via the production sink
    * code. No broker offline — the payload DataFrame IS the testable part. */
  def p2KafkaPayload(spark: SparkSession, dir: String): DataFrame =
    Sinks.kafkaPayload(Tables.customer(spark, dir)).orderBy(col("value"))

  val p2Sql: String = """
    SELECT CAST(to_json(struct_pack(
             c_custkey := c_custkey, c_name := c_name, c_nationkey := c_nationkey,
             c_acctbal := c_acctbal, c_mktsegment := c_mktsegment)) AS VARCHAR) AS value
    FROM customer ORDER BY value"""

  private val documentRules = Seq(
    FieldRules("text", Seq(NotEmpty, MinLength(150))),
    FieldRules("lang", Seq(NotNull)),
    FieldRules("source", Seq(MatchesRegex("^src[0-9]+$"))))

  private val docRulesSqlOk =
    "text <> '' AND length(text) >= 150 AND lang IS NOT NULL AND regexp_matches(source, '^src[0-9]+$')"

  /** F1–F5 — validation split, OK side (null-safe semantics, single-pass;
    * reference `PipelineProcessor.scala:44-87`). */
  def fValidateOk(spark: SparkSession, dir: String): DataFrame = {
    val s = ValidationSplit.split(Tables.documents(spark, dir), documentRules, persist = false)
    s.ok.select(col("doc_id"), col("lang"), col("n_chars")).orderBy(col("doc_id"))
  }

  val fValidateOkSql: String = s"""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE $docRulesSqlOk ORDER BY doc_id"""

  /** KO side with the per-row error codes (joined to one string for a
    * compare-stable column; array order = rule declaration order). */
  def fValidateKo(spark: SparkSession, dir: String): DataFrame = {
    val s = ValidationSplit.split(Tables.documents(spark, dir), documentRules, persist = false)
    s.ko.select(col("doc_id"),
        concat_ws(",", col(ValidationSplit.ErrorCol)).as("errors"))
      .orderBy(col("doc_id"))
  }

  val fValidateKoSql: String = """
    SELECT doc_id,
           concat_ws(',',
             CASE WHEN NOT coalesce(text <> '', false) THEN 'text-notEmpty' END,
             CASE WHEN NOT coalesce(length(text) >= 150, false) THEN 'text-minLength' END,
             CASE WHEN lang IS NULL THEN 'lang-notNull' END,
             CASE WHEN NOT coalesce(regexp_matches(source, '^src[0-9]+$'), false) THEN 'source-matchesRegex' END
           ) AS errors
    FROM documents
    WHERE NOT (coalesce(text <> '', false) AND coalesce(length(text) >= 150, false)
               AND lang IS NOT NULL AND coalesce(regexp_matches(source, '^src[0-9]+$'), false))
    ORDER BY doc_id"""

  /** One JVM-wide scratch dir, reused (overwrite mode) by every
    * round-trip call and removed on JVM exit — a fresh temp dir per call
    * would litter a long-lived cluster driver. */
  private lazy val sinkScratch: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_sink_")
    sys.addShutdownHook(org.apache.commons.io.FileUtils.deleteQuietly(d.toFile))
    d.toString
  }

  /** K1 — file sink round-trip: write a projection through the production
    * multi-path file sink, read it back (reference `:122-128`). */
  def k1FileSinkRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = sinkScratch
    val df = Tables.nation(spark, dir)
    val sink = SinkConf("ok_with_date", "nation_copy", Seq(out), "parquet", "overwrite")
    Sinks.persist(Seq(sink), Map("ok_with_date" -> df), kafkaServer = None)
    spark.read.schema(Tables.nationSchema).parquet(s"$out/nation_copy")
      .orderBy(col("n_nationkey"))
  }

  val k1Sql: String =
    "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"
}
