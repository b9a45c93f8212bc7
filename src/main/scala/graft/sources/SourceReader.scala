package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.config.SourceConf

/** Multi-source reader (reference `PipelineProcessor.scala:105-113`):
  * each source is a `format` + `path` (globs allowed) loaded through the
  * Spark DataSource API, then all sources are unioned.
  *
  * Deviations from the reference, both scale fixes:
  *   - optional EXPLICIT schema per source (DDL string) — the reference
  *     always infers, which for JSON/CSV is a full extra pass over the
  *     data (`:111` has no `.schema`);
  *   - union is by NAME with missing columns allowed (schema-drifting
  *     JSON sources at 100 TB will not silently mis-bind columns the way
  *     the reference's positional `reduce(_ union _)` does, `:113`).
  *     `UnionMode.Positional` restores reference behavior.
  */
object SourceReader {

  sealed trait UnionMode
  object UnionMode {
    case object ByName extends UnionMode
    case object Positional extends UnionMode
  }

  def readOne(spark: SparkSession, s: SourceConf): DataFrame = {
    val reader = spark.read.format(s.format.toLowerCase)
    s.schema.fold(reader)(ddl => reader.schema(StructType.fromDDL(ddl))).load(s.path)
  }

  def read(spark: SparkSession, sources: Seq[SourceConf],
           mode: UnionMode = UnionMode.ByName): DataFrame = {
    require(sources.nonEmpty, "at least one source required")
    val dfs = sources.map(readOne(spark, _))
    mode match {
      case UnionMode.ByName     => dfs.reduce(_.unionByName(_, allowMissingColumns = true))
      case UnionMode.Positional => dfs.reduce(_ union _)
    }
  }

  /** Malformed-record quarantine for text sources (JSON/CSV): PERMISSIVE
    * read with a corrupt-record column, split into (good rows, quarantined
    * raw records). The reference aborts the whole job on one bad line
    * (schema inference + FAILFAST-equivalent defaults); at 100 TB of
    * accumulated ingest a single truncated record must not kill the run —
    * it must land in a quarantine relation with its raw text for triage.
    *
    * Both splits filter ONE persisted pass (registered in
    * [[graft.Caches]] — caller releases); the persist is also a Spark
    * requirement: a query referencing only the corrupt column is
    * disallowed on the raw lazy relation. Requires an explicit schema —
    * quarantine over an inferred schema is meaningless (inference would
    * adapt to the malformation). */
  def readWithQuarantine(spark: SparkSession, s: SourceConf): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val fmt = s.format.toLowerCase
    require(fmt == "json" || fmt == "csv",
      s"quarantine read supports json/csv, not $fmt (binary formats fail per-file, not per-record)")
    val ddl = s.schema.getOrElse(throw new IllegalArgumentException(
      s"source '${s.name}': quarantine read requires an explicit schema"))
    val corrupt = "_corrupt_record"
    val schema = StructType.fromDDL(ddl)
      .add(corrupt, org.apache.spark.sql.types.StringType)
    val raw = graft.Caches.persist(spark.read.format(fmt)
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .load(s.path))
    val good = raw.filter(col(corrupt).isNull).drop(corrupt)
    val quarantined = raw.filter(col(corrupt).isNotNull)
      .select(col(corrupt).as("raw_record"))
    (good, quarantined)
  }
}
