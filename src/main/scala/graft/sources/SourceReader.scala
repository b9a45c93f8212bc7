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
}
