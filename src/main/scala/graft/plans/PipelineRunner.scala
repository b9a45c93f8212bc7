package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.config._
import graft.operators.{AddFields, ValidationSplit}
import graft.sinks.Sinks
import graft.sources.SourceReader

/** Batch dataflow runner — the reference's `process()` loop
  * (`PipelineProcessor.scala:13-42`) as a pure plan-builder plus one
  * persist step per dataflow.
  *
  * Observable-behavior parity (SURVEY §3.2): `add_fields` is applied to
  * the raw source union BEFORE validation regardless of declaration order
  * (so computed columns appear on both OK and KO splits, like the
  * reference's hardcoded wiring at `:24-36`); `params.input` remains
  * advisory. Debug `show()` calls (reference `:70,84`) are dropped — at
  * scale they are two extra jobs per dataflow.
  */
object PipelineRunner {

  final case class Options(
      unionMode: SourceReader.UnionMode = SourceReader.UnionMode.ByName,
      kafkaServer: Option[String] = None,
      repartition: Option[Int] = None,
      /** Reproduce the reference's 3VL row-dropping split (tests only). */
      referenceCompatSplit: Boolean = false)

  final case class DataflowResult(name: String, split: ValidationSplit.Split) {
    def ok: DataFrame = split.ok
    def ko: DataFrame = split.ko
  }

  /** The transform wiring shared by the batch AND streaming runners —
    * one definition of the add_fields-before-validation ordering
    * contract (computed columns appear on both OK and KO splits, like
    * the reference's hardcoded wiring), so the two entry points cannot
    * silently diverge on the same metadata document. */
  def stages(df: DataflowConf): (Seq[FieldDef], Seq[FieldRules]) = (
    df.transformations.collect { case a: AddFieldsConf => a.fields }.flatten,
    df.transformations.collect { case v: ValidateFieldsConf => v.rules }.flatten)

  /** Post-validation curation stages (extension DSL): applied to the OK
    * split in declaration order — rows that failed the contract keep
    * their original shape for triage, rows that passed get curated. */
  def postStages(df: DataflowConf): Seq[TransformConf] =
    df.transformations.collect {
      case t: DeduplicateConf => t
      case t: FilterConf => t
    }

  /** Applies one curation stage. Deduplicate keeps the MIN(`keepBy`)
    * row per identity tuple (a window keyed on the identity columns —
    * shuffles once on the dedup key; survivors are deterministic, which
    * `dropDuplicates`' arbitrary-row contract is not). Ties ON `keepBy`
    * fall through to every remaining column in schema order — without
    * that secondary sort, two rows equal on (identity, keepBy) but
    * differing elsewhere would be picked by partition-internal row
    * order, which varies run to run. In a streaming `foreachBatch`
    * context this applies PER MICRO-BATCH; cross-batch dedup is
    * [[graft.streaming.StreamingPipeline.dedupeWithinWatermark]]'s
    * job (state must be watermark-bounded, not config-implied). */
  def applyPost(df: DataFrame, stages: Seq[TransformConf]): DataFrame =
    stages.foldLeft(df) {
      case (d, DeduplicateConf(_, _, cols, keepBy)) =>
        val tieBreak = d.columns.toSeq
          .filterNot(c => cols.contains(c) || c == keepBy)
          .map(org.apache.spark.sql.functions.col)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(cols.map(org.apache.spark.sql.functions.col): _*)
          .orderBy(org.apache.spark.sql.functions.col(keepBy) +: tieBreak: _*)
        d.withColumn("__dedup_rn",
            org.apache.spark.sql.functions.row_number().over(w))
          .filter(org.apache.spark.sql.functions.col("__dedup_rn") === 1)
          .drop("__dedup_rn")
      case (d, FilterConf(_, _, e)) =>
        d.filter(org.apache.spark.sql.functions.expr(e))
      case (d, _) => d
    }

  /** Build the OK/KO plans for one dataflow (no actions triggered). */
  def plan(spark: SparkSession, df: DataflowConf,
           opts: Options = Options()): DataflowResult = {
    val source = SourceReader.read(spark, df.sources, opts.unionMode)
    val (fields, rules) = stages(df)
    val withFields = AddFields(fields)(source)
    val split =
      if (opts.referenceCompatSplit) ValidationSplit.splitReferenceCompat(withFields, rules)
      else ValidationSplit.split(withFields, rules)
    val post = postStages(df)
    val curated =
      if (post.isEmpty) split
      else split.copy(ok = applyPost(split.ok, post))
    DataflowResult(df.name, curated)
  }

  /** Run one dataflow end-to-end: plan, persist to all sinks, unpersist. */
  def run(spark: SparkSession, df: DataflowConf, opts: Options = Options()): DataflowResult = {
    val res = plan(spark, df, opts)
    val splits = Map("ok_with_date" -> res.ok, "validation_ko" -> res.ko)
    try Sinks.persist(df.sinks, splits, opts.kafkaServer, repartition = opts.repartition)
    finally res.split.unpersist()
    res
  }

  /** Run every dataflow in a metadata document (reference `process()`). */
  def runAll(spark: SparkSession, meta: DataflowMetadata,
             opts: Options = Options()): Seq[DataflowResult] =
    meta.dataflows.map(run(spark, _, opts))
}
