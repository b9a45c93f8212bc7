package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr
import graft.config.FieldDef

/** `add_fields` — append computed columns from Spark SQL expression strings
  * (reference `PipelineProcessor.scala:89-103`; the expression string is
  * the reference's entire scalar-function surface via `expr`, `:99`).
  *
  * The reference mutates a `var` in a `foreach` (its own TODO at `:97`
  * asks for `foldLeft`); here it is a `foldLeft` of `withColumn`, which
  * Catalyst's `CollapseProject` rule flattens to ONE projection — later
  * fields may still reference earlier ones (sequential semantics
  * preserved), with no plan-depth blowup for wide configs.
  */
object AddFields {
  def apply(fields: Seq[FieldDef])(df: DataFrame): DataFrame =
    fields.foldLeft(df)((acc, f) => acc.withColumn(f.name, expr(f.function)))
}
