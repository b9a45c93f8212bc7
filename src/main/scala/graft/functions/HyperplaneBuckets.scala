package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Static kernel — one pass over the embedding computes EVERY LSH table's
  * bucket id. Per plane p, the projection is the sequential double fold
  * Σ_d x[d]·sign[p][d] in ascending d — identical arithmetic (and
  * rounding) to the `aggregate(zip_with(...))` formulation and to the
  * DuckDB oracle ([[graft.operators.Similarity.bucketIdSql]]). */
object HyperplaneKernel {
  def compute(x: ArrayData, signs: Array[Int], tables: Int, planes: Int): ArrayData = {
    val dim = x.numElements()
    // the stride below assumes the sign family was built for exactly this
    // dim — a malformed embedding would otherwise read misaligned signs
    // (wrong buckets) or run past the array; fail loudly instead
    if (signs.length != tables * planes * dim)
      throw new IllegalArgumentException(
        s"embedding dim $dim does not match sign family: " +
        s"${signs.length} signs for $tables tables x $planes planes")
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var i = 0
      while (i < planes) {
        val base = (t * planes + i) * dim
        var acc = 0.0
        var d = 0
        while (d < dim) { acc += x.getFloat(d).toDouble * signs(base + d); d += 1 }
        if (acc > 0) bucket |= 1 << i
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd multi-table hyperplane bucketing over an `array<float>`
  * embedding: returns `array<int>` of length `tables`, element t = the
  * `planes`-bit bucket id in LSH table t (planes t·planes … t·planes+
  * planes−1 of the shared sign family).
  *
  * The built-in formulation evaluates tables×planes interpreted
  * `HigherOrderFunction` lambdas per row (boxed, CodegenFallback); this
  * is one tight static loop inlined into whole-stage codegen — the
  * banding kernel every ANN/near-dup query runs over the full corpus. */
case class HyperplaneBuckets(child: Expression, tables: Int, planes: Int,
                             signsFlat: Array[Int]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(x: Any): Any =
    HyperplaneKernel.compute(x.asInstanceOf[ArrayData], signsFlat, tables, planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("hpSigns", signsFlat, "int[]")
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.HyperplaneKernel.compute($x, $signsRef, $tables, $planes)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {
  /** Column-API entry point: buckets(x)[t] = bucket id in table t. */
  def buckets(x: Column, tables: Int, planes: Int, signs: Array[Array[Int]]): Column = {
    val flat = Array.tabulate(tables * planes * signs(0).length) { idx =>
      signs(idx / signs(0).length)(idx % signs(0).length)
    }
    Bridge.column(HyperplaneBuckets(Bridge.expression(x), tables, planes, flat))
  }
}
