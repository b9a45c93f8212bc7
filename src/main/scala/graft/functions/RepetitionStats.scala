package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel: per-document n-gram repetition fractions in one pass —
  * [top2_frac, dup2_frac, top3_frac, dup3_frac] where top = count of the
  * most frequent word n-gram over total n-grams and dup = occurrences of
  * grams appearing more than once, over total. Word splitting matches
  * [[Portable.words]] (`split(text, ' ')` with trailing empties kept,
  * hence `split(" ", -1)`); fractions are 0.0 when the doc has fewer
  * than n words — both identical to the exploded
  * groupBy(doc_id, gram) → groupBy(doc_id) relational form and to the
  * DuckDB oracle. */
object RepetitionStatsKernel {
  def compute(text: UTF8String): ArrayData = {
    val ws = text.toString.split(" ", -1)
    val out = new Array[Double](4)
    var n = 2
    while (n <= 3) {
      val total = ws.length - n + 1
      if (total > 0) {
        val counts = new java.util.HashMap[String, Integer]()
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i < total) {
          sb.setLength(0)
          var k = 0
          while (k < n) {
            if (k > 0) sb.append(' ')
            sb.append(ws(i + k))
            k += 1
          }
          val key = sb.toString
          val prev = counts.get(key)
          counts.put(key, if (prev == null) 1 else prev + 1)
          i += 1
        }
        var maxC = 0
        var dup = 0L
        val it = counts.values().iterator()
        while (it.hasNext) {
          val c: Int = it.next()
          if (c > maxC) maxC = c
          if (c > 1) dup += c
        }
        out((n - 2) * 2) = maxC.toDouble / total
        out((n - 2) * 2 + 1) = dup.toDouble / total
      }
      n += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd per-row repetition stats (`array<double>` of the four
  * fractions). One doc = one row, so the repetition signal needs NO
  * gram explode and NO (doc_id, gram) shuffle — at 100 TB the exploded
  * form shuffles ~2× the corpus token count per n; this is a narrow
  * projection. */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(x: Any): Any =
    RepetitionStatsKernel.compute(x.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.RepetitionStatsKernel.compute($x)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  def repetitionStats(c: Column): Column =
    Bridge.column(RepetitionStats(Bridge.expression(c)))
}
