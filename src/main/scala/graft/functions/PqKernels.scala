package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Static kernels for the product-quantization path
  * ([[graft.operators.Pq]]). Building the encode/ADC out of
  * `element_at`/arithmetic Column trees costs thousands of expression
  * nodes (M×K×SubDim distance terms) — measured ~4 s of fixed
  * planning+codegen per sim_pq_topk run at ANY corpus size. Each kernel
  * here is one tight static loop inlined into whole-stage codegen, the
  * same posture as [[HyperplaneKernel]]. Arithmetic is bit-identical to
  * the Column-tree form it replaced: ascending-d double folds for the
  * norm and each subspace distance, argmin ties to the LOWEST centroid
  * index (PqSpec pins the encode laws). */
object PqKernel {

  /** codes(m) = argmin_c Σ_d (x[m·subDim+d]/‖x‖ − cb[(m·k+c)·subDim+d])². */
  def encode(x: ArrayData, cb: Array[Double], m: Int, subDim: Int, k: Int): ArrayData = {
    val dim = m * subDim
    if (x.numElements() != dim)
      throw new IllegalArgumentException(
        s"embedding dim ${x.numElements()} != $m subspaces x $subDim dims")
    var nrmSq = 0.0
    var d = 0
    while (d < dim) {
      val v = x.getFloat(d).toDouble
      nrmSq += v * v
      d += 1
    }
    // fail loudly: a zero-norm row would make every distance NaN and
    // the argmin would silently collapse to centroid 0
    if (nrmSq == 0.0)
      throw new IllegalArgumentException(
        "cannot PQ-encode a zero embedding (zero norm)")
    val nrm = math.sqrt(nrmSq)
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < k) {
        val base = (s * k + c) * subDim
        var dist = 0.0
        var i = 0
        while (i < subDim) {
          val diff = x.getFloat(s * subDim + i).toDouble / nrm - cb(base + i)
          dist += diff * diff
          i += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  /** adc(q) = Σ_m tables[(q·m̂+m)·k + codes[m]] — per-query table lookup
    * sums over the code array (m̂ = subspace count). */
  def adc(codes: ArrayData, tables: Array[Double], q: Int, m: Int, k: Int): ArrayData = {
    if (codes.numElements() != m)
      throw new IllegalArgumentException(
        s"code array length ${codes.numElements()} != $m subspaces")
    val out = new Array[Double](q)
    var qi = 0
    while (qi < q) {
      var acc = 0.0
      var s = 0
      while (s < m) {
        acc += tables((qi * m + s) * k + codes.getInt(s))
        s += 1
      }
      out(qi) = acc
      qi += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd PQ encode: `array<float>[M·SubDim]` → `array<int>[M]`. */
case class PqEncode(child: Expression, m: Int, subDim: Int, k: Int,
                    cbFlat: Array[Double]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(x: Any): Any =
    PqKernel.encode(x.asInstanceOf[ArrayData], cbFlat, m, subDim, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbFlat, "double[]")
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.PqKernel.encode($x, $cbRef, $m, $subDim, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Codegen'd ADC scoring: `array<int>[M]` codes → `array<double>[Q]` of
  * per-query approximate squared distances. */
case class PqAdc(child: Expression, q: Int, m: Int, k: Int,
                 tablesFlat: Array[Double]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(codes: Any): Any =
    PqKernel.adc(codes.asInstanceOf[ArrayData], tablesFlat, q, m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("pqTables", tablesFlat, "double[]")
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.PqKernel.adc($x, $tRef, $q, $m, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)
}

object PqKernels {
  def encode(x: Column, m: Int, subDim: Int, k: Int,
      cb: Array[Array[Array[Double]]]): Column = {
    val flat = new Array[Double](m * k * subDim)
    var i = 0
    for (s <- 0 until m; c <- 0 until k; d <- 0 until subDim) {
      flat(i) = cb(s)(c)(d); i += 1
    }
    Bridge.column(PqEncode(Bridge.expression(x), m, subDim, k, flat))
  }

  def adc(codes: Column, q: Int, m: Int, k: Int,
      tables: Array[Array[Array[Double]]]): Column = {
    val flat = new Array[Double](q * m * k)
    var i = 0
    for (qi <- 0 until q; s <- 0 until m; c <- 0 until k) {
      flat(i) = tables(qi)(s)(c); i += 1
    }
    Bridge.column(PqAdc(Bridge.expression(codes), q, m, k, flat))
  }
}
