package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.Decimal

/** Top-level codegen targets for the vector expressions. Must be a
  * top-level object: Scala only emits Java-visible static forwarders
  * for those, and generated Java cannot address nested objects
  * (`VectorExpressions.DotF32.dot` fails janino compilation and
  * silently drops the whole stage to interpreted mode).
  */
object VectorKernels {

  /** IEEE index-order double dot product over float arrays. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val xs = a.toFloatArray()
    val ys = b.toFloatArray()
    val n = math.min(xs.length, ys.length)
    var s = 0.0
    var i = 0
    while (i < n) {
      s += xs(i).toDouble * ys(i).toDouble
      i += 1
    }
    s
  }

  /** Symmetric int8 scalar quantization — the 4× memory cut of the
    * ANN serving path: scale = max|x|/127 (a double; 0 for the zero
    * vector), code_i = floor(x_i·127/max|x| + 0.5) ∈ [−127, 127].
    * Every step is a single IEEE double op in a fixed order
    * (float→double cast, ·127, /max, +0.5, floor), so DuckDB's
    * replay of the same formula is bit-identical — no rounding-mode
    * seam. Returns `(scale, codes)`; codes all-zero when scale is 0.
    */
  def sq8Quantize(a: ArrayData): (Double, Array[Byte]) = {
    val xs = a.toFloatArray()
    var ma = 0.0
    var i = 0
    while (i < xs.length) {
      val v = math.abs(xs(i).toDouble)
      if (v > ma) ma = v
      i += 1
    }
    val out = new Array[Byte](xs.length)
    if (ma > 0) {
      i = 0
      while (i < xs.length) {
        out(i) = math.floor(xs(i).toDouble * 127 / ma + 0.5).toByte
        i += 1
      }
    }
    (if (ma > 0) ma / 127 else 0.0, out)
  }

  /** [[sq8Quantize]] as a Catalyst row for the codegen path. */
  def sq8QuantizeRow(a: ArrayData): InternalRow = {
    val (s, q) = sq8Quantize(a)
    InternalRow(s, new GenericArrayData(q.map(Byte.box).toArray[Any]))
  }

  /** Integer dot product over int8 code arrays — exact in Long
    * (64 · 127² ≪ 2⁶³), the cheap ranking kernel of the quantized
    * ANN path.
    */
  def dotI8(a: ArrayData, b: ArrayData): Long = {
    val xs = a.toByteArray()
    val ys = b.toByteArray()
    val n = math.min(xs.length, ys.length)
    var s = 0L
    var i = 0
    while (i < n) {
      s += xs(i).toLong * ys(i)
      i += 1
    }
    s
  }

  /** Sign-bit binary quantization: bit d = 1 iff x_d > 0, over the
    * first 64 dims — 1 bit per dimension, the 32× memory cut below
    * SQ8's 4× (a 64-dim vector becomes ONE long). Hamming distance
    * between sign words approximates angular distance, the candidate
    * generator of the binary-quantized ANN serving path; comparison
    * against exact zero has no rounding seam, so the SQL oracle
    * replays every bit.
    */
  def bqPack(a: ArrayData): Long = {
    val xs = a.toFloatArray()
    val n = math.min(xs.length, 64)
    var bits = 0L
    var d = 0
    while (d < n) {
      if (xs(d) > 0f) bits |= 1L << d
      d += 1
    }
    bits
  }

  /** Exact DECIMAL(38,12) dot: per-product shortest-string rounding to
    * 12 dp (matching CAST(double AS DECIMAL) in Spark and DuckDB),
    * summed exactly.
    */
  def dotDec(a: ArrayData, b: ArrayData): Decimal = {
    val xs = a.toFloatArray()
    val ys = b.toFloatArray()
    val n = math.min(xs.length, ys.length)
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      val p = xs(i).toDouble * ys(i).toDouble
      acc = acc.add(java.math.BigDecimal.valueOf(p)
        .setScale(12, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    Decimal(acc, 38, 12)
  }
}
