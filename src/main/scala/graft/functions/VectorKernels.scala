package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
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
