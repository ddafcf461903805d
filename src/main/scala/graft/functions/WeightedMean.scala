package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** D10/J3: typed custom UDAF — weighted mean via a two-field commutative
  * buffer. Registered with functions.udaf(...); Spark runs it as a
  * partial+final two-phase aggregate, so it scales like a built-in (the
  * buffer, not the rows, crosses the shuffle).
  */
case class WmBuf(var wsum: Double, var w: Double)

object WeightedMean extends Aggregator[(Double, Double), WmBuf, Double] {
  override def zero: WmBuf = WmBuf(0.0, 0.0)
  override def reduce(b: WmBuf, in: (Double, Double)): WmBuf = {
    b.wsum += in._1 * in._2
    b.w += in._2
    b
  }
  override def merge(a: WmBuf, b: WmBuf): WmBuf = {
    a.wsum += b.wsum
    a.w += b.w
    a
  }
  override def finish(b: WmBuf): Double = if (b.w == 0) Double.NaN else b.wsum / b.w
  override def bufferEncoder: Encoder[WmBuf] = Encoders.product[WmBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
