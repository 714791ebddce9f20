package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` exemplar (SURVEY §7.3): exact decimal weighted
  * average of a double `value` weighted by double `weight`.
  *
  * Semantics mirror graft.Policy exactly:
  *   - value and weight are quantized to DECIMAL(18,4) (HALF_UP),
  *   - numerator Σ v·w and denominator Σ w accumulate as EXACT
  *     BigDecimals — partition-order independent, so the result is
  *     stable under any parallelism (the property PartitionInvarianceSpec
  *     checks engine-wide),
  *   - finish = double(num rescaled to 4 d.p.) / double(den): one IEEE
  *     division on deterministic inputs (Policy.sumMoney rationale).
  *
  * Registered as SQL function `wavg_dec(value, weight)` in
  * graft.Sessions via `functions.udaf`.
  */
object DecimalWeightedAvg
    extends Aggregator[(Double, Double), (JBigDecimal, JBigDecimal), Double] {

  // Quantize via Double.toString's SHORTEST decimal representation — the
  // same path Spark's Decimal(double) / CAST(double AS DECIMAL(18,4))
  // takes (and DuckDB's cast agrees with). The exact binary expansion
  // (new BigDecimal(double)) differs at representation-tie inputs: e.g.
  // 1.00005 stores as 1.0000499999..., which HALF_UP rounds DOWN to
  // 1.0000, while the shortest repr "1.00005" rounds UP to 1.0001 —
  // PolicySpec pins this boundary case.
  private def dec4(d: Double): JBigDecimal =
    new JBigDecimal(java.lang.Double.toString(d))
      .setScale(4, RoundingMode.HALF_UP)

  override def zero: (JBigDecimal, JBigDecimal) =
    (JBigDecimal.ZERO, JBigDecimal.ZERO)

  override def reduce(b: (JBigDecimal, JBigDecimal),
      in: (Double, Double)): (JBigDecimal, JBigDecimal) = {
    val v = dec4(in._1)
    val w = dec4(in._2)
    (b._1.add(v.multiply(w)), b._2.add(w))
  }

  override def merge(a: (JBigDecimal, JBigDecimal),
      b: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
    (a._1.add(b._1), a._2.add(b._2))

  override def finish(r: (JBigDecimal, JBigDecimal)): Double = {
    if (r._2.signum() == 0) Double.NaN
    else r._1.setScale(4, RoundingMode.HALF_UP).doubleValue() /
      r._2.doubleValue()
  }

  override def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Input encoder for functions.udaf registration. */
  val inputEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
}
