package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Central-moment state: n, mean, and 2nd..4th central moment sums.
  *
  * The reference's collector framework (Identity/Accumulate/Combine/Finish,
  * collector.h:51-382) is exactly Spark's `Aggregator[IN,BUF,OUT]`; its
  * variance collector already merges partials with Chan's formula
  * (collector.h:704-716). We extend the same scheme to 3rd/4th moments so
  * skewness/kurtosis are single-pass and parallel-mergeable — unlike the
  * reference's buffer-everything skewness/kurtosis (collector.h:3065-3239),
  * which would not survive 100 TB. Finishers reproduce the reference's
  * exact formulas (population σ inside, sample-style bias factors outside).
  */
case class Moments(n: Long, mean: Double, m2: Double, m3: Double, m4: Double) {

  def add(x: Double): Moments = {
    val n1 = n
    val nn = n + 1
    val delta = x - mean
    val dn = delta / nn
    val dn2 = dn * dn
    val term1 = delta * dn * n1
    Moments(
      nn,
      mean + dn,
      m2 + term1,
      m3 + term1 * dn * (nn - 2) - 3 * dn * m2,
      m4 + term1 * dn2 * (nn.toDouble * nn - 3 * nn + 3) + 6 * dn2 * m2 - 4 * dn * m3)
  }

  def merge(o: Moments): Moments = {
    if (n == 0) return o
    if (o.n == 0) return this
    val na = n.toDouble; val nb = o.n.toDouble; val nt = na + nb
    val d = o.mean - mean
    val d2 = d * d
    Moments(
      n + o.n,
      mean + d * nb / nt,
      m2 + o.m2 + d2 * na * nb / nt,
      m3 + o.m3 + d * d2 * na * nb * (na - nb) / (nt * nt) +
        3.0 * d * (na * o.m2 - nb * m2) / nt,
      m4 + o.m4 + d2 * d2 * na * nb * (na * na - na * nb + nb * nb) / (nt * nt * nt) +
        6.0 * d2 * (na * na * o.m2 + nb * nb * m2) / (nt * nt) +
        4.0 * d * (na * o.m3 - nb * m3) / nt)
  }

  /** Population variance ÷N (useVariance, collector.h:688-723). */
  def variancePop: Double = if (n == 0) 0.0 else m2 / n

  def stddevPop: Double = math.sqrt(variancePop)

  /** Reference skewness (collector.h:3065-3103): n<3 → 0; population σ,
    * sample bias factor n/((n-1)(n-2)). */
  def skewness: Double = {
    if (n < 3) return 0.0
    val nd = n.toDouble
    val variance = m2 / nd
    if (variance == 0.0) return 0.0
    val sd = math.sqrt(variance)
    (nd / ((nd - 1) * (nd - 2))) * (m3 / (sd * sd * sd))
  }

  /** Reference excess kurtosis (collector.h:3147-3186): n<4 → 0; population
    * σ⁴ in the denominator, bias-corrected adjustment term. */
  def kurtosis: Double = {
    if (n < 4) return 0.0
    val nd = n.toDouble
    val variance = m2 / nd
    if (variance == 0.0) return 0.0
    val s4 = variance * variance
    val num = nd * (nd + 1) * (nd - 1) * m4
    val denom = (nd - 2) * (nd - 3) * s4 * nd * nd
    if (denom == 0.0) return 0.0
    num / denom - 3.0 * (nd - 1) * (nd - 1) / ((nd - 2) * (nd - 3))
  }
}

object Moments {
  val zero: Moments = Moments(0L, 0.0, 0.0, 0.0, 0.0)
  def of(xs: IterableOnce[Double]): Moments = xs.iterator.foldLeft(zero)(_.add(_))
}

class MomentsAggregator extends Aggregator[Double, Moments, Moments] {
  def zero: Moments = Moments.zero
  def reduce(b: Moments, x: Double): Moments = b.add(x)
  def merge(a: Moments, b: Moments): Moments = a.merge(b)
  def finish(m: Moments): Moments = m
  def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
  def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
}

class SkewnessAggregator extends Aggregator[Double, Moments, Double] {
  def zero: Moments = Moments.zero
  def reduce(b: Moments, x: Double): Moments = b.add(x)
  def merge(a: Moments, b: Moments): Moments = a.merge(b)
  def finish(m: Moments): Double = m.skewness
  def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

class KurtosisAggregator extends Aggregator[Double, Moments, Double] {
  def zero: Moments = Moments.zero
  def reduce(b: Moments, x: Double): Moments = b.add(x)
  def merge(a: Moments, b: Moments): Moments = a.merge(b)
  def finish(m: Moments): Double = m.kurtosis
  def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Column-usable UDAFs. Register once per session or use directly. */
object StatFunctions {
  lazy val skewnessRef = udaf(new SkewnessAggregator, Encoders.scalaDouble)
  lazy val kurtosisRef = udaf(new KurtosisAggregator, Encoders.scalaDouble)
  def skewness_ref(c: Column): Column = skewnessRef(c)
  def kurtosis_ref(c: Column): Column = kurtosisRef(c)
}
