package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Discrete Fourier transforms with the reference's exact conventions
  * (collector.h:2744-2942):
  *   - DFT: X_k = Σ_n x_n·e^(−2πikn/N), direct O(n²);
  *   - IDFT: ÷N, +2πikn/N sign;
  *   - FFT: radix-2 Cooley-Tukey, zero-pad to next power of two,
  *     bit-reversal permutation, then TRUNCATE the result back to the
  *     original length — reproduced as-is (a truncated padded FFT is NOT
  *     the DFT of the original signal; tests must encode the reference's
  *     answer, not the textbook's);
  *   - IFFT: inverse butterflies, truncate, ÷originalN.
  *
  * Complex numbers are (re, im) pairs. The transforms themselves run on a
  * gathered vector — exactly like the reference's finisher — inside an
  * Aggregator finish, so per-group series parallelize across groups.
  */
object Spectral {

  def dft(re: Array[Double], im: Array[Double]): (Array[Double], Array[Double]) = {
    val n = re.length
    val or = new Array[Double](n); val oi = new Array[Double](n)
    var k = 0
    while (k < n) {
      var sr = 0.0; var si = 0.0
      var j = 0
      while (j < n) {
        val ang = -2.0 * math.Pi * (k.toLong * j) / n
        val c = math.cos(ang); val s = math.sin(ang)
        sr += re(j) * c - im(j) * s
        si += re(j) * s + im(j) * c
        j += 1
      }
      or(k) = sr; oi(k) = si
      k += 1
    }
    (or, oi)
  }

  def idft(re: Array[Double], im: Array[Double]): (Array[Double], Array[Double]) = {
    val n = re.length
    val or = new Array[Double](n); val oi = new Array[Double](n)
    var k = 0
    while (k < n) {
      var sr = 0.0; var si = 0.0
      var j = 0
      while (j < n) {
        val ang = 2.0 * math.Pi * (k.toLong * j) / n
        val c = math.cos(ang); val s = math.sin(ang)
        sr += re(j) * c - im(j) * s
        si += re(j) * s + im(j) * c
        j += 1
      }
      or(k) = sr / n; oi(k) = si / n
      k += 1
    }
    (or, oi)
  }

  private def nextPow2(n: Int): Int = {
    var p = 1
    while (p < n) p <<= 1
    p
  }

  /** In-place iterative radix-2 transform on padded arrays.
    * sign = -1 forward, +1 inverse (no scaling here). */
  private def radix2(re: Array[Double], im: Array[Double], sign: Int): Unit = {
    val n = re.length
    // bit-reversal permutation
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = sign * 2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ar = re(blk + k); val ai = im(blk + k)
          val br = re(blk + k + len / 2) * cr - im(blk + k + len / 2) * ci
          val bi = re(blk + k + len / 2) * ci + im(blk + k + len / 2) * cr
          re(blk + k) = ar + br; im(blk + k) = ai + bi
          re(blk + k + len / 2) = ar - br; im(blk + k + len / 2) = ai - bi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** Reference useFFT: pad→transform→truncate to original n. */
  def fft(reIn: Array[Double], imIn: Array[Double]): (Array[Double], Array[Double]) = {
    val n = reIn.length
    if (n == 0) return (Array.empty, Array.empty)
    val p = nextPow2(n)
    val re = java.util.Arrays.copyOf(reIn, p)
    val im = java.util.Arrays.copyOf(imIn, p)
    radix2(re, im, -1)
    (re.take(n), im.take(n))
  }

  /** Reference useIFFT: pad→inverse transform→÷N→truncate. The scale
    * divisor is the ORIGINAL length N, not the padded power of two — the
    * reference resizes back to N first and then runs `data[i] /= N`
    * (collector.h useIFFT finisher), so non-power-of-2 inputs keep the
    * ÷N convention. */
  def ifft(reIn: Array[Double], imIn: Array[Double]): (Array[Double], Array[Double]) = {
    val n = reIn.length
    if (n == 0) return (Array.empty, Array.empty)
    val p = nextPow2(n)
    val re = java.util.Arrays.copyOf(reIn, p)
    val im = java.util.Arrays.copyOf(imIn, p)
    radix2(re, im, +1)
    var i = 0
    while (i < n) { re(i) /= n; im(i) /= n; i += 1 }
    (re.take(n), im.take(n))
  }
}

/** Per-group DFT as a typed aggregate: input rows are (idx, value); the
  * buffer keeps the indexed series; finish sorts by idx and transforms —
  * mirroring the reference collector shape (buffer-all, transform in the
  * finisher, collector.h:2744-2779) while groups parallelize across the
  * cluster. Suitable for many small/medium series, not one giant one. */
class DftAggregator(inverse: Boolean = false, useFft: Boolean = false)
  extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Double, Double)]] {

  def zero: Seq[(Long, Double)] = Nil
  def reduce(b: Seq[(Long, Double)], x: (Long, Double)): Seq[(Long, Double)] = x +: b
  def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] = a ++ b

  /** k-th output bin as a (re, im) pair. */
  def finish(buf: Seq[(Long, Double)]): Seq[(Double, Double)] = {
    val xs = buf.sortBy(_._1).map(_._2).toArray
    val zeros = new Array[Double](xs.length)
    val (r, i) =
      if (useFft && inverse) Spectral.ifft(xs, zeros)
      else if (useFft) Spectral.fft(xs, zeros)
      else if (inverse) Spectral.idft(xs, zeros)
      else Spectral.dft(xs, zeros)
    r.indices.map(k => (r(k), i(k)))
  }

  def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
  def outputEncoder: Encoder[Seq[(Double, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Double)]]()
}
