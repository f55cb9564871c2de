package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Spectral

/** Closed-form transform checks (SURVEY.md §5.4), including the reference's
  * pad-to-pow2-then-truncate FFT behavior (collector.h:2836-2876). */
class SpectralSpec extends AnyFunSuite {

  private def assertClose(a: Array[Double], b: Array[Double], eps: Double = 1e-9): Unit = {
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < eps, s"$x vs $y") }
  }

  test("DFT of impulse is all-ones; DFT of constant is N at k=0") {
    val (r1, i1) = Spectral.dft(Array(1.0, 0, 0, 0), new Array[Double](4))
    assertClose(r1, Array(1.0, 1, 1, 1)); assertClose(i1, Array(0.0, 0, 0, 0))
    val (r2, i2) = Spectral.dft(Array(1.0, 1, 1, 1), new Array[Double](4))
    assertClose(r2, Array(4.0, 0, 0, 0)); assertClose(i2, Array(0.0, 0, 0, 0))
  }

  test("DFT of single tone concentrates at ±k") {
    val n = 8
    val xs = Array.tabulate(n)(j => math.cos(2 * math.Pi * 2 * j / n))
    val (r, _) = Spectral.dft(xs, new Array[Double](n))
    assert(math.abs(r(2) - n / 2.0) < 1e-9)
    assert(math.abs(r(6) - n / 2.0) < 1e-9)
    assert(math.abs(r(0)) < 1e-9 && math.abs(r(1)) < 1e-9)
  }

  test("IDFT inverts DFT") {
    val xs = Array(3.0, -1.0, 2.5, 0.5, 9.0)
    val (fr, fi) = Spectral.dft(xs, new Array[Double](5))
    val (br, bi) = Spectral.idft(fr, fi)
    assertClose(br, xs); assertClose(bi, new Array[Double](5))
  }

  test("FFT on power-of-2 length equals DFT") {
    val xs = Array.tabulate(16)(j => math.sin(j * 0.9) + 0.3 * j)
    val (fr, fi) = Spectral.fft(xs, new Array[Double](16))
    val (dr, di) = Spectral.dft(xs, new Array[Double](16))
    assertClose(fr, dr, 1e-8); assertClose(fi, di, 1e-8)
  }

  test("FFT on n=12 equals padded-16 DFT truncated (reference quirk, NOT dft of n=12)") {
    val xs = Array.tabulate(12)(j => math.cos(j * 0.7) * (j + 1))
    val padded = xs ++ Array.fill(4)(0.0)
    val (pr, pi) = Spectral.dft(padded, new Array[Double](16))
    val (fr, fi) = Spectral.fft(xs, new Array[Double](12))
    assertClose(fr, pr.take(12), 1e-8); assertClose(fi, pi.take(12), 1e-8)
    // and it must differ from the direct DFT of the original signal
    val (dr, _) = Spectral.dft(xs, new Array[Double](12))
    assert(fr.zip(dr).exists { case (a, b) => math.abs(a - b) > 1e-6 })
  }

  test("IFFT inverts FFT on power-of-2 length") {
    val xs = Array.tabulate(8)(j => j * 1.5 - 3)
    val (fr, fi) = Spectral.fft(xs, new Array[Double](8))
    val (br, bi) = Spectral.ifft(fr, fi)
    assertClose(br, xs, 1e-8); assertClose(bi, new Array[Double](8), 1e-8)
  }

  test("IFFT divides by the ORIGINAL length N on non-power-of-2 input") {
    // reference useIFFT resizes to N and then runs data[i] /= N — so a
    // length-12 input padded to 16 is still scaled by 1/12, not 1/16
    val n = 12
    val re = Array.tabulate(n)(j => math.sin(j * 0.7) + 0.25 * j)
    val im = Array.tabulate(n)(j => math.cos(j * 1.3))
    val (ar, ai) = Spectral.ifft(re, im)
    // unscaled inverse butterflies on the padded arrays, truncated
    val p = 16
    val pr = java.util.Arrays.copyOf(re, p)
    val pi = java.util.Arrays.copyOf(im, p)
    val (ur, ui) = {
      // idft of the padded signal ÷p equals the radix-2 inverse ÷p; undo
      // the ÷p and re-apply ÷n to get the expected reference answer
      val (r, i) = Spectral.idft(pr, pi)
      (r.take(n).map(_ * p / n), i.take(n).map(_ * p / n))
    }
    assertClose(ar, ur, 1e-8); assertClose(ai, ui, 1e-8)
  }
}
