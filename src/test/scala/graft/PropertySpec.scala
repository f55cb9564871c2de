package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Moments, Spectral}

/** Property tests (SURVEY.md §5.2): algebraic laws the reference's
  * collector framework guarantees by construction, checked with
  * ScalaCheck properties (driven directly — the scalatest bridge module
  * is not vendored). Spark-level laws live in CoreStreamSpec.
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, s"$name: $res")
  }

  val doubles: Gen[List[Double]] = Gen.listOfN(60, Gen.choose(-1e3, 1e3))

  test("Combiner law: merge(fold(a), fold(b)) == fold(a ++ b) for Moments") {
    check("combiner", Prop.forAll(doubles, doubles) { (a, b) =>
      val merged = Moments.of(a).merge(Moments.of(b))
      val whole = Moments.of(a ++ b)
      merged.n == whole.n &&
        math.abs(merged.mean - whole.mean) < 1e-6 &&
        math.abs(merged.m2 - whole.m2) / math.max(1.0, whole.m2.abs) < 1e-6 &&
        math.abs(merged.m3 - whole.m3) / math.max(1.0, whole.m3.abs) < 1e-5 &&
        math.abs(merged.m4 - whole.m4) / math.max(1.0, whole.m4.abs) < 1e-5
    })
  }

  test("Moments identity: merge with zero is a no-op") {
    check("identity", Prop.forAll(doubles) { a =>
      val m = Moments.of(a)
      Moments.zero.merge(m) == m && m.merge(Moments.zero) == m
    })
  }

  test("IDFT ∘ DFT == identity within 1e-6") {
    check("idft-dft", Prop.forAll(Gen.listOfN(24, Gen.choose(-100.0, 100.0))) { xs =>
      val re = xs.toArray
      val (fr, fi) = Spectral.dft(re, new Array[Double](re.length))
      val (br, bi) = Spectral.idft(fr, fi)
      re.indices.forall(i => math.abs(br(i) - re(i)) < 1e-6 && math.abs(bi(i)) < 1e-6)
    })
  }

  test("FFT == DFT on power-of-two lengths") {
    check("fft-dft", Prop.forAll(Gen.listOfN(16, Gen.choose(-50.0, 50.0))) { xs =>
      val re = xs.toArray
      val (fr, fi) = Spectral.fft(re, new Array[Double](16))
      val (dr, di) = Spectral.dft(re, new Array[Double](16))
      re.indices.forall(i =>
        math.abs(fr(i) - dr(i)) < 1e-6 && math.abs(fi(i) - di(i)) < 1e-6)
    })
  }

  test("skewness of a symmetric sample is ~0; small-n and σ=0 gates hold") {
    check("skew-sym", Prop.forAll(Gen.listOfN(30, Gen.choose(0.1, 100.0))) { xs =>
      val sym = xs ++ xs.map(-_) // exactly symmetric around 0
      math.abs(Moments.of(sym).skewness) < 1e-6
    })
    assert(Moments.of(Seq(1.0, 2.0)).skewness == 0.0)       // n<3 → 0
    assert(Moments.of(Seq(1.0, 2.0, 3.0)).kurtosis == 0.0)  // n<4 → 0
    assert(Moments.of(Seq(5.0, 5.0, 5.0, 5.0)).skewness == 0.0) // σ=0 → 0
  }

  test("TopKByScore partition invariance: any chunking + merge order == global sort-take") {
    // the law that makes the distributed form correct: top-k selection
    // commutes with partitioning, so fold-chunks-then-merge must equal
    // the single-pass sort-take whatever the split and merge order
    import graft.functions.{ScoredId, TopKByScore}
    val entries: Gen[List[ScoredId]] = for {
      n <- Gen.choose(0, 120)
      scores <- Gen.listOfN(n, Gen.oneOf(
        Gen.choose(-1e6, 1e6), Gen.oneOf(0.0, -0.0, 1.5, -1.5)))
    } yield scores.zipWithIndex.map { case (s, i) => ScoredId(s, i.toLong) }
    check("topk-partition", Prop.forAll(entries, Gen.choose(1, 12),
      Gen.choose(1, 7), Gen.long) { (xs, k, chunks, seed) =>
      val agg = new TopKByScore(k)
      val rnd = new scala.util.Random(seed)
      val parts = rnd.shuffle(xs).grouped(math.max(1, xs.length / chunks + 1)).toList
      val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(bufs).foldLeft(agg.zero)(agg.merge)
      val got = agg.finish(merged).items
      def key(s: ScoredId) = (if (s.score == 0.0) 0.0 else s.score, s.id)
      val want = xs.sortWith { (a, b) =>
        val c = java.lang.Double.compare(key(b)._1, key(a)._1)
        if (c != 0) c < 0 else a.id < b.id
      }.take(k)
      got.map(s => (key(s), s.id)) == want.map(s => (key(s), s.id))
    })
  }

  test("FirstKByOrder partition invariance: any chunking + merge order == global sort-take") {
    // the same law for the first-k twin (q37/q42's engine): first-k
    // selection commutes with partitioning when ord is unique, so any
    // split and merge order must equal the single-pass sort-take
    import graft.functions.{FirstKByOrder, OrdPayload}
    val entries: Gen[List[OrdPayload]] = for {
      n <- Gen.choose(0, 120)
      ords <- Gen.listOfN(n, Gen.choose(Long.MinValue / 2, Long.MaxValue / 2))
    } yield ords.distinct.zipWithIndex.map { case (o, i) => OrdPayload(o, i * 1.5) }
    check("firstk-partition", Prop.forAll(entries, Gen.choose(1, 12),
      Gen.choose(1, 7), Gen.long) { (xs, k, chunks, seed) =>
      val agg = new FirstKByOrder(k)
      val rnd = new scala.util.Random(seed)
      val parts = rnd.shuffle(xs).grouped(math.max(1, xs.length / chunks + 1)).toList
      val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(bufs).foldLeft(agg.zero)(agg.merge)
      val got = agg.finish(merged).items
      val want = xs.sortBy(_.ord).take(k)
      got == want
    })
  }

  test("LastLongByOrder partition invariance: any chunking + merge order == last valid by order") {
    // the law behind the carry machinery's hash-aggregated summaries:
    // max-by over a strict total order is associative and commutative,
    // so any split/merge must equal the single-pass answer; rows with
    // ok=false (null carries) never win
    import graft.functions.{LastLongByOrder, OrdLong}
    val entries: Gen[List[OrdLong]] = for {
      n <- Gen.choose(0, 100)
      ords <- Gen.listOfN(n, Gen.listOfN(3, Gen.choose(-1000L, 1000L)))
    } yield ords.distinct.zipWithIndex.map { case (o, i) =>
      OrdLong(o, i.toLong, ok = i % 3 != 0)
    }
    check("lastbyorder-partition", Prop.forAll(entries, Gen.choose(1, 7), Gen.long) {
      (xs, chunks, seed) =>
      val agg = new LastLongByOrder
      val rnd = new scala.util.Random(seed)
      val parts = rnd.shuffle(xs).grouped(math.max(1, xs.length / chunks + 1)).toList
      val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      val got = agg.finish(rnd.shuffle(bufs).foldLeft(agg.zero)(agg.merge))
      val valid = xs.filter(_.ok)
      val want =
        if (valid.isEmpty) agg.zero
        else valid.maxBy(_.ord)(Ordering.Implicits.seqOrdering[Seq, Long])
      got == want
    })
  }
}
