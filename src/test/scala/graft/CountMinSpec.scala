package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CountMin

/** CountMin's contracts: fixed state, merge-order invariance (a true
  * mergeable summary), the deterministic lower-bound guarantee
  * (estimate ≥ true count for EVERY key, any chunking), and exactness
  * when the width eliminates collisions. */
class CountMinSpec extends AnyFunSuite {

  private def stream: Seq[String] =
    (1 to 20).flatMap(i => Seq.fill(200 / i)(s"t$i")) ++
      (1 to 300).map(i => s"noise$i")

  private def exact(s: Seq[String]): Map[String, Long] =
    s.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("state is fixed-size; merge is order-invariant") {
    val cm = new CountMin(4, 64)
    val s = stream
    val chunks = s.grouped(97).toSeq
    def build(ch: Seq[Seq[String]]) =
      ch.map(_.foldLeft(cm.zero)(cm.reduce)).reduce(cm.merge).toSeq
    val a = build(chunks)
    val b = build(chunks.reverse)
    assert(a.length == 4 * 64)
    assert(a == b, "merge must be order-invariant")
    // total mass: every occurrence lands once per row
    assert(a.sum == 4L * s.length)
  }

  test("estimate >= true count for every key under any chunking") {
    val cm = new CountMin(4, 64)
    val s = stream
    val ex = exact(s)
    for (nChunks <- Seq(1, 5, 13)) {
      val sketch = s.grouped(math.max(s.length / nChunks, 1)).toSeq
        .map(_.foldLeft(cm.zero)(cm.reduce)).reduce(cm.merge)
      ex.foreach { case (tok, n) =>
        assert(cm.estimate(sketch, tok) >= n, s"$tok under-counted")
      }
      // absent keys never report negative
      assert(cm.estimate(sketch, "never_seen_xyz") >= 0)
    }
  }

  test("wide sketch (no collisions for a small vocab) is exact") {
    val cm = new CountMin(4, 1 << 14)
    val s = (1 to 50).flatMap(i => Seq.fill(i)(s"w$i"))
    val sketch = s.foldLeft(cm.zero)(cm.reduce)
    exact(s).foreach { case (tok, n) =>
      assert(cm.estimate(sketch, tok) == n)
    }
  }

  // The published estimator bound (Cormode & Muthukrishnan 2005, Thm 1):
  // with eps = e/width and delta = e^-depth,
  //   Pr[ estimate(x) > true(x) + eps * N ] <= delta,
  // the probability taken over the hash family. Our family is fixed
  // (md5-derived rows), so the empirical face is the violation RATE
  // across many seeded random streams and keys — it must not exceed
  // delta. Deterministic: seeds and hashes are both fixed, so this is
  // a reproducible measurement of estimator quality, not a flaky
  // statistical test. Also checks the expectation face E[overcount]
  // <= N/width that Markov's inequality starts from.
  test("overcount <= eps*N at confidence delta on seeded random streams") {
    val depth = 4
    val width = 64
    val cm = new CountMin(depth, width)
    val eps = math.E / width
    val delta = math.exp(-depth.toDouble)
    var checks = 0L
    var violations = 0L
    var overcountSum = 0.0
    var nSum = 0.0
    for (seed <- 1 to 25) {
      val rnd = new scala.util.Random(seed)
      // Zipf-ish skew over a vocab much wider than the sketch, so
      // collisions are real and heavy keys dominate the mass
      val n = 2000
      val vocab = 500
      val s = Seq.fill(n) {
        val r = rnd.nextDouble()
        val k = math.min((math.pow(vocab.toDouble, r) - 1).toInt, vocab - 1)
        s"k${seed}_$k"
      }
      val sketch = s.grouped(311).toSeq
        .map(_.foldLeft(cm.zero)(cm.reduce)).reduce(cm.merge)
      val ex = exact(s)
      ex.foreach { case (tok, t) =>
        val over = cm.estimate(sketch, tok) - t
        assert(over >= 0, s"$tok under-counted")
        checks += 1
        if (over > eps * n) violations += 1
        overcountSum += over.toDouble
        nSum += n.toDouble
      }
    }
    assert(checks > 5000, s"need a real sample, got $checks")
    val rate = violations.toDouble / checks
    assert(rate <= delta,
      f"violation rate $rate%.4f exceeds delta=$delta%.4f " +
        s"($violations of $checks keys over eps*N)")
    val meanOver = overcountSum / checks
    val meanBound = nSum / checks / width
    assert(meanOver <= meanBound,
      f"mean overcount $meanOver%.2f exceeds E-bound N/width=$meanBound%.2f")
  }
}
