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
}
