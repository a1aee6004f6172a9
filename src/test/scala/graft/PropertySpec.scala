package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Naming
import graft.extract.RestExtract
import graft.query.QualifyRewriter

/** Property-based tests (SURVEY §5: the build must test STRONGER than the
  * reference, which has no property tests at all). */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val identGen: Gen[String] = for {
    head <- Gen.alphaChar
    tail <- Gen.listOfN(8, Gen.oneOf(Gen.alphaNumChar, Gen.const('_')))
  } yield (head :: tail).mkString

  test("toSnakeCase is idempotent and always produces valid snake_case") {
    check(Prop.forAll(identGen) { s =>
      val once = Naming.toSnakeCase(s)
      Naming.toSnakeCase(once) == once &&
        (once.isEmpty || Naming.isSnakeCase(once))
    })
  }

  test("similarity is bounded and 1.0 on self") {
    // NOTE deliberately not asserting symmetry: Ratcliff/Obershelp (like
    // Python's difflib the reference uses) is order-dependent when
    // longest-common-substring ties break differently — found by this
    // property test's earlier symmetric version.
    check(Prop.forAll(identGen, identGen) { (a, b) =>
      val s = RestExtract.similarity(a, b)
      s >= 0.0 && s <= 1.0
    })
    check(Prop.forAll(identGen)(a => RestExtract.similarity(a, a) == 1.0))
  }

  test("nscaledDist2's 128-bit accumulator matches a BigInteger reference") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-200000L, 200000L))
    val sumGen = Gen.listOfN(8, Gen.chooseNum(-1000000000000L, 1000000000000L))
    val nGen = Gen.chooseNum(1L, 10000000L)
    check(Prop.forAll(vecGen, sumGen, nGen) { (x, s, n) =>
      val got = graft.functions.GraftVec.nscaledDist2(
        new GenericArrayData(x.toArray), new GenericArrayData(s.toArray), n)
        .toJavaBigDecimal.toBigInteger
      val exp = x.zip(s).map { case (xi, si) =>
        val t = BigInt(n) * BigInt(xi) - BigInt(si); t * t
      }.sum
      got == exp.bigInteger
    })
  }

  test("VecMomentsBuf add/merge equals direct sums under any split point") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rowsGen = Gen.nonEmptyListOf(Gen.listOfN(4, Gen.chooseNum(-100000L, 100000L)))
    check(Prop.forAll(rowsGen, Gen.chooseNum(0, 100)) { (rows, cutPct) =>
      val cut = rows.length * cutPct / 100
      val (a, b) = rows.splitAt(cut)
      def bufOf(part: List[List[Long]]) = {
        val buf = new graft.functions.VecMomentsBuf(0L, null, null)
        part.foreach(r => buf.add(new GenericArrayData(r.toArray)))
        buf
      }
      val merged = bufOf(a)
      merged.merge(bufOf(b))
      val expS = (0 until 4).map(g => rows.map(_(g)).sum)
      val expQ = (0 until 4).map(g => rows.map(r => r(g) * r(g)).sum)
      merged.n == rows.length &&
        merged.s.toSeq == expS && merged.q.toSeq == expQ
    })
  }

  test("singularize never grows a name") {
    check(Prop.forAll(identGen)(a =>
      RestExtract.singularize(a).length <= a.length))
    assert(RestExtract.singularize(RestExtract.singularize("categories")) == "category")
  }

  test("QualifyRewriter is identity when no top-level QUALIFY exists") {
    Seq(
      "SELECT a FROM t",
      "SELECT 'QUALIFY x' FROM t",
      "SELECT * FROM (SELECT 1 AS x) q WHERE x = 1",
      "WITH c AS (SELECT 1 AS x) SELECT * FROM c"
    ).foreach(sql => assert(QualifyRewriter.rewrite(sql) == sql))
  }
}
