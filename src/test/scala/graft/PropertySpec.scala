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
