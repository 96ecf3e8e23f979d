package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.model.FactColumnKind._
import graft.model.TableConstraint._

/** Property: the validator is total — any model, however broken, yields
  * Right(env) or Left(errors), never an exception (SURVEY §5.3). */
class ValidatorPropertySpec extends AnyFunSuite {

  private val genName: Gen[String] = Gen.oneOf("t1", "t2", "evts", "x", "dim_a", "")
  private val genType: Gen[String] =
    Gen.oneOf("bigint", "text", "timestamp without time zone", "interval", "bogus", "")

  private val genColumn: Gen[Column] = for {
    n   <- genName
    t   <- genType
    nul <- Gen.oneOf(Nullable.Null, Nullable.NotNull)
  } yield Column(n, t, nul)

  private val genConstraint: Gen[TableConstraint] = Gen.oneOf(
    genName.map(PrimaryKey(_)),
    Gen.listOf(genName).map(UniqueKey(_)),
    for { t <- genName; a <- genName; b <- genName } yield ForeignKey(t, Seq(a -> b))
  )

  private val genTable: Gen[Table] = for {
    n  <- genName
    cs <- Gen.listOfN(3, genColumn)
    ks <- Gen.listOfN(2, genConstraint)
  } yield Table(n, cs, ks)

  private val genKind: Gen[FactColumnKind] = Gen.oneOf(
    Gen.const(DimTime), Gen.const(NoDimId), Gen.const(TenantId),
    genName.map(DimId(_)), genName.map(DimVal(_)),
    Gen.option(genName).map(FactCount(_)),
    Gen.option(genName).map(FactCountDistinct(_)),
    genName.map(FactSum(_)), genName.map(FactAverage(_)),
    genName.map(FactMax(_)), genName.map(FactMin(_))
  )

  private val genFact: Gen[Fact] = for {
    n  <- genName
    t  <- genName
    ps <- Gen.listOf(genName)
    cs <- Gen.listOfN(4, for { c <- genName; k <- genKind } yield FactColumn(c, k))
  } yield Fact(n, t, parentNames = ps.take(1), columns = cs)

  test("validateEnv never throws on arbitrary models") {
    val prop = Prop.forAll(
      Gen.listOfN(3, genTable), Gen.listOfN(3, genFact)) { (tables, facts) =>
      Validator.validateEnv(tables, facts, Settings(), Fixtures.testTypeDefaults) match {
        case Right(env) => env.tables == tables
        case Left(errs) => errs.nonEmpty
      }
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(result.passed, result.status.toString)
  }
}
