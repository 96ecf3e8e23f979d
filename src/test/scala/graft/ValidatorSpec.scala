package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.model.FactColumnKind._
import graft.model.Nullable._
import graft.model.TableConstraint._
import graft.model.ValidationError._

/** Validator error taxonomy (`src/Ringo/Validator.hs:33-110`). */
class ValidatorSpec extends AnyFunSuite {

  private val defaults = Fixtures.testTypeDefaults
  private val okTable = Table(
    "t",
    Seq(
      Column("id", "bigint", NotNull),
      Column("ts", "timestamp without time zone", NotNull),
      Column("v", "text", Null)),
    Seq(PrimaryKey("id")))
  private val okFact = Fact(
    "f", "t",
    columns = Seq(FactColumn("ts", DimTime), FactColumn("n", FactCount(None))))

  private def errsOf(
      tables: Seq[Table] = Seq(okTable),
      facts: Seq[Fact] = Seq(okFact),
      settings: Settings = Settings(),
      defs: TypeDefaults = defaults
  ): Seq[ValidationError] =
    Validator.validateEnv(tables, facts, settings, defs).left.getOrElse(Nil)

  test("valid model validates") {
    assert(Validator.validateEnv(Seq(okTable), Seq(okFact), Settings(), defaults).isRight)
  }

  test("MissingTable: fact source") {
    assert(errsOf(facts = Seq(okFact.copy(tableName = "nope"))).contains(MissingTable("nope")))
  }

  test("MissingTable: FK target") {
    val t = okTable.copy(constraints = okTable.constraints :+
      ForeignKey("absent", Seq("id" -> "x")))
    assert(errsOf(tables = Seq(t)).contains(MissingTable("absent")))
  }

  test("MissingFact: parent") {
    assert(errsOf(facts = Seq(okFact.copy(parentNames = Seq("ghost"))))
      .contains(MissingFact("ghost")))
  }

  test("MissingColumn: constraint and fact source column") {
    val t = okTable.copy(constraints = Seq(PrimaryKey("zzz")))
    assert(errsOf(tables = Seq(t)).contains(MissingColumn("t", "zzz")))
    val f = okFact.copy(columns = okFact.columns :+ FactColumn("absent", FactSum("absent")))
    assert(errsOf(facts = Seq(f)).contains(MissingColumn("t", "absent")))
  }

  test("DuplicateTable / DuplicateFact / DuplicateColumn") {
    assert(errsOf(tables = Seq(okTable, okTable)).contains(DuplicateTable("t")))
    assert(errsOf(facts = Seq(okFact, okFact)).contains(DuplicateFact("f")))
    val t = okTable.copy(columns = okTable.columns :+ Column("id", "bigint", NotNull))
    assert(errsOf(tables = Seq(t)).contains(DuplicateColumn("t", "id")))
  }

  test("MissingTimeColumn") {
    val f = okFact.copy(columns = Seq(FactColumn("n", FactCount(None))))
    assert(errsOf(facts = Seq(f)).contains(MissingTimeColumn("t")))
  }

  test("MissingNotNullConstraint on the DimTime column") {
    val t = okTable.copy(columns = okTable.columns.map(c =>
      if (c.name == "ts") c.copy(nullable = Null) else c))
    assert(errsOf(tables = Seq(t)).contains(MissingNotNullConstraint("t", "ts")))
  }

  test("MissingTypeDefault for dim columns") {
    val t = okTable.copy(columns = okTable.columns :+ Column("u", "uuid", Null))
    val f = okFact.copy(columns = okFact.columns :+ FactColumn("u", DimVal("users")))
    assert(errsOf(tables = Seq(t), facts = Seq(f)).contains(MissingTypeDefault("uuid")))
  }

  test("CyclicFactParents: parent cycles are rejected, not recursed") {
    val f1 = okFact.copy(name = "f1", parentNames = Seq("f2"))
    val f2 = okFact.copy(name = "f2", parentNames = Seq("f1"))
    assert(errsOf(facts = Seq(f1, f2)).contains(CyclicFactParents("f1")))
    val self = okFact.copy(name = "s", parentNames = Seq("s"))
    assert(errsOf(facts = Seq(self)).contains(CyclicFactParents("s")))
  }

  test("errors are deduplicated") {
    val f1 = okFact.copy(name = "f1", parentNames = Seq("ghost"))
    val f2 = okFact.copy(name = "f2", parentNames = Seq("ghost"))
    val es = errsOf(facts = Seq(f1, f2))
    assert(es.count(_ == MissingFact("ghost")) == 1)
  }
}
