package graft.sources

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.yaml.snakeyaml.Yaml

import graft.model._

/** YAML model source (S1): parses the same declarative model format as
  * the reference (`app/Ringo/InputParser.hs:21-90`):
  *
  * {{{
  * tables:
  *   - name: events
  *     columns:
  *       - [event_id, bigint, notnull]
  *       - [ts, timestamp without time zone, notnull]
  *       - [event_type, text]            # nullability defaults to null
  *     constraints:
  *       - { type: primary, column: event_id }
  *       - { type: foreign, table: users, columns: [[user_id, id]] }
  * facts:
  *   - name: event
  *     tablename: events
  *     persistent: true                  # default true
  *     parentfacts: []                   # default empty
  *     columns:
  *       - { type: dimtime, column: ts }
  *       - { type: dimval, column: event_type, table: event_type }
  *       - { type: factcount, column: event_count }
  *       - { type: factsum, column: value_sum, sourcecolumn: value }
  * defaults:
  *   bigint: "-1"
  *   text: "'__UNKNOWN_VAL__'"
  * }}}
  */
object ModelParser {

  def parseFile(path: String): Either[String, (Seq[Table], Seq[Fact], TypeDefaults)] =
    Try(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))
      .toEither.left.map(e => s"cannot read $path: ${e.getMessage}")
      .flatMap(parse)

  def parse(yamlText: String): Either[String, (Seq[Table], Seq[Fact], TypeDefaults)] =
    Try {
      val root = new Yaml().load[java.util.Map[String, AnyRef]](yamlText)
      val tables = seqOfMaps(root, "tables").map(parseTable)
      val facts  = seqOfMaps(root, "facts").map(parseFact)
      val defaults = Option(root.get("defaults"))
        .map(_.asInstanceOf[java.util.Map[String, AnyRef]].asScala.toMap
          .map { case (k, v) => k -> String.valueOf(v) })
        .getOrElse(Map.empty[String, String])
      (tables, facts, TypeDefaults(defaults))
    }.toEither.left.map(e => s"cannot parse model: ${e.getMessage}")

  private def seqOfMaps(m: java.util.Map[String, AnyRef], key: String): Seq[java.util.Map[String, AnyRef]] =
    Option(m.get(key))
      .map(_.asInstanceOf[java.util.List[AnyRef]].asScala.toSeq
        .map(_.asInstanceOf[java.util.Map[String, AnyRef]]))
      .getOrElse(Nil)

  private def str(m: java.util.Map[String, AnyRef], key: String): String =
    Option(m.get(key)).map(String.valueOf(_))
      .getOrElse(throw new IllegalArgumentException(s"missing key: $key in $m"))

  private def optStr(m: java.util.Map[String, AnyRef], key: String): Option[String] =
    Option(m.get(key)).map(String.valueOf(_))

  private def parseTable(t: java.util.Map[String, AnyRef]): Table = {
    val cols = Option(t.get("columns")).toSeq
      .flatMap(_.asInstanceOf[java.util.List[java.util.List[AnyRef]]].asScala)
      .map { arr =>
        val a = arr.asScala.map(String.valueOf(_))
        require(a.length >= 2, s"column needs [name, type]: $a")
        val nullable = a.lift(2).getOrElse("null") match {
          case "null"    => Nullable.Null
          case "notnull" => Nullable.NotNull
          case other     => throw new IllegalArgumentException(s"invalid nullable: $other")
        }
        Column(a(0), a(1), nullable)
      }
    val constraints = seqOfMaps(t, "constraints").map { c =>
      str(c, "type") match {
        case "primary" => TableConstraint.PrimaryKey(str(c, "column"))
        case "unique" =>
          TableConstraint.UniqueKey(
            c.get("columns").asInstanceOf[java.util.List[AnyRef]].asScala.toSeq.map(String.valueOf(_)))
        case "foreign" =>
          val pairs = c.get("columns").asInstanceOf[java.util.List[java.util.List[AnyRef]]]
            .asScala.toSeq.map { p =>
              val q = p.asScala.map(String.valueOf(_))
              (q(0), q(1))
            }
          TableConstraint.ForeignKey(str(c, "table"), pairs)
        case other => throw new IllegalArgumentException(s"invalid constraint type: $other")
      }
    }
    Table(str(t, "name"), cols.toSeq, constraints)
  }

  private def parseFact(f: java.util.Map[String, AnyRef]): Fact = {
    import FactColumnKind._
    val columns = seqOfMaps(f, "columns").map { c =>
      val target = str(c, "column")
      val kind = str(c, "type") match {
        case "dimtime"           => DimTime
        case "nodimid"           => NoDimId
        case "tenantid"          => TenantId
        case "dimid"             => DimId(str(c, "table"))
        case "dimval"            => DimVal(str(c, "table"))
        case "factcount"         => FactCount(optStr(c, "sourcecolumn"))
        case "factcountdistinct" => FactCountDistinct(optStr(c, "sourcecolumn"))
        case "factsum"           => FactSum(str(c, "sourcecolumn"))
        case "factaverage"       => FactAverage(str(c, "sourcecolumn"))
        case "factmax"           => FactMax(str(c, "sourcecolumn"))
        case "factmin"           => FactMin(str(c, "sourcecolumn"))
        case other               => throw new IllegalArgumentException(s"invalid fact column type: $other")
      }
      FactColumn(target, kind)
    }
    Fact(
      name = str(f, "name"),
      tableName = str(f, "tablename"),
      persistent = optStr(f, "persistent").forall(_.toBoolean),
      parentNames = Option(f.get("parentfacts")).toSeq
        .flatMap(_.asInstanceOf[java.util.List[AnyRef]].asScala.map(String.valueOf(_))),
      columns = columns
    )
  }
}
