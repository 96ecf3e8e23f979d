package graft.sources

import java.nio.file.{Files, Paths}

import graft.derive.Extractor
import graft.model.Env

/** JSON metadata sinks (S3): dependencies.json, dimensions.json,
  * facts.json — the orchestration metadata the reference emits
  * (`app/Main.hs:43-52`), same shapes.
  */
object MetadataSink {

  private def esc(s: String): String = "\"" + s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  } + "\""

  private def arr(xs: Seq[String]): String  = xs.map(esc).mkString("[", ",", "]")
  private def obj(kv: Seq[(String, String)]): String =
    kv.map { case (k, v) => s"${esc(k)}:$v" }.mkString("{", ",", "}")

  /** `{table: [dependencies...]}` — union of per-fact DAGs. */
  def dependenciesJson(env: Env): String =
    obj(Extractor.allDependencies(env).toSeq.sortBy(_._1).map { case (t, ds) => t -> arr(ds) })

  /** `{factName: [derived dimension tables...]}`. */
  def dimensionsJson(env: Env): String =
    obj(env.facts.map { f =>
      val dims = Extractor
        .extractDimensionTables(env, f)
        .filterNot(env.tables.contains)
        .map(_.name)
      f.name -> arr(dims)
    })

  /** `{factName: extractedFactTableName}` for persistent facts. */
  def factsJson(env: Env): String =
    obj(env.facts.filter(_.persistent).map { f =>
      val s = env.settings
      f.name -> esc(
        graft.model.Naming.extractedFactTableName(s.factPrefix, s.factInfix, f.name, s.timeUnit))
    })

  def writeAll(env: Env, outDir: String): Unit = {
    Files.createDirectories(Paths.get(outDir))
    val s = env.settings
    Files.writeString(Paths.get(outDir, s.dependenciesJsonFileName), dependenciesJson(env))
    Files.writeString(Paths.get(outDir, s.dimensionsJsonFileName), dimensionsJson(env))
    Files.writeString(Paths.get(outDir, s.factsJsonFileName), factsJson(env))
  }
}
