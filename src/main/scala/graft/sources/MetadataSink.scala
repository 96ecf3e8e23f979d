package graft.sources

import java.nio.file.{Files, Paths}

import graft.derive.Extractor
import graft.model.Env

/** JSON metadata sinks (S3): dependencies.json, dimensions.json,
  * facts.json — the orchestration metadata the reference emits
  * (`app/Main.hs:43-52`), same shapes: dependencies as an object
  * `{table: [deps...]}` (left-biased union across facts),
  * dimensions/facts as flat arrays of table names in declared fact
  * order (dimensions keeps per-fact duplicates, as the reference's
  * list comprehension does).
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

  /** Flat array of derived dimension table names, in fact order
    * (`app/Main.hs:48-49`); per-fact duplicates are kept.
    */
  def dimensionsJson(env: Env): String =
    arr(env.facts.flatMap { f =>
      Extractor
        .extractDimensionTables(env, f)
        .filterNot(env.tables.contains)
        .map(_.name)
    })

  /** Flat array of extracted fact table names for persistent facts, in
    * fact order (`app/Main.hs:51-52`).
    */
  def factsJson(env: Env): String =
    arr(env.facts.filter(_.persistent).map { f =>
      val s = env.settings
      graft.model.Naming.extractedFactTableName(s.factPrefix, s.factInfix, f.name, s.timeUnit)
    })

  def writeAll(env: Env, outDir: String): Unit = {
    Files.createDirectories(Paths.get(outDir))
    val s = env.settings
    Files.writeString(Paths.get(outDir, s.dependenciesJsonFileName), dependenciesJson(env))
    Files.writeString(Paths.get(outDir, s.dimensionsJsonFileName), dimensionsJson(env))
    Files.writeString(Paths.get(outDir, s.factsJsonFileName), factsJson(env))
  }
}
