package graft.operators

import org.apache.spark.sql.DataFrame

/** §2.11 — the user extension surface. The reference's converter
  * plugin protocol dynamically imports any module exposing
  * `convert(sourceFilename[, checkPublication[, verbose]])`
  * (`OverwriteFS.py:871-895`, contract `Template.py:19-59`) and runs it
  * as a file→file transform between download and publish.
  *
  * Spark-native shape: a converter is a registered, ANALYZABLE
  * `DataFrame => DataFrame` stage — it composes into the logical plan,
  * so Catalyst optimizes across the converter boundary (pushdown
  * through it where legal) instead of opaque file rewriting.
  */
object Converters {

  type Converter = DataFrame => DataFrame

  private val registry = new java.util.concurrent.ConcurrentHashMap[String, Converter]()

  /** Register a named converter (the analog of dropping a module into
    * `Converters/`). Last registration wins, like a module reload. */
  def register(name: String, fn: Converter): Unit = registry.put(name, fn)

  /** Resolve by name; the reference raises on missing module. */
  def resolve(name: String): Converter = {
    val fn = registry.get(name)
    if (fn == null)
      throw new IllegalArgumentException(s"Converter not found: '$name'")
    fn
  }

  def names: Seq[String] = {
    import scala.jdk.CollectionConverters._
    registry.keys().asScala.toSeq.sorted
  }

  /** Apply an optional converter between source and sink — the
    * reference's invocation point (`OverwriteFS.py:1997-2030`). */
  def applyOpt(df: DataFrame, name: Option[String]): DataFrame =
    name.map(resolve(_)(df)).getOrElse(df)

  // Built-ins mirroring the reference's shipped converters.
  register("json2geojson", df => Flatten.flatten(df))
  register("identity", df => df)
}
