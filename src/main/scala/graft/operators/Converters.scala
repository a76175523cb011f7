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
/** Contract for dynamically-loaded converters (the reference's
  * `Template.py:19-59` `convert()` entry point): implement this with a
  * no-arg constructor and pass the fully-qualified class name wherever
  * a converter name is accepted. */
trait ConverterPlugin {
  def convert(df: DataFrame): DataFrame
}

object Converters {

  type Converter = DataFrame => DataFrame

  private val registry = new java.util.concurrent.ConcurrentHashMap[String, Converter]()

  /** Register a named converter (the analog of dropping a module into
    * `Converters/`). Last registration wins, like a module reload. */
  def register(name: String, fn: Converter): Unit = registry.put(name, fn)

  /** Resolve by name; the reference raises on missing module.
    *
    * Dot-path names load DYNAMICALLY, mirroring the reference's
    * runtime `importlib`-style converter import
    * (`OverwriteFS.py:871-895`): a name containing '.' is treated as a
    * fully-qualified class name implementing [[ConverterPlugin]],
    * instantiated reflectively (no-arg constructor) and cached in the
    * registry — dropping a converter class on the classpath is the
    * analog of dropping a module into `Converters/`. */
  def resolve(name: String): Converter = {
    val fn = registry.get(name)
    if (fn != null) return fn
    if (name.contains(".")) {
      val loaded =
        try Class.forName(name).getDeclaredConstructor().newInstance()
          .asInstanceOf[ConverterPlugin]
        catch {
          case e: ClassNotFoundException =>
            throw new IllegalArgumentException(s"Converter not found: '$name'", e)
          case e: ClassCastException =>
            throw new IllegalArgumentException(
              s"'$name' does not implement ConverterPlugin", e)
        }
      val converter: Converter = loaded.convert
      registry.put(name, converter)
      return converter
    }
    throw new IllegalArgumentException(s"Converter not found: '$name'")
  }

  def names: Seq[String] = {
    import scala.jdk.CollectionConverters._
    registry.keys().asScala.toSeq.sorted
  }

  /** Apply an optional converter between source and sink — the
    * reference's invocation point (`OverwriteFS.py:1997-2030`). */
  def applyOpt(df: DataFrame, name: Option[String]): DataFrame =
    name.map(resolve(_)(df)).getOrElse(df)

  /** F21 — value-content field-type detection
    * (`Json2GeoJSON.py:711-750`): classify a field's string value as
    * 'integer' / 'float' / 'date' / 'text', with the element NAME
    * promoting integral epoch-looking values to 'date' when it
    * contains a date-ish word. Faithful to the reference INCLUDING its
    * dead branches: the time (`:`) and datetime rules call a
    * nonexistent `str.isDigit`, so any value reaching them raises and
    * falls through to 'text' — only the slash/dash all-digits rule
    * ever yields 'date' for non-integers (ISO datetimes with a time
    * part are therefore 'text', as upstream actually behaves).
    * Numeric grammars are the common ASCII decimal/scientific forms
    * (Python's `int()`/`float()` extras — underscores, inf/nan,
    * surrounding whitespace — don't occur in field data and are not
    * modeled). Pure codegen'd when/rlike chain, null value → 'text'
    * (upstream: every probe raises on None). */
  def detectType(name: org.apache.spark.sql.Column,
      value: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val dateWords = Seq("date", "time", "updated", "created", "modified",
      "start", "end")
    val nameIsDateish = dateWords
      .map(w => lower(name).contains(w))
      .reduce(_ || _)
    val isInt = value.rlike("^[+-]?[0-9]+$")
    val isFloat =
      value.rlike("^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$")
    val slashDashDate = (value.contains("/") || value.contains("-")) &&
      regexp_replace(regexp_replace(value, "/", ""), "-", "")
        .rlike("^[0-9]+$")
    when(value.isNull, lit("text"))
      .when(isInt, when(nameIsDateish, lit("date")).otherwise(lit("integer")))
      .when(isFloat, lit("float"))
      .when(slashDashDate, lit("date"))
      .otherwise(lit("text"))
  }

  // Built-ins mirroring the reference's shipped converters.
  register("json2geojson", df => Flatten.flatten(df))
  register("identity", df => df)
}
