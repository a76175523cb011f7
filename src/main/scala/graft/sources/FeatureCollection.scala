package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Flatten

/** S11 — JSON FeatureCollection / item-list scan
  * (`Json2GeoJSON.py:833-895`).
  *
  * Root-element detection is plan-time and schema-driven (the reference
  * parses the document and picks the known root `features` if present,
  * else the top-level key holding the LARGEST list): here we inspect
  * the inferred schema for array-typed top-level fields, take
  * `features` when present, otherwise the array field with the highest
  * element count (one tiny aggregation over the document — documents
  * are single files, not the 100 TB path). Reading explodes the root
  * array and flattens item structs via [[Flatten]].
  */
object FeatureCollection {

  val knownRoots: Seq[String] = Seq("features")

  /** Detect the root element name of a JSON document. */
  def detectRoot(spark: SparkSession, path: String): Option[String] = {
    val doc = spark.read.option("multiLine", true).json(path)
    val arrayFields = doc.schema.fields.collect {
      case StructField(name, _: ArrayType, _, _) => name
    }.toSeq
    knownRoots.find(arrayFields.contains).orElse {
      if (arrayFields.isEmpty) None
      else if (arrayFields.size == 1) Some(arrayFields.head)
      else {
        val counts = doc.select(arrayFields.map(f => size(col(f)).as(f)): _*).head()
        Some(arrayFields.maxBy(f => counts.getAs[Int](f)))
      }
    }
  }

  /** Read the document's items as rows: explode the root array, flatten
    * nested structs to `_`-joined columns (F14), uniquify collisions
    * (F13). */
  def read(spark: SparkSession, path: String,
      rootElement: Option[String] = None): DataFrame = {
    val root = rootElement.orElse(detectRoot(spark, path))
      .getOrElse(throw new IllegalArgumentException(
        s"Unable to identify as 'Feature Collection': $path"))
    val doc = spark.read.option("multiLine", true).json(path)
    val items = doc.select(explode(col(root)).as("item")).select("item.*")
    Flatten.flatten(items)
  }

  /** F22 — publication-date short-circuit: the document's publication
    * stamp (first of `lastBuildDate`/`pubDate`/`published`/`generated`
    * present at any nesting level of the inferred schema top level),
    * for the caller's incremental-load watermark
    * (`Json2GeoJSON.py:897-921`). */
  val publicationTags: Seq[String] = Seq("lastBuildDate", "pubDate", "published", "generated")

  def publicationDate(spark: SparkSession, path: String): Option[String] = {
    val doc = spark.read.option("multiLine", true).json(path)
    val flat = Flatten.flatten(doc)
    val candidates = publicationTags.flatMap(t =>
      flat.columns.find(c => c == t || c.endsWith(s"_$t")))
    candidates.headOption.map(c => flat.select(col(c).cast("string")).head().getString(0))
  }
}
