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

  /** F22 GATE FIXTURE + FLOW — the publication-date short-circuit as
    * an oracle-checkable batch: one tiny JSON document per
    * `event_type`, its publication stamp = the type's max event time,
    * carried under a DIFFERENT tag (and nesting depth) per
    * alphabetical rank to exercise the whole tag-priority matrix:
    * rank 1 `lastBuildDate` (top level), 2 `pubDate` (nested), 3
    * `published` (top), 4 `generated` (nested), 5 BOTH `pubDate` and
    * `generated` (priority must pick `pubDate`). The stored watermark
    * is the stamp itself for even ranks (not newer → abort conversion,
    * `Json2GeoJSON.py:897-921`) and a day older for odd ranks
    * (refresh). Everything derives from `events.parquet`, so DuckDB
    * replays tag choice, stamp, and verdict. */
  def publicationGate(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.file.{Files, Path}
    val safe = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    // dir name carries the source fingerprint: regenerated testdata
    // rebuilds the fixture instead of serving a stale one
    val dir = Path.of(System.getProperty("java.io.tmpdir"),
      s"graft_f22_fixture_${safe}_${graft.Tables.contentTag(sfDir, "events")}")
    val mx = graft.Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(date_format(date_trunc("second", max(col("ts"))),
        "yyyy-MM-dd HH:mm:ss").as("pub"))
      .collect().map(r => r.getString(0) -> r.getString(1)).sortBy(_._1)
    val marker = dir.resolve("_READY")
    if (!Files.exists(marker)) {
      Files.createDirectories(dir)
      mx.zipWithIndex.foreach { case ((tp, pub), i) =>
        val doc = (i + 1) match {
          case 1 => s"""{"lastBuildDate": "$pub", "items": [{"a": 1}]}"""
          case 2 => s"""{"channel": {"pubDate": "$pub"}, "items": [{"a": 1}]}"""
          case 3 => s"""{"published": "$pub", "items": [{"a": 1}]}"""
          case 4 => s"""{"feed": {"generated": "$pub"}, "items": [{"a": 1}]}"""
          case _ =>
            s"""{"generated": "1970-01-01 00:00:00", "channel": {"pubDate": "$pub"}, "items": [{"a": 1}]}"""
        }
        Files.writeString(dir.resolve(s"ds_$tp.json"), doc)
      }
      Files.writeString(marker, "ok")
    }
    import spark.implicits._
    val rows = mx.zipWithIndex.map { case ((tp, pub), i) =>
      val r = i + 1
      val (tag, value) =
        publicationDateTagged(spark, dir.resolve(s"ds_$tp.json").toString)
          .getOrElse(sys.error(s"no publication tag found for ds_$tp"))
      // stored watermark: even ranks already saw this stamp → skip
      val stored = if (r % 2 == 0) value
        else {
          val t = java.sql.Timestamp.valueOf(value)
          new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
            .format(new java.util.Date(t.getTime - 86400000L))
        }
      (s"ds_$tp", tag, value, value > stored)
    }.toSeq
    rows.toDF("dataset_id", "tag_used", "pub_date", "refresh")
  }

  def publicationDate(spark: SparkSession, path: String): Option[String] =
    publicationDateTagged(spark, path).map(_._2)

  /** [[publicationDate]] plus WHICH tag matched — tag-list priority
    * order (not document order: a doc carrying both `pubDate` and
    * `generated` reports `pubDate`), matching at top level or any
    * flattened `_`-suffix nesting. */
  def publicationDateTagged(spark: SparkSession,
      path: String): Option[(String, String)] = {
    val doc = spark.read.option("multiLine", true).json(path)
    val flat = Flatten.flatten(doc)
    val candidates = publicationTags.flatMap(t =>
      flat.columns.find(c => c == t || c.endsWith(s"_$t")).map(t -> _))
    candidates.headOption.map { case (t, c) =>
      t -> flat.select(col(c).cast("string")).head().getString(0)
    }
  }
}
