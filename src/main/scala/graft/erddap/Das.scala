package graft.erddap

import scala.collection.immutable.ListMap
import scala.collection.mutable

import org.apache.spark.sql.types._

/** DAS (Dataset Attribute Structure) document model + parser.
  *
  * Re-implements the reference's stateful line parser
  * (`das_client.py:25-135`): sections open on a line ending `{`, close
  * on `}`; attributes are `<datatype> <name> <value>` triples; String
  * attributes inside NC_GLOBAL may span multiple lines (value closed by
  * `";`), including the "String license" form where the quoted value
  * starts on the NEXT line. The DAS is the system's only schema source —
  * here it becomes a Spark `StructType` at plan time with the full
  * attribute bag preserved as column `Metadata`.
  */
object Das {

  case class Attr(datatype: String, value: String)
  /** var → attr name → Attr; insertion-ordered like the reference's
    * OrderedDict. */
  case class Document(sections: ListMap[String, ListMap[String, Attr]]) {
    def ncGlobal: Map[String, Attr] =
      sections.getOrElse("NC_GLOBAL", ListMap.empty)
    def variables: Seq[String] = sections.keys.filterNot(_ == "NC_GLOBAL").toSeq
  }

  def parse(text: String): Document = {
    val sections = mutable.LinkedHashMap.empty[String, mutable.LinkedHashMap[String, Attr]]
    var current: Option[mutable.LinkedHashMap[String, Attr]] = None
    var inNcGlobal = false
    var inMultiline = false
    var checkForQuotes = false
    var mlName: String = null
    var mlType: String = null
    val mlLines = mutable.ArrayBuffer.empty[String]

    for (raw <- text.strip().linesIterator) {
      val line = raw.strip()
      if (line.nonEmpty && !line.startsWith("Attributes {")) {
        if (line.endsWith("{")) {
          val name = line.split("\\s+")(0)
          val sec = mutable.LinkedHashMap.empty[String, Attr]
          sections(name) = sec
          current = Some(sec)
          inNcGlobal = name == "NC_GLOBAL"
        } else if (line == "}") {
          inNcGlobal = false
          current = None
          checkForQuotes = false
        } else if (inNcGlobal && inMultiline) {
          mlLines += line
          if (line.endsWith("\";")) {
            inMultiline = false
            val combined = mlLines.mkString("\n")
              .reverse.dropWhile(c => c == ';' || c == '"').reverse.strip()
            current.foreach(_(mlName) = Attr(mlType, combined))
            mlName = null; mlType = null; mlLines.clear()
          }
        } else if (inNcGlobal && checkForQuotes) {
          checkForQuotes = false
          inMultiline = true
          mlLines.clear()
          mlLines += line
        } else current match {
          case Some(sec) =>
            val parts = line.split("\\s+", 3)
            if (parts.length == 2 && inNcGlobal && parts(0) == "String") {
              // `String license` with the quoted value on following lines
              // (the reference's check_for_quotes state, das_client.py:92-98)
              mlType = parts(0); mlName = parts(1); checkForQuotes = true
            } else if (parts.length == 3) {
              val Array(datatype, name, value) = parts
              if (inNcGlobal && datatype == "String") {
                if (value.startsWith("\"") && !value.endsWith("\";")) {
                  inMultiline = true; mlType = datatype; mlName = name
                  mlLines.clear(); mlLines += value
                } else if (!value.startsWith("\"")) {
                  mlType = datatype; mlName = name; checkForQuotes = true
                } else {
                  sec(name) = Attr(datatype, stripQuotes(value))
                }
              } else {
                sec(name) = Attr(datatype, stripQuotes(value))
              }
            }
          case None => // outside any section: ignore
        }
      }
    }
    Document(ListMap.from(sections.map { case (k, v) => k -> ListMap.from(v) }))
  }

  /** Matches the reference's `value.strip('";')` for single-line values:
    * strips quote/semicolon from BOTH ends. Multiline joins intentionally
    * keep a leading quote (`rstrip` only, das_client.py:80) — a reference
    * quirk we reproduce. */
  private def stripQuotes(v: String): String =
    v.dropWhile(c => c == '"' || c == ';')
      .reverse.dropWhile(c => c == ';' || c == '"').reverse

  /** DAS primitive type → Spark type (`das_client.py` keeps them as
    * strings; we materialize real Catalyst types). */
  def sparkType(dasType: String): DataType = dasType match {
    case "Float64" => DoubleType
    case "Float32" => FloatType
    case "Int32" | "UInt32" => IntegerType
    case "Int16" | "UInt16" => ShortType
    case "Byte" | "Int8" | "UByte" => ByteType
    case "Int64" | "UInt64" => LongType
    case _ => StringType
  }

  /** Build the plan-time schema for a selected attribute list. The time
    * column becomes TimestampType (ERDDAP serves ISO-8601/epoch); every
    * DAS attribute of the variable is preserved in the field Metadata. */
  def toStructType(doc: Document, attrs: Seq[String],
      timeCol: Option[String]): StructType =
    StructType(attrs.map { name =>
      val varAttrs = doc.sections.getOrElse(name, ListMap.empty)
      val mb = new MetadataBuilder()
      varAttrs.foreach { case (k, a) => mb.putString(k, a.value) }
      val dt =
        if (timeCol.contains(name)) TimestampType
        else varAttrs.get("actual_range").map(a => sparkType(a.datatype))
          .orElse(varAttrs.headOption.map(a => sparkType(a._2.datatype)))
          .getOrElse(StringType)
      StructField(name, dt, nullable = true, metadata = mb.build())
    })

  /** Time extent from the time variable's `actual_range` (epoch-second
    * pair): negative epochs are offset from 1970-01-01, end clamped to
    * `now` (`das_client.py:189-209`). None when the variable has no
    * actual_range (the reference's "no_time_range" special case,
    * `das_client.py:223-227`). */
  def timeExtent(doc: Document, timeCol: String,
      now: java.time.Instant = java.time.Instant.now())
      : Option[(java.time.Instant, java.time.Instant)] = {
    for {
      sec <- doc.sections.get(timeCol)
      range <- sec.get("actual_range")
      parts = range.value.split(",\\s*")
      if parts.length == 2
    } yield {
      val s = parts(0).toDouble
      val e = parts(1).toDouble
      val start = java.time.Instant.ofEpochMilli((s * 1000).toLong)
      val endRaw = java.time.Instant.ofEpochMilli((e * 1000).toLong)
      val end = if (endRaw.isAfter(now)) now else endRaw
      (start, end)
    }
  }

  /** S5/P5/P7 GATE — DAS fetch + parse + attribute policy as an
    * oracle-checkable batch: one DAS document per `event_type`
    * (written idempotently per sfDir, time actual_range from the
    * type's truncated min/max event time) through the REAL [[parse]]
    * and [[AttributePolicy.actualAttributes]]. Each document carries a
    * QC-suffixed variable (`value_qc`) the policy must PRUNE (P5), a
    * time variable the fallback chain must detect (P7), and an
    * NC_GLOBAL title; the extent reads back through [[timeExtent]].
    * DuckDB replays attributes, extent epochs, and title from
    * `events.parquet`. */
  def dasGate(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame = {
    import java.nio.file.{Files, Path}
    import org.apache.spark.sql.functions._
    val safe = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    // dir name carries the source fingerprint: regenerated testdata
    // rebuilds the fixture instead of serving a stale one
    val dir = Path.of(System.getProperty("java.io.tmpdir"),
      s"graft_das_fixture_${safe}_${graft.Tables.contentTag(sfDir, "events")}")
    val mx = graft.Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(min(unix_timestamp(date_trunc("second", col("ts")))).as("lo"),
        max(unix_timestamp(date_trunc("second", col("ts")))).as("hi"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val marker = dir.resolve("_READY")
    if (!Files.exists(marker)) {
      Files.createDirectories(dir)
      // sections are written multi-line: the parser is line-based like
      // the reference's (a section opens only on a line ENDING in `{`)
      mx.foreach { case (tp, lo, hi) =>
        Files.writeString(dir.resolve(s"ds_$tp.das"),
          s"""Attributes {
             |  time {
             |    String ioos_category "Time";
             |    Float64 actual_range $lo.0, $hi.0;
             |  }
             |  value {
             |    Float64 actual_range 0.0, 1.0;
             |  }
             |  value_qc {
             |    String ioos_category "Quality";
             |  }
             |  NC_GLOBAL {
             |    String title "DAS fixture $tp";
             |  }
             |}""".stripMargin)
      }
      Files.writeString(marker, "ok")
    }
    import spark.implicits._
    mx.toSeq.map { case (tp, _, _) =>
      val das = parse(Files.readString(dir.resolve(s"ds_$tp.das")))
      val sel = AttributePolicy.actualAttributes(das)
      val tc = sel.timeCol.getOrElse(sys.error(s"no time column for ds_$tp"))
      val (lo, hi) = timeExtent(das, tc).getOrElse(
        sys.error(s"no time extent for ds_$tp"))
      (s"ds_$tp", tc, sel.attributes.mkString("|"),
        lo.getEpochSecond, hi.getEpochSecond,
        das.ncGlobal("title").value)
    }.toDF("dataset_id", "time_col", "attributes",
      "time_lo_epoch", "time_hi_epoch", "title")
  }
}
