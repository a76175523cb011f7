package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class FileChangeSpec extends AnyFunSuite {

  test("crc32 change detection: unchanged bytes skip, changed bytes pass") {
    val f = Files.createTempFile("cc", ".csv")
    Files.writeString(f, "a,b\n1,2\n")
    val (d1, c1) = FileChange.byCrc(f, None)
    assert(d1 == FileChange.Changed)
    val (d2, c2) = FileChange.byCrc(f, Some(c1))
    assert(d2 == FileChange.Unchanged && c2 == c1)
    Files.writeString(f, "a,b\n1,3\n")
    val (d3, c3) = FileChange.byCrc(f, Some(c1))
    assert(d3 == FileChange.Changed && c3 != c1)
  }

  test("last-modified tier: older source skips unless ignoreAge") {
    assert(FileChange.byLastModified(100L, 200L) == FileChange.Unchanged)
    assert(FileChange.byLastModified(300L, 200L) == FileChange.Changed)
    assert(FileChange.byLastModified(100L, 200L, ignoreAge = true) ==
      FileChange.Changed)
  }

  test("converter registry resolves, composes into plans, errors on missing") {
    val spark = graft.operators.SparkTestSession.spark
    import spark.implicits._
    val df = spark.read.json(Seq("""{"a": {"b": 1}}""").toDS())
    val out = graft.operators.Converters.applyOpt(df, Some("json2geojson"))
    assert(out.columns.toSeq == Seq("a_b"))
    assert(graft.operators.Converters.applyOpt(df, None) eq df)
    intercept[IllegalArgumentException] {
      graft.operators.Converters.resolve("nope")
    }
  }

  test("converter plugin loads dynamically by fully-qualified class name") {
    val spark = graft.operators.SparkTestSession.spark
    import spark.implicits._
    val df = Seq((1, "x"), (2, "y")).toDF("id", "v")
    val out = graft.operators.Converters.applyOpt(df,
      Some("graft.streaming.UppercaseConverter"))
    assert(out.columns.contains("v_upper"))
    assert(out.select("v_upper").as[String].collect().toSet == Set("X", "Y"))
    // second resolve hits the registry cache (same instance behavior)
    assert(graft.operators.Converters.names
      .contains("graft.streaming.UppercaseConverter"))
    // unknown class and non-plugin class both raise, like the reference
    intercept[IllegalArgumentException] {
      graft.operators.Converters.resolve("no.such.ConverterClass")
    }
    intercept[IllegalArgumentException] {
      graft.operators.Converters.resolve("java.lang.String")
    }
  }

  test("server registry: public filter + url normalization") {
    val f = Files.createTempFile("reg", ".json")
    Files.writeString(f,
      """[{"name": "GCOOS", "url": "https://erddap2.gcoos.org/erddap", "public": true},
        | {"name": "Private", "url": "https://x/erddap/", "public": false}]""".stripMargin)
    val spark = graft.operators.SparkTestSession.spark
    val reg = graft.erddap.ServerRegistry.load(spark, f.toString)
    val pub = graft.erddap.ServerRegistry.publicServers(reg).collect()
    assert(pub.length == 1)
    assert(pub(0).getAs[String]("url") == "https://erddap2.gcoos.org/erddap/")
  }
}

/** Fixture for the dynamic-converter-loading test: resolved by FQCN. */
class UppercaseConverter extends graft.operators.ConverterPlugin {
  override def convert(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.withColumn("v_upper", org.apache.spark.sql.functions.upper(
      org.apache.spark.sql.functions.col("v")))
}
