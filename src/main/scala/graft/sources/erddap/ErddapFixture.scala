package graft.sources.erddap

import java.nio.file.{Files, Path}

/** Deterministic tabledap fixture for plan audits and demos: 96 hourly
  * observations (2024-06-01 → 2024-06-04) with a DAS whose actual_range
  * matches, so the metadata-only aggregate path (COUNT from the size
  * probe, min/max(time) from DAS) is exercisable without test scope. */
object ErddapFixture {

  val rows = 96
  val datasetId = "auditbuoy"

  /** Write (idempotently) and return the fixture directory. */
  def ensure(): String = {
    val dir = Path.of(System.getProperty("java.io.tmpdir"), "graft_erddap_fixture")
    Files.createDirectories(dir)
    val csv = dir.resolve(s"$datasetId.csv")
    if (!Files.exists(csv)) {
      val body = (0 until rows).map { h =>
        val t = java.time.Instant.parse("2024-06-01T00:00:00Z").plusSeconds(h * 3600L)
        s"${graft.erddap.ChunkPlanner.isoNoZone(t)}Z,25.9,-89.7,${20.0 + h % 10}"
      }
      Files.writeString(csv,
        ("time,latitude,longitude,sst" +: body).mkString("\n"))
      Files.writeString(dir.resolve(s"$datasetId.das"),
        """Attributes {
          |  time {
          |    String ioos_category "Time";
          |    Float64 actual_range 1717200000.0, 1717542000.0;
          |  }
          |  latitude { Float64 actual_range 25.9, 25.9; }
          |  longitude { Float64 actual_range -89.7, -89.7; }
          |  sst { Float64 actual_range 20.0, 29.0; }
          |  NC_GLOBAL { String title "Audit buoy"; }
          |}""".stripMargin)
    }
    dir.toString
  }
}
