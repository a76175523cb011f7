package graft.sinks

import java.nio.file.{Files, Path}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.sources.griddap.GridNc

/** K4 at scale — write a long-form grid DataFrame back out as NetCDF,
  * ONE FILE PER TIME SLICE, executor-side: `repartition(time)` routes
  * every row of a slice to one task, each task densifies its slices and
  * serializes them with [[GridNc]] (lat axis reoriented north→south on
  * the way out, `agol_wrangler.py:235-261`). No slice ever passes
  * through the driver, so the write scales with the time axis — the
  * shape a 1000-executor cluster needs (point the target at a shared
  * filesystem there; slices land in parallel).
  *
  * Cells absent from the long form are filled with NaN (NetCDF's
  * conventional missing marker).
  */
object NetcdfSink {

  def writePerSlice(longForm: DataFrame, outDir: String, varCols: Seq[String],
      latFlip: Boolean = true): Long = {
    Files.createDirectories(Path.of(outDir))
    val cols = Seq("time", "latitude", "longitude") ++ varCols
    val written = longForm.sparkSession.sparkContext.longAccumulator("nc_slices")

    longForm.select(cols.map(col): _*)
      .repartition(col("time"))
      .foreachPartition { (it: Iterator[Row]) =>
        // rows of (possibly several) complete time slices
        case class Cell(lat: Double, lon: Double, vs: Array[Double])
        val byTime = mutable.LinkedHashMap.empty[Long, mutable.ArrayBuffer[Cell]]
        it.foreach { r =>
          val epochSec = r.getTimestamp(0).toInstant.getEpochSecond
          val vs = Array.tabulate(varCols.length) { i =>
            if (r.isNullAt(3 + i)) Double.NaN else r.getDouble(3 + i)
          }
          byTime.getOrElseUpdate(epochSec, mutable.ArrayBuffer.empty) +=
            Cell(r.getDouble(1), r.getDouble(2), vs)
        }
        byTime.foreach { case (t, cells) =>
          val lats = cells.map(_.lat).distinct.sorted.toArray
          val lons = cells.map(_.lon).distinct.sorted.toArray
          val latIdx = lats.zipWithIndex.toMap
          val lonIdx = lons.zipWithIndex.toMap
          val mats = varCols.indices.map(_ =>
            Array.fill(lats.length * lons.length)(Double.NaN)).toArray
          cells.foreach { c =>
            val k = latIdx(c.lat) * lons.length + lonIdx(c.lon)
            varCols.indices.foreach(i => mats(i)(k) = c.vs(i))
          }
          val grid = GridNc.Grid(
            dims = Seq(("time", 1), ("latitude", lats.length),
              ("longitude", lons.length)),
            vars = GridNc.Var("time", Seq(0), isFloat = false,
                Array(t.toDouble)) +:
              GridNc.Var("latitude", Seq(1), isFloat = false, lats) +:
              GridNc.Var("longitude", Seq(2), isFloat = false, lons) +:
              varCols.indices.map(i =>
                GridNc.Var(varCols(i), Seq(0, 1, 2), isFloat = false, mats(i))))
          val out = if (latFlip) GridNc.latFlip(grid) else grid
          Files.write(Path.of(outDir, s"slice_$t.nc"), GridNc.write(out))
          written.add(1)
        }
      }
    written.value
  }
}
