package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** GeoJSON geometry constructors + ordinate surgery (F16-F20,
  * `Xml2GeoJSON.py:893-955`, `Json2GeoJSON.py:348-385`) over
  * `ArrayType(Double)` ordinate columns — all codegen'd Column
  * combinators, no UDFs, no geo library.
  *
  * Geometry model: a struct `(type: String, coordinates: <nested
  * arrays>)` serialized to GeoJSON text with `to_json`. Coordinates are
  * `[x, y]`, `[x, y, z]` or `[x, y, z, m]` arrays. The reference's XML
  * sources supply ordinates LAT-FIRST (`y x [z]`); constructors swap to
  * GeoJSON `[x, y, ...]` order (`Xml2GeoJSON.py:893-896`).
  */
object Geometry {

  /** F16 point: `[lat, lon, z?]` ordinates → `[x, y, z?]`. */
  def point(ordinates: Column): Column = {
    val y = element_at(ordinates, 1)
    val x = element_at(ordinates, 2)
    val z = when(size(ordinates) >= 3, element_at(ordinates, 3))
    when(size(ordinates) >= 3, array(x, y, z)).otherwise(array(x, y))
  }

  /** F16 line: flat ordinate list chunked by `dimensions` into points
    * (each point lat-first → swapped). */
  def line(ordinates: Column, dimensions: Int = 2): Column = {
    val n = size(ordinates)
    val idx = sequence(lit(0), (n / lit(dimensions)).cast("int") - 1)
    transform(idx, i => point(slice(ordinates, i * dimensions + 1, lit(dimensions))))
  }

  /** F16 polygon: line reversed to counter-clockwise exterior ring by
    * default (`Xml2GeoJSON.py:903-908`); pass `clockWise=true` for an
    * interior ring. One ring per part. */
  def polygon(ordinates: Column, dimensions: Int = 2,
      clockWise: Boolean = false): Column = {
    val ring = line(ordinates, dimensions)
    array(if (clockWise) ring else reverse(ring))
  }

  /** F16 polygon with holes: `ringOffsets` marks each ring's start in
    * the flat ordinate list (first entry 0 = exterior). The exterior is
    * reversed to counter-clockwise, interior rings keep their supplied
    * (clockwise) order — exactly the reference's ring assembly
    * (`Xml2GeoJSON.py:903-908` reverse-on-exterior, `:1107-1110`
    * clockWise=True after `gml:interior`). Null/empty offsets → plain
    * single-ring [[polygon]]. */
  def polygonRings(ordinates: Column, ringOffsets: Column,
      dimensions: Int = 2): Column = {
    val nRings = size(ringOffsets)
    val ringed = transform(sequence(lit(0), nRings - 1), i => {
      val start = element_at(ringOffsets, i + 1)
      val end = when(i === nRings - 1, size(ordinates))
        .otherwise(element_at(ringOffsets, i + 2))
      val ring = line(slice(ordinates, start + 1, end - start), dimensions)
      when(i === 0, reverse(ring)).otherwise(ring)
    })
    when(ringOffsets.isNull || nRings <= 1, polygon(ordinates, dimensions))
      .otherwise(ringed)
  }

  /** F16 box/envelope: two corners (lowerLeft, upperRight) → closed
    * 5-point ring via polygon() (`Xml2GeoJSON.py:910-920`). */
  def box(ordinates: Column, dimensions: Int = 2): Column = {
    val ll = slice(ordinates, 1, dimensions)
    val ur = slice(ordinates, dimensions + 1, dimensions)
    // upperLeft = lowerLeft with [0] from upperRight; lowerRight converse
    val ul = concat(slice(ur, 1, 1), slice(ll, 2, dimensions - 1))
    val lr = concat(slice(ll, 1, 1), slice(ur, 2, dimensions - 1))
    polygon(concat(ll, ul, ur, lr, ll), dimensions)
  }

  /** F17 elevation broadcast: append `elev` to every coordinate of a
    * line/ring (`Xml2GeoJSON.py:922-928`). */
  def addElevation(coords: Column, elev: Column): Column =
    transform(coords, c => concat(c, array(elev)))

  /** F18 Z surgery on a coordinate array: `z = abs(z)*factor + offset`
    * when present (`Json2GeoJSON.py:367-376`). */
  def zAdjust(coord: Column, zFactor: Column, zOffset: Column,
      zAbsolute: Boolean = false): Column = {
    val z = element_at(coord, 3)
    val adj = (if (zAbsolute) abs(z) else z) * zFactor + zOffset
    when(size(coord) >= 3 && z.isNotNull,
      concat(slice(coord, 1, 2), array(adj), slice(coord, 4, 1)))
      .otherwise(coord)
  }

  /** F18 strip Z/M ordinates per output flags: no M → drop 4th; no Z →
    * drop 3rd (or null it when M kept). */
  def stripZM(coord: Column, keepZ: Boolean, keepM: Boolean): Column = {
    val noM = when(!lit(keepM) && size(coord) === 4, slice(coord, 1, 3))
      .otherwise(coord)
    if (keepZ) noM
    else when(size(noM) === 3, slice(noM, 1, 2))
      .when(size(noM) === 4,
        concat(slice(noM, 1, 2), array(lit(null).cast("double")), slice(noM, 4, 1)))
      .otherwise(noM)
  }

  /** F19 multi-part promotion: >1 part → `Multi<Type>`
    * (`Json2GeoJSON.py:1061-1065`). `parts` is an array of single-part
    * coordinate values. Returns the geometry as a JSON string (the two
    * branches have different coordinate nesting, so a single struct
    * type cannot hold both). */
  def multiPromote(geomType: Column, parts: Column): Column =
    when(size(parts) > 1,
      to_json(struct(concat(lit("Multi"), geomType).as("type"),
        parts.as("coordinates"))))
      .otherwise(to_json(struct(geomType.as("type"),
        element_at(parts, 1).as("coordinates"))))

  /** F20 GeoJSON type canonicalization (`Json2GeoJSON.py:315-322`). */
  val canonicalTypes: Map[String, String] = Map(
    "point" -> "Point", "multipoint" -> "MultiPoint",
    "linestring" -> "LineString", "multilinestring" -> "MultiLineString",
    "polygon" -> "Polygon", "multipolygon" -> "MultiPolygon",
    "geometrycollection" -> "GeometryCollection")

  def canonicalType(c: Column): Column = {
    val pairs = canonicalTypes.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    coalesce(element_at(map(pairs: _*), lower(c)), c)
  }

  /** Geometry struct → GeoJSON geometry object text. */
  def geometryJson(geomType: Column, coordinates: Column): Column =
    to_json(struct(geomType.as("type"), coordinates.as("coordinates")))

  /** K2 feature assembly: a GeoJSON Feature as a JSON string, with all
    * `propertyCols` under "properties". */
  def featureJson(properties: Column, geometry: Column): Column =
    to_json(struct(lit("Feature").as("type"), properties.as("properties"),
      geometry.as("geometry")))
}
