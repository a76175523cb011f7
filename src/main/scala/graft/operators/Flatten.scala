package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** F13/F14 — schema-driven JSON flattening
  * (`Json2GeoJSON.py:1000-1027`): nested structs become `parent_child`
  * columns ( `_`-joined path names), exclusion-aware; non-scalar leaves
  * (arrays, maps) re-serialize via `to_json` (the reference's
  * `json.dumps` for non-scalar values); colliding flat names uniquify
  * as `name2`, `name3`, ….
  *
  * Pure plan-time schema recursion — generates one `select`, so
  * Catalyst still prunes unused leaves at the source.
  */
object Flatten {

  def flatten(df: DataFrame, sep: String = "_",
      exclude: Set[String] = Set.empty): DataFrame = {

    def leaves(prefix: Seq[String], dt: DataType): Seq[(Seq[String], DataType)] =
      dt match {
        case st: StructType =>
          st.fields.toSeq.flatMap { f =>
            val path = prefix :+ f.name
            if (exclude.contains(path.mkString("."))) Nil
            else leaves(path, f.dataType)
          }
        case other => Seq((prefix, other))
      }

    val cols = df.schema.fields.toSeq.flatMap { f =>
      if (exclude.contains(f.name)) Nil
      else leaves(Seq(f.name), f.dataType)
    }

    // F13 name uniquification: collision → name2, name3, …
    val used = collection.mutable.Map.empty[String, Int]
    val selected = cols.map { case (path, dt) =>
      val flat = path.mkString(sep)
      val name = used.get(flat) match {
        case None => used(flat) = 1; flat
        case Some(n) => used(flat) = n + 1; s"$flat${n + 1}"
      }
      val ref = col(path.map(p => s"`$p`").mkString("."))
      val value = dt match {
        case _: ArrayType | _: MapType => to_json(ref)
        case _ => ref
      }
      value.as(name)
    }
    df.select(selected: _*)
  }
}
