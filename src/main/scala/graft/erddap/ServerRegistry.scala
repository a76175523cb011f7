package graft.erddap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1 — server-registry scan (`erddap_wrangler.py:52-73`): the
  * awesome-erddap `erddaps.json` list (~63 servers) as a static catalog
  * DataFrame. Shape: `[{"name": ..., "url": ..., "public": true}, ...]`.
  * Tiny table — loads once, lives broadcast.
  */
object ServerRegistry {

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", true).json(path)
      .select(col("name"), col("url"), col("public"))

  /** The reference filters to public servers and normalizes the URL to
    * end with a single `/erddap/` base. */
  def publicServers(registry: DataFrame): DataFrame =
    registry.filter(col("public") === true)
      .withColumn("url",
        when(col("url").endsWith("/"), col("url")).otherwise(concat(col("url"), lit("/"))))
}
