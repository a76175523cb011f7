package graft.erddap

/** Projection + predicate → ERDDAP request URL ("physical plan" of the
  * reference; SURVEY.md §2.3). In the Spark connector this is the
  * pushdown target: `SupportsPushDownRequiredColumns` feeds the
  * attribute list, `SupportsPushDownFilters` feeds the time range, and
  * each chunk becomes one InputPartition URL.
  *
  * Grammar (`data_wrangler.py:324-387`):
  *   `<server><id>.<fmt>?<time>%2C<attrs>&<time>%3E%3D<start>Z&<time>%3C%3D<end>Z`
  * with `depth` forced to the front of the attribute list, the time
  * column pulled out and prepended, and one URL per time chunk when
  * subsetting.
  */
object UrlCompiler {

  case class Tabledap(
      server: String,
      datasetId: String,
      format: String = "csvp",
      attributes: Seq[String] = Nil,
      timeCol: Option[String] = None,
      start: Option[String] = None,
      end: Option[String] = None,
      chunks: Seq[ChunkPlanner.TimeChunk] = Nil,
      noTimeRange: Boolean = false,
      startExclusive: Boolean = false,
      endExclusive: Boolean = false)

  /** Attribute ordering (`data_wrangler.py:330-344`): depth first, time
    * column removed (it is prepended separately). */
  def orderAttributes(attrs: Seq[String], timeCol: Option[String]): Seq[String] = {
    val (depth, rest) = attrs.partition(_ == "depth")
    (depth ++ rest).filterNot(a => timeCol.contains(a))
  }

  def compile(req: Tabledap): Seq[String] = {
    val attrs = orderAttributes(req.attributes, req.timeCol)
    val attrsEncoded = attrs.mkString("%2C")
    val base = s"${req.server}${req.datasetId}.${req.format}"

    // Interior chunk starts compile to the STRICT `>` operator (part of
    // ERDDAP's public constraint grammar, though the reference only
    // emits >=/<=): adjacent chunks share their boundary instant, and
    // with closed bounds on both sides a row landing exactly on a
    // second-truncated boundary would be fetched by BOTH partitions.
    def timeUrl(timeStr: String, start: String, end: String,
        startExcl: Boolean, endExcl: Boolean): String = {
      val startOp = if (startExcl) "%3E" else "%3E%3D"
      val endOp = if (endExcl) "%3C" else "%3C%3D"
      val constraints =
        s"&$timeStr$startOp${start}Z&$timeStr$endOp${end}Z"
      s"$base?$timeStr%2C$attrsEncoded$constraints"
    }

    req.timeCol match {
      case _ if req.noTimeRange => Seq(s"$base?$attrsEncoded")
      case Some(timeStr) if req.chunks.nonEmpty =>
        val last = req.chunks.length - 1
        req.chunks.zipWithIndex.map { case (c, i) =>
          timeUrl(timeStr, c.startString, c.endString,
            i > 0 || req.startExclusive,
            i == last && req.endExclusive)
        }
      case Some(timeStr) if req.start.isDefined && req.end.isDefined =>
        Seq(timeUrl(timeStr, req.start.get, req.end.get,
          req.startExclusive, req.endExclusive))
      case _ => Seq(s"$base?$attrsEncoded")
    }
  }

  case class Griddap(
      server: String,
      datasetId: String,
      variables: Seq[String],
      start: String,
      end: String,
      latRange: (Double, Double),
      lonRange: (Double, Double),
      zSlice: Boolean = false,
      latest: Boolean = false)

  /** Griddap NetCDF hyperslab URLs (`data_wrangler.py:389-521`): one URL
    * per request; time selector `[(start):1:(end)]` (or `[(t)]` for a
    * single slice / `latest`), lat/lon selectors from extent, optional
    * `[0]` z-axis surface slice when an altitude/depth/zlev dim exists. */
  def compileGriddap(req: Griddap): Seq[String] = {
    val base = req.server.replace("tabledap", "griddap")
    val timeSel =
      if (req.latest || req.start == req.end) s"%5B(${req.end}Z)%5D"
      else s"%5B(${req.start}Z):1:(${req.end}Z)%5D"
    val altSel = if (req.zSlice) "%5B0%5D" else ""
    val latSel = s"%5B(${req.latRange._1}):1:(${req.latRange._2})%5D"
    val lonSel = s"%5B(${req.lonRange._1}):1:(${req.lonRange._2})%5D"
    val varsEncoded = req.variables
      .map(v => s"$v$timeSel$altSel$latSel$lonSel").mkString("%2C")
    Seq(s"$base${req.datasetId}.nc?$varsEncoded")
  }

  /** Dimension tokens excluded from griddap variable lists
    * (`data_wrangler.py:405-409`). */
  val dimTokens: Set[String] = Set(
    "latitude", "longitude", "altitude", "zlev", "depth",
    "NC_GLOBAL", "l2_lat", "l2_lon", "l2_time")

  val zDims: Set[String] = Set("altitude", "depth", "zlev")
}
