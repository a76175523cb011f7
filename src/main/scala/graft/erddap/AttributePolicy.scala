package graft.erddap

/** Plan-time attribute-selection policies — the reference's QC-variable
  * pruning and time-column resolution applied to a parsed DAS document.
  * Pure schema logic; in the connector these run before any data is
  * read, so a `SELECT *` over an ERDDAP table reproduces reference
  * semantics (SURVEY.md §2.3 P5/P6/P7).
  */
object AttributePolicy {

  /** QC/engineering variable suffixes pruned by default
    * (`das_client.py:324-328`). */
  val qcSuffixes: Seq[String] = Seq(
    "_qc_", "qartod_", "_qc", "_clm", "_loc", "_flt", "_rct",
    "_agg", "_rng", "_gap", "_spk")

  private val qcSubstrings = Seq("_qc_", "qartod_")

  case class Selection(
      attributes: Seq[String],
      timeCol: Option[String],
      hasLat: Boolean,
      hasLon: Boolean,
      noTimeRange: Boolean) {
    /** lat+lon both required, else dataset is flagged
      * (`das_client.py:384-387`). */
    def hasError: Boolean = !(hasLat && hasLon)
  }

  /** Tabledap selection (`das_client.py:299-389`): keep lat/lon always;
    * detect the time column (`time` > `datecollec` > `date_gmt` > first
    * var with ioos_category=Time ∧ epoch-seconds units); unless
    * `returnAll`, drop QC-suffixed vars, 1-char names, NC_GLOBAL, and
    * vars lacking `actual_range` unless they have exactly one attribute. */
  def actualAttributes(doc: Das.Document, returnAll: Boolean = false): Selection = {
    var hasLat = false
    var hasLon = false
    var timeCol: Option[String] = None
    val out = collection.mutable.LinkedHashSet.empty[String]

    doc.sections.foreach { case (name, attrs) =>
      if (name == "latitude") { hasLat = true; out += name }
      else if (name == "longitude") { hasLon = true; out += name }

      if (name == "time") timeCol = Some("time")
      else if (timeCol.isEmpty && (name == "datecollec" || name == "date_gmt"))
        timeCol = Some(name)
      else if (timeCol.isEmpty &&
          attrs.get("ioos_category").exists(_.value == "Time") &&
          attrs.get("units").exists(_.value == "seconds since 1970-01-01T00:00:00Z"))
        timeCol = Some(name)

      if (!returnAll) {
        val isQc = qcSuffixes.exists(name.endsWith) ||
          qcSubstrings.exists(name.contains)
        if (!isQc && name.length > 1 && name.toLowerCase != "nc_global" &&
            (attrs.contains("actual_range") || attrs.size == 1))
          out += name
      } else if (name.length > 1 && name.toLowerCase != "nc_global") {
        out += name
      }
    }
    val noTimeRange = timeCol.exists(tc =>
      !doc.sections.get(tc).exists(_.contains("actual_range")))
    Selection(out.toSeq, timeCol, hasLat, hasLon, noTimeRange)
  }

  /** Griddap data-variable selection (`das_client.py:245-296`): skip the
    * coordinate vars, the hardcoded `sst_gradient_magnitude`, and vars
    * whose coverage_content_type is quality/reference/thematic. */
  def griddapDimensions(doc: Das.Document): Selection = {
    val commonVars = Set("latitude", "longitude", "time", "NC_GLOBAL")
    val skippedCoverage =
      Set("qualityInformation", "referenceInformation", "thematicClassification")
    var timeCol: Option[String] = None
    val out = collection.mutable.LinkedHashSet.empty[String]

    doc.sections.foreach { case (name, attrs) =>
      if (name == "time") timeCol = Some("time")
      val isCommon = commonVars.contains(name)
      if (!isCommon && name != "sst_gradient_magnitude") {
        if (timeCol.isEmpty && (name == "datecollec" || name == "date_gmt"))
          timeCol = Some(name)
        else if (timeCol.isEmpty &&
            attrs.get("ioos_category").exists(_.value == "Time") &&
            attrs.get("units").exists(_.value == "seconds since 1970-01-01T00:00:00Z"))
          timeCol = Some(name)
        else if (!attrs.get("coverage_content_type")
            .exists(a => skippedCoverage.contains(a.value)))
          out += name
      }
    }
    Selection(out.toSeq, timeCol, hasLat = true, hasLon = true, noTimeRange = false)
  }
}
