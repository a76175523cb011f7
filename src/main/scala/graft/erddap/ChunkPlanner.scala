package graft.erddap

import java.time.{Duration, Instant, LocalDate, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.time.temporal.IsoFields

/** Plan-time partitioning of a dataset's time extent.
  *
  * Reproduces the reference's chunk math (`data_wrangler.py:283-314`):
  * `chunks = ceil(rows / chunkSize)`, each chunk spans
  * `seconds_per_record * chunkSize` (uniform-density assumption), last
  * chunk snapped to the exact end. In the Spark connector each chunk
  * becomes one `InputPartition`, so the serial download loop of the
  * reference parallelizes across executors for free; on plain tables
  * the same plan maps to `repartitionByRange(col(time))`.
  */
object ChunkPlanner {

  case class TimeChunk(label: String, start: Instant, end: Instant) {
    def startString: String = ChunkPlanner.isoNoZone(start)
    def endString: String = ChunkPlanner.isoNoZone(end)
  }

  private val fmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss").withZone(ZoneOffset.UTC)

  def isoNoZone(i: Instant): String = fmt.format(i)

  /** Uniform time slicing. Returns Nil when no subsetting is needed
    * (rows ≤ chunkSize → caller uses the full range, matching
    * `needs_Subset`, `data_wrangler.py:271-279`). */
  def timeSubsets(start: Instant, end: Instant, rowCount: Long,
      chunkSize: Long = 100000L): Seq[TimeChunk] = {
    if (rowCount <= chunkSize || rowCount <= 0) return Nil
    val chunksNeeded = math.ceil(rowCount.toDouble / chunkSize).toInt
    val totalSeconds = Duration.between(start, end).toMillis / 1000.0
    val secondsPerChunk = totalSeconds / rowCount * chunkSize
    (1 to chunksNeeded).map { i =>
      val cs = start.plusMillis(((i - 1) * secondsPerChunk * 1000).toLong)
      val ce =
        if (i == chunksNeeded) end
        else start.plusMillis((i * secondsPerChunk * 1000).toLong)
      TimeChunk(s"Subset_$i", cs, ce)
    }
  }

  /** Calendar divisions with display labels
    * (`data_wrangler.py:190-221`): day → one bucket per day labelled
    * `yyyy-MM-dd`; week → ISO week spans labelled `Wnn-yyyy`; month →
    * calendar-month spans labelled `MMM-yyyy`. Bucket ends are clamped
    * to `end`; successive buckets start the day after the previous end. */
  def calendarDivisions(start: LocalDate, end: LocalDate,
      division: String): Seq[(LocalDate, LocalDate, String)] = {
    val out = collection.mutable.ArrayBuffer.empty[(LocalDate, LocalDate, String)]
    var cur = start
    division.toLowerCase match {
      case "day" =>
        while (!cur.isAfter(end)) {
          out += ((cur, cur, cur.format(DateTimeFormatter.ISO_LOCAL_DATE)))
          cur = cur.plusDays(1)
        }
      case "week" =>
        while (!cur.isAfter(end)) {
          val wk = cur.get(IsoFields.WEEK_OF_WEEK_BASED_YEAR)
          val year = cur.get(IsoFields.WEEK_BASED_YEAR)
          val wkEnd = cur.plusDays(6)
          val nxt = if (wkEnd.isBefore(end)) wkEnd else end
          out += ((cur, nxt, f"W$wk%02d-$year"))
          cur = nxt.plusDays(1)
        }
      case "month" =>
        val monthFmt = DateTimeFormatter.ofPattern("MMM-yyyy", java.util.Locale.US)
        while (!cur.isAfter(end)) {
          val mEnd = cur.plusMonths(1).withDayOfMonth(1).minusDays(1)
          val nxt = if (mEnd.isBefore(end)) mEnd else end
          out += ((cur, nxt, cur.format(monthFmt)))
          cur = nxt.plusDays(1)
        }
      case other =>
        throw new IllegalArgumentException(s"unknown division: $other")
    }
    out.toSeq
  }

  /** NRT moving window (`data_wrangler.py:738-743`): trailing
    * `windowDays` ending now, second resolution. */
  def nrtWindow(now: Instant, windowDays: Int = 7): (String, String) =
    (isoNoZone(now.minus(Duration.ofDays(windowDays))), isoNoZone(now))
}
