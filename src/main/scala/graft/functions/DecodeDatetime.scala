package graft.functions

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Universal datetime decoder (F1) — re-implements the reference's
  * format-SYNTHESIZING parser (`datetimeUtils.py:15-252`): instead of
  * trying a list of known formats, it tokenizes the value and derives
  * the format from the token shapes — month/day names (long or
  * abbreviated), 2-or-4-digit years, 12/24-hour time with optional
  * microseconds, day-of-year, ordinal suffixes (1st/2nd/...), UTC
  * offsets, ~190 timezone abbreviations, and 10/13-digit epoch values
  * (incl. negative). Stock Spark `to_timestamp` cannot infer formats.
  *
  * Number-assignment rules (`decodeNumber`, `datetimeUtils.py:46-67`):
  * a number > 31 is a year (2-digit → %y pivot 1969), > 12 a day,
  * otherwise first-unassigned in order month → day → 2-digit year. A
  * month NAME after a misassigned numeric month reassigns that number
  * to the day slot (`datetimeUtils.py:155-162`).
  *
  * Epoch quirk preserved: with `asMicroseconds=true` (reference
  * default) any numeric value is divided by 1000 — i.e. 13-digit epochs
  * are treated as milliseconds (`datetimeUtils.py:87-89`).
  *
  * Two deliberate divergences from the reference, both toward
  * try_to_timestamp-style engine semantics: (1) a number > 12 when the
  * day slot is taken becomes a 2-digit year instead of silently
  * overwriting the day; (2) input with no recognizable component
  * returns None instead of the reference's strptime fallthrough to
  * Jan 1 of the current year.
  */
object DecodeDatetime {

  /** Timezone-abbreviation table (offset minutes from UTC), from the
    * reference's `_buildTzLookup` (`datetimeUtils.py:262-473`), itself
    * built from the public Wikipedia list. Where the source lists
    * duplicates, the reference's ACTIVE (uncommented) entry wins. */
  val tzOffsetMinutes: Map[String, Int] = Map(
    "ACDT" -> 630,
    "ACST" -> 570,
    "ACT" -> -300,
    "ACWST" -> 525,
    "ADT" -> -180,
    "AEDT" -> 660,
    "AEST" -> 600,
    "AFT" -> 270,
    "AKDT" -> -480,
    "AKST" -> -540,
    "ALMT" -> 360,
    "AMST" -> -180,
    "AMT" -> -240,
    "ANAT" -> 720,
    "AQTT" -> 300,
    "ART" -> -180,
    "AST" -> -240,
    "AWST" -> 480,
    "AZOST" -> 0,
    "AZOT" -> -60,
    "AZT" -> 240,
    "BNT" -> 480,
    "BIOT" -> 360,
    "BIT" -> -720,
    "BOT" -> -240,
    "BRST" -> -120,
    "BRT" -> -180,
    "BST" -> 360,
    "BTT" -> 360,
    "CAT" -> 120,
    "CCT" -> 390,
    "CDT" -> -300,
    "CEST" -> 120,
    "CET" -> 60,
    "CHADT" -> 825,
    "CHAST" -> 765,
    "CHOT" -> 480,
    "CHOST" -> 540,
    "CHST" -> 600,
    "CHUT" -> 600,
    "CIST" -> -480,
    "CKT" -> -600,
    "CLST" -> -180,
    "CLT" -> -240,
    "COST" -> -240,
    "COT" -> -300,
    "CST" -> -360,
    "CVT" -> -60,
    "CWST" -> 525,
    "CXT" -> 420,
    "DAVT" -> 420,
    "DDUT" -> 600,
    "DFT" -> 60,
    "EASST" -> -300,
    "EAST" -> -360,
    "EAT" -> 180,
    "ECT" -> -240,
    "EDT" -> -240,
    "EEST" -> 180,
    "EET" -> 120,
    "EGST" -> 0,
    "EGT" -> -60,
    "EST" -> -300,
    "FET" -> 180,
    "FJT" -> 720,
    "FKST" -> -180,
    "FKT" -> -240,
    "FNT" -> -120,
    "GALT" -> -360,
    "GAMT" -> -540,
    "GET" -> 240,
    "GFT" -> -180,
    "GILT" -> 720,
    "GIT" -> -540,
    "GMT" -> 0,
    "GST" -> 240,
    "GYT" -> -240,
    "HADT" -> -540,
    "HDT" -> -540,
    "HAEC" -> 120,
    "HAST" -> -600,
    "HST" -> -600,
    "HKT" -> 480,
    "HMT" -> 300,
    "HOVST" -> 480,
    "HOVT" -> 420,
    "ICT" -> 420,
    "IDLW" -> -720,
    "IDT" -> 180,
    "IOT" -> 180,
    "IRDT" -> 270,
    "IRKT" -> 480,
    "IRST" -> 210,
    "IST" -> 330,
    "JST" -> 540,
    "KALT" -> 120,
    "KGT" -> 360,
    "KOST" -> 660,
    "KRAT" -> 420,
    "KST" -> 540,
    "LHST" -> 630,
    "LINT" -> 840,
    "MAGT" -> 720,
    "MART" -> -570,
    "MAWT" -> 300,
    "MDT" -> -360,
    "MET" -> 60,
    "MEST" -> 120,
    "MHT" -> 720,
    "MIST" -> 660,
    "MIT" -> -570,
    "MMT" -> 390,
    "MSK" -> 180,
    "MST" -> -420,
    "MUT" -> 240,
    "MVT" -> 300,
    "MYT" -> 480,
    "NCT" -> 660,
    "NDT" -> -150,
    "NFT" -> 660,
    "NOVT" -> 420,
    "NPT" -> 345,
    "NST" -> -210,
    "NT" -> -210,
    "NUT" -> -660,
    "NZDT" -> 780,
    "NZST" -> 720,
    "OMST" -> 360,
    "ORAT" -> 300,
    "PDT" -> -420,
    "PET" -> -300,
    "PETT" -> 720,
    "PGT" -> 600,
    "PHOT" -> 780,
    "PHT" -> 480,
    "PHST" -> 480,
    "PKT" -> 300,
    "PMDT" -> -120,
    "PMST" -> -180,
    "PONT" -> 660,
    "PST" -> -480,
    "PWT" -> 540,
    "PYST" -> -180,
    "PYT" -> -240,
    "RET" -> 240,
    "ROTT" -> -180,
    "SAKT" -> 660,
    "SAMT" -> 240,
    "SAST" -> 120,
    "SBT" -> 660,
    "SCT" -> 240,
    "SDT" -> -600,
    "SGT" -> 480,
    "SLST" -> 330,
    "SRET" -> 660,
    "SRT" -> -180,
    "SST" -> 480,
    "SYOT" -> 180,
    "TAHT" -> -600,
    "THA" -> 420,
    "TFT" -> 300,
    "TJT" -> 300,
    "TKT" -> 780,
    "TLT" -> 540,
    "TMT" -> 300,
    "TRT" -> 180,
    "TOT" -> 780,
    "TVT" -> 720,
    "ULAST" -> 540,
    "ULAT" -> 480,
    "UTC" -> 0,
    "UYST" -> -120,
    "UYT" -> -180,
    "UZT" -> 300,
    "VET" -> -240,
    "VLAT" -> 600,
    "VOLT" -> 240,
    "VOST" -> 360,
    "VUT" -> 660,
    "WAKT" -> 720,
    "WAST" -> 120,
    "WAT" -> 60,
    "WEST" -> 60,
    "WET" -> 0,
    "WIB" -> 420,
    "WIT" -> 540,
    "WITA" -> 480,
    "WGST" -> -120,
    "WGT" -> -180,
    "WST" -> 480,
    "YAKT" -> 540,
    "YEKT" -> 300
  )

  private val dayNames = Set("Mon", "Monday", "Tue", "Tuesday", "Wed",
    "Wednesday", "Thu", "Thursday", "Fri", "Friday", "Sat", "Saturday",
    "Sun", "Sunday")

  private val monthNames: Map[String, Int] = {
    val longNames = Seq("January", "February", "March", "April", "May", "June",
      "July", "August", "September", "October", "November", "December")
    (longNames.zipWithIndex.map { case (n, i) => n -> (i + 1) } ++
      longNames.zipWithIndex.map { case (n, i) => n.take(3) -> (i + 1) }).toMap
  }

  case class Decoded(instant: Instant, format: String)

  /** Decode to a UTC instant (the reference's `utcOut=True` path, which
    * is what a Spark TimestampType needs). Returns None on failure.
    * `defaultYear` stands in for "today's year" when the value has no
    * year component (injectable for deterministic tests). */
  def decode(s: String, asMicroseconds: Boolean = true,
      defaultYear: Int = LocalDate.now(ZoneOffset.UTC).getYear): Option[Decoded] = {
    if (s == null || s.isEmpty) return None

    // ---- epoch fast path ------------------------------------------------
    // Guarded against non-finite parseable doubles: "NaN" (ERDDAP's
    // missing marker) would round to epoch-0 and "Infinity" to wrapped
    // garbage. The reference's utcfromtimestamp raises on both, which
    // under this repo's divergence rule means None here.
    try {
      val v = s.toDouble
      if (java.lang.Double.isFinite(v)) {
        val seconds = if (asMicroseconds) v / 1000.0 else v
        val micros = math.round(seconds * 1e6)
        return Some(Decoded(Instant.EPOCH.plusNanos(micros * 1000L),
          s"epoch(${if (asMicroseconds) "ms" else "s"})"))
      } else return None
    } catch { case _: NumberFormatException => }

    // ---- tokenize (reference's delimiter state machine) ----------------
    val parts = tokenize(s)
    try {

    var haveDay, haveMonth, haveYear = false
    var year, month, day = -1
    var dayOfYear = -1
    var hour, minute, second = 0
    var micros = 0L
    var is12h = false
    var isPm = false
    var offsetMin: Option[Int] = None
    val fmt = new StringBuilder

    // slots assigned by decodeNumber in arrival order; month-name fixup
    // may retroactively move a number from month to day
    var pendingMonthNumber = -1

    def assignNumber(part: String): Unit = {
      val num = part.toInt
      if (num > 31) {
        year = if (part.length > 2) num else twoDigitYear(num)
        haveYear = true; fmt ++= (if (part.length > 2) "%Y" else "%y")
      } else if (num > 12) {
        if (!haveDay) { day = num; haveDay = true; fmt ++= "%d" }
        else { year = twoDigitYear(num); haveYear = true; fmt ++= "%y" }
      } else if (!haveMonth) {
        month = num; haveMonth = true; pendingMonthNumber = num; fmt ++= "%m"
      } else if (!haveDay) {
        day = num; haveDay = true; fmt ++= "%d"
      } else if (!haveYear) {
        year = twoDigitYear(num); haveYear = true; fmt ++= "%y"
      }
    }

    for (rawPart <- parts) {
      var part = rawPart
      // ordinal indicators: 1st, 2nd, 3rd, 12th
      val tail2 = part.takeRight(2).toLowerCase
      if (Seq("st", "nd", "rd", "th").contains(tail2) &&
          part.dropRight(2).nonEmpty && part.dropRight(2).forall(_.isDigit))
        part = part.dropRight(2)

      if (part.nonEmpty) {
        val isTitle = part.headOption.exists(_.isUpper) && part.drop(1).forall(!_.isUpper)
        if (isTitle && dayNames.contains(part)) {
          fmt ++= (if (part.length > 3) "%A" else "%a")
        } else if (isTitle && monthNames.contains(part)) {
          fmt ++= (if (part.length > 3) "%B" else "%b")
          if (haveMonth && !haveDay && pendingMonthNumber >= 0) {
            // month name arrived after a numeric month: that number was the day
            day = pendingMonthNumber; haveDay = true
            val i = fmt.lastIndexOf("%m"); if (i >= 0) fmt.replace(i, i + 2, "%d")
          }
          month = monthNames(part); haveMonth = true
        } else if (part.equalsIgnoreCase("am") || part.equalsIgnoreCase("pm")) {
          is12h = true; isPm = part.equalsIgnoreCase("pm"); fmt ++= "%p"
        } else if (part.forall(c => c.isUpper || c.isDigit) &&
            tzOffsetMinutes.contains(part)) {
          offsetMin = Some(tzOffsetMinutes(part)); fmt ++= part
        } else if (part.head == '+' || part.head == '-') {
          offsetMin = Some(parseUtcOffset(part)); fmt ++= "%z"
        } else if (part.stripPrefix(":").stripSuffix(":").contains(":")
            || (part.contains(":") && part.count(_ == ':') >= 1
                && part.exists(_.isDigit))) {
          val (timePart, fracPart) = part.span(_ != '.')
          val hms = timePart.split(":").filter(_.nonEmpty)
          hour = hms(0).toInt
          if (hms.length > 1) minute = hms(1).toInt
          if (hms.length > 2) second = hms(2).toInt
          fmt ++= (if (hms.length < 3) "%H:%M" else "%H:%M:%S")
          if (fracPart.nonEmpty) {
            // strip any trailing non-digits (e.g. a Zulu suffix glued to a
            // short fraction like ".5Z") before scaling to microseconds
            val digits = fracPart.stripPrefix(".").takeWhile(_.isDigit)
            if (digits.nonEmpty) {
              micros = digits.padTo(6, '0').take(6).toLong
              fmt ++= ".%f"
            }
          }
        } else if ((part.contains("/") || part.contains("-") || part.contains(".")) &&
            part.take(2).forall(_.isDigit) && part.takeRight(2).forall(_.isDigit)) {
          val splitChr = Seq('/', '-', '.').find(part.contains(_)).get
          part.split(java.util.regex.Pattern.quote(splitChr.toString))
            .foreach(assignNumber)
        } else if (part.forall(_.isDigit)) {
          if (part.length == 6) { micros = part.toLong; fmt ++= "%f" }
          else if (part.length == 3) { dayOfYear = part.toInt; fmt ++= "%j" }
          else assignNumber(part)
        } else {
          fmt ++= part // literal
        }
      }
    }

    val haveTime = fmt.toString.contains("%H") || fmt.toString.contains("%f")
    if (!(haveYear || haveMonth || haveDay || dayOfYear > 0 || haveTime)) None
    else {
      if (!haveYear) year = defaultYear
      if (is12h) {
        if (isPm && hour < 12) hour += 12
        else if (!isPm && hour == 12) hour = 0
      }
      val date =
        if (dayOfYear > 0) LocalDate.ofYearDay(year, dayOfYear)
        else LocalDate.of(year,
          if (haveMonth) month else 1,
          if (haveDay) day else 1)
      val ldt = LocalDateTime.of(date.getYear, date.getMonthValue,
        date.getDayOfMonth, hour, minute, second, (micros * 1000L).toInt)
      val off = ZoneOffset.ofTotalSeconds(offsetMin.getOrElse(0) * 60)
      Some(Decoded(ldt.toInstant(off), fmt.toString))
    }
    } catch { case _: Exception => None }
  }

  /** strptime %y pivot: 69-99 → 19xx, 00-68 → 20xx. */
  private def twoDigitYear(n: Int): Int = if (n >= 69) 1900 + n else 2000 + n

  private def parseUtcOffset(p: String): Int = {
    val sign = if (p.head == '-') -1 else 1
    val digits = p.drop(1).replace(":", "")
    val (h, m) = digits.length match {
      case 1 | 2 => (digits.toInt, 0)
      case _ => (digits.take(digits.length - 2).toInt, digits.takeRight(2).toInt)
    }
    sign * (h * 60 + m)
  }

  /** The reference's character-level splitter (`datetimeUtils.py:104-145`):
    * space/comma separate; 'T'/'Z' after 2 digits separate (ISO divider /
    * Zulu); '+'/'-' after a time part starts a new (offset) token; 'A'/'P'
    * after a time part starts the AM/PM token. */
  private[functions] def tokenize(s: String): Seq[String] = {
    val parts = collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val last2Numeric = cur.length >= 2 &&
        cur.takeRight(2).forall(_.isDigit)
      if ((c == 'A' || c == 'P' || c == 'a' || c == 'p') &&
          cur.indexOf(":") >= 0 && last2Numeric) {
        parts += cur.toString; cur.clear(); cur += c
      } else if ((c == 'T' || c == 'Z') && last2Numeric) {
        if (cur.nonEmpty) { parts += cur.toString; cur.clear() }
      } else if ((c == '+' || c == '-') && cur.indexOf(":") >= 0) {
        parts += cur.toString; cur.clear(); cur += c
      } else if (c == ' ' || c == ',') {
        if (cur.nonEmpty) { parts += cur.toString; cur.clear() }
      } else {
        cur += c
      }
      i += 1
    }
    if (cur.nonEmpty) parts += cur.toString
    parts.toSeq
  }

  /** Static entry for codegen: UTF8String → epoch micros (boxed), null
    * when undecodable. */
  def evalMicros(s: UTF8String, asMicroseconds: Boolean): java.lang.Long =
    if (s == null) null
    else decode(s.toString, asMicroseconds) match {
      case Some(d) =>
        java.lang.Long.valueOf(
          d.instant.getEpochSecond * 1000000L + d.instant.getNano / 1000L)
      case None => null
    }

  def decode_datetime(c: Column, asMicroseconds: Boolean = true): Column =
    GraftSqlBridge.column(
      DecodeDatetimeExpr(GraftSqlBridge.expression(c), asMicroseconds))
}

/** string → timestamp via the format-synthesizing decoder; null on
  * undecodable input (like `try_to_timestamp`). */
case class DecodeDatetimeExpr(child: Expression, asMicroseconds: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def prettyName: String = "decode_datetime"

  override def nullSafeEval(input: Any): Any =
    DecodeDatetime.evalMicros(input.asInstanceOf[UTF8String], asMicroseconds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultTerm = ctx.freshName("decoded")
    nullSafeCodeGen(ctx, ev, c => {
      s"""java.lang.Long $resultTerm =
         |  graft.functions.DecodeDatetime.evalMicros($c, $asMicroseconds);
         |if ($resultTerm == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $resultTerm.longValue(); }""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): DecodeDatetimeExpr =
    copy(child = newChild)
}
