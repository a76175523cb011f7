package graft.functions

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SparkTestSession

/** Corpus per FIXTURES.md §7 (datetimeUtils.py behaviors). */
class DecodeDatetimeSpec extends AnyFunSuite {

  def dec(s: String, asMicros: Boolean = false): Option[Instant] =
    DecodeDatetime.decode(s, asMicros, defaultYear = 2024).map(_.instant)

  test("ISO-8601 with Z") {
    assert(dec("2024-05-25T14:02:00Z").contains(Instant.parse("2024-05-25T14:02:00Z")))
  }

  test("ISO-8601 with offset") {
    assert(dec("2024-05-25T14:02:00+02:00")
      .contains(Instant.parse("2024-05-25T12:02:00Z")))
    assert(dec("2024-05-25 14:02:00-0500")
      .contains(Instant.parse("2024-05-25T19:02:00Z")))
  }

  test("HTTP Last-Modified format") {
    assert(dec("Sat, 25 May 2024 14:02:00 GMT")
      .contains(Instant.parse("2024-05-25T14:02:00Z")))
  }

  test("slash and dash dates with 2-digit year") {
    // 25 > 12 → day; 05 → month; 2024 → year
    assert(dec("25/05/2024").contains(Instant.parse("2024-05-25T00:00:00Z")))
    // 05-25-24: 05 → month, 25 → day, 24 → %y → 2024
    assert(dec("05-25-24").contains(Instant.parse("2024-05-25T00:00:00Z")))
  }

  test("month name with ordinal day and 12-hour time with tz abbreviation") {
    // EST = UTC-5 → 4:15 PM EST = 21:15 UTC
    assert(dec("June 1st, 2024 4:15 PM EST")
      .contains(Instant.parse("2024-06-01T21:15:00Z")))
  }

  test("month name AFTER a numeric month reassigns the number to day") {
    // "1 June 2024": 1 assigned to month first, then June forces 1 → day
    assert(dec("1 June 2024").contains(Instant.parse("2024-06-01T00:00:00Z")))
  }

  test("day-of-year form") {
    // 2024 146 → 2024, day 146 = May 25
    assert(dec("2024 146").contains(Instant.parse("2024-05-25T00:00:00Z")))
  }

  test("epochs: 10-digit seconds, negative, float") {
    assert(dec("1716595200").contains(Instant.parse("2024-05-25T00:00:00Z")))
    assert(dec("-86400").contains(Instant.parse("1969-12-31T00:00:00Z")))
    assert(dec("1716595200.5").contains(Instant.parse("2024-05-25T00:00:00.5Z")))
  }

  test("non-finite parseable doubles are rejected, not epoch-0") {
    // ERDDAP's missing marker "NaN" must not decode to 1970-01-01
    assert(dec("NaN").isEmpty)
    assert(dec("nan").isEmpty)
    assert(dec("Infinity").isEmpty)
    assert(dec("-Infinity").isEmpty)
    assert(dec("NaN", asMicros = true).isEmpty)
  }

  test("13-digit epoch with asMicroseconds flag divides by 1000 (reference quirk)") {
    assert(dec("1716595200000", asMicros = true)
      .contains(Instant.parse("2024-05-25T00:00:00Z")))
  }

  test("missing year defaults to current year") {
    assert(dec("May 25 14:02:00").contains(Instant.parse("2024-05-25T14:02:00Z")))
  }

  test("microseconds fraction") {
    assert(dec("2024-05-25T14:02:00.123456Z")
      .contains(Instant.parse("2024-05-25T14:02:00.123456Z")))
  }

  test("timezone abbreviations from the table") {
    assert(dec("2024-05-25 12:00:00 PST") // UTC-8
      .contains(Instant.parse("2024-05-25T20:00:00Z")))
    assert(dec("2024-05-25 12:00:00 IST") // Indian Standard +5:30
      .contains(Instant.parse("2024-05-25T06:30:00Z")))
    assert(dec("2024-05-25 12:00:00 ACWST") // +8:45
      .contains(Instant.parse("2024-05-25T03:15:00Z")))
  }

  test("EVERY reference tz abbreviation parses with its exact offset") {
    // the full 192-entry table from datetimeUtils.py:262-473 (active,
    // uncommented entries — later duplicates win, Python-dict style);
    // parameterized so a dropped or drifted entry names itself
    DecodeDatetime.tzOffsetMinutes.foreach { case (abbr, minutes) =>
      val got = dec(s"2024-05-25 12:00:00 $abbr")
      val expected = Instant.parse("2024-05-25T12:00:00Z")
        .minusSeconds(minutes * 60L)
      assert(got.contains(expected), s"$abbr (offset $minutes min): got $got")
    }
    assert(DecodeDatetime.tzOffsetMinutes.size == 192)
    // spot-check the reference's disambiguation choices (commented-out
    // duplicates lose): AMT=Brazil -4h not Armenia +4, AST=Atlantic -4h
    // not Arabia +3, BST=Bangladesh +6 (last writer), CST=Central -6,
    // EST=Eastern -5, IST=India +5:30, SST=Singapore +8 (last writer)
    assert(DecodeDatetime.tzOffsetMinutes("AMT") == -240)
    assert(DecodeDatetime.tzOffsetMinutes("AST") == -240)
    assert(DecodeDatetime.tzOffsetMinutes("BST") == 360)
    assert(DecodeDatetime.tzOffsetMinutes("CST") == -360)
    assert(DecodeDatetime.tzOffsetMinutes("EST") == -300)
    assert(DecodeDatetime.tzOffsetMinutes("IST") == 330)
    assert(DecodeDatetime.tzOffsetMinutes("SST") == 480)
    assert(DecodeDatetime.tzOffsetMinutes("NT") == -210) // Newfoundland -3:30
    assert(DecodeDatetime.tzOffsetMinutes("CHADT") == 825) // +13:45
  }

  test("undecodable input → None") {
    assert(dec("not a date at all !!").isEmpty)
    assert(dec("").isEmpty)
  }

  test("expression: column-level decode inside a Spark plan") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq(
      "2024-05-25T14:02:00Z",
      "Sat, 25 May 2024 14:02:00 GMT",
      "25/05/2024",
      "garbage"
    ).toDF("s")
    val out = df.select(DecodeDatetime.decode_datetime(col("s"), asMicroseconds = false)
      .as("ts")).collect()
    assert(out(0).getTimestamp(0).toInstant == Instant.parse("2024-05-25T14:02:00Z"))
    assert(out(1).getTimestamp(0).toInstant == Instant.parse("2024-05-25T14:02:00Z"))
    assert(out(2).getTimestamp(0).toInstant == Instant.parse("2024-05-25T00:00:00Z"))
    assert(out(3).isNullAt(0))
  }

  test("round-trip property: random instants through several renderings") {
    val rnd = new scala.util.Random(7)
    val fmts = Seq(
      (i: Instant) => i.toString.replace("Z", "Z"),                     // ISO Z
      (i: Instant) => i.toString.stripSuffix("Z").replace("T", " "),    // naive
      (i: Instant) => i.getEpochSecond.toString                         // epoch s
    )
    for (_ <- 1 to 200) {
      val inst = Instant.ofEpochSecond(rnd.between(0L, 2000000000L))
      for (f <- fmts) {
        val got = dec(f(inst))
        assert(got.contains(inst), s"round-trip failed for '${f(inst)}'")
      }
    }
  }

  test("round-trip property: day names inside full formats are skipped, not parsed") {
    val rnd = new scala.util.Random(13)
    val days = Seq("Mon", "Tuesday", "Wed", "Thursday", "Fri", "Saturday", "Sun")
    for (_ <- 1 to 100) {
      val inst = Instant.ofEpochSecond(rnd.between(0L, 2000000000L) / 60 * 60)
      val utc = inst.atZone(java.time.ZoneOffset.UTC)
      val dn = days(rnd.nextInt(days.length)) // deliberately wrong day names too
      // month-first: a leading number <= 12 is %m (reference assignment)
      val rendered = f"$dn, ${utc.getMonthValue}%02d/${utc.getDayOfMonth}%02d/" +
        f"${utc.getYear} ${utc.getHour}%02d:${utc.getMinute}%02d:${utc.getSecond}%02d"
      assert(dec(rendered).contains(inst),
        s"day-name form failed for '$rendered'")
    }
  }

  test("round-trip property: negative 13-digit epochs under asMicroseconds") {
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 100) {
      // pre-1970 instants: 13-digit negative ms (1906..1938), whole seconds
      val ms = -rnd.between(1000000000000L, 1999999999999L) / 1000 * 1000
      val got = dec(ms.toString, asMicros = true)
      assert(got.contains(Instant.ofEpochMilli(ms)),
        s"negative 13-digit epoch failed for '$ms'")
    }
  }

  test("round-trip property: day-of-year forms across years incl. leap day") {
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 100) {
      val year = rnd.between(1970, 2100)
      val doy = rnd.between(1, if (java.time.Year.of(year).isLeap) 367 else 366)
      val expect = Instant.parse(
        java.time.LocalDate.ofYearDay(year, doy).toString + "T00:00:00Z")
      // the reference's %j form: 4-digit year, space, zero-padded 3-digit doy
      val full = f"$year%04d $doy%03d"
      assert(dec(full).contains(expect), s"day-of-year failed for '$full'")
    }
    // leap-day boundary pinned explicitly
    assert(dec("2024 366").contains(Instant.parse("2024-12-31T00:00:00Z")))
    assert(dec("2023 365").contains(Instant.parse("2023-12-31T00:00:00Z")))
  }

  test("tz table is bit-complete vs the reference's active table (192 entries verbatim)") {
    // Every ACTIVE entry of the reference's tzDict
    // (datetimeUtils.py:262-473), abbreviation -> offset minutes,
    // extracted verbatim. The reference also carries 18 COMMENTED-OUT
    // entries, every one a duplicate abbreviation it disambiguated by
    // deactivation (ACT=ASEAN, AET, AMT=Armenia, AST=Arabia,
    // BST=Bougainville/1968-UK, CDT/CST=Cuba+China, CT, ECT=Ecuador,
    // ET, GST=South-Georgia, IST=Irish/Israel, LHST=summer,
    // MST=Malaysia, SST=Samoa; AET/CT/ET have no offset even there) --
    // inactive at the reference's own runtime, so excluded here too.
    val reference: Seq[(String, Int)] = Seq(
    ("ACDT", 630), ("ACST", 570), ("ACT", -300), ("ACWST", 525),
    ("ADT", -180), ("AEDT", 660), ("AEST", 600), ("AFT", 270),
    ("AKDT", -480), ("AKST", -540), ("ALMT", 360), ("AMST", -180),
    ("AMT", -240), ("ANAT", 720), ("AQTT", 300), ("ART", -180),
    ("AST", -240), ("AWST", 480), ("AZOST", 0), ("AZOT", -60),
    ("AZT", 240), ("BNT", 480), ("BIOT", 360), ("BIT", -720),
    ("BOT", -240), ("BRST", -120), ("BRT", -180), ("BST", 360),
    ("BTT", 360), ("CAT", 120), ("CCT", 390), ("CDT", -300),
    ("CEST", 120), ("CET", 60), ("CHADT", 825), ("CHAST", 765),
    ("CHOT", 480), ("CHOST", 540), ("CHST", 600), ("CHUT", 600),
    ("CIST", -480), ("CKT", -600), ("CLST", -180), ("CLT", -240),
    ("COST", -240), ("COT", -300), ("CST", -360), ("CVT", -60),
    ("CWST", 525), ("CXT", 420), ("DAVT", 420), ("DDUT", 600),
    ("DFT", 60), ("EASST", -300), ("EAST", -360), ("EAT", 180),
    ("ECT", -240), ("EDT", -240), ("EEST", 180), ("EET", 120),
    ("EGST", 0), ("EGT", -60), ("EST", -300), ("FET", 180),
    ("FJT", 720), ("FKST", -180), ("FKT", -240), ("FNT", -120),
    ("GALT", -360), ("GAMT", -540), ("GET", 240), ("GFT", -180),
    ("GILT", 720), ("GIT", -540), ("GMT", 0), ("GST", 240),
    ("GYT", -240), ("HADT", -540), ("HDT", -540), ("HAEC", 120),
    ("HAST", -600), ("HST", -600), ("HKT", 480), ("HMT", 300),
    ("HOVST", 480), ("HOVT", 420), ("ICT", 420), ("IDLW", -720),
    ("IDT", 180), ("IOT", 180), ("IRDT", 270), ("IRKT", 480),
    ("IRST", 210), ("IST", 330), ("JST", 540), ("KALT", 120),
    ("KGT", 360), ("KOST", 660), ("KRAT", 420), ("KST", 540),
    ("LHST", 630), ("LINT", 840), ("MAGT", 720), ("MART", -570),
    ("MAWT", 300), ("MDT", -360), ("MET", 60), ("MEST", 120),
    ("MHT", 720), ("MIST", 660), ("MIT", -570), ("MMT", 390),
    ("MSK", 180), ("MST", -420), ("MUT", 240), ("MVT", 300),
    ("MYT", 480), ("NCT", 660), ("NDT", -150), ("NFT", 660),
    ("NOVT", 420), ("NPT", 345), ("NST", -210), ("NT", -210),
    ("NUT", -660), ("NZDT", 780), ("NZST", 720), ("OMST", 360),
    ("ORAT", 300), ("PDT", -420), ("PET", -300), ("PETT", 720),
    ("PGT", 600), ("PHOT", 780), ("PHT", 480), ("PHST", 480),
    ("PKT", 300), ("PMDT", -120), ("PMST", -180), ("PONT", 660),
    ("PST", -480), ("PWT", 540), ("PYST", -180), ("PYT", -240),
    ("RET", 240), ("ROTT", -180), ("SAKT", 660), ("SAMT", 240),
    ("SAST", 120), ("SBT", 660), ("SCT", 240), ("SDT", -600),
    ("SGT", 480), ("SLST", 330), ("SRET", 660), ("SRT", -180),
    ("SST", 480), ("SYOT", 180), ("TAHT", -600), ("THA", 420),
    ("TFT", 300), ("TJT", 300), ("TKT", 780), ("TLT", 540),
    ("TMT", 300), ("TRT", 180), ("TOT", 780), ("TVT", 720),
    ("ULAST", 540), ("ULAT", 480), ("UTC", 0), ("UYST", -120),
    ("UYT", -180), ("UZT", 300), ("VET", -240), ("VLAT", 600),
    ("VOLT", 240), ("VOST", 360), ("VUT", 660), ("WAKT", 720),
    ("WAST", 120), ("WAT", 60), ("WEST", 60), ("WET", 0),
    ("WIB", 420), ("WIT", 540), ("WITA", 480), ("WGST", -120),
    ("WGT", -180), ("WST", 480), ("YAKT", 540), ("YEKT", 300))
    assert(reference.size == 192 && reference.map(_._1).distinct.size == 192)
    reference.foreach { case (abbr, minutes) =>
      assert(DecodeDatetime.tzOffsetMinutes.get(abbr).contains(minutes),
        s"$abbr: ours=${DecodeDatetime.tzOffsetMinutes.get(abbr)} ref=$minutes")
    }
    // and nothing EXTRA on our side
    assert(DecodeDatetime.tzOffsetMinutes.keySet == reference.map(_._1).toSet)
  }
}
