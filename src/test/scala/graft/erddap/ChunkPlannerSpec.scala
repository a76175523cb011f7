package graft.erddap

import org.scalatest.funsuite.AnyFunSuite
import java.time.{Instant, LocalDate}

class ChunkPlannerSpec extends AnyFunSuite {

  test("no subsetting when rows <= chunkSize") {
    assert(ChunkPlanner.timeSubsets(
      Instant.EPOCH, Instant.ofEpochSecond(1000), 100, 1000).isEmpty)
  }

  test("properties: chunks cover [start,end] contiguously, count = ceil") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val s0 = rnd.nextLong(2_000_000_000L)
      val span = 3600L + rnd.nextLong(400L * 24 * 3600)
      val rows = 1L + rnd.nextLong(5_000_000L)
      val chunkSize = Seq(1000L, 100000L, 77L)(rnd.nextInt(3))
      val start = Instant.ofEpochSecond(s0)
      val end = Instant.ofEpochSecond(s0 + span)
      val chunks = ChunkPlanner.timeSubsets(start, end, rows, chunkSize)
      if (rows <= chunkSize) assert(chunks.isEmpty)
      else {
        assert(chunks.size == math.ceil(rows.toDouble / chunkSize).toInt)
        assert(chunks.head.start == start)
        assert(chunks.last.end == end)
        chunks.sliding(2).foreach {
          case Seq(a, b) => assert(a.end == b.start)
          case _ =>
        }
        assert(chunks.zipWithIndex.forall { case (c, i) =>
          c.label == s"Subset_${i + 1}" })
      }
    }
  }

  test("calendar day division: one bucket per day with ISO label") {
    val divs = ChunkPlanner.calendarDivisions(
      LocalDate.of(2024, 1, 30), LocalDate.of(2024, 2, 2), "day")
    assert(divs.size == 4)
    assert(divs.head._3 == "2024-01-30")
    assert(divs.last._3 == "2024-02-02")
  }

  test("calendar week division: ISO week labels, end clamped") {
    val divs = ChunkPlanner.calendarDivisions(
      LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 10), "week")
    assert(divs.head._3 == "W01-2024")
    assert(divs.last._2 == LocalDate.of(2024, 1, 10))
  }

  test("calendar month division: 'MMM-yyyy' labels, month-end snapping") {
    val divs = ChunkPlanner.calendarDivisions(
      LocalDate.of(2024, 1, 15), LocalDate.of(2024, 3, 5), "month")
    assert(divs.map(_._3) == Seq("Jan-2024", "Feb-2024", "Mar-2024"))
    assert(divs(0)._2 == LocalDate.of(2024, 1, 31))
    assert(divs(1)._1 == LocalDate.of(2024, 2, 1))
    assert(divs(1)._2 == LocalDate.of(2024, 2, 29))
    assert(divs(2)._2 == LocalDate.of(2024, 3, 5))
  }

  test("nrt window is a trailing 7-day window at second resolution") {
    val now = Instant.parse("2024-06-15T12:30:45Z")
    val (s, e) = ChunkPlanner.nrtWindow(now)
    assert(s == "2024-06-08T12:30:45")
    assert(e == "2024-06-15T12:30:45")
  }
}
