package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextAnalysis

/** Streaming face of the crawl-frontier scheduler.
  *
  * The batch [[TextAnalysis.politenessSchedule]] orders a SNAPSHOT of
  * the frontier; a live crawler discovers URLs continuously, and a
  * late-discovered URL must queue BEHIND the slots its host already
  * handed out — that per-host continuation is state, which is exactly
  * what `flatMapGroupsWithState` keyed by registered domain holds: one
  * counter per domain (a few bytes — state size tracks the domain
  * count, not the URL count, so the store stays metadata-sized at any
  * crawl scale). Within a micro-batch the rows of a domain take slots
  * in the engine-wide salted-md5 order (so a single-batch run is
  * bit-identical to the batch scheduler — the parity the gate checks);
  * across batches slots continue monotonically from the stored
  * counter (arrival order — the honest semantics of an incremental
  * frontier, spec-checked with a two-batch stream).
  */
object Frontier {

  /** One frontier row after URL→domain projection (internal). */
  case class FrontierUrl(id: Long, domain: String, delayMs: Option[Long],
    ord: String)

  /** Per-domain slot counter carried across micro-batches. */
  case class DomainState(nextSlot: Long)

  /** Scheduled fetch: dispatch `id` no earlier than start+offsetMs. */
  case class PoliteOut(id: Long, domain: String, slot: Long, offsetMs: Long)

  /** Streaming per-host politeness schedule over a frontier stream of
    * `(idCol, urlCol, delayCol)` — same output contract as
    * [[TextAnalysis.politenessSchedule]]: consecutive slots per
    * registered domain, `offset_ms = (slot−1)·delay` (row delay, null →
    * `defaultDelayMs`). Unparseable URLs keep a null domain and form
    * their own bucket, matching the batch scheduler. */
  def politenessStream(frontier: DataFrame, urlCol: String, idCol: String,
      delayCol: String, defaultDelayMs: Long = 1000L,
      multiSuffixes: Seq[String] = TextAnalysis.defaultMultiSuffixes,
      salt: String = ""): Dataset[PoliteOut] = {
    implicit val inEnc = Encoders.product[FrontierUrl]
    implicit val stateEnc = Encoders.product[DomainState]
    implicit val outEnc = Encoders.product[PoliteOut]
    val prepped = frontier.select(
        col(idCol).cast("long").as("id"),
        TextAnalysis.registeredDomain(
          lower(try_parse_url(col(urlCol), lit("HOST"))), multiSuffixes)
          .as("domain"),
        col(delayCol).cast("long").as("delayMs"),
        md5(concat(lit(salt), col(idCol).cast("string"))).as("ord"))
      .as[FrontierUrl]
    // group key must be non-null: fold the null-domain bucket to "" for
    // KEYING only; rows keep their real (possibly null) domain
    prepped.groupByKey(r => Option(r.domain).getOrElse(""))(Encoders.STRING)
      .flatMapGroupsWithState[DomainState, PoliteOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[FrontierUrl],
            state: GroupState[DomainState]) =>
          var slot = state.getOption.map(_.nextSlot).getOrElse(1L)
          val out = rows.toSeq.sortBy(r => (r.ord, r.id)).map { r =>
            val o = PoliteOut(r.id, r.domain, slot,
              (slot - 1) * r.delayMs.getOrElse(defaultDelayMs))
            slot += 1
            o
          }
          state.update(DomainState(slot))
          out.iterator
      }
  }
}
