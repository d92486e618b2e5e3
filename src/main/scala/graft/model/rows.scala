package graft.model

import java.sql.Timestamp

/** Typed rows for the two core records (SURVEY.md §1: `Dataset[T]` where
  * compile-time field safety pays; `DataFrame` everywhere schemas are
  * dynamic).
  */
case class LogEntry(
    date: Timestamp,
    ip: String,
    risk: Option[Int],
    asn: Option[Long],
    country: String)

/** `risk`/`asn` stay Option to mirror [[LogEntry]]: they are GROUP BY
  * keys, so a NULL in the feed (PERMISSIVE CSV ingest) flows through the
  * aggregate into the count row — non-optional fields here would throw at
  * Dataset decode on any feed with a NULL key.
  */
case class CountRow(
    date: Timestamp,
    risk: Option[Int],
    country: String,
    asn: Option[Long],
    count: Long,
    count_amplified: Option[Double])
