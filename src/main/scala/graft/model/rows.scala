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

case class CountRow(
    date: Timestamp,
    risk: Int,
    country: String,
    asn: Long,
    count: Long,
    count_amplified: Option[Double])
