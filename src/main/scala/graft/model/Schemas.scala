package graft.model

import java.sql.Timestamp

/** Typed row models for the acquisition dataflow (FIXTURES.md §A).
  *
  * These mirror the reference pipeline's implicit record shapes
  * (reference: app.py:573-575 request tuple, app.py:369-380 chunk row,
  * app.py:322-330 placeholder record) as Spark `Dataset[T]` case
  * classes. Analytics queries stay untyped (`DataFrame`); these types
  * are used by the typed operators (interval merge aggregator, the
  * HTTP source stub, streaming state) where compile-time field checks
  * pay off.
  */
object Schemas {

  /** One planned fetch: the cross product row + its time window
    * (reference: app.py:573-575). */
  final case class RequestParam(
      network: String,
      station: String,
      location: String,
      channel: String,
      starttime: Timestamp,
      endtime: Timestamp)

  /** A request after hourly chunking + buffered/clamped bounds
    * (reference: app.py:369-380). */
  final case class ChunkRequest(
      network: String,
      station: String,
      location: String,
      channel: String,
      chunkStart: Timestamp,
      queryStart: Timestamp,
      queryEnd: Timestamp,
      sensorIp: String,
      url: String,
      filename: String)

  /** A landed payload row (reference: app.py:296-304, 449-459). */
  final case class WaveformObject(
      filename: String,
      datePart: String,
      s3Key: String,
      content: Array[Byte])

  /** Dead-letter row for failed fetches (reference: app.py:322-330);
    * placeholder-ness is a column here, not an S3 object tag. */
  final case class PlaceholderRecord(
      marker: String,
      errorType: String,
      errorMessage: String,
      timestamp: String,
      originalRequest: String,
      station: String,
      channel: String,
      timePeriod: String,
      isPlaceholder: Boolean)

  /** Sink listing row (reference: upload_to_rfs.py:24-35). */
  final case class SinkInventory(key: String, size: Long)

  /** A half-open time interval; unit of the interval-merge operator. */
  final case class Interval(start: Timestamp, end: Timestamp)
}
