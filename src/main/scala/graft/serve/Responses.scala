package graft.serve

import org.apache.spark.sql.{DataFrame, Row}

/** A rendered HTTP response payload — status, content type, extra headers,
  * body — decoupled from any web framework so the serving edge stays a pure
  * function of a DataFrame (the reference returns actix `HttpResponse`
  * values; here the caller's HTTP layer maps this 1:1).
  */
final case class HttpPayload(status: Int, contentType: String,
    headers: Map[String, String], body: String)

/** Serving-edge response sinks (SURVEY §2.2 K6/K7): render a bounded query
  * result as a CSV download or a JSON body, exactly the reference's
  * `?format=csv` / JSON controller split.
  *
  * CSV semantics mirror the reference's `to_csv_response`
  * (etl-api/src/csv_response.rs:7-35): a header record from the field
  * names, RFC 4180 "quote only when necessary" cell encoding (quote a
  * field iff it contains the delimiter, a double quote, or a line break;
  * embedded quotes double), `\n` record terminator, `text/csv` content
  * type, and a `Content-Disposition: attachment; filename="…"` header.
  * Nulls render as empty fields (serde `None` under the csv crate).
  *
  * A response body is driver-side by nature, so both renderers clamp the
  * row count first — pair with [[TimeWindowParams.clampLimit]] for the
  * request-facing cap. The reference's "streaming" variant
  * (csv_response.rs:37-55) buffers the full body too; [[csvRecords]] is
  * the genuinely incremental analog — an iterator that pulls one Spark
  * partition at a time onto the driver (`toLocalIterator`), the shape an
  * HTTP chunked-transfer writer wants for exports too large to clamp.
  */
object Responses {

  private val NeedsQuote = Array(',', '"', '\n', '\r')

  /** RFC 4180 necessary-quoting of one cell; null → empty field.
    * Timestamps render RFC 3339 UTC (`2024-01-01T00:00:00Z`) — the
    * reference serializes chrono `DateTime<Utc>` via serde, not the JDBC
    * `yyyy-MM-dd HH:mm:ss.f` form `Timestamp.toString` would give.
    * TIMESTAMP_NTZ cells collect as java.time.LocalDateTime, whose
    * toString drops the seconds field when it is :00 (`2024-03-05T06:07`)
    * — formatted explicitly so seconds always appear (chrono's
    * NaiveDateTime serde form). Binary cells render base64 (serde_bytes'
    * human-readable default), not the Java array identity string.
    */
  private val NtzFormat = new java.time.format.DateTimeFormatterBuilder()
    .appendPattern("yyyy-MM-dd'T'HH:mm:ss")
    .appendFraction(java.time.temporal.ChronoField.NANO_OF_SECOND, 0, 9, true)
    .toFormatter

  private[serve] def csvCell(v: Any): String = {
    val s = v match {
      case null => ""
      case t: java.sql.Timestamp => t.toInstant.toString
      case i: java.time.Instant => i.toString
      case d: java.time.LocalDateTime => d.format(NtzFormat)
      case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
      case other => other.toString
    }
    if (s.exists(NeedsQuote.contains(_)))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s
  }

  private def csvRecord(columns: Array[String], row: Row): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < columns.length) {
      if (i > 0) sb.append(',')
      sb.append(csvCell(row.get(i)))
      i += 1
    }
    sb.toString
  }

  /** K7: a clamped CSV attachment response. */
  def toCsvResponse(df: DataFrame, filename: String, maxRows: Int = 10000): HttpPayload = {
    val cols = df.columns
    val body = new StringBuilder
    body.append(cols.map(csvCell).mkString(",")).append('\n')
    df.limit(maxRows).collect().foreach { row =>
      body.append(csvRecord(cols, row)).append('\n')
    }
    HttpPayload(200, "text/csv",
      Map("Content-Disposition" -> s"""attachment; filename="$filename""""),
      body.toString)
  }

  /** Incremental CSV records (header first), one Spark partition resident
    * on the driver at a time — the chunked-transfer path for unclamped
    * exports. Same cell encoding as [[toCsvResponse]]; each element is one
    * record WITHOUT the terminator (the transport frames them).
    */
  def csvRecords(df: DataFrame): Iterator[String] = {
    import scala.jdk.CollectionConverters._
    val cols = df.columns
    Iterator.single(cols.map(csvCell).mkString(",")) ++
      df.toLocalIterator().asScala.map(csvRecord(cols, _))
  }

  /** K6: a clamped JSON-array response (the reference's actix `Json` over
    * DAO rows). Row→JSON uses Spark's own JSON encoder so types render
    * identically to a distributed JSON sink.
    */
  def toJsonResponse(df: DataFrame, maxRows: Int = 100): HttpPayload =
    HttpPayload(200, "application/json", Map.empty,
      df.limit(maxRows).toJSON.collect().mkString("[", ",", "]"))
}
