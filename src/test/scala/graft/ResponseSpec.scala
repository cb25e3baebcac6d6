package graft

import org.apache.spark.sql.functions._
import graft.serve.Responses

/** Pins the serving-edge response sinks (K6/K7) to the reference's
  * `to_csv_response` semantics (etl-api/src/csv_response.rs:7-55): header
  * record from the field names, RFC 4180 necessary-quoting, `\n`
  * terminator, null → empty field, `text/csv` + attachment headers; and
  * the JSON twin (actix `Json` over DAO rows). The incremental
  * `csvRecords` iterator must render byte-identically to the buffered
  * response — the two paths are the same contract at different scales.
  */
class ResponseSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    (1L, "plain", Some("no special chars")),
    (2L, "comma,inside", Some("quote \"q\" inside")),
    (3L, "line\nbreak", None)
  ).toDF("id", "name", "note").coalesce(1).orderBy("id")

  test("toCsvResponse: header, necessary quoting, null as empty, attachment headers") {
    val resp = Responses.toCsvResponse(sample, "export.csv")
    assert(resp.status == 200)
    assert(resp.contentType == "text/csv")
    assert(resp.headers("Content-Disposition") == "attachment; filename=\"export.csv\"")
    val expected =
      "id,name,note\n" +
      "1,plain,no special chars\n" +
      "2,\"comma,inside\",\"quote \"\"q\"\" inside\"\n" +
      "3,\"line\nbreak\",\n"
    assert(resp.body == expected, s"body was:\n${resp.body}")
  }

  test("toCsvResponse clamps the row count (header always present)") {
    val resp = Responses.toCsvResponse(sample, "page.csv", maxRows = 1)
    assert(resp.body == "id,name,note\n1,plain,no special chars\n")
    val empty = Responses.toCsvResponse(sample.filter(lit(false)), "empty.csv")
    assert(empty.body == "id,name,note\n")
  }

  test("csvRecords streams byte-identically to the buffered response") {
    val streamed = Responses.csvRecords(sample).mkString("", "\n", "\n")
    assert(streamed == Responses.toCsvResponse(sample, "x.csv", maxRows = 10).body)
  }

  test("quoted header cells: a column name containing the delimiter is quoted") {
    val df = Seq((1, 2)).toDF("a,b", "c")
    assert(Responses.toCsvResponse(df, "h.csv").body.startsWith("\"a,b\",c\n"))
  }

  test("timestamp cells render RFC 3339 UTC, not the JDBC toString form") {
    val df = Seq(Tuple1("2024-03-05 06:07:08")).toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    val body = Responses.toCsvResponse(df, "t.csv").body
    assert(body == "ts\n2024-03-05T06:07:08Z\n", s"body was: $body")
  }

  test("TIMESTAMP_NTZ cells keep the seconds field at :00 and binary renders base64") {
    // LocalDateTime.toString drops ':00' seconds ('2024-03-05T06:07') —
    // the formatter must not
    val df = Seq(Tuple1("2024-03-05 06:07:00")).toDF("s")
      .select(col("s").cast("timestamp_ntz").as("ts"))
    val body = Responses.toCsvResponse(df, "ntz.csv").body
    assert(body == "ts\n2024-03-05T06:07:00\n", s"body was: $body")
    val df2 = Seq(Tuple1("2024-03-05 06:07:08.25")).toDF("s")
      .select(col("s").cast("timestamp_ntz").as("ts"))
    val body2 = Responses.toCsvResponse(df2, "ntz2.csv").body
    assert(body2 == "ts\n2024-03-05T06:07:08.25\n", s"body was: $body2")
    val dfb = Seq(Tuple1(Array[Byte](1, 2, 0xFF.toByte))).toDF("b")
    val bodyb = Responses.toCsvResponse(dfb, "b.csv").body
    assert(bodyb == "b\nAQL/\n", s"body was: $bodyb")
  }

  test("toJsonResponse: valid JSON array that round-trips through Spark's reader") {
    val resp = Responses.toJsonResponse(sample, maxRows = 10)
    assert(resp.contentType == "application/json")
    val back = spark.read.json(Seq(resp.body).toDS)
      .select("id", "name", "note").orderBy("id")
    val orig = sample.collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    val rt = back.collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    assert(rt.toSeq == orig.toSeq)
    // clamp respected and empty input renders the empty array
    assert(Responses.toJsonResponse(sample, maxRows = 1).body.count(_ == '{') == 1)
    assert(Responses.toJsonResponse(sample.filter(lit(false))).body == "[]")
  }
}
