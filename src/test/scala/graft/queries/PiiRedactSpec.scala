package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Properties of the PII redaction patterns beyond what the DuckDB
  * oracle pins (the oracle proves Spark==DuckDB on the planted
  * corpus; these prove the patterns behave on adversarial inputs).
  */
class PiiRedactSpec extends SparkSpec {
  import TextAnalysis.{EmailRe, IpRe, PhoneRe}

  private def redact(c: org.apache.spark.sql.Column) =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      IpRe, "<IP>")

  private def redactOne(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(redact(col("t"))).head().getString(0)
  }

  test("redaction is idempotent: redact(redact(x)) == redact(x)") {
    val cases = Seq(
      "mail a.b-c_d%e+f@sub.domain.example.com now",
      "ips 10.0.0.1 and 255.255.255.255, tel +1-555-0199",
      "no pii at all, just words",
      "edge a@b.co 1.2.3.4a@b.co",
      "stacked x@y.de x@y.de 1.1.1.1 1.1.1.1 +1-555-0000 +1-555-9999")
    cases.foreach { s =>
      val once = redactOne(s)
      assert(redactOne(once) == once, s"not idempotent on: $s")
    }
  }

  test("clean text passes through byte-identical") {
    val clean = Seq(
      "the quick brown fox 123 456",
      "version 1.2.3 of pkg",             // only 3 octets — not an IP
      "call 555-0100 plainly",            // not the +1-555- form
      "at symbol alone @ stays",
      "1234.5.6.7890 is not an address")  // \b blocks partial octets
    clean.foreach(s => assert(redactOne(s) == s, s"mangled: $s"))
  }

  test("every planted kind is consumed by its own placeholder") {
    val s = "u user9@mail2.example.com srv 10.4.0.77 tel +1-555-0042 end"
    assert(redactOne(s) == "u <EMAIL> srv <IP> tel <PHONE> end")
  }

  test("dotted-quad inside a hostname goes to the email rule, not IP") {
    // order email→phone→IP: the whole address including its
    // digits-and-dots domain is consumed first
    val s = "x 10.0.0.1@10.0.0.1.example.com y"
    assert(redactOne(s) == "x <EMAIL> y")
  }

  test("the query emits one row per document with non-null fingerprints") {
    val out = TextAnalysis.piiRedact(spark, "/root/testdata/sf0.001")
    val n = out.count()
    assert(n > 0)
    assert(out.filter(col("fp").isNull || col("redacted_len") <= 0).count() == 0)
    // planted density: every doc_id % 3 != 0 doc carries an email
    val emails = out.agg(sum(col("n_emails"))).head().getLong(0)
    assert(emails == out.filter(col("doc_id") % 3 =!= 0).count())
  }
}
