package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(s: String): String =
    Seq(s).toDF("text").select(TextAnalysis.scrubPii($"text")).head().getString(0)

  test("redacts emails, phones, and IPv4s with typed placeholders") {
    assert(scrub("mail a.b+c@ex-1.example.org now") == "mail <email> now")
    assert(scrub("call +1 555 010 0100 ok") == "call <phone> ok")
    assert(scrub("host 192.168.0.1 up") == "host <ipv4> up")
    assert(scrub("x@y.io and 10.0.0.7 and +44 123 456 7890")
      == "<email> and <ipv4> and <phone>")
  }

  test("leaves clean text untouched and never cascades placeholders") {
    val clean = "the quick brown fox version 2 at noon"
    assert(scrub(clean) == clean)
    // a replaced email must not create a phone/ipv4 match
    assert(scrub("bob1.2.3.4@example.com") == "<email>")
  }

  test("piiCounts counts every non-overlapping match per category") {
    val row = Seq("a@b.co c@d.io 1.2.3.4").toDF("text")
      .select(TextAnalysis.piiCounts($"text").map { case (k, c) => c.as(k) }: _*)
      .head()
    assert(row.getAs[Int]("email") == 2)
    assert(row.getAs[Int]("phone") == 0)
    assert(row.getAs[Int]("ipv4") == 1)
  }
}
