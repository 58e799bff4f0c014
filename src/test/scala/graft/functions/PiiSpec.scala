package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The PII kernel's behavior on constructed positives — the testdata
  * corpus is digit-free word salad, so x_pii_scrub's oracle-verified
  * answer there is the all-clear audit; THIS spec is where detection
  * and redaction are actually exercised. */
class PiiSpec extends AnyFunSuite with SparkTestBase {
  import org.apache.spark.sql.functions._

  private def one(text: String) = {
    import spark.implicits._
    Seq(text).toDF("text")
  }

  test("emails, phones and IPv4s are counted and char-accounted") {
    import spark.implicits._
    val df = one("mail bob.smith+x@corp.example.org or call 555-123-4567; " +
        "host 10.0.255.3 and 192.168.1.1, not 1.2.3 and not a@b")
      .select(
        Pii.count($"text", Pii.emailPat).as("e"),
        Pii.count($"text", Pii.phonePat).as("p"),
        Pii.count($"text", Pii.ipv4Pat).as("i"),
        Pii.matchedChars($"text", Pii.emailPat).as("ec"))
    val r = df.collect()(0)
    assert(r.getLong(0) == 1 && r.getLong(1) == 1 && r.getLong(2) == 2,
      s"counts wrong: $r")
    assert(r.getLong(3) == "bob.smith+x@corp.example.org".length.toLong)
  }

  test("scrub replaces every hit with its type tag and keeps clean text intact") {
    import spark.implicits._
    val scrubbed = one("ping 10.0.0.1 then mail a_b@x.io or 555-123-4567 ok")
      .select(Pii.scrub($"text").as("s")).collect()(0).getString(0)
    assert(scrubbed == "ping <ipv4> then mail <email> or <phone> ok", scrubbed)
    val clean = "the quick brown fox at noon"
    assert(one(clean).select(Pii.scrub($"text")).collect()(0).getString(0) == clean)
  }

  test("zero-hit documents account zero matched chars (no null poisoning)") {
    import spark.implicits._
    val r = one("nothing here")
      .select(Pii.matchedChars($"text", Pii.emailPat)).collect()(0)
    assert(!r.isNullAt(0) && r.getLong(0) == 0L)
  }
}
