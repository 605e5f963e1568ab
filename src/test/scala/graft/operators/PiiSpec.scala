package graft.operators

import graft.SparkSpec

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: String*) =
    Pii.redact(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")).collect()

  test("masks each category with its typed token and counts it") {
    val out = run(
      "mail me at jane.doe+x@corp.example.com or call 555-867-5309 ok",
      "server at 10.0.42.7 logged card 4111 1111 1111 1111 twice",
      "nothing sensitive here at all")
    assert(out(0).getAs[String]("redacted") ==
      "mail me at <EMAIL> or call <PHONE> ok")
    assert(out(0).getAs[Long]("n_emails") == 1L)
    assert(out(0).getAs[Long]("n_phones") == 1L)
    assert(!out(0).getAs[Boolean]("pii_free"))
    assert(out(1).getAs[String]("redacted") ==
      "server at <IP> logged card <CARD> twice")
    assert(out(1).getAs[Long]("n_cards") == 1L)
    assert(out(1).getAs[Long]("n_ips") == 1L)
    assert(out(2).getAs[Boolean]("pii_free"))
    assert(out(2).getAs[String]("redacted") == "nothing sensitive here at all")
  }

  test("cascade: a card is never double-counted as a phone; email digits stay private") {
    val out = run(
      "card 4111 1111 1111 1111 end",        // card only — no phone count
      "reach 555-123-4567@phones.example.net today") // phone-shaped local part is EMAIL
    assert(out(0).getAs[Long]("n_cards") == 1L)
    assert(out(0).getAs[Long]("n_phones") == 0L)
    assert(out(1).getAs[Long]("n_emails") == 1L)
    assert(out(1).getAs[Long]("n_phones") == 0L)
    assert(out(1).getAs[String]("redacted") == "reach <EMAIL> today")
  }

  test("multiple hits in one doc are all masked and counted") {
    val out = run("a@b.co then c@d.org then 1.2.3.4 then 5.6.7.8")
    assert(out(0).getAs[Long]("n_emails") == 2L)
    assert(out(0).getAs[Long]("n_ips") == 2L)
    assert(out(0).getAs[String]("redacted") ==
      "<EMAIL> then <EMAIL> then <IP> then <IP>")
  }

  test("piiFreeCol equals scrub's cascaded pii_free on every row") {
    val df = Seq(
      (1L, "mail jane@corp.example.com today"),
      (2L, "card 4111 1111 1111 1111 on file"),
      (3L, "call 555-867-5309 re 10.0.42.7"),
      (4L, "nothing sensitive at all"),
      (5L, "")).toDF("doc_id", "text")
    val fromCol = df.select($"doc_id", Pii.piiFreeCol.as("p")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val fromScrub = Pii.scrub(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("pii_free")).toMap
    assert(fromCol == fromScrub)
    assert(fromCol == Map(1L -> false, 2L -> false, 3L -> false,
      4L -> true, 5L -> true))
  }
}
