package graft.queries

import graft.SparkSpec

/** Planted-PII property test for the scrub operator: documents with known
  * emails, IPv4 addresses, and phone numbers (including the adversarial
  * shapes — PII at string edges, back-to-back occurrences, phone/IP digit
  * overlap, an IP inside an email that must NOT double-count after the
  * email stage already consumed it) are driven through the REAL operator
  * core and compared against hand-written expected redactions.
  */
class PiiScrubPropertySpec extends SparkSpec {

  // (text, expected scrubbed, n_emails, n_ips, n_phones)
  private val cases: Seq[(String, String, Long, Long, Long)] = Seq(
    ("no pii here at all", "no pii here at all", 0, 0, 0),
    ("mail me at alice.smith+spam@example.co.uk today",
      "mail me at <EMAIL> today", 1, 0, 0),
    ("server 10.0.255.3 and 192.168.1.1.",
      "server <IP> and <IP>.", 0, 2, 0),
    ("call 555-123-4567 or 555.123.4567 or 555 123 4567",
      "call <PHONE> or <PHONE> or <PHONE>", 0, 0, 3),
    // a raw-IP "email" has no alphabetic TLD, so the email stage skips it
    // and the IP stage redacts the address itself (user@host stays)
    ("root@10.0.0.12 logged in from 10.0.0.13",
      "root@<IP> logged in from <IP>", 0, 2, 0),
    // all three categories in one line, at both string edges
    ("bob@x.io 1.2.3.4 555-000-1111",
      "<EMAIL> <IP> <PHONE>", 1, 1, 1),
    // 4-digit tail is not an IP octet; dotted phone must win
    ("dial 123.456.7890 now", "dial <PHONE> now", 0, 0, 1),
    // digits glued to words give no \b match
    ("id ab1.2.3.4cd stays", "id ab1.2.3.4cd stays", 0, 0, 0),
    ("twice bob@x.io carol@y.org and again bob@x.io",
      "twice <EMAIL> <EMAIL> and again <EMAIL>", 3, 0, 0),
  )

  test("planted PII scrubs to hand-computed redactions through the real operator") {
    import spark.implicits._
    val df = cases.zipWithIndex
      .map { case ((text, _, _, _, _), i) => (i.toLong, text) }
      .toDF("doc_id", "text")
    val got = TextOps.piiScrubOn(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("scrubbed"), r.getAs[Long]("n_emails"),
          r.getAs[Long]("n_ips"), r.getAs[Long]("n_phones"),
          r.getAs[Long]("n_redacted"))))
      .toMap
    cases.zipWithIndex.foreach { case ((text, want, e, ip, ph), i) =>
      val (scrubbed, ne, ni, np, nr) = got(i.toLong)
      assert(scrubbed === want, s"case $i: $text")
      assert((ne, ni, np) === ((e, ip, ph)), s"case $i counts: $text")
      assert(nr === e + ip + ph, s"case $i total: $text")
    }
  }

  test("the synthetic corpus is PII-free and the catalog row is total") {
    val out = Catalog.queries("t_pii_scrub")(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 500)
    assert(out.forall(_.getAs[Long]("n_redacted") === 0L),
      "word-salad corpus must scrub to zero redactions")
  }
}
