package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {

  private def redactOne(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(Pii.redact(col("t"))).as[String].head()
  }

  private def counts(s: String): (Long, Long, Long) = {
    import spark.implicits._
    Seq(s).toDF("t")
      .select(Pii.emailCount(col("t")), Pii.phoneCount(col("t")),
        Pii.ipCount(col("t")))
      .as[(Long, Long, Long)].head()
  }

  test("redacts each class with its token") {
    assert(redactOne("mail a.b-c_d%e@sub.example.org now") ==
      "mail [EMAIL] now")
    assert(redactOne("call 555-0199 twice 555-0200") ==
      "call [PHONE] twice [PHONE]")
    assert(redactOne("host 192.168.0.1 and 10.0.255.9") ==
      "host [IP] and [IP]")
  }

  test("email is consumed before the IP pattern can see its domain dots") {
    // "u1@10.0.0.1.example.com"-style strings must become one [EMAIL],
    // not an [EMAIL]-with-[IP]-inside
    assert(redactOne("u1@e10.0.0.1b.example.com x") == "[EMAIL] x")
  }

  test("word boundaries: longer digit runs are not phones/IPs") {
    assert(redactOne("id 1555-01999 x") == "id 1555-01999 x")
    assert(redactOne("v 1.2.3.4.5 x") == s"v ${"[IP]"}.5 x")
    assert(counts("id 1555-01999")._2 == 0L)
  }

  test("counts are longs and count every occurrence") {
    assert(counts("a@b.co c@d.org 555-0000 1.2.3.4 5.6.7.8") == (2L, 1L, 2L))
    assert(counts("nothing here") == (0L, 0L, 0L))
  }

  test("mixed text redacts in one pass, non-PII bytes untouched") {
    assert(redactOne("Contact u9@mail.example.com call 555-0042 ip 10.1.2.9!") ==
      "Contact [EMAIL] call [PHONE] ip [IP]!")
  }
}
