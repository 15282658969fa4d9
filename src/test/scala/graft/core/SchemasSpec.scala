package graft.core

import graft.SparkSpecBase

/** D1/D2 parsing parity with the reference deserializers
  * (`/root/reference/src/main/java/Deserializer/`) and the producer's
  * wire format (`user-generator.py:22`).
  */
class SchemasSpec extends SparkSpecBase {
  import spark.implicits._

  private val userJson =
    """{"id":"u1","name":"Maria Silva","email":"maria@example.org",
      |"genre":"F","registerDate":"2026-08-12T14:03:21.123456+0000"}"""
      .stripMargin.replace("\n", "")

  test("user JSON parses incl. the no-colon-offset microsecond timestamp") {
    val users = Schemas.parseUsers(Seq(userJson).toDF("value")).collect()
    assert(users.length == 1)
    val u = users.head
    assert(u.id == "u1" && u.name == "Maria Silva" && u.genre == "F")
    // 2026-08-12T14:03:21.123456 UTC
    assert(u.registerDate.toInstant.toString == "2026-08-12T14:03:21.123456Z")
  }

  test("missing JSON fields become null (Jackson missing-field behavior)") {
    val users = Schemas.parseUsers(Seq("""{"id":"u2"}""").toDF("value")).collect()
    assert(users.head.id == "u2" && users.head.name == null && users.head.registerDate == null)
  }

  test("malformed JSON yields null row in permissive mode") {
    val users = Schemas.parseUsers(Seq("""not json at all""").toDF("value")).collect()
    assert(users.length == 1 && users.head.id == null)
  }

  test("strict mode surfaces malformed JSON (Jackson throw-on-garbage parity)") {
    val bad = Seq("""{"id": not valid""").toDF("value")
    intercept[Exception] {
      Schemas.parseUsers(bad, strict = true).collect()
    }
  }

  test("address JSON parses with embedded newline in address") {
    val parsed = Schemas.parseAddresses(
      Seq("""{"userId":"u1","address":"1 Main St\nApt 5","city":"X","state":"Illinois","zipCode":"62701","country":"Brazil"}""")
        .toDF("value")).collect()
    assert(parsed.head.address == "1 Main St\nApt 5")
    assert(parsed.head.state == "Illinois")
  }
}
