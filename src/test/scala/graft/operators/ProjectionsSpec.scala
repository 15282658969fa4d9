package graft.operators

import graft.SparkSpecBase
import graft.core.{Address, User, UserAddress}

/** C3 golden document shape (`/root/reference/src/main/java/Dto/UserAddress.java:41-61`):
  * renames name→userName, email→userEmail; nested address elements DROP userId.
  */
class ProjectionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("C3: field renames and dropped userId in nested addresses") {
    val ts = java.sql.Timestamp.valueOf("2026-08-12 14:03:21")
    val ua = UserAddress(
      User("u1", "Maria Silva", "maria@example.org", "F", ts),
      Seq(Address("u1", "1 Main St", "Springfield", "Illinois", "62701", "Brazil")))
    val doc = Projections.userAddressDocument(Seq(ua).toDS().toDF())
    assert(doc.columns.toSeq ==
      Seq("userId", "userName", "userEmail", "genre", "registerDate", "addresses"))
    val row = doc.collect().head
    assert(row.getString(0) == "u1" && row.getString(1) == "Maria Silva" &&
      row.getString(2) == "maria@example.org")
    val addrElem = row.getSeq[org.apache.spark.sql.Row](5).head
    assert(addrElem.schema.fieldNames.toSeq ==
      Seq("address", "city", "state", "zipCode", "country")) // no userId
    assert(addrElem.getString(0) == "1 Main St" && addrElem.getString(4) == "Brazil")
  }
}
