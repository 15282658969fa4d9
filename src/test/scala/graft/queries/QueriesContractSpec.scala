package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract: the correctness gate only checks queries
  * that declare an oracle, so a query silently losing its oracle entry
  * would LOOK green while dropping out of verification.
  */
class QueriesContractSpec extends AnyFunSuite {

  test("every query has a DuckDB oracle (and no orphan oracles)") {
    assert(Queries.oracles.keySet == Queries.all.keySet)
  }

  test("query names follow the qNN_snake_case convention") {
    assert(Queries.all.keySet.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")))
  }

  test("oracle SQL is non-trivial and references a corpus table") {
    val tables = Seq("lineitem", "orders", "customer", "supplier", "part",
      "nation", "region", "events", "documents", "embeddings")
    Queries.oracles.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name oracle is empty")
      assert(tables.exists(sql.contains), s"$name oracle references no corpus table")
    }
  }
}
