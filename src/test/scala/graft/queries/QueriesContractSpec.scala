package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract: the correctness gate only checks queries
  * that declare an oracle, so a query silently losing its oracle entry
  * would LOOK green while dropping out of verification.
  */
class QueriesContractSpec extends AnyFunSuite {

  /** Queries deliberately WITHOUT a SQL oracle (driver falls back to the
    * rows-only check). Every entry must say why here and carry a spec
    * that pins its semantics instead. Currently empty: even q112's BPE
    * train+encode replay turned out to be SQL-expressible (greedy merge
    * = boundary-wrapped `replace()`, rounds unrolled to materialized
    * CTEs — `Queries.bpeEncodeOracle`).
    */
  private val rowsOnly = Set.empty[String]

  test("every query has a DuckDB oracle (and no orphan oracles)") {
    assert(Queries.oracles.keySet == Queries.all.keySet -- rowsOnly)
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
