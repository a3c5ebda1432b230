package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Session-free source-wiring pins (SURVEY §2.1 S1): the JDBC option map
  * is the contract Spark's JDBC source reads by exact key — a typo in
  * "partitionColumn"/"lowerBound"/... silently degrades to a single-task
  * unpartitioned scan, which at 100 TB is a dead pipeline. */
class SourcesSpec extends AnyFunSuite {

  test("jdbc option wiring: exact keys + stringified bounds") {
    val got = Tables.jdbcOptions(
      url = "jdbc:postgresql://db:5432/posttop",
      table = "(SELECT v.id FROM video v) AS src",
      partitionColumn = "id", lowerBound = 0L, upperBound = 1000000L,
      numPartitions = 64)
    assert(got == Map(
      "url" -> "jdbc:postgresql://db:5432/posttop",
      "dbtable" -> "(SELECT v.id FROM video v) AS src",
      "partitionColumn" -> "id",
      "lowerBound" -> "0",
      "upperBound" -> "1000000",
      "numPartitions" -> "64"))
  }
}
