package graft

import org.scalatest.funsuite.AnyFunSuite

/** Integrity of the split query registry (r10): the per-domain Queries*
  * slices must merge without collisions (a duplicate key would silently
  * shadow a query in the ++ chain) and every query must carry its oracle
  * twin. Pure map algebra — no SparkSession needed. */
class RegistrySpec extends AnyFunSuite {

  private val slices: Seq[(String, Map[String, _], Map[String, String])] = Seq(
    ("Relational", QueriesRelational.queries, QueriesRelational.oracleSql),
    ("Text", QueriesText.queries, QueriesText.oracleSql),
    ("Dedup", QueriesDedup.queries, QueriesDedup.oracleSql),
    ("Ann", QueriesAnn.queries, QueriesAnn.oracleSql),
    ("Graph", QueriesGraph.queries, QueriesGraph.oracleSql),
    ("Stats", QueriesStats.queries, QueriesStats.oracleSql),
    ("Stream", QueriesStream.queries, QueriesStream.oracleSql))

  test("domain slices are pairwise disjoint and merge losslessly") {
    val all = slices.flatMap(_._2.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query ids across slices: $dups")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every query has an oracle twin in its own slice, and globally") {
    for ((name, q, o) <- slices)
      assert(q.keySet == o.keySet,
        s"$name: unpaired ids ${(q.keySet diff o.keySet) ++ (o.keySet diff q.keySet)}")
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
    assert(SparkEntry.queries.size >= 239)
  }
}
