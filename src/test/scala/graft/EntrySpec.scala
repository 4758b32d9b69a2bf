package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: every oracle names an existing query,
  * pack names never collide, and the flagship entry is registered. */
class EntrySpec extends AnyFunSuite {

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("query packs do not shadow each other's names") {
    val all = Seq(
      queries.SourceQueries.queries, queries.RelationalQueries.queries,
      queries.EncodingQueries.queries, queries.ImputationQueries.queries,
      queries.BalancingQueries.queries, queries.TextQueries.queries,
      queries.DedupQueries.queries, queries.MlQueries.queries,
      queries.StreamingQueries.queries, queries.MultimodalQueries.queries,
      queries.SmoteQueries.queries, queries.MiscQueries.queries,
      queries.JoinQueries.queries)
    val names = all.flatMap(_.keys)
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names across packs: $dupes")
    assert(names.toSet == SparkEntry.queries.keySet)
  }

  test("bench headline names all resolve") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline names without queries: $missing")
  }
}
