package graft

/** The five no-oracle keys' quantitative evidence (see [[Evidence]])
  * must hold at the small fixture too — same computation the
  * committed EVIDENCE.json artifact runs at sf0.01.
  */
class EvidenceSpec extends SparkSuite {
  test("all no-oracle evidence bounds hold at sf0.001") {
    val rows = ops.core.withCaches(spark) { Evidence.compute(spark, sf) }
    assert(rows.nonEmpty)
    val failed = rows.filterNot(_.pass)
    assert(failed.isEmpty, failed.map(r =>
      s"${r.key} ${r.metric}: ${r.value} !${r.cmp} ${r.bound} (n=${r.n})")
      .mkString("; "))
    // every no-oracle key is covered by at least one evidence row
    val covered = rows.map(_.key).toSet
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.subsetOf(covered),
      s"no-oracle keys without evidence: ${(noOracle -- covered).toSeq.sorted}")
  }
}
