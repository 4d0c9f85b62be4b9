package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: the oracle map may never carry a key
  * that isn't a registered query (the driver iterates queries and
  * looks oracles up by name — an orphan oracle would silently never
  * run), and names must be stable snake_case identifiers (they become
  * file paths and JSON keys in the driver's artifacts).
  * No SparkSession needed: both maps are static (the one
  * context-dependent oracle, sim_pq_ann, only ADDS a key for an
  * already-registered query when Verify sets the context).
  */
class RegistrySpec extends AnyFunSuite {

  test("every oracle key is a registered query") {
    val q = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- q
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("query names are stable snake_case identifiers") {
    val bad = SparkEntry.queries.keySet
      .filterNot(_.matches("[a-z0-9]+(_[a-z0-9]+)*"))
    assert(bad.isEmpty, s"non-conforming names: $bad")
  }

  test("registered query count matches the round record") {
    assert(SparkEntry.queries.size == 287, // r17: +ta_lm_kn4,
      // +ta_lm_kn4_levels (the KN-style continuation-count tier),
      // +sim_ivfpq_opq, +sim_ivfpq_opq_serve,
      // +sim_ivfpq_opq_recall_curve (the rotated tier)
      s"query count drifted: ${SparkEntry.queries.size} — update the " +
        "round record (NOTES.md/README.md) together with this pin")
  }
}
