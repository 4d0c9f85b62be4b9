package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Pins the canary protocol's cross-language contract (VERDICT r12 ask
  * #1): the Scala measurement set ([[Canary.Queries]]) and the Python
  * normalization set (`CANARY_QUERIES` in tools/bench_diff.py) must be
  * the SAME list, every canary must be a registered query, and every
  * canary must exist in the floor artifact the normalization divides by.
  * No SparkSession needed — source-level contract checks, run from the
  * repo root like TwinRegistrySpec.
  */
class CanarySpec extends AnyFunSuite {

  test("canary set: ten distinct registered queries") {
    assert(Canary.Queries.size == 10)
    assert(Canary.Queries.distinct.size == Canary.Queries.size)
    val missing = Canary.Queries.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"canaries not in the query registry: $missing")
  }

  test("canary set mirrors CANARY_QUERIES in tools/bench_diff.py exactly") {
    val py = new String(
      Files.readAllBytes(Paths.get("tools/bench_diff.py")), "UTF-8")
    val start = py.indexOf("CANARY_QUERIES = [")
    assert(start >= 0, "bench_diff.py lost its CANARY_QUERIES block")
    val block = py.substring(start, py.indexOf("]", start))
    val pyList = "\"([a-z0-9_]+)\"".r.findAllMatchIn(block)
      .map(_.group(1)).toSeq
    assert(pyList == Canary.Queries,
      s"bench_diff.py canary list drifted: $pyList vs ${Canary.Queries}")
  }

  test("every canary exists in the floor artifact the gate divides by") {
    val floor = new String(
      Files.readAllBytes(Paths.get("BENCH_floor_local.json")), "UTF-8")
    val missing = Canary.Queries.filterNot(q => floor.contains("\"" + q + "\""))
    assert(missing.isEmpty,
      s"canaries absent from BENCH_floor_local.json: $missing — " +
        "normalization would silently skip them")
  }
}
