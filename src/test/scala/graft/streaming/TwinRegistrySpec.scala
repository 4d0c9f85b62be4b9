package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Machine-checks the streaming-twin registry (r12 VERDICT ask #4) the
  * way RegistrySpec machine-checks the query registry: the COUNT is
  * pinned, every entry must name a parity spec that literally exists in
  * the test sources, every named fold/reader must exist in the main
  * sources, and — the converse direction — every `…FromState` /
  * `…AgainstState` reader defined in StreamingCuration must be claimed
  * by exactly the registry. A 32nd twin therefore cannot land half-wired:
  * adding the reader without a registry entry fails the coverage test,
  * and adding the entry without a `fromState == batch` spec fails the
  * parity-location test. No SparkSession needed — this is a source-level
  * contract check (sbt runs tests from the repo root).
  */
class TwinRegistrySpec extends AnyFunSuite {

  private def sourcesUnder(root: String): Seq[String] = {
    val p = Paths.get(root)
    assert(Files.isDirectory(p), s"expected to run from the repo root; missing $root")
    Files.walk(p).iterator().asScala
      .filter(f => f.toString.endsWith(".scala"))
      .map(f => new String(Files.readAllBytes(f), "UTF-8"))
      .toSeq
  }
  private lazy val testSrc = sourcesUnder("src/test/scala")
  private lazy val mainSrc = sourcesUnder("src/main/scala")

  test("twin count matches the round record") {
    assert(TwinRegistry.twins.size == 43, // r17: +min_k_cap, +min_k_band
      // (the first O(cap × |keys|)-bounded-state twins),
      // +ivfpq_opq_index (the rotated serving tier),
      // +lm_kn4_model (one state, three scorers);
      // r16: +ivfpq_residual_index,
      // +lm_trigram_model
      // r15: +ivfpq_index (the
      // frozen serving artifact), +lm_model — update README/NOTES
      // with this pin
      s"twin count drifted: ${TwinRegistry.twins.size}")
  }

  test("twin names are unique snake_case identifiers") {
    val names = TwinRegistry.twins.map(_.name)
    assert(names.distinct.size == names.size, "duplicate twin names")
    val bad = names.filterNot(_.matches("[a-z0-9]+(_[a-z0-9]+)*"))
    assert(bad.isEmpty, s"non-conforming names: $bad")
  }

  test("every twin declares a known protocol and non-empty state tables") {
    TwinRegistry.twins.foreach { t =>
      assert(Set("versioned-state", "persisted-artifact").contains(t.protocol),
        s"${t.name}: unknown protocol ${t.protocol}")
      assert(t.stateTables.nonEmpty && t.mergeOps.nonEmpty &&
        t.readerOp.nonEmpty && t.batchTwin.nonEmpty,
        s"${t.name}: incomplete entry")
    }
  }

  test("every twin's parity spec exists verbatim in the test sources") {
    TwinRegistry.twins.foreach { t =>
      assert(t.paritySpec.length > 20,
        s"${t.name}: parity spec name suspiciously short")
      assert(testSrc.exists(_.contains(t.paritySpec)),
        s"${t.name}: no test source contains \"${t.paritySpec}\" — " +
          "a twin may not land without its reader==batch parity spec")
    }
  }

  test("every twin's fold and reader entry points exist in the main sources") {
    TwinRegistry.twins.foreach { t =>
      (t.mergeOps :+ t.readerOp).foreach { op =>
        assert(mainSrc.exists(_.contains(s"def $op")),
          s"${t.name}: entry point $op not found in src/main — " +
            "registry drifted after a rename?")
      }
    }
  }

  test("every versioned-state twin's state tables exist verbatim in the main sources") {
    TwinRegistry.twins.filter(_.protocol == "versioned-state").foreach { t =>
      t.stateTables.foreach { tbl =>
        // parameterized tables (key_counts_<key>, kmv_<key>) pin their
        // literal prefix; concrete names pin the quoted literal
        val needle =
          if (tbl.contains("<")) "\"" + tbl.takeWhile(_ != '<')
          else "\"" + tbl + "\""
        assert(mainSrc.exists(_.contains(needle)),
          s"${t.name}: state table $tbl (as $needle) not found in " +
            "src/main — registry drifted after a table rename?")
      }
    }
  }

  test("every StreamingCuration state reader is claimed by the registry") {
    val cur = new String(Files.readAllBytes(Paths.get(
      "src/main/scala/graft/examples/StreamingCuration.scala")), "UTF-8")
    val defined = "def (\\w+(?:FromState|AgainstState))".r
      .findAllMatchIn(cur).map(_.group(1)).toSet
    val claimed = TwinRegistry.twins.map(_.readerOp).toSet
    val orphans = defined -- claimed
    assert(orphans.isEmpty,
      s"state readers with no registry entry (twin #${TwinRegistry.twins.size + 1} " +
        s"half-landed?): $orphans")
  }
}
