package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench promotion gate — a loaded driver run overwrote the quiet
  * BENCH_FULL.json pin three rounds running (r7–r9); promotion must be
  * an explicit decision, not an unconditional write. */
class BenchPromotionSpec extends AnyFunSuite {

  private val pin = Map("q_a" -> 1.0, "q_b" -> 2.0, "q_c" -> 3.0)

  test("quiet run within 1.1x promotes") {
    val fresh = Map("q_a" -> 1.0, "q_b" -> 2.1, "q_c" -> 3.2)  // 6.3/6.0 = 1.05x
    val (promote, reason, f, p) = Bench.promotionDecision(fresh, pin)
    assert(promote && reason.startsWith("quiet_"))
    assert(math.abs(f - 6.3) < 1e-9 && math.abs(p - 6.0) < 1e-9)
  }

  test("loaded run with the same query set keeps the pin") {
    val fresh = Map("q_a" -> 1.5, "q_b" -> 3.0, "q_c" -> 4.5)  // 9.0/6.0 = 1.5x
    val (promote, reason, _, _) = Bench.promotionDecision(fresh, pin)
    assert(!promote, s"1.5x loaded run must not clobber the pin ($reason)")
    assert(reason.startsWith("kept_pin_loaded_"))
  }

  test("query-set change promotes even when loaded, and says so") {
    val fresh = Map("q_a" -> 1.5, "q_b" -> 3.0, "q_c" -> 4.5, "q_new" -> 0.5)
    val (promote, reason, _, _) = Bench.promotionDecision(fresh, pin)
    assert(promote, "a changed query set means the pin no longer describes the suite")
    assert(reason.startsWith("query_set_changed_loaded_"))
  }

  test("query-set change on a quiet run promotes with the plain reason") {
    val fresh = Map("q_a" -> 1.0, "q_b" -> 2.0, "q_c" -> 3.0, "q_new" -> 0.5)
    val (promote, reason, _, _) = Bench.promotionDecision(fresh, pin)
    assert(promote && reason == "query_set_changed")
  }

  test("no prior pin promotes") {
    val (promote, reason, _, _) =
      Bench.promotionDecision(Map("q_a" -> 1.0), Map.empty)
    assert(promote && reason == "no_prior_pin")
  }

  test("parsePinnedQueries reads our flat record and drops -1 sentinels") {
    val rec = """{"metric":"total","value":6.000,"unit":"sec","queries":{"q_a":1.000,"q_b":2.000,"q_dead":-1.0},"failed":["q_dead"],"reps":2,"load_avg":0.5,"cpus":4,"sf":"/root/testdata/sf0.1"}"""
    val m = Bench.parsePinnedQueries(rec)
    assert(m == Map("q_a" -> 1.0, "q_b" -> 2.0))
  }

  test("parsePinnedQueries on garbage yields empty (promotes as no_prior_pin)") {
    assert(Bench.parsePinnedQueries("not json at all").isEmpty)
    assert(Bench.parsePinnedQueries("").isEmpty)
  }

  test("contentionVsPin flags only >=2x AND >=0.3s rows, worst-first") {
    val pin = Map("a" -> 1.0, "b" -> 0.1, "c" -> 2.0, "d" -> 0.05, "e" -> 1.0)
    val fresh = Map(
      "a" -> 3.0, // 3.0x, flagged
      "b" -> 0.25, // 2.5x but under the 0.3s absolute floor — noise, not flagged
      "c" -> 3.0, // 1.5x — under the ratio bar
      "d" -> 1.0, // 20x, flagged (absolute floor met)
      "e" -> 1.0, // 1.0x
      "new_q" -> 9.9) // not in the pin — nothing to compare against
    assert(Bench.contentionVsPin(fresh, pin) ==
      Seq("d" -> 20.0, "a" -> 3.0))
  }

  test("real committed pin parses to the full query map") {
    val p = java.nio.file.Paths.get("BENCH_FULL.json")
    if (java.nio.file.Files.exists(p)) {
      val m = Bench.parsePinnedQueries(java.nio.file.Files.readString(p))
      assert(m.size > 200, s"expected the full suite in the pin, got ${m.size}")
      assert(m.values.forall(_ >= 0))
    }
  }
}
