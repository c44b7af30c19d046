package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene for the fixture-template consumer sets: the
  * restricted-prewarm feature is only correct while the declared
  * consumers track reality, so the declarations that CAN be checked
  * statically are. (The other direction — a new call site adopting a
  * template without declaring itself — is a review-time contract,
  * restated on [[FixtureTemplates.cloneInto]]/[[FixtureTemplates.readOnlyPath]].)
  */
class FixtureTemplatesSpec extends AnyFunSuite {

  test("every declared consumer is a registered gated query (stale names would silently skip prewarm)") {
    val queries = graft.SparkEntry.queries.keySet
    FixtureTemplates.all.foreach { t =>
      val unknown = t.consumers -- queries
      assert(unknown.isEmpty,
        s"template '${t.kind}' declares consumers not in SparkEntry.queries: $unknown")
    }
  }

  test("every template kind has at least one consumer and kinds are unique") {
    assert(FixtureTemplates.all.forall(_.consumers.nonEmpty))
    val kinds = FixtureTemplates.all.map(_.kind)
    assert(kinds.distinct == kinds, s"duplicate template kinds: $kinds")
  }

  test("a restricted selection prewarms exactly the templates its queries consume") {
    val sel = Set("q_substring_dedup", "q_ivf_pq")
    val kinds = FixtureTemplates.all
      .filter(t => (t.consumers & sel).nonEmpty).map(_.kind)
    assert(kinds == Seq("pq_full", "sub_windows"), kinds)
    // a selection touching no templates prewarms nothing
    assert(!FixtureTemplates.all.exists(t => t.consumers.contains("q_agg_group")))
  }
}
