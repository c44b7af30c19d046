package graft.operators

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}

/** The incremental connected-components contract beyond the oracle row:
  * the merge graph is SMALL (new nodes + touched reps only — untouched
  * components are never handed to the solver), and the algebra handles
  * the tricky topology (two stored components merged through a
  * purely-new path).
  */
class IncrementalCcSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  import spark.implicits._

  test("incremental merge equals full recluster; untouched components never enter the solver") {
    val docs = Engine.table(spark, dir, "documents")
    val pairs = DedupQueries.qNgramJaccardCapped(spark, dir)
      .select(col("i"), col("j")).localCheckpoint()
    val basePairs = pairs.filter(col("i") % 2 === 0 && col("j") % 2 === 0)
    val newEdges = pairs.filter(col("i") % 2 === 1 || col("j") % 2 === 1)
    val (baseLabels, _) = DedupQueries.starComponents(
      docs.filter(col("doc_id") % 2 === 0).select(col("doc_id").as("node")),
      basePairs)
    val inc = DedupQueries.incrementalComponents(
      baseLabels.localCheckpoint(),
      docs.filter(col("doc_id") % 2 === 1).select(col("doc_id").as("node")),
      newEdges)

    // equality with the full recluster (both solved with the same solver)
    val (fullLabels, _) = DedupQueries.starComponents(
      docs.select(col("doc_id").as("node")), pairs)
    val got = inc.labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = fullLabels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)

    // the not-recomputed contract: the solver saw new nodes + touched
    // reps ONLY — strictly fewer nodes than the stored assignment,
    // and untouched components (reps not adjacent to any new edge)
    // stayed out entirely
    val nStored = baseLabels.count()
    val nStoredComps = baseLabels.select(col("comp")).distinct().count()
    val nTouched = inc.touchedReps.count()
    val nNew = docs.filter(col("doc_id") % 2 === 1).count()
    val nActive = inc.activeNodes.count()
    assert(nTouched < nStoredComps,
      s"fixture should leave some components untouched ($nTouched/$nStoredComps)")
    assert(nActive == nNew + nTouched)
    assert(nActive < nStored + nNew,
      s"merge graph ($nActive) must be smaller than corpus (${nStored + nNew})")
  }

  test("two stored components merged through a purely-new path") {
    // stored: {0,2} with rep 0, {4,6} with rep 4, singleton {8}
    val stored = Seq((0L, 0L), (2L, 0L), (4L, 4L), (6L, 4L), (8L, 8L))
      .toDF("node", "comp")
    // new nodes 1, 3; path 2-1, 1-3, 3-6 bridges the two components
    val newNodes = Seq(1L, 3L).toDF("node")
    val newEdges = Seq((2L, 1L), (1L, 3L), (3L, 6L)).toDF("i", "j")
    val inc = DedupQueries.incrementalComponents(stored, newNodes, newEdges)
    val got = inc.labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(
      0L -> 0L, 2L -> 0L, 4L -> 0L, 6L -> 0L, // merged under global min 0
      1L -> 0L, 3L -> 0L,                     // new nodes joined it
      8L -> 8L))                              // untouched singleton
    // and the untouched singleton never reached the solver
    val active = inc.activeNodes.collect().map(_.getLong(0)).toSet
    assert(active == Set(1L, 3L, 0L, 4L))
  }

  test("new node with no edges stays a singleton; batch against empty-touch store") {
    val stored = Seq((0L, 0L), (2L, 0L)).toDF("node", "comp")
    val newNodes = Seq(5L, 7L).toDF("node")
    val newEdges = Seq((5L, 7L)).toDF("i", "j") // new-new only, no store touch
    val inc = DedupQueries.incrementalComponents(stored, newNodes, newEdges)
    val got = inc.labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(0L -> 0L, 2L -> 0L, 5L -> 5L, 7L -> 5L))
    assert(inc.touchedReps.count() == 0)
  }
}
