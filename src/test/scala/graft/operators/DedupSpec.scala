package graft.operators

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}

/** Semantics of the near-dup family beyond execution: LSH recall against
  * the exact all-pairs baseline, and SimHash fingerprint invariants.
  */
class DedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Exact word-Jaccard >= 0.9 pairs (brute force, the LSH ground truth). */
  private lazy val truePairs: Set[(Long, Long)] = {
    val s = Engine.table(spark, dir, "documents")
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
    val sizes = s.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    s.as("a").join(s.as("b"), col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.as("ci"), col("i") === col("ci.doc_id"))
      .join(sizes.as("cj"), col("j") === col("cj.doc_id"))
      .filter(col("inter") * 10 >= (col("ci.n") + col("cj.n") - col("inter")) * 9)
      .select(col("i"), col("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private lazy val lshPairs: Set[(Long, Long)] =
    DedupQueries.qMinhashLsh(spark, dir)
      .select(col("i"), col("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LSH verified pairs are a subset of the exact >=0.9 pairs") {
    assert((lshPairs -- truePairs).isEmpty)
  }

  test("LSH recall >= 0.9 of exact >=0.9-Jaccard pairs (4x4 banding: ~0.986 expected)") {
    assert(truePairs.nonEmpty, "fixture should contain near-dup pairs")
    val recall = lshPairs.size.toDouble / truePairs.size
    assert(recall >= 0.9, s"recall=$recall (${lshPairs.size}/${truePairs.size})")
  }

  test("simhash fingerprints are 16-bit and cover every doc") {
    val rows = DedupQueries.qSimhash(spark, dir).collect()
    val nDocs = Engine.table(spark, dir, "documents").count()
    assert(rows.length == nDocs)
    assert(rows.forall { r =>
      val fp = r.getLong(1); fp >= 0 && fp < (1L << 16)
    })
  }

  test("identical docs get identical simhash (hash is content-deterministic)") {
    val fps = DedupQueries.qSimhash(spark, dir)
      .select("doc_id", "simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val again = DedupQueries.qSimhash(spark, dir)
      .select("doc_id", "simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps == again)
  }

  test("star contraction computes the same clusters as propagation on the fixture") {
    val prop = DedupQueries.qDedupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val star = DedupQueries.qDedupClustersStar(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(star == prop)
  }

  test("star contraction converges in O(log n) rounds on a 1000-node chain where propagation cannot") {
    import org.apache.spark.sql.functions._
    // worst case for propagation: a chain 0-1-2-...-999 has diameter
    // 999, and min-label propagation moves the 0 label ONE hop per
    // round; star contraction re-attaches nodes to their neighborhood
    // min, halving distances roughly every round pair
    val n = 1000
    val nodes = spark.range(n).select(col("id").as("node"))
    val chain = spark.range(n - 1)
      .select(col("id").as("i"), (col("id") + 1).as("j"))
    val (labels, rounds) = DedupQueries.starComponents(nodes, chain)
    val comps = labels.select("comp").distinct().collect().map(_.getLong(0))
    assert(comps.toSeq == Seq(0L), "one component labeled by the min node")
    assert(labels.count() == n)
    info(s"star contraction rounds for the $n-chain: $rounds")
    assert(rounds <= 15, s"expected O(log n) rounds, got $rounds")
    // the propagation variant is diameter-bounded: at a 30-round cap it
    // must refuse (throw) rather than emit a wrong fixpoint
    val e = intercept[RuntimeException] {
      DedupQueries.propagationComponents(nodes, chain, 30)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("uncapped n-gram Jaccard baseline matches an independent in-memory computation") {
    // q_ngram_jaccard left the gated surface in round 6 (its uncapped
    // shared-shingle self-join is the documented df² scale-killer and
    // was the bench's residual flapper); this spec keeps it honest in
    // its baseline role against a from-scratch Scala computation.
    val docs = Engine.table(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val shingleSets = docs.flatMap { case (id, text) =>
      val tk = text.split(" ")
      if (tk.length < 3) None
      else Some(id -> tk.sliding(3).map(_.mkString(" ")).toSet)
    }.toMap
    val expected = (for {
      (i, si) <- shingleSets; (j, sj) <- shingleSets if i < j
      inter = (si & sj).size if inter >= 2
      union = si.size + sj.size - inter if inter * 20 >= union
    } yield (i, j, inter.toLong, union.toLong)).toSet
    val got = DedupQueries.qNgramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    assert(expected.nonEmpty, "fixture should contain shingle-level near-dups")
  }

  test("dedup clusters are the transitive closure of the capped pair graph") {
    val rows = DedupQueries.qDedupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = Engine.table(spark, dir, "documents").count()
    assert(rows.length == nDocs, "every doc gets a cluster verdict")
    val label = rows.map(r => r._1 -> r._2).toMap
    // independent ground truth: union-find over the same pair set
    val pairs = DedupQueries.qNgramJaccardCapped(spark, dir)
      .select(col("i"), col("j")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map(label.keys.map(k => k -> k).toSeq: _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = label.keys.map(k => k -> find(k)).toMap
    assert(label == truth, "propagation fixpoint must equal union-find components")
    // representative invariants: rep is in its own cluster and minimal
    rows.foreach { case (id, rep, size, kept) =>
      assert(rep <= id, s"rep must be the min id (doc $id)")
      assert((kept == 1L) == (id == rep))
      assert(size >= 1)
    }
    // the fixture's near-dup pairs must produce at least one multi-doc cluster
    assert(rows.exists(_._3 > 1))
  }

  test("persisted LSH store: probe census matches the inline pipeline's cross-split hits") {
    val base = java.nio.file.Files.createTempDirectory("lsh_store_spec").toString
    var caches = Seq.empty[org.apache.spark.sql.DataFrame]
    try {
      DedupQueries.buildLshStore(spark, dir, base)
      // the plan-inspectable form: the production probeLshStore wrapper
      // materializes through a localCheckpoint (to release its caches),
      // which truncates the plan to a LogicalRDD leaf — shape assertions
      // must read the UNCUT frame
      val (probe, incoming, qreps) = DedupQueries.probeLshStoreFrame(
        spark, dir, base, col("doc_id") % 2 === 1)
      caches = Seq(incoming, qreps)
      // the corpus side of the probe reads ONLY stored bucket rows —
      // every scan is either the store or the documents fixture (the
      // incoming batch itself), and the bucket join is an equi-join
      val s = probe.queryExecution.executedPlan.toString
      assert(s.contains(base), "probe plan must scan the bucket store")
      assert(!s.contains("CartesianProduct") &&
        !s.contains("BroadcastNestedLoopJoin"),
        s"bucket probe must stay an equi-join:\n${s.take(2000)}")
      // independent truth: the inline pipeline's verified pairs,
      // restricted to (odd incoming) x (even corpus) — LSH-identical
      // hash family on both paths, so hit sets must agree exactly
      val crossHits = lshPairs.collect {
        case (i, j) if i % 2 == 1 && j % 2 == 0 => i
        case (i, j) if j % 2 == 1 && i % 2 == 0 => j
      }
      val perSource = Engine.table(spark, dir, "documents")
        .filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("source")).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val expected = perSource.groupBy(_._2).map { case (src, docs) =>
        val hit = docs.count(d => crossHits.contains(d._1))
        (src, docs.length.toLong, hit.toLong, (docs.length - hit).toLong)
      }.toSet
      val got = probe.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expected)
      assert(got.exists(_._3 > 0), "fixture should have cross-split near-dups")
    } finally {
      // the frame form's contract: callers release the caches — in a
      // finally, or a failed assertion leaks them into the shared
      // suite session
      caches.foreach(_.unpersist())
      graft.Fs.deleteRecursively(base)
    }
  }
}
