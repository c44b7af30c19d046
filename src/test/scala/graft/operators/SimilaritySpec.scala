package graft.operators

import graft.SparkSpec

/** ANN semantics: the IVF path trades recall for the bucket join; the
  * trade must be measurable and bounded, and both paths deterministic.
  */
class SimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("brute-force kNN returns exactly k neighbors per query") {
    val byQuery = SimilarityQueries.qKnnBrute(spark, dir).collect()
      .groupBy(_.getLong(0))
    assert(byQuery.nonEmpty)
    assert(byQuery.values.forall(_.length == 5))
  }

  test("IVF kNN with nprobe=1 keeps nonzero recall vs brute force") {
    val brute = pairs(SimilarityQueries.qKnnBrute(spark, dir))
    val ivf = pairs(SimilarityQueries.qIvfKnn(spark, dir))
    // IVF only ever returns same-cluster vectors, so a subset relation
    // does NOT hold for ranks — but every IVF neighbor must be a real
    // corpus vector and recall must be > 0 on random data with 8 cells.
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall > 0.0, s"recall=$recall")
    info(f"IVF recall@5 vs brute force: $recall%.2f")
  }

  test("multi-probe IVF strictly improves recall over single-probe at measured extra cost") {
    import org.apache.spark.sql.functions._
    val brute = pairs(SimilarityQueries.qKnnBrute(spark, dir))
    val one = pairs(SimilarityQueries.qIvfKnn(spark, dir))
    val multi = pairs(SimilarityQueries.qIvfMultiprobe(spark, dir))
    val r1 = (one & brute).size.toDouble / brute.size
    val rN = (multi & brute).size.toDouble / brute.size
    // probe cost = candidate rows scanned = total occupancy of probed
    // cells; measured from the same assignment the queries use
    val occ = SimilarityQueries.probeAssignments(spark, dir, 0)
      .groupBy("centroid_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    info(f"recall@5: nprobe=1 $r1%.2f, nprobe=3 $rN%.2f; " +
      f"mean cell occupancy ${occ.values.sum / occ.size}%d of ${occ.values.sum}%d vectors")
    // the knob must actually buy recall on this fixture (isotropic
    // data, 8 cells: 3x the probed volume reaches well beyond the
    // nearest cell's boundary)
    assert(rN > r1, f"multi-probe recall $rN%.2f must exceed single-probe $r1%.2f")
    // NOT asserted: one ⊆ multi — widening the candidate set can
    // displace a single-probe neighbor below rank K (that displacement
    // IS the recall improvement: a truer neighbor took its slot)
  }

  test("k-means IVF at equal probe cost does not lose recall vs data-row centroids") {
    val brute = pairs(SimilarityQueries.qKnnBrute(spark, dir))
    val dataRows = pairs(SimilarityQueries.qIvfKnn(spark, dir))
    val kmeans = pairs(SimilarityQueries.qIvfKmeans(spark, dir))
    val rData = (dataRows & brute).size.toDouble / brute.size
    val rKm = (kmeans & brute).size.toDouble / brute.size
    info(f"IVF recall@5: data-row centroids $rData%.2f, k-means centroids $rKm%.2f")
    assert(rKm > 0.0)
    // The fixture embeddings are isotropic random vectors, so recall
    // cannot systematically improve (no cluster structure to learn);
    // Lloyd-refined cells must simply not be materially worse at the
    // same probe budget (1 cell). The measurable k-means win on this
    // data is occupancy balance — next test.
    assert(rKm >= rData - 0.05, f"k-means recall $rKm%.2f << data-row $rData%.2f")
  }

  test("k-means cells bound worst-case probe cost at least as well as data rows") {
    def maxShare(iters: Int): Double = {
      val sizes = SimilarityQueries.probeAssignments(spark, dir, iters)
        .groupBy("centroid_id").count().collect().map(_.getLong(1))
      sizes.max.toDouble / sizes.sum
    }
    val dr = maxShare(0)
    val km = maxShare(SimilarityQueries.KmIters)
    info(f"worst-cell share: data-row $dr%.3f, k-means $km%.3f")
    // measured at sf0.1: 0.15 -> 0.13; tolerance for small-SF noise
    assert(km <= dr * 1.25, f"k-means worst cell $km%.3f vs data-row $dr%.3f")
  }

  test("sign-LSH kNN keeps nonzero recall vs brute force") {
    val brute = pairs(SimilarityQueries.qKnnBrute(spark, dir))
    val lsh = pairs(SimilarityQueries.qEmbedLsh(spark, dir))
    val recall = (lsh & brute).size.toDouble / brute.size
    assert(recall > 0.0, s"recall=$recall")
    info(f"sign-LSH recall@5 vs brute force: $recall%.2f")
  }

  test("block-pair near-dup join equals the naive all-pairs result") {
    import org.apache.spark.sql.functions._
    val blocked = SimilarityQueries.qEmbedNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // naive all-pairs reference, built inline (the shape the oracle uses)
    val e = graft.Engine.table(spark, dir, "embeddings")
      .filter(pmod(col("vec_id"), lit(2)) === 0)
      .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
    val l = e.select(col("vec_id").as("i"), col("embedding").as("ae"), col("nrm").as("an"))
    val r = e.select(col("vec_id").as("j"), col("embedding").as("be"), col("nrm").as("bn"))
    val naive = l.join(r, col("i") < col("j"))
      .filter(expr("vec_dot(ae, be)") / (col("an") * col("bn")) >= 0.35)
      .select("i", "j").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(blocked == naive,
      s"missing=${(naive -- blocked).take(5)} extra=${(blocked -- naive).take(5)}")
  }

  test("near-dup pairs are symmetric-free (i < j) and deterministic") {
    val a = SimilarityQueries.qEmbedNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(a.forall { case (i, j) => i < j })
    val b = SimilarityQueries.qEmbedNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq)
  }

  test("persisted sign-LSH store: probe matches an independent in-memory recomputation") {
    val base = java.nio.file.Files.createTempDirectory("emb_store_spec").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base)
      val probe = SimilarityQueries.probeEmbedStore(spark, dir, base)
      // corpus side reads ONLY the store: the fixture appears in the
      // plan solely for the incoming batch (vec_id % 2 = 1 filter)
      val s = probe.queryExecution.executedPlan.toString
      assert(s.contains(base), "probe plan must scan the bucket store")
      // independent truth: collect the raw vectors and redo the
      // plane/bucket/rank pipeline in plain Scala
      val vecs = graft.Engine.table(spark, dir, "embeddings")
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1)
      def dot(a: Array[Float], b: Array[Float]): Double =
        a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
      val planes = vecs.filter(v => v._1 % 2 == 0 &&
        v._1 < 2 * SimilarityQueries.NPlanes).map(_._2)
      def bucket(v: Array[Float]): Long =
        planes.zipWithIndex.map { case (p, i) =>
          if (dot(v, p) >= 0) 1L << i else 0L }.sum
      val corpus = vecs.filter(_._1 % 2 == 0)
      val expected = vecs
        .filter(v => v._1 % 2 == 1 && v._1 < 2 * SimilarityQueries.NQueries)
        .flatMap { case (qid, q) =>
          val qb = bucket(q)
          corpus.filter(c => bucket(c._2) == qb)
            .map(c => (c._1, dot(q, c._2) / (nrm(q) * nrm(c._2))))
            .sortBy { case (nid, cos) => (-cos, nid) }
            .take(SimilarityQueries.K).zipWithIndex
            .map { case ((nid, _), i) => (qid, (i + 1).toLong, nid) }
        }.toSeq
      val got = probe.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expected)
      assert(got.nonEmpty, "some incoming vector should share a bucket")
      // the store is bucket-partitioned: one-pattern probes prune
      val bDirs = new java.io.File(s"$base/corpus").listFiles()
        .filter(_.getName.startsWith("bucket="))
      assert(bDirs.nonEmpty, "corpus store must be partitioned by bucket")
    } finally graft.Fs.deleteRecursively(base)
  }

  test("persisted IVF: probe answers from the stored index alone, row-identical to inline") {
    val base = java.nio.file.Files.createTempDirectory("ivf_spec").toString
    try {
      SimilarityQueries.buildIvfIndex(spark, dir, base)
      val probe = SimilarityQueries.probeIvfIndex(spark, base)
      // 1. every scan in the probe plan reads the INDEX store — the
      //    raw embeddings table is never touched and no k-means /
      //    assignment crossJoin job re-runs at probe time. (String
      //    inspection: AQE wraps the plan in a leaf
      //    AdaptiveSparkPlanExec, so node collection can't descend.)
      val s = probe.queryExecution.executedPlan.toString
      val locs = s.linesIterator.filter(_.contains("Location:")).toSeq
      assert(locs.nonEmpty, s"no file scans in probe plan:\n${s.take(2000)}")
      locs.foreach(l =>
        assert(l.contains(base), s"probe scans outside the index: $l"))
      assert(!s.contains("testdata"), "probe must not read the raw fixture")
      assert(!s.contains("CartesianProduct") &&
        !s.contains("BroadcastNestedLoopJoin"),
        s"probe plan must be the cell equi-join only:\n${s.take(2000)}")
      // 2. row-identical to the inline (recompute-per-run) pipeline —
      //    inherits q_ivf_kmeans' recall contract and oracle
      val inline = SimilarityQueries.qIvfKmeans(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val stored = probe.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(stored == inline)
      // 3. the store is cell-partitioned and a one-cell read
      //    partition-PRUNES (the filter lands in PartitionFilters,
      //    so only that cell's directory is listed/scanned)
      val corpusDir = new java.io.File(s"$base/corpus")
      val cellDirs = corpusDir.listFiles().filter(_.getName.startsWith("centroid_id="))
      assert(cellDirs.nonEmpty, s"corpus not cell-partitioned: ${corpusDir.list().toSeq}")
      val cellId = cellDirs.head.getName.stripPrefix("centroid_id=").toInt
      val cellPlan = spark.read.parquet(s"$base/corpus")
        .filter(org.apache.spark.sql.functions.col("centroid_id") === cellId)
        .queryExecution.executedPlan.toString
      val pf = cellPlan.linesIterator.find(_.contains("PartitionFilters:"))
      assert(pf.exists(_.contains(s"= $cellId")),
        s"cell filter not pushed to partition pruning: $pf")
    } finally graft.Fs.deleteRecursively(base)
  }

  test("scalar-quantized kNN: high recall vs brute at a 15-candidate re-rank, partition-invariant") {
    val brute = pairs(SimilarityQueries.qKnnBrute(spark, dir))
    val sq = SimilarityQueries.qKnnQuantized(spark, dir)
    val sqPairs = pairs(sq)
    // int8 codes preserve dot products to ~1% — the quantized ranking
    // rarely drops a true top-5 neighbor out of the top-15 pool, so
    // recall should be near-perfect (measured 1.00 on this fixture;
    // floor set below to absorb fixture regeneration)
    val recall = (sqPairs & brute).size.toDouble / brute.size
    info(f"quantized recall@5 vs brute force: $recall%.2f")
    assert(recall >= 0.9, f"quantized recall collapsed: $recall%.2f")
    // k per query, no self-matches
    val byQuery = sq.collect().groupBy(_.getLong(0))
    assert(byQuery.values.forall(_.length == 5))
    assert(sqPairs.forall { case (q, n) => q != n })
    // the two-stage result is partition-invariant: the approximate
    // scores are integer-exact in any summation order, so a different
    // parallelism must reproduce the identical ranking
    val n = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      assert(pairs(SimilarityQueries.qKnnQuantized(spark, dir)) == sqPairs)
    } finally spark.conf.set("spark.sql.shuffle.partitions", n)
  }

  test("MMR re-rank matches an independent in-memory greedy and strictly diversifies vs pure relevance") {
    import org.apache.spark.sql.functions._
    val got = SimilarityQueries.qMmr(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(_._2).map(_._3).toSeq
      }
    assert(got.size == SimilarityQueries.NMmrQ)

    // independent mirror: collect the raw embeddings and run the greedy
    // selection in plain Scala over the same pool/weights/tie-break
    val emb = SimilarityQueries.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var i = 0; var d = 0.0; var na = 0.0; var nb = 0.0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val mirror = (0L until SimilarityQueries.NMmrQ).map { q =>
      val rel = emb.keys.filter(_ != q).toSeq
        .map(c => c -> cos(emb(q), emb(c)))
        .sortBy { case (c, r) => (-r, c) }.take(SimilarityQueries.MmrPool)
      val relOf = rel.toMap
      var selected = Seq.empty[Long]
      while (selected.size < SimilarityQueries.MmrK) {
        val pick = rel.map(_._1).filterNot(selected.contains)
          .map { c =>
            val maxsim =
              if (selected.isEmpty) 0.0
              else selected.map(s => cos(emb(c), emb(s))).max
            c -> (7 * relOf(c) - 3 * maxsim)
          }.minBy { case (c, m) => (-m, c) }._1
        selected = selected :+ pick
      }
      q -> selected
    }.toMap
    assert(got == mirror, s"MMR diverged from the in-memory greedy:\n$got\nvs\n$mirror")

    // the diversity effect is real on the fixture: for at least one
    // query the selection differs from pure-relevance top-3, and over
    // the queries where it differs, the selected set's max pairwise
    // sim is strictly below the pure-relevance set's
    val changed = (0L until SimilarityQueries.NMmrQ).filter { q =>
      val top3 = emb.keys.filter(_ != q).toSeq
        .map(c => c -> cos(emb(q), emb(c)))
        .sortBy { case (c, r) => (-r, c) }.take(3).map(_._1)
      top3.toSet != got(q).toSet
    }
    assert(changed.nonEmpty, "MMR never diverged from pure relevance on the fixture")
    changed.foreach { q =>
      def maxPair(ids: Seq[Long]) =
        ids.combinations(2).map { case Seq(a, b) => cos(emb(a), emb(b)) }.max
      val top3 = emb.keys.filter(_ != q).toSeq
        .map(c => c -> cos(emb(q), emb(c)))
        .sortBy { case (c, r) => (-r, c) }.take(3).map(_._1)
      assert(maxPair(got(q)) < maxPair(top3),
        s"query $q: MMR changed the set without reducing its max pairwise sim")
    }
  }

  test("filtered ANN: every neighbor carries its query's label, ranking is the filtered-brute subset within the cell") {
    import org.apache.spark.sql.functions._
    val res = SimilarityQueries.qIvfFiltered(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(res.nonEmpty)
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the metadata contract: NO neighbor with a foreign label, ever —
    // a post-filter that slipped below the rank would break this
    res.foreach { case (q, _, n) =>
      assert(labels(q) == labels(n),
        s"query $q (label ${labels(q)}) got neighbor $n (label ${labels(n)})")
    }
    // per-query lists are dense rank prefixes (1..m, m <= K): a short
    // list is correct when the (cell, label) slice is thin
    res.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq, s"query $q ranks")
      assert(rows.length <= 5)
    }
    // recall vs the LABEL-FILTERED brute-force top-5 (the right
    // baseline: unfiltered brute ranks neighbors the filter excludes)
    val brute = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet").collect()
        .map(r => (r.getLong(0),
          r.getSeq[Float](1).toArray.map(_.toDouble), r.getInt(2)))
      def cos(a: Array[Double], b: Array[Double]) = {
        val d = a.zip(b).map { case (x, y) => x * y }.sum
        d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      emb.filter(_._1 < SimilarityQueries.NQueries).flatMap { case (q, qe, ql) =>
        emb.filter(c => c._1 != q && c._3 == ql)
          .map(c => (q, c._1, cos(qe, c._2)))
          .sortBy { case (_, n, s) => (-s, n) }.take(5)
          .map { case (qq, n, _) => (qq, n) }
      }.toSet
    }
    val got = res.map { case (q, _, n) => (q, n) }.toSet
    val recall = (got & brute).size.toDouble / brute.size
    info(f"filtered recall@5 vs label-filtered brute: $recall%.2f")
    assert(recall > 0.2, f"filtered recall collapsed: $recall%.2f")
  }

  test("filtered ANN: the nprobe dial composes with the label key — recall rises monotonically") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_flt_np").toString
    try {
      graft.sources.StoreFixtures.cloneInto("ivf_labeled", dir, base)(
        d => SimilarityQueries.buildLabeledIvfStore(spark, dir, d))
      val emb = spark.read.parquet(s"$dir/embeddings.parquet").collect()
        .map(r => (r.getLong(0),
          r.getSeq[Float](1).toArray.map(_.toDouble), r.getInt(2)))
      def cos(a: Array[Double], b: Array[Double]) = {
        val d = a.zip(b).map { case (x, y) => x * y }.sum
        d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      val brute = emb.filter(_._1 < SimilarityQueries.NQueries)
        .flatMap { case (q, qe, ql) =>
          emb.filter(c => c._1 != q && c._3 == ql)
            .map(c => (q, c._1, cos(qe, c._2)))
            .sortBy { case (_, n, s) => (-s, n) }.take(5)
            .map { case (qq, n, _) => (qq, n) }
        }.toSet
      def recall(nprobe: Int): Double = {
        val got = SimilarityQueries.probeIvfFiltered(spark, base, nprobe)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        (got & brute).size.toDouble / brute.size
      }
      val (r1, r3, r8) = (recall(1), recall(3), recall(8))
      info(f"filtered recall@5: nprobe=1 $r1%.2f, 3 $r3%.2f, 8 $r8%.2f")
      assert(r3 >= r1 && r8 >= r3, f"dial not monotone: $r1%.2f $r3%.2f $r8%.2f")
      assert(r3 > r1, "widening the probe bought no filtered recall on the fixture")
      // all 8 cells probed = exact label-filtered search
      assert(r8 == 1.0, f"full-probe filtered recall must be exact, got $r8%.2f")
    } finally graft.Fs.deleteRecursively(base)
  }

  test("filtered ANN: a FIXED-label read prunes label= partitions at the scan") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_flt_spec").toString
    try {
      graft.sources.StoreFixtures.cloneInto("ivf_labeled", dir, base)(
        d => SimilarityQueries.buildLabeledIvfStore(spark, dir, d))
      val files = graft.sources.IndexCatalog.latestFiles(base)
      val scan = spark.read.option("basePath", s"$base/corpus")
        .parquet(files: _*).filter(col("label") === 3)
      scan.collect()
      val scanNode = scan.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head
      val read = scanNode.metrics("numFiles").value
      assert(read > 0 && read < files.size,
        s"expected a label-pruned read, got $read of ${files.size} files")
      assert(scan.filter(col("label") =!= 3).count() == 0)
    } finally graft.Fs.deleteRecursively(base)
  }
}
