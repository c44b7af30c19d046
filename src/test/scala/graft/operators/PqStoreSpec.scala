package graft.operators

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.IndexCatalog

/** IVF-PQ store contracts (q_ivf_pq's mechanism): the asymmetric-
  * distance probe's recall against the exact brute-force baseline,
  * and the frozen-family append lifecycle — centroids and codebooks
  * are trained once at build and NEVER retrained, so appended
  * generations stay code-compatible with the stored corpus (the same
  * contract q_ivf_append pins for centroids alone).
  */
class PqStoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def bytesUnder(d: String): Map[String, Seq[Byte]] =
    IndexCatalog.listDataFiles(d)
      .map(f => f -> Files.readAllBytes(Paths.get(f)).toSeq).toMap

  test("recall@5 vs exact brute force is at least 0.9") {
    val brute = SimilarityQueries.qKnnBrute(spark, dir)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = SimilarityQueries.qIvfPq(spark, dir)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(pq).size.toDouble / brute.size
    assert(recall >= 0.9,
      f"IVF-PQ recall@5 vs brute = $recall%.3f — the approximate index " +
        "no longer clears the recall gate")
  }

  test("nprobe is the recall/cost dial: recall@5 measured at 1/3/default probes on one store") {
    val base = Files.createTempDirectory("graft_pqdial").toString
    try {
      SimilarityQueries.buildPqStore(spark, dir, base)
      val brute = SimilarityQueries.qKnnBrute(spark, dir)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def recallAt(np: Int): Double = {
        val got = SimilarityQueries.probePqStore(spark, dir, base, nprobe = np)
          .select(col("query_id"), col("neighbor_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        brute.intersect(got).size.toDouble / brute.size
      }
      val r1 = recallAt(1)
      val r3 = recallAt(3)
      val rd = recallAt(SimilarityQueries.PqProbe)
      info(f"recall@5: nprobe=1 $r1%.3f, nprobe=3 $r3%.3f, " +
        f"nprobe=${SimilarityQueries.PqProbe} $rd%.3f")
      // candidate sets grow with the dial, so recall must not
      // systematically degrade (2% slack covers ADC pool-cut noise)
      assert(r3 >= r1 - 0.02 && rd >= r3 - 0.02,
        f"recall fell as nprobe grew: $r1%.3f -> $r3%.3f -> $rd%.3f")
      assert(rd >= 0.9, f"default-dial recall $rd%.3f under the 0.9 gate")
      assert(r1 < rd,
        "nprobe=1 recall already equals the default dial — the dial is " +
          "not exercising cell pruning at this geometry")
    } finally graft.Fs.deleteRecursively(base)
  }

  test("appends freeze centroids and codebooks; old generations byte-untouched; batch becomes searchable") {
    val base = Files.createTempDirectory("graft_pqappend").toString
    try {
      // build over the even corpus only — centroids + codebooks
      // trained there, then FROZEN
      SimilarityQueries.buildPqStore(spark, dir, base,
        pmod(col("vec_id"), lit(2)) === 0)
      val frozenCent = bytesUnder(s"$base/centroids")
      val frozenCb = bytesUnder(s"$base/pq")
      val v1Files = IndexCatalog.latestFiles(base)
      val v1Bytes = v1Files.map(f =>
        f -> Files.readAllBytes(Paths.get(f)).toSeq).toMap

      // append batch A: encoded against the STORED families
      SimilarityQueries.appendPqStore(spark,
        SimilarityQueries.embeddings(spark, dir)
          .filter(pmod(col("vec_id"), lit(4)) === 1), base)

      assert(bytesUnder(s"$base/centroids") == frozenCent,
        "append retrained/rewrote the centroids — the cell family must be frozen")
      assert(bytesUnder(s"$base/pq") == frozenCb,
        "append retrained/rewrote the codebooks — the quantizer must be frozen")
      v1Bytes.foreach { case (f, b) =>
        assert(Files.readAllBytes(Paths.get(f)).toSeq == b,
          s"append touched a build-generation file: $f")
      }
      assert(IndexCatalog.currentVersion(base) == 2)

      // the appended rows are in the store with codes, and the probe
      // can now surface them: every appended id present exactly once,
      // and batch ids appear among some query's neighbors
      val grown = spark.read.option("basePath", s"$base/corpus")
        .parquet(IndexCatalog.latestFiles(base): _*)
      val ids = grown.select(col("vec_id")).collect().map(_.getLong(0))
      assert(ids.length == ids.distinct.length)
      assert(ids.count(_ % 4 == 1) > 0)
      assert(grown.filter(size(col("codes")) =!= SimilarityQueries.PqM)
        .isEmpty, "every stored row carries one code per subspace")
      val neighbors = SimilarityQueries.probePqStore(spark, dir, base,
        pmod(col("vec_id"), lit(4)) === 3 &&
          col("vec_id") < 4 * SimilarityQueries.NQueries)
        .select(col("neighbor_id")).collect().map(_.getLong(0)).toSet
      assert(neighbors.forall(n => n % 2 == 0 || n % 4 == 1),
        "probe surfaced an id the store never held")
      assert(neighbors.exists(_ % 4 == 1),
        "no appended vector ever surfaced as a neighbor — the batch is " +
          "not searchable through the frozen families")

      // replaying the same batch is a no-op (anti-join dedup): no new
      // version, no new files
      val before = IndexCatalog.latestFiles(base)
      SimilarityQueries.appendPqStore(spark,
        SimilarityQueries.embeddings(spark, dir)
          .filter(pmod(col("vec_id"), lit(4)) === 1), base)
      assert(IndexCatalog.currentVersion(base) == 2)
      assert(IndexCatalog.latestFiles(base) == before)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("label-filtered PQ probe: zero foreign-label neighbors, recall vs label-filtered brute, candidates thin pre-ADC") {
    val base = Files.createTempDirectory("graft_pq_flt").toString
    try {
      SimilarityQueries.buildPqStore(spark, dir, base)
      val res = SimilarityQueries
        .probePqStore(spark, dir, base, sameLabel = true)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(res.nonEmpty)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet").collect()
        .map(r => (r.getLong(0),
          r.getSeq[Float](1).toArray.map(_.toDouble), r.getInt(2)))
      val labels = emb.map(e => e._1 -> e._3).toMap
      // the metadata contract holds through BOTH stages (ADC pool and
      // exact re-rank): no foreign-label neighbor can surface
      res.foreach { case (q, _, n) =>
        assert(labels(q) == labels(n),
          s"query $q (label ${labels(q)}) got neighbor $n (label ${labels(n)})")
      }
      // recall against the LABEL-FILTERED exact baseline
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
      val got = res.map { case (q, _, n) => (q, n) }.toSet
      val recall = (got & brute).size.toDouble / brute.size
      info(f"filtered PQ recall@5 vs label-filtered brute: $recall%.2f")
      // 6-of-8 cells probed and a 45-candidate pool over ~10%-selective
      // slices: the compressed filtered probe must stay useful
      assert(recall >= 0.5, f"filtered PQ recall collapsed: $recall%.2f")
      // the unfiltered probe at the same dial DOES return foreign
      // labels — i.e. the filter is doing the thinning, not the data
      val unfiltered = SimilarityQueries.probePqStore(spark, dir, base)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      assert(unfiltered.exists { case (q, n) => labels(q) != labels(n) })
    } finally graft.Fs.deleteRecursively(base)
  }
}
