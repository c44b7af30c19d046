package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{IndexCatalog, StoreFixtures}

/** Fixture-cache contracts ([[graft.sources.StoreFixtures]]): a clone
  * is a byte-copy with manifests rewritten to the clone's own paths,
  * the template builds ONCE per (kind, sfDir), and clones are fully
  * independent — mutating one touches neither its siblings nor the
  * template.
  */
class StoreFixturesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("clones resolve to their own paths, read identically, build once, and mutate independently") {
    var builds = 0
    val a = Files.createTempDirectory("graft_fix_a").toString
    val b = Files.createTempDirectory("graft_fix_b").toString
    try {
      def cloneTo(dest: String): Unit =
        StoreFixtures.cloneInto("spec_embed_evens", dir, dest) { d =>
          builds += 1
          SimilarityQueries.buildEmbedStore(spark, dir, d)
          // blooms on the TEMPLATE exercise copyStore's second
          // sidecar-re-key branch (embed builds record stats only)
          graft.sources.FileBloom.record(spark, d,
            IndexCatalog.latestFiles(d), "vec_id")
        }
      cloneTo(a)
      cloneTo(b)
      assert(builds == 1, s"template built $builds times; the cache must build once")

      // every manifest-resolved file of a clone lives UNDER the clone
      val filesA = IndexCatalog.latestFiles(a)
      assert(filesA.nonEmpty && filesA.forall(_.startsWith(a)),
        "clone manifests still reference template paths")

      // stats sidecars are keyed by the data file's ABSOLUTE path, so
      // the copy must RE-KEY them — a verbatim copy would orphan every
      // sidecar and the clone's prunes would degrade to keep-all
      val ranges = graft.sources.FileStats.ranges(a, filesA, "vec_id")
      assert(ranges.size == filesA.size,
        s"clone resolves ${ranges.size}/${filesA.size} stats sidecars; " +
          "copy must re-key sidecars to the clone's paths")
      // bloom sidecars re-key the same way: a point probe for a value
      // no file holds must prune (orphaned sidecars would keep all)
      val keptNone = graft.sources.FileBloom.prunePoint(spark, a, filesA,
        "vec_id", Seq(-987654321L))
      assert(keptNone.size < filesA.size,
        "clone's bloom sidecars did not re-key: point prune kept every file")

      // both clones read identically
      def census(base: String) = SimilarityQueries.readStoreFiles(spark,
        IndexCatalog.latestFiles(base))
        .agg(count(lit(1)), sum(col("vec_id")).cast("long"))
        .collect()(0)
      assert(census(a) == census(b))

      // mutating clone A (an append) leaves clone B's manifest chain
      // and files untouched
      val bFiles = IndexCatalog.latestFiles(b)
        .map(f => f -> graft.TestHash.sha256(f)).toMap
      val bVersion = IndexCatalog.currentVersion(b)
      SimilarityQueries.appendEmbedStore(spark,
        SimilarityQueries.embeddings(spark, dir)
          .filter(pmod(col("vec_id"), lit(4)) === 1), a)
      assert(IndexCatalog.currentVersion(a) == bVersion + 1)
      assert(IndexCatalog.currentVersion(b) == bVersion)
      bFiles.foreach { case (f, h) =>
        assert(Files.exists(Paths.get(f)) && graft.TestHash.sha256(f) == h,
          s"mutating clone A disturbed clone B's $f")
      }
    } finally {
      graft.Fs.deleteRecursively(a); graft.Fs.deleteRecursively(b)
    }
  }
}
