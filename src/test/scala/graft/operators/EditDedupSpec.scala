package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Blocked edit-distance near-dup contracts (q_edit_dedup's
  * mechanism): the injected suffix revisions are all recovered at
  * their exact distance, a HEAD edit is recovered through the
  * suffix blocking key (the prefix key alone would miss it), the
  * per-key df cap really excludes hot boilerplate keys, the distance
  * threshold is an exact boundary, and the output is
  * partitioning-invariant.
  */
class EditDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def df(rows: Seq[(Long, String)], id: String, t: String) = {
    import spark.implicits._
    rows.toDF(id, t)
  }

  test("every injected suffix revision is recovered at distance 3; bounds hold") {
    val out = DedupQueries.qEditDedup(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nInjected = docs.filter(col("doc_id") % 10 === 1).count()
    val injected = out.filter(r => r.getLong(0) % 10 == 1 &&
      r.getLong(1) == r.getLong(0) - 1)
    assert(injected.length == nInjected,
      s"${injected.length} of $nInjected injected revisions recovered")
    injected.foreach(r => assert(r.getLong(2) == 3L,
      s"injected pair ${r.getLong(0)} at dist ${r.getLong(2)}, expected 3"))
    out.foreach { r =>
      assert(r.getLong(0) % 2 == 1 && r.getLong(1) % 2 == 0, "side leak")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 4, "distance out of band")
    }
  }

  test("a head edit is caught by the suffix key; the threshold is an exact boundary") {
    val baseText = ("the quick brown fox jumps over the lazy dog " * 4).trim
    val base = df(Seq((0L, baseText)), "bid", "btext")
    val incoming = df(Seq(
      (1L, "zzz " + baseText.drop(4)),  // head edit (3 substitutions): prefix key differs, suffix key matches
      (3L, baseText + " abc"),          // tail edit, dist exactly EditD = 4 (boundary: kept)
      (5L, baseText + " abcd")          // tail edit, dist 5: past threshold (dropped)
    ), "iid", "itext")
    val got = DedupQueries.editPairs(incoming, base)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == Map(1L -> 3L, 3L -> 4L),
      s"expected head-edit + boundary pair only, got $got")
  }

  test("the df cap excludes hot boilerplate keys on BOTH blocking axes") {
    val boiler = "SHARED BOILERPLATE HEADER AND FOOTER LINE padding words here"
    // 70 base docs (> EditCap = 64) share both the first and last 16
    // chars; each is a true distance-2 neighbor of the one incoming
    // doc — but the hot key is excluded, so nothing blocks, nothing
    // verifies, and the fan-out guard held
    val base = df((0L until 70L).map(i => (i * 2, boiler)), "bid", "btext")
    val incoming = df(Seq((1L, boiler + " x")), "iid", "itext")
    assert(DedupQueries.editPairs(incoming, base).isEmpty)
    // under the cap the same shape verifies fully
    val cool = df((0L until 60L).map(i => (i * 2, boiler)), "bid", "btext")
    assert(DedupQueries.editPairs(incoming, cool).count() == 60)
  }

  test("output is partitioning-invariant") {
    val a = DedupQueries.qEditDedup(spark, dir).collect().toSeq
    val docs = spark.read.parquet(s"$dir/documents.parquet").repartition(7)
    docs.createOrReplaceTempView("documents_repart")
    // same pipeline over a differently-partitioned source: rebuild the
    // frames by hand to avoid a second fixture read path
    val donors = docs.select(col("doc_id").as("b_id"), col("text").as("b_text"))
    val incoming = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id").as("iid"), col("text").as("own_text"),
        when(col("doc_id") % 10 === 1, col("doc_id") - 1).as("donor_id"))
      .join(donors, col("donor_id") === col("b_id"), "left_outer")
      .select(col("iid"),
        coalesce(concat(col("b_text"), lit(" zq")), col("own_text")).as("itext"))
    val base = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").as("bid"), col("text").as("btext"))
    val b = DedupQueries.editPairs(incoming, base).collect().toSeq
    assert(a == b)
  }
}
