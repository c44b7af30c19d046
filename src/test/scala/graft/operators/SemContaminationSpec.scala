package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Semantic contamination gate: (1) on the fixture it must equal an
  * independent in-memory recomputation of the cell-bounded eval×train
  * rule; (2) a PLANTED paraphrase-grade leak — an eval doc whose
  * embedding is a noised copy of a train doc's but whose text shares
  * not a single 3-gram with it — must be recovered by the semantic
  * gate while the verbatim shingle gate is provably blind to it.
  */
class SemContaminationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def isTrainCoin(text: String): Boolean =
    md5hex("split1|" + text).charAt(0) < 'd'

  test("gate equals the independently recomputed cell-bounded eval×train rule") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val coin = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> isTrainCoin(r.getString(1))).toMap
    val cell = SimilarityQueries
      .probeAssignments(spark, dir, SimilarityQueries.KmIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var i = 0; var d = 0.0; var na = 0.0; var nb = 0.0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = (for {
      y <- e.keys.toSeq if !coin(y) // eval side
      srcs = e.keys.toSeq
        .filter(x => coin(x) && cell(x) == cell(y) && cos(e(x), e(y)) >= 0.35)
      if srcs.nonEmpty
    } yield {
      val src = srcs.maxBy(x => (cos(e(x), e(y)), -x))
      (y, src, cell(y))
    }).toSet
    val got = SimilarityQueries.qSemContamination(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty, "fixture must exercise the flag path")
    assert(got == expected,
      s"gate mismatch: extra=${got -- expected} missing=${expected -- got}")
  }

  test("planted noised-vector leak is recovered; the verbatim shingle gate is blind to it") {
    val tmp = Files.createTempDirectory("graft_semcontam").toString
    try {
      // 20 docs with PAIRWISE-DISJOINT vocabularies (doc i speaks only
      // w<i>* words): no two docs share any 3-gram, so every verbatim
      // method reads zero overlap corpus-wide by construction. The
      // split side of each doc is whatever the content-hash coin says.
      val texts = (0L until 20L).map(i =>
        i -> s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f").toMap
      val coins = texts.map { case (i, t) => i -> isTrainCoin(t) }
      val trainIds = coins.filter(_._2).keys.toSeq.sorted
      val evalIds = coins.filterNot(_._2).keys.toSeq.sorted
      assert(trainIds.nonEmpty && evalIds.nonEmpty,
        s"degenerate coin split: train=$trainIds eval=$evalIds")
      val t = trainIds.head // the leak source
      val ev = evalIds.head // the paraphrased eval item
      // base geometry: two well-separated direction clusters so the
      // k-means cells are stable; per-doc deterministic jitter keeps
      // within-cluster cosines high but distinct
      val dim = 8
      def baseVec(i: Long): Array[Float] = {
        val v = Array.fill(dim)(0.0f)
        val cluster = (i % 2).toInt // alternate so both clusters hold seeds
        v(cluster) = 1.0f
        v(2 + ((i % 3).toInt)) = 0.05f * (1 + (i % 5))
        v
      }
      // the leak: ev's embedding is t's plus a tiny orthogonal nudge —
      // cosine ≈ 0.999, far above the 0.35 gate — while every OTHER
      // eval doc keeps its own base vector
      val vecs: Map[Long, Array[Float]] =
        (0L until 20L).map { i =>
          if (i == ev) {
            val v = baseVec(t).clone()
            v(dim - 1) = v(dim - 1) + 0.02f
            i -> v
          } else i -> baseVec(i)
        }.toMap
      val docsSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType)))
      val docRows = (0L until 20L).map(i => Row(
        i, texts(i), "en", "planted", texts(i).length.toLong))
      spark.createDataFrame(
          java.util.Arrays.asList(docRows: _*), docsSchema)
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val embSchema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType, containsNull = false)),
        StructField("label", IntegerType)))
      val embRows = (0L until 20L).map(i => Row(i, vecs(i).toSeq, 0))
      spark.createDataFrame(
          java.util.Arrays.asList(embRows: _*), embSchema)
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")

      // the semantic gate recovers the planted leak and names its source
      val flagged = SimilarityQueries.qSemContamination(spark, tmp).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(flagged.get(ev).contains(t),
        s"planted leak eval=$ev from train=$t not recovered: $flagged")

      // the verbatim shingle gate reads ZERO shared shingles for the
      // planted doc (and every doc — vocabularies are disjoint): the
      // paraphrase-grade leak is invisible to n-gram methods
      val verbatim = CurationQueries.qContamination(spark, tmp).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(verbatim(ev) == 0L,
        s"shingle gate unexpectedly sees the planted leak: ${verbatim(ev)}")
      assert(verbatim.values.forall(_ == 0L))
    } finally graft.Fs.deleteRecursively(tmp)
  }
}
