package graft.operators

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}

/** Semantics of the curation family beyond execution: injected-PII
  * accounting, split-consistency of the contamination check, repetition
  * bounds, and mixture-rate sanity.
  */
class CurationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("pii scrub finds exactly the injected email/phone per doc_id class") {
    val rows = CurationQueries.qPiiScrub(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (emails, phones) = (r.getLong(1), r.getLong(2))
      if (id % 5 == 0) assert(emails == 1 && phones == 0, s"doc $id")
      else if (id % 5 == 1) assert(emails == 0 && phones == 1, s"doc $id")
      else assert(emails == 0 && phones == 0, s"doc $id")
      // scrubbing only ever shortens or keeps length: the placeholders
      // are shorter than any injected match (user<id>@example.com)
      if (id % 5 == 0) assert(r.getLong(4) < r.getLong(3), s"doc $id not scrubbed")
      else if (id % 5 != 1) assert(r.getLong(4) == r.getLong(3), s"doc $id changed")
    }
  }

  test("contamination reports exactly the eval docs of q_train_split") {
    val docs = Engine.table(spark, dir, "documents")
    val evalIds = docs
      .filter(substring(md5(concat(lit("split1|"), col("text"))), 1, 1) >= "d")
      .withColumn("ntk", size(split(col("text"), " ")))
      .filter(col("ntk") >= 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = CurationQueries.qContamination(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSet == evalIds)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "shared cannot exceed total shingles")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 100)
    }
  }

  test("mix temperature: quotas respect the budget, sampling is exact-to-quota") {
    val rows = CurationQueries.qMixTemperature(spark, dir).collect()
    assert(rows.nonEmpty)
    val nTotal = rows.map(_.getLong(1)).sum
    val budget = nTotal / 4
    // per-source: weight = isqrt(n_docs); n_sampled = min(quota, n_docs)
    rows.foreach { r =>
      val (n, w, q, s) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(w == math.sqrt(n.toDouble).toLong, s"weight isqrt ${r.getString(0)}")
      assert(s == math.min(q, n), s"sampled!=min(quota,n) ${r.getString(0)}")
    }
    // integer-floor quotas never overshoot the corpus budget
    assert(rows.map(_.getLong(3)).sum <= budget)
    // alpha=1/2 upweights small domains: the smallest source's sampled
    // FRACTION is >= the largest source's (equal only if sizes tie)
    val bySize = rows.sortBy(_.getLong(1))
    val (small, large) = (bySize.head, bySize.last)
    assert(small.getLong(4) * large.getLong(1) >=
      large.getLong(4) * small.getLong(1))
  }

  test("repetition: max_rep <= n_grams, distinct <= total, pct in range") {
    val rows = CurationQueries.qRepetition(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, mx, nd, pct) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(mx >= 1 && mx <= n)
      assert(nd <= n)
      assert(pct >= 1 && pct <= 100) // max_rep >= 1 ⇒ pct >= floor(100/n) and n>0
    }
  }

  test("domain mix: per-source sample counts respect the deterministic coin") {
    val rows = CurationQueries.qDomainMix(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nSampled, target) = (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(target >= 4 && target <= 11)
      assert(nSampled <= nDocs)
    }
    // mixture must actually differentiate: not all sources sample at
    // the same realized rate (targets span 25%..68.75%)
    val rates = rows.map(r => r.getLong(2).toDouble / r.getLong(1)).distinct
    assert(rates.length > 1)
  }

  test("domain mix is content-keyed: identical across invocations") {
    val a = CurationQueries.qDomainMix(spark, dir).collect().map(_.toSeq)
    val b = CurationQueries.qDomainMix(spark, dir).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("token budget: census equals an independent in-memory greedy recount; the prefix rule holds") {
    val got = TextQueries.qTokenBudget(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    // independent recount in plain Scala: same BPE merge chain, same
    // quality formula, same (quality desc, doc_id) greedy order
    val merges = Seq("th" -> "0", "he" -> "1", "in" -> "2", "er" -> "3",
      "an" -> "4", "re" -> "5", "on" -> "6", "at" -> "7",
      "0e" -> "8", "4d" -> "9")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "doc_id", "text").collect()
      .map { r =>
        val text = r.getString(2)
        val merged = merges.foldLeft(text) { case (s, (a, b)) => s.replace(a, b) }
        val toks = text.split(" ", -1)
        val quality = math.floor(100.0 * toks.distinct.length / toks.length).toLong
        (r.getString(0), r.getLong(1),
          merged.count(_ != ' ').toLong, quality)
      }
    val budget = 16L * 256L
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val ordered = rows.sortBy { case (_, id, _, q) => (-q, id) }
      var cum = 0L; var nKept = 0L; var tokKept = 0L
      ordered.foreach { case (_, _, nTok, _) =>
        if (cum < budget) { nKept += 1; tokKept += nTok } // prefix rule
        cum += nTok
      }
      val (gKept, gTok, gDocs, gTotal) = got(src)
      assert(gKept == nKept && gTok == tokKept,
        s"$src: engine ($gKept, $gTok) vs recount ($nKept, $tokKept)")
      assert(gDocs == rows.length && gTotal == rows.map(_._3).sum)
      // the prefix rule's budget bound: everything kept strictly under
      // budget BEFORE the boundary doc, so kept tokens < budget + max doc
      assert(gTok < budget + rows.map(_._3).max)
    }
  }

  test("epoch shuffle: complete per epoch, reshuffled across epochs, replay-deterministic, no degenerate shard") {
    val rows = CurationQueries.qEpochShuffle(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L))
    byEpoch.values.foreach { shards =>
      // every doc lands in exactly one shard: per-epoch counts resum
      assert(shards.map(_._3).sum == nDocs)
      // hash sharding must not collapse: every shard non-empty, and no
      // shard holds more than half the corpus (uniform hash, 8 shards)
      assert(shards.length == 8)
      assert(shards.forall(_._3 > 0))
      assert(shards.map(_._3).max <= nDocs / 2)
    }
    // the reshuffle is real: epoch 1's order signatures differ from
    // epoch 0's on at least one shard (hash keys all changed)
    val sig = (e: Long) => byEpoch(e).sortBy(_._2).map(_._5).toSeq
    assert(sig(0L) != sig(1L), "epochs produced identical shard orders")
    // replay determinism: the whole census is bit-stable
    val again = CurationQueries.qEpochShuffle(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.toSeq == again.toSeq)
  }
}
