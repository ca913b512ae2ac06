package graft

import graft.ext.Classifier

/** q251/q252: the trained quality classifier's learning and
  * determinism contracts (the oracle gate pins cross-engine equality;
  * these pin that the mechanism actually LEARNS). */
class ClassifierSpec extends SparkSpec {

  import spark.implicits._

  test("planted-separable corpus: full teacher agreement") {
    // class-1 docs are stopword soup (teacher fires), class-0 docs use
    // a fully disjoint vocabulary — an exact linear separator exists
    // over the hashed features, so GD must reach 100% agreement
    val docs = (0 until 200).map { i =>
      val id = i.toLong
      if (i % 2 == 0)
        (id, s"the a the a word${i % 5} the a the a the a extra${i % 3}")
      else
        (id, s"alpha beta gamma delta epsilon zeta eta theta iota kappa word${i % 5}")
    }.toDF("doc_id", "text")
    val out = Classifier.trainQuality(docs, 32, 12, 0.25).collect()
    assert(out.count(_.getLong(1) == 1L) == 100, "labels must plant both classes")
    val acc = out.count(r => r.getLong(1) == r.getLong(2)).toDouble / out.length
    assert(acc == 1.0, s"planted-separable accuracy $acc < 1.0")
  }

  test("calibrated v2: planted-separable still exact; keep-rate hits the quantized target") {
    // the v1 planted corpus must stay exactly separable under the
    // ENLARGED (unigram ∪ bigram) feature space — adding evidence
    // cannot break an exact linear separator
    val docs = (0 until 200).map { i =>
      val id = i.toLong
      if (i % 2 == 0)
        (id, s"the a the a word${i % 5} the a the a the a extra${i % 3}")
      else
        (id, s"alpha beta gamma delta epsilon zeta eta theta iota kappa word${i % 5}")
    }.toDF("doc_id", "text")
    val out = Classifier.calibratedQuality(docs, 32, 12, 0.25, 500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))
    // 50% target on a 50/50 planted corpus with separated scores: the
    // kept set is exactly the positive class
    assert(out.count(_._4) == 100, s"keep count ${out.count(_._4)} != 100")
    assert(out.filter(_._4).forall(_._2 == 1L), "kept a teacher-negative doc")
    // threshold semantics: keep-rate never EXCEEDS the target
    val out30 = Classifier.calibratedQuality(docs, 32, 12, 0.25, 300000L)
      .collect().map(r => (r.getLong(0), r.getBoolean(3)))
    assert(out30.count(_._2) <= 60, s"30% target exceeded: ${out30.count(_._2)}")
    // bigram machinery is live: a corpus whose classes differ ONLY in
    // token ADJACENCY (identical unigram multisets) still trains —
    // here just assert v2 scores differ from v1 on a bigram-rich doc
    // set (the feature streams genuinely differ)
    val v1 = Classifier.trainQuality(docs, 32, 12, 0.25)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    val v2 = Classifier.calibratedQuality(docs, 32, 12, 0.25, 500000L)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(v1.keySet == v2.keySet && v1.exists { case (k, v) => v2(k) != v },
      "bigram features changed nothing — stream likely not wired")
  }

  test("fixture corpus: beats the base rate; scores are run-to-run identical") {
    val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
    def run() = Classifier.trainQuality(docs, 64, 16, 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    val out = run()
    val base = math.max(out.count(_._2 == 1L), out.count(_._2 == 0L))
      .toDouble / out.length
    val acc = out.count(r => r._2 == r._3).toDouble / out.length
    assert(acc > base + 0.1,
      s"accuracy $acc must beat the majority base rate $base by 10pts")
    // bit-identical replay (the whole determinism doctrine in one line)
    assert(run().sameElements(out), "re-run diverged")
  }

  test("pipeline v7 shards carry every quality-pass deduped doc exactly once") {
    val res = Classifier.q252(spark, sf("sf0.001")).collect()
    val nDocs = res.map(_.getLong(1)).sum
    val expected = Classifier.q251(spark, sf("sf0.001"))
      .filter(org.apache.spark.sql.functions.col("pred") === 1)
      .count() // fixture texts are unique, so dedup keeps all
    assert(nDocs == expected, s"sharded $nDocs docs vs $expected gated")
    assert(res.map(_.getLong(0)).distinct.length == res.length, "duplicate shards")
  }
}
