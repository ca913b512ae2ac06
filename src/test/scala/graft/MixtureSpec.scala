package graft

import org.apache.spark.sql.functions._
import graft.ext.Mixture

/** Contracts for the r18 mixture tier: exact histogram quantiles,
  * Hamilton apportionment, and the two-level order-statistic select —
  * each checked against a naive driver-side reference on frames small
  * enough to sort in memory (the engine path never sorts globally). */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private def lcg(seed: Long): Long = seed * 6364136223846793005L + 1442695040888963407L

  test("groupQuantiles equals naive sorted quantiles (duplicates, skew, singleton groups)") {
    val rows = (0 until 1000).map { i =>
      val g = s"g${i % 7}"
      val v = math.abs(lcg(i.toLong)) % (if (i % 7 == 0) 5 else 400)
      (g, v)
    } :+ (("lone", 42L))
    val df = rows.toDF("source", "v")
    val got = Mixture.groupQuantiles(df, "source", col("v"),
      Seq(("p50", 1, 2), ("p90", 9, 10)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    rows.groupBy(_._1).foreach { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length
      def q(num: Int, den: Int) = sorted((num * n + den - 1) / den - 1)
      assert(got(g) == ((n.toLong, q(1, 2), q(9, 10))),
        s"$g: got ${got(g)} want (${n}, ${q(1, 2)}, ${q(9, 10)})")
    }
  }

  test("allocateQuotas: Hamilton apportionment sums to target with the declared tie-break") {
    val srcs = Seq(("a", 10L, 3L), ("b", 10L, 3L), ("c", 10L, 3L), ("d", 10L, 1L))
      .toDF("source", "n_docs", "w")
    val target = 7L
    val got = Mixture.allocateQuotas(srcs, "w", target)
      .select("source", "quota").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // base = 7*3/10 = 2 (a,b,c), 7*1/10 = 0 (d); leftover = 7-6 = 1;
    // remainders: a/b/c = 1, d = 7 → d takes the seat
    assert(got == Map("a" -> 2L, "b" -> 2L, "c" -> 2L, "d" -> 1L), s"$got")
    assert(got.values.sum == target)
    // remainder tie: equal remainders fall back to source ASC
    val tie = Mixture.allocateQuotas(
      Seq(("x", 1L), ("y", 1L), ("z", 1L)).toDF("source", "w"), "w", 4L)
      .select("source", "quota").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tie == Map("x" -> 2L, "y" -> 1L, "z" -> 1L), s"$tie")
  }

  test("selectionThresholds equals the naive per-source order statistic across bucket boundaries") {
    // sparse ids force multi-bucket paths even at buckets = 8
    val rows = (0 until 500).map { i =>
      (s"s${i % 3}", math.abs(lcg(lcg(i.toLong))) % 1000000L)
    }.distinct
    val docs = rows.toDF("source", "doc_id")
    val quotas = Seq(("s0", 1L), ("s1", 57L), ("s2", 100000L)) // s2 over-quota
      .toDF("source", "quota")
    val got = Mixture.selectionThresholds(docs, quotas, buckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySrc = rows.groupBy(_._1).map { case (s, vs) => s -> vs.map(_._2).sorted }
    assert(got("s0") == bySrc("s0").head, "quota 1 = min id")
    assert(got("s1") == bySrc("s1")(56), s"57th smallest: ${got("s1")}")
    assert(!got.contains("s2"), "over-quota source must emit no threshold")
    // quota = n exactly → max id
    val full = Mixture.selectionThresholds(docs,
      Seq(("s2", bySrc("s2").length.toLong)).toDF("source", "quota"), buckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(full("s2") == bySrc("s2").last, "quota = n → max id")
  }

  test("selectionThresholds recurses on clustered ids (r18 verdict #3): tiny taskCap, block-allocated ids") {
    // epoch-prefixed / block-allocated ids: ~all of each source's rows
    // land in ONE value-range bucket at buckets = 8 — the skew shape
    // the recursive split exists for. taskCap = 16 forces ≥ 2 rounds
    // (800 rows per source in a range 8 buckets wide can't reach a
    // ≤ 16-row slot in one split).
    val rows = (0 until 2400).map { i =>
      val s = s"s${i % 3}"
      // cluster: a huge epoch prefix + a dense 800-wide block per source
      (s, 1700000000000000L + (i % 3) * 10000000L + i / 3)
    }
    val docs = rows.toDF("source", "doc_id")
    val quotas = Seq(("s0", 1L), ("s1", 400L), ("s2", 800L))
      .toDF("source", "quota")
    val got = Mixture.selectionThresholds(docs, quotas,
      buckets = 8, taskCap = 16L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySrc = rows.groupBy(_._1).map { case (s, vs) => s -> vs.map(_._2).sorted }
    assert(got("s0") == bySrc("s0").head, "quota 1 = min id under clustering")
    assert(got("s1") == bySrc("s1")(399), s"400th smallest: ${got("s1")}")
    assert(got("s2") == bySrc("s2").last, "quota = n -> max id under clustering")
  }

  test("allocateQuotas fails loudly on empty input or non-positive weight sum") {
    val empty = Seq.empty[(String, Long)].toDF("source", "w")
    val e1 = intercept[IllegalArgumentException] {
      Mixture.allocateQuotas(empty, "w", 10L)
    }
    assert(e1.getMessage.contains("must be positive"))
    val zero = Seq(("a", 0L), ("b", 0L)).toDF("source", "w")
    val e2 = intercept[IllegalArgumentException] {
      Mixture.allocateQuotas(zero, "w", 10L)
    }
    assert(e2.getMessage.contains("must be positive"))
  }

  test("q283 composition: selected counts sum to the target when no source caps") {
    val d = sf("sf0.001")
    val out = Mixture.q283(spark, d).collect()
    val total = graft.sources.Tables.documents(spark, d).count()
    assert(out.map(_.getLong(5)).sum == total / 2,
      "sum(n_selected) == target (no source capped on this fixture)")
    // threshold is a real member id: count(doc_id <= t within source) == quota
    val docs = graft.sources.Tables.documents(spark, d)
      .select("source", "doc_id").collect()
      .groupBy(_.getString(0)).map { case (s, rs) => s -> rs.map(_.getLong(1)) }
    out.foreach { r =>
      val (s, quota) = (r.getString(0), r.getLong(3))
      if (!r.isNullAt(4)) {
        val t = r.getLong(4)
        assert(docs(s).count(_ <= t) == quota, s"$s: threshold rank mismatch")
      }
    }
  }
}
