package graft

import org.apache.spark.sql.functions._
import graft.core.Partitioning
import graft.sources.Tables

/** Bucketed-table co-located joins (SURVEY.md §2.2 partitioning row /
  * the 100 TB "pay the shuffle once at ingest" lever): two tables
  * written with `Partitioning.writeBucketed` on the join key must join
  * with ZERO shuffle exchanges — the bucket spec satisfies the join's
  * required distribution — and, being bucket-SORTED, without re-sorting
  * the larger scans. Results must equal the plain join exactly. */
class BucketingSpec extends SparkSpec {

  private val d = sf("sf0.001")

  test("equi-join of two same-bucketed tables plans with zero Exchange and matches plain join") {
    val orders = Tables.orders(spark, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val customer = Tables.customer(spark, d)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    Partitioning.writeBucketed(orders, "b_orders", "o_custkey", 8)
    Partitioning.writeBucketed(customer, "b_customer", "o_custkey", 8)
    try {
      val bo = spark.table("b_orders")
      val bc = spark.table("b_customer")
      // force the SMJ path (broadcast would hide the bucket win at
      // fixture size; at 100 TB neither side broadcasts)
      val joined = bo.hint("merge").join(bc, Seq("o_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      val plain = orders.join(customer, Seq("o_custkey"))
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(canon(joined) == canon(plain))
      // bucket-pruned aggregation: groupBy the bucket key also needs no
      // exchange (the scan already distributes by o_custkey)
      val aggPlan = bo.groupBy("o_custkey").agg(sum("o_totalprice"))
        .queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"groupBy on the bucket key still shuffles:\n$aggPlan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("itemNeighborsBucketed: basket self-join reads buckets with no Exchange below the pair agg, result equals the plain operator") {
    import graft.operators.Relational
    val baskets = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey"))
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // at fixture size everything broadcasts, which would hide the
      // bucket win; at 100 TB neither self-join side broadcasts
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bucketed = Relational.itemNeighborsBucketed(
        baskets, k = 5, table = "b_baskets", nBuckets = 8)
      // the ONLY exchanges in the plan must sit at/above the pair
      // aggregation (item-keyed); the cust-keyed self-join below it
      // must be satisfied by the bucket scan itself
      val plan = bucketed.queryExecution.executedPlan.toString
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, plan)
      val belowJoin = plan.substring(joinIdx)
      assert(!belowJoin.contains("Exchange hashpartitioning(cust"),
        s"bucketed basket self-join still shuffles on cust:\n$plan")
      val plain = Relational.itemNeighbors(baskets, 5)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(canon(bucketed) == canon(plain))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
      spark.sql("DROP TABLE IF EXISTS b_baskets")
    }
  }
}
