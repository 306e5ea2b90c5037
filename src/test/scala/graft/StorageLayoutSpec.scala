package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Storage-layout scale levers: bucketing (co-located joins with NO
  * shuffle on either side) and partition pruning (directory-level data
  * skipping). These are deploy-time decisions, so the evidence is
  * plan-shape assertions rather than oracle queries.
  */
class StorageLayoutSpec extends SparkSpec {

  test("bucketed tables join with no shuffle exchange") {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // the in-memory catalog forgets tables between JVMs but their
    // warehouse directories survive — clear them or CREATE TABLE refuses
    Seq("b_orders", "b_customer").foreach { t =>
      val p = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
          .getPath, t)
      if (p.exists()) {
        p.listFiles().foreach(_.delete()); p.delete()
      }
    }
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffled-join path: broadcast would hide the exchange
      // question entirely (and is the right plan for a genuinely small dim)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders").join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
      val plan = j.queryExecution.sparkPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // and it still computes the right thing
      val expected = orders.join(customer,
        col("o_custkey") === col("c_custkey")).count()
      assert(j.count() == expected && expected > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("freezeCorpus layout: fold partitions prune, id buckets join " +
    "feature tables with zero exchange") {
    Seq("frozen_docs", "frozen_emb").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
          .getPath, t)
      if (p.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        rm(p)
      }
    }
    graft.operators.Curation.freezeCorpus(
      Tables.documents(spark, sf), "doc_id", "frozen_docs",
      folds = 5, buckets = 4)
    graft.operators.Curation.freezeCorpus(
      Tables.embeddings(spark, sf).withColumnRenamed("vec_id", "doc_id"),
      "doc_id", "frozen_emb", folds = 5, buckets = 4)
    // fold filter prunes at the directory listing
    val fold3 = spark.table("frozen_docs").filter(col("fold") === 3)
    val scan = fold3.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("fold"),
      s"fold pruning must reach the scan:\n${scan.take(600)}")
    // identical bucketing on both tables → co-located sort-merge join
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("frozen_docs").select("doc_id", "text")
        .join(spark.table("frozen_emb").select("doc_id", "embedding"),
          "doc_id")
      val plan = j.queryExecution.sparkPlan.toString
      assert(plan.contains("SortMergeJoin") && !plan.contains("Exchange"),
        s"frozen join must not shuffle:\n${plan.take(600)}")
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
    // the freeze is reproducible: fold assignment is content-free md5
    val folds1 = spark.table("frozen_docs").select("doc_id", "fold")
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).intValue).toMap
    val folds2 = graft.operators.Splits
      .assignFolds(Tables.documents(spark, sf), "doc_id", 5)
      .select("doc_id", "fold").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).intValue).toMap
    assert(folds1 == folds2)
  }

  test("partition pruning reaches the file listing") {
    val dir = Files.createTempDirectory("graft_part").toString
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"),
        col("event_type"))
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val clicks = spark.read.parquet(dir)
      .filter(col("event_type") === "click")
    val scan = clicks.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"))
    assert(scan.contains("event_type"),
      s"partition filter must reach the scan:\n$scan")
    // pruning is semantically invisible
    val expected = Tables.events(spark, sf)
      .filter(col("event_type") === "click").count()
    assert(clicks.count() == expected && expected > 0)
  }
}
