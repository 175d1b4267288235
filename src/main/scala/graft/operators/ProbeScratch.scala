package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch decomposition probe for the optimization round — NOT registered. */
object ProbeScratch {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    System.err.println(f"[probe] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }
  val HitsScale = 1000000000000L
  def cast38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")

  def hitsWith(spark: SparkSession, dir: String, prePartition: Boolean): DataFrame = {
    implicit val s: SparkSession = spark
    val e = GraphQueries.stagedEdges(spark, dir)
    val dirE0 = e.select(col("pa").as("src"), col("pb").as("dst"))
    val (eDst, eSrc) =
      if (prePartition) {
        val d = Cached.track(dirE0.repartition(col("dst"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val sdf = Cached.track(dirE0.repartition(col("src"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        (d, sdf)
      } else {
        val one = Cached.track(dirE0
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        (one, one)
      }
    def renorm(rawIn: DataFrame): DataFrame = {
      val raw = Cached.track(rawIn.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val mx = raw.agg(max(col("raw")).as("mx")).head().getDecimal(0)
      raw.select(col("node"),
        expr(s"CAST((CAST(raw AS DECIMAL(38,0)) * $HitsScale) div CAST('$mx' AS DECIMAL(38,0)) AS BIGINT)").as("s"))
    }
    LoopConf.noAqeBelow(spark, 0L) {
      var h = eSrc.select(col("src").as("node")).distinct()
        .select(col("node"), lit(HitsScale).as("s"))
      var a: DataFrame = null
      for (_ <- 1 to 4) {
        a = renorm(eDst.join(h, eDst("src") === h("node"))
          .groupBy(col("dst")).agg(sum(cast38(col("s"))).as("raw"))
          .select(col("dst").as("node"), col("raw")))
        h = renorm(eSrc.join(a, eSrc("dst") === a("node"))
          .groupBy(col("src")).agg(sum(cast38(col("s"))).as("raw"))
          .select(col("src").as("node"), col("raw")))
      }
      a.select(col("node"), col("s").as("auth_scaled"))
        .join(h.select(col("node"), col("s").as("hub_scaled")), Seq("node"), "full_outer")
        .select(col("node").as("p_partkey"),
          coalesce(col("auth_scaled"), lit(0L)).as("auth_scaled"),
          coalesce(col("hub_scaled"), lit(0L)).as("hub_scaled"))
        .orderBy(col("auth_scaled").desc, col("hub_scaled").desc, col("p_partkey"))
        .limit(50)
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession()
    implicit val s: SparkSession = spark
    graft.plans.VectorExpressions.register(spark)

    def run(label: String, f: => DataFrame): Seq[String] = {
      Cached.releaseAll(); spark.catalog.clearCache()
      f.write.mode("overwrite").format("noop").save() // warm
      Cached.releaseAll(); spark.catalog.clearCache()
      var rows: Seq[String] = Nil
      t(label) {
        val out = f
        out.write.mode("overwrite").format("noop").save()
        rows = out.collect().map(_.toString).toSeq
      }
      Cached.releaseAll(); spark.catalog.clearCache()
      rows
    }
    val h0 = run("hits single persisted cache", hitsWith(spark, dir, prePartition = false))
    val h1 = run("hits dual pre-partitioned caches", hitsWith(spark, dir, prePartition = true))
    System.err.println(s"[probe] hits equal: ${h0 == h1}")

    // projection audit: planning vs execution
    val fn = graft.SparkEntry.registry("ann_projection_audit").fn
    fn(spark, dir).write.mode("overwrite").format("noop").save() // warm
    Cached.releaseAll(); spark.catalog.clearCache()
    val df = t("projection_audit: build DataFrame (analysis)") { fn(spark, dir) }
    t("projection_audit: executedPlan (plan+codegen prep)") { df.queryExecution.executedPlan }
    t("projection_audit: noop execute") { df.write.mode("overwrite").format("noop").save() }
    t("projection_audit: second noop (fresh fn)") {
      fn(spark, dir).write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
