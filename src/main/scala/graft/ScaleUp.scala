package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus replicator for empirical scale checks (VERDICT r04 §6): builds an
  * sf×F dataset from an existing sf directory by writing F key-offset
  * copies of every table — copy i shifts each entity key by i × stride
  * (stride = max key + 1), and every foreign key shifts by its referenced
  * table's stride, so the result is F disjoint replicas with EXACTLY the
  * original join cardinalities and value distributions. Dimension tables
  * (nation, region) are shared, as in TPC-H's constant dimensions.
  *
  * {{{
  * sbt "runMain graft.ScaleUp /root/testdata/sf0.1 testdata_sf1 10"
  * }}}
  *
  * Known (intended) structural properties of replica scaling, for reading
  * the resulting bench numbers:
  *  - documents/embeddings replicate VERBATIM (ids offset): every doc gains
  *    F−1 exact twins, so dedup outputs grow by design — a realistic
  *    stress (web corpora are majority-duplicate) rather than a defect;
  *  - the co-purchase graph becomes F disjoint components — triangle
  *    counts scale exactly ×F;
  *  - ANN probe sets (vec_id % ProbeMod) grow ×F alongside the corpus, so
  *    candidate-pair work for the bucketed families grows ~×F² — per-probe
  *    work is the near-linear quantity.
  *
  * Optional 4th arg `saltdocs` (r10): document text is SALTED per copy —
  * every whitespace token gets a `_c<copy>` suffix — so copies share no
  * window hashes. Verbatim replication makes every window's df ≥ F,
  * which pushes the exact-substring pair stage's rare bound (2≤df≤8) to
  * shed everything — the scale reading measured an empty join. Salting
  * preserves each copy's INTERNAL duplication structure exactly (same
  * token sequences up to renaming, so same window-hash equalities, same
  * diagonal islands, same df values as the source SF within each copy):
  * the result is a 10× corpus whose duplicated-span population is 10
  * disjoint copies of the original's — the honest scale stress for
  * `dedup_substring_runs`' pair stage.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "testdata_sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val saltDocs = args.length > 3 && args(3) == "saltdocs"
    val spark = GraftSession()

    def maxOf(table: String, key: String): Long =
      spark.read.parquet(s"$src/$table.parquet").agg(max(col(key))).head().getLong(0)
    val strides = Map(
      "customer" -> (maxOf("customer", "c_custkey") + 1),
      "supplier" -> (maxOf("supplier", "s_suppkey") + 1),
      "part" -> (maxOf("part", "p_partkey") + 1),
      "orders" -> (maxOf("orders", "o_orderkey") + 1),
      "events" -> (maxOf("events", "event_id") + 1),
      "users" -> (maxOf("events", "user_id") + 1),
      "documents" -> (maxOf("documents", "doc_id") + 1),
      "embeddings" -> (maxOf("embeddings", "vec_id") + 1))

    /** F copies with the listed key columns offset by copy × stride. */
    def replicate(table: String, offsets: Map[String, String]): DataFrame = {
      val df = spark.read.parquet(s"$src/$table.parquet")
      val copies = df.crossJoin(
        spark.range(factor.toLong).select(col("id").as("__copy")))
      val shifted = df.columns.foldLeft(copies) { (acc, c) =>
        offsets.get(c) match {
          case Some(ref) => acc.withColumn(c, col(c) + col("__copy") * strides(ref))
          case None => acc
        }
      }
      val salted =
        if (saltDocs && table == "documents")
          shifted.withColumn("text", regexp_replace(col("text"),
            lit("(\\S+)"), concat(lit("$1_c"), col("__copy"))))
        else shifted
      salted.drop("__copy")
    }

    val plans: Seq[(String, DataFrame)] = Seq(
      "region" -> spark.read.parquet(s"$src/region.parquet"),
      "nation" -> spark.read.parquet(s"$src/nation.parquet"),
      "customer" -> replicate("customer", Map("c_custkey" -> "customer")),
      "supplier" -> replicate("supplier", Map("s_suppkey" -> "supplier")),
      "part" -> replicate("part", Map("p_partkey" -> "part")),
      "orders" -> replicate("orders", Map("o_orderkey" -> "orders", "o_custkey" -> "customer")),
      "lineitem" -> replicate("lineitem", Map(
        "l_orderkey" -> "orders", "l_partkey" -> "part", "l_suppkey" -> "supplier")),
      "events" -> replicate("events", Map("event_id" -> "events", "user_id" -> "users")),
      "documents" -> replicate("documents", Map("doc_id" -> "documents")),
      "embeddings" -> replicate("embeddings", Map("vec_id" -> "embeddings")))

    plans.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      System.err.println(s"[scaleup] wrote $out/$name.parquet")
    }
    spark.stop()
  }
}
