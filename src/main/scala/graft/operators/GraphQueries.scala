package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the co-purchase graph (parts linked when the same
  * order contains both). The interesting operator is triangle counting —
  * the classic "your first shuffle explodes" problem: a naive wedge join
  * generates Σ deg(v)² candidates, which a few whale SKUs turn into
  * billions. The fix is the standard degree-ordered orientation
  * (Suri & Vassilvitskii, WWW'11): orient every edge from its
  * lower-(degree, id) endpoint to the higher one — every triangle then
  * has exactly ONE source generating it, and per-source out-degree is
  * O(√|E|), so the wedge set stays near-linear. Both engines run the
  * identical orientation, so counts match row-for-row. */
object GraphQueries {

  /** Distinct co-purchase edges (a < b). One shuffle on l_orderkey; the
    * per-order pair explosion is bounded by order size (≤ 7 lines in this
    * schema; a real catalog would cap or sample whale orders the same way
    * the LSH family caps whale buckets). */
  private def edges(t: Tables): DataFrame = {
    val li = t.lineitem.select(col("l_orderkey"), col("l_partkey"))
    val a = li.toDF("o", "pa")
    val b = li.toDF("o", "pb")
    a.join(b, Seq("o")).where(col("pa") < col("pb"))
      .select(col("pa"), col("pb")).distinct()
  }

  /** Per-part triangle participation, top 100 by count: every triangle
    * found once via its unique low-degree source, then exploded to its
    * three corners. Shuffle ledger: edge build (1 on orderkey), degree
    * count (1 on node), two degree joins (broadcast — the degree table is
    * |parts| rows), wedge self-join (1 on src), closing-edge join (1 on
    * the canonical pair), corner rollup (1). Each shuffles the BOUNDED
    * edge/wedge frames, never lineitem again. */
  def triangles(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val e = edges(Tables(dir))
    val deg = e.select(explode(array(col("pa"), col("pb"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(broadcast(deg.toDF("pa", "deg_a")), Seq("pa"))
      .join(broadcast(deg.toDF("pb", "deg_b")), Seq("pb"))
    val oriented = withDeg.select(
      when(col("deg_a") < col("deg_b")
        || (col("deg_a") === col("deg_b") && col("pa") < col("pb")), col("pa"))
        .otherwise(col("pb")).as("src"),
      when(col("deg_a") < col("deg_b")
        || (col("deg_a") === col("deg_b") && col("pa") < col("pb")), col("pb"))
        .otherwise(col("pa")).as("dst"))
    val w1 = oriented.toDF("src", "d1")
    val w2 = oriented.toDF("src", "d2")
    val wedges = w1.join(w2, Seq("src")).where(col("d1") < col("d2"))
    val tri = wedges.join(e,
      wedges("d1") === e("pa") && wedges("d2") === e("pb"))
      .select(col("src"), col("d1"), col("d2"))
    val perPart = tri
      .select(explode(array(col("src"), col("d1"), col("d2"))).as("p_partkey"))
      .groupBy("p_partkey").agg(count(lit(1)).as("n_triangles"))
    perPart.orderBy(col("n_triangles").desc, col("p_partkey")).limit(100)
  }

  /** §8g(af) — whale-degree guard: cap each source's oriented adjacency
    * to its `cap` lowest-id neighbors before the wedge join. The
    * orientation already bounds out-degree near √|E|, but a pathological
    * hub (every order contains SKU X) can still blow the wedge set; the
    * cap makes the worst case cap²·|V| with a DOCUMENTED undercount —
    * the same honest trade as the LSH family's whale-bucket cap. Counts
    * are a lower bound; cap = Int.MaxValue recovers exact (spec-pinned
    * both ways). */
  def trianglesCapped(spark: SparkSession, dir: String, cap: Int): DataFrame = {
    implicit val s: SparkSession = spark
    val e = edges(Tables(dir))
    val deg = e.select(explode(array(col("pa"), col("pb"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(broadcast(deg.toDF("pa", "deg_a")), Seq("pa"))
      .join(broadcast(deg.toDF("pb", "deg_b")), Seq("pb"))
    val oriented = withDeg.select(
      when(col("deg_a") < col("deg_b")
        || (col("deg_a") === col("deg_b") && col("pa") < col("pb")), col("pa"))
        .otherwise(col("pb")).as("src"),
      when(col("deg_a") < col("deg_b")
        || (col("deg_a") === col("deg_b") && col("pa") < col("pb")), col("pb"))
        .otherwise(col("pa")).as("dst"))
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")).orderBy(col("dst"))))
      .where(col("rn") <= cap)
      .drop("rn")
    val w1 = oriented.toDF("src", "d1")
    val w2 = oriented.toDF("src", "d2")
    val wedges = w1.join(w2, Seq("src")).where(col("d1") < col("d2"))
    val tri = wedges.join(e,
      wedges("d1") === e("pa") && wedges("d2") === e("pb"))
      .select(col("src"), col("d1"), col("d2"))
    tri.select(explode(array(col("src"), col("d1"), col("d2"))).as("p_partkey"))
      .groupBy("p_partkey").agg(count(lit(1)).as("n_triangles"))
  }

  private val trianglesSql =
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e AS (
      |  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |deg AS (
      |  SELECT node, COUNT(*) AS deg FROM (
      |    SELECT pa AS node FROM e UNION ALL SELECT pb FROM e) n GROUP BY 1),
      |oriented AS (
      |  SELECT
      |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND pa < pb) THEN pa ELSE pb END AS src,
      |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND pa < pb) THEN pb ELSE pa END AS dst
      |  FROM e JOIN deg da ON da.node = e.pa JOIN deg db ON db.node = e.pb),
      |wedges AS (
      |  SELECT w1.src, w1.dst AS d1, w2.dst AS d2
      |  FROM oriented w1 JOIN oriented w2 ON w1.src = w2.src AND w1.dst < w2.dst),
      |tri AS (
      |  SELECT w.src, w.d1, w.d2
      |  FROM wedges w JOIN e ON e.pa = w.d1 AND e.pb = w.d2),
      |corners AS (
      |  SELECT p_partkey, COUNT(*) AS n_triangles FROM (
      |    SELECT src AS p_partkey FROM tri
      |    UNION ALL SELECT d1 FROM tri
      |    UNION ALL SELECT d2 FROM tri) c GROUP BY 1)
      |SELECT p_partkey, n_triangles FROM corners
      |ORDER BY n_triangles DESC, p_partkey LIMIT 100""".stripMargin

  /** Registered capped variant (cap = 8): the whale-guard semantics are
    * fully deterministic (lowest-id neighbors survive), so the oracle
    * mirrors the cap with the same ROW_NUMBER and the undercount is
    * itself verified row-for-row. */
  private val CapK = 8

  private def trianglesCappedSql(cap: Int) =
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |e AS (
       |  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
       |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       |deg AS (
       |  SELECT node, COUNT(*) AS deg FROM (
       |    SELECT pa AS node FROM e UNION ALL SELECT pb FROM e) n GROUP BY 1),
       |oriented0 AS (
       |  SELECT
       |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND pa < pb) THEN pa ELSE pb END AS src,
       |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND pa < pb) THEN pb ELSE pa END AS dst
       |  FROM e JOIN deg da ON da.node = e.pa JOIN deg db ON db.node = e.pb),
       |oriented AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rn
       |    FROM oriented0) x WHERE rn <= $cap),
       |wedges AS (
       |  SELECT w1.src, w1.dst AS d1, w2.dst AS d2
       |  FROM oriented w1 JOIN oriented w2 ON w1.src = w2.src AND w1.dst < w2.dst),
       |tri AS (
       |  SELECT w.src, w.d1, w.d2
       |  FROM wedges w JOIN e ON e.pa = w.d1 AND e.pb = w.d2),
       |corners AS (
       |  SELECT p_partkey, COUNT(*) AS n_triangles FROM (
       |    SELECT src AS p_partkey FROM tri
       |    UNION ALL SELECT d1 FROM tri
       |    UNION ALL SELECT d2 FROM tri) c GROUP BY 1)
       |SELECT p_partkey, n_triangles FROM corners
       |ORDER BY p_partkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "graph_triangles" -> Q(triangles _, trianglesSql,
      Seq(col("n_triangles").desc, col("p_partkey"))),
    "graph_triangles_capped" -> Q((s, d) => trianglesCapped(s, d, CapK),
      trianglesCappedSql(CapK), Seq(col("p_partkey"))),
  )
}
