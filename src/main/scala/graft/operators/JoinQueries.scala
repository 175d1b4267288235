package graft.operators

import graft.Q
import graft.functions.Num.{dsum, fin}
import graft.plans.BloomPrune
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join-optimization operators: Bloom-pruned semi-join (SURVEY §8d) and a
  * banded temporal self-join (range join without a range-join operator).
  */
object JoinQueries {

  // ------------------------------------------------------ bloom semi-join

  /** Revenue of lineitems belonging to URGENT orders, with the probe side
    * Bloom-pruned map-side before the exact semi-join ([[BloomPrune]]).
    * Result is EXACT (the sketch has no false negatives and the semi-join
    * removes false positives), so the oracle is the plain EXISTS query —
    * what changes at 100 TB is the bytes entering the fact-side exchange:
    * ~80% of lineitem rows are dropped at the scan by a ~1 MB sketch. */
  def bloomSemi(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val t = Tables(dir)
    val urgent = t.orders
      .where(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    BloomPrune.prunedSemiJoin(spark, t.lineitem, col("l_orderkey"),
        urgent, col("o_orderkey"), expectedItems = 1L << 20)
      .groupBy(col("l_returnflag"))
      .agg(fin(dsum(col("l_extendedprice"))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  private val bloomSemiSql =
    """SELECT l_returnflag,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_orderkey = l_orderkey AND o_orderpriority = '1-URGENT')
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------- banded temporal join

  /** Burst window: pairs of same-user events ≤ 10 minutes apart. */
  private val WindowUs = 600L * 1000 * 1000

  /** Temporal self-join done the scale way: a naive `|t_a - t_b| ≤ w` join
    * on user_id alone degenerates into a per-user cross product (quadratic
    * in a hot user's event count). Banding fixes it: bucket each event
    * into floor(t/w), explode the LEFT side into its own and the next
    * bucket, and join on (user_id, bucket) — every qualifying pair lands
    * in exactly one (bucket, bucket) or (bucket, bucket+1) combination, so
    * no distinct is needed, and the shuffle key (user, time-band) keeps a
    * whale user spread across bands instead of one task. The exact window
    * predicate then filters inside the bucket pairs. */
  def burstPairs(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val e = Tables(dir).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val a = e
      .withColumn("bucket", explode(array(expr(s"us div $WindowUs"), expr(s"us div $WindowUs + 1"))))
      .select(col("user_id"), col("bucket"), col("event_id").as("event_a"), col("us").as("us_a"))
    val b = e
      .select(col("user_id"), expr(s"us div $WindowUs").as("bucket"),
        col("event_id").as("event_b"), col("us").as("us_b"))
    a.join(b, Seq("user_id", "bucket"))
      .where(col("us_b") - col("us_a") >= 0 && col("us_b") - col("us_a") <= WindowUs &&
        (col("us_a") < col("us_b") ||
          (col("us_a") === col("us_b") && col("event_a") < col("event_b"))))
      .select(col("user_id"), col("event_a"), col("event_b"),
        (col("us_b") - col("us_a")).as("gap_us"))
  }

  private val burstPairsSql =
    s"""SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
       |  epoch_us(CAST(b.ts AS TIMESTAMP)) - epoch_us(CAST(a.ts AS TIMESTAMP)) AS gap_us
       |FROM events a JOIN events b ON a.user_id = b.user_id
       |WHERE epoch_us(CAST(b.ts AS TIMESTAMP)) - epoch_us(CAST(a.ts AS TIMESTAMP))
       |        BETWEEN 0 AND $WindowUs
       |  AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
       |ORDER BY a.user_id, event_a, event_b""".stripMargin

  // -------------------------------------------------- co-purchase mining

  /** Market-basket pair mining: parts co-purchased in ≥ 2 orders. The
    * [[Banded.pairsExec]] custom operator generalizes beyond LSH here —
    * the "bucket" is simply the order (naturally bounded: a handful of
    * lines each), so per-order part pairs stream out of one exchange
    * clustered on l_orderkey and the pair-count aggregate rides on top.
    * The all-pairs product only ever happens inside one order's lines;
    * support counting is a plain partial-agg groupBy. The operator's
    * whale-bucket cap is the guard if a pathological order had thousands
    * of lines. */
  def copurchasePairs(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val orderParts = Tables(dir).lineitem.select(col("l_orderkey"), col("l_partkey"))
    Banded.pairsExec(orderParts, Seq("l_orderkey"), "l_partkey")
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_orders"))
      .where(col("n_orders") >= 2)
      .select(col("id_a").as("part_a"), col("id_b").as("part_b"), col("n_orders"))
  }

  private val copurchaseSql =
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |pairs AS (
      |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      |  FROM op a JOIN op b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |c AS (SELECT part_a, part_b, COUNT(*) AS n_orders FROM pairs GROUP BY part_a, part_b)
      |SELECT part_a, part_b, n_orders FROM c WHERE n_orders >= 2
      |ORDER BY part_a, part_b""".stripMargin

  /** §8l(bt) — association RULES over the mined pairs: every supported
    * pair {a,b} yields both directed rules a→b and b→a with exact
    * integer confidence (per-mille of the antecedent's orders that also
    * contain the consequent) and lift (ppm of the independence
    * expectation — >10⁶ means genuinely associated). The market-basket
    * step after [[copurchasePairs]]: support alone ranks popular pairs,
    * confidence/lift expose DIRECTION and surprise, which is what a
    * recommender consumes. All integer div — no floats anywhere.
    *
    * Scale shape: the pair mining reuses the order-bucketed
    * [[Banded.pairsExec]]; item counts are one distinct-collapse
    * aggregate joined back (vocabulary-sized, hash join on part key);
    * the grand total rides a 1-row broadcast. */
  def assocRules(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val op = Tables(dir).lineitem.select(col("l_orderkey"), col("l_partkey"))
    val pairs = Banded.pairsExec(op, Seq("l_orderkey"), "l_partkey")
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= 2)
    val items = op.distinct().groupBy(col("l_partkey")).agg(count(lit(1)).as("n_item"))
    val totals = op.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders_total"))
    // r15 (opt, §2.4): both rule directions from ONE mining pass — the
    // former self-union re-ran the whole BandedPairs pair-mining subtree
    // per branch (the before plan holds BandedPairs twice and five
    // lineitem scans; no exchange reuse fires because the branches project
    // swapped columns). Exploding a 2-struct array emits a→b and b→a from
    // the single mined row instead.
    val directed = pairs
      .select(explode(array(
        struct(col("id_a").as("lhs"), col("id_b").as("rhs"), col("n_pair")),
        struct(col("id_b").as("lhs"), col("id_a").as("rhs"), col("n_pair")))).as("d"))
      .select(col("d.lhs").as("lhs"), col("d.rhs").as("rhs"), col("d.n_pair").as("n_pair"))
    directed
      .join(items.select(col("l_partkey").as("lhs"), col("n_item").as("n_lhs")), Seq("lhs"))
      .join(items.select(col("l_partkey").as("rhs"), col("n_item").as("n_rhs")), Seq("rhs"))
      .crossJoin(broadcast(totals))
      .select(col("lhs"), col("rhs"), col("n_pair"),
        expr("n_pair * 1000 div n_lhs").as("conf_pm"),
        // operands promoted to DECIMAL before the products: n_pair·N·1e6
        // overflows int64 once order counts pass ~10^6; Spark would wrap
        // silently where DuckDB errors (IntegralDivide on decimals still
        // returns LongType, so the schema is unchanged)
        expr("(CAST(n_pair AS DECIMAL(38,0)) * n_orders_total * 1000000) div (CAST(n_lhs AS DECIMAL(38,0)) * n_rhs)").as("lift_ppm"))
  }

  private val assocRulesSql =
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |pairs AS (
      |  SELECT a.l_partkey AS id_a, b.l_partkey AS id_b, COUNT(*) AS n_pair
      |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |items AS (SELECT l_partkey, COUNT(*) AS n_item FROM op GROUP BY 1),
      |tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders_total FROM op),
      |directed AS (
      |  SELECT id_a AS lhs, id_b AS rhs, n_pair FROM pairs
      |  UNION ALL SELECT id_b, id_a, n_pair FROM pairs)
      |SELECT d.lhs, d.rhs, d.n_pair,
      |  d.n_pair * 1000 // la.n_item AS conf_pm,
      |  CAST((CAST(d.n_pair AS HUGEINT) * t.n_orders_total * 1000000) // (CAST(la.n_item AS HUGEINT) * lb.n_item) AS BIGINT) AS lift_ppm
      |FROM directed d
      |JOIN items la ON la.l_partkey = d.lhs
      |JOIN items lb ON lb.l_partkey = d.rhs
      |CROSS JOIN tot t
      |ORDER BY lhs, rhs""".stripMargin

  // ------------------------------------------------------ key-skew audit

  /** §8p(ct) — join-key skew diagnostics: for each fact-table join key,
    * the numbers an engine operator reads before choosing a join
    * strategy — key cardinality, the heaviest key's row count and its
    * share of the table (ppm), and the Gini coefficient of the
    * rows-per-key distribution (ppm; 0 = perfectly even, →1 = one whale
    * key). top_share bounds the single-task row count a hash join would
    * see (the salting trigger); Gini separates "one whale" from
    * "everything mildly uneven" (the AQE-skew-threshold tuning signal).
    *
    * Exactness + scale shape: Gini's rank-weighted sum is computed from
    * the GROUPED count-of-counts distribution, not per-key ranks — keys
    * sharing a multiplicity occupy a contiguous rank block, so
    * Σ i·cᵢ = Σ_blocks c·(m·M_prev + m(m+1)/2) — which turns the naive
    * |keys|-row single-partition rank window into: one (col,key) groupBy
    * (map-side partial), one (col,count) groupBy, and a window over the
    * count-of-counts table, whose size is bounded by the number of
    * DISTINCT multiplicities (dozens, even at 100 TB). The rank-weighted
    * sum rides DECIMAL(38,0)/HUGEINT — Σ i·cᵢ ≤ n_keys·n_rows overflows
    * int64 at ~10⁹ keys. */
  def skewAudit(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    // r14 (verdict #2): the per-key multiplicities come from the STAGED
    // value-count cells ([[StorageQueries.stagedValCounts]] — the three
    // key columns are a filter over the six-column stats frame, and the
    // orders leg rides its own orders-gated stage), so the audit never
    // re-melts the fact table: work is ∝ |distinct (col, key)| cells.
    val freq = StorageQueries.stagedValCounts(spark, dir)
      .where(col("col_name").isin("l_orderkey", "l_partkey", "l_suppkey"))
      .unionByName(StorageQueries.stagedCustKeyCounts(spark, dir))
      .select(col("col_name"), col("cnt").as("c"))
      .groupBy("col_name", "c").agg(count(lit(1)).as("m"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("col_name")).orderBy(col("c"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    freq
      .withColumn("mprev", coalesce(sum(col("m")).over(w), lit(0L)))
      .withColumn("si", expr(
        "CAST(c AS DECIMAL(38,0)) * m * mprev + CAST(c AS DECIMAL(38,0)) * (m * (m + 1) div 2)"))
      .groupBy("col_name")
      .agg(
        sum(expr("c * m")).as("n_rows"),
        sum(col("m")).as("n_keys"),
        max(col("c")).as("max_key_rows"),
        sum(col("si")).as("sumic"))
      .select(col("col_name"), col("n_rows"), col("n_keys"), col("max_key_rows"),
        expr("max_key_rows * 1000000 div n_rows").as("top_share_ppm"),
        expr("CAST(2000000 * sumic div (CAST(n_keys AS DECIMAL(38,0)) * n_rows)" +
          " - CAST(1000000 AS DECIMAL(38,0)) * (n_keys + 1) div n_keys AS BIGINT)").as("gini_ppm"))
  }

  private val skewAuditSql =
    """WITH keyed AS (
      |  SELECT 'l_orderkey' AS col_name, l_orderkey AS key FROM lineitem
      |  UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
      |  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem
      |  UNION ALL SELECT 'o_custkey', o_custkey FROM orders),
      |freq AS (
      |  SELECT col_name, c, COUNT(*) AS m FROM (
      |    SELECT col_name, key, COUNT(*) AS c FROM keyed GROUP BY 1, 2) x
      |  GROUP BY 1, 2),
      |cum AS (
      |  SELECT col_name, c, m,
      |    COALESCE(SUM(m) OVER (PARTITION BY col_name ORDER BY c
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS mprev
      |  FROM freq),
      |agg AS (
      |  SELECT col_name,
      |    CAST(SUM(c * m) AS BIGINT) AS n_rows,
      |    CAST(SUM(m) AS BIGINT) AS n_keys,
      |    MAX(c) AS max_key_rows,
      |    SUM(CAST(c AS HUGEINT) * m * mprev + CAST(c AS HUGEINT) * (m * (m + 1) // 2)) AS sumic
      |  FROM cum GROUP BY 1)
      |SELECT col_name, n_rows, n_keys, max_key_rows,
      |  max_key_rows * 1000000 // n_rows AS top_share_ppm,
      |  CAST(2000000 * sumic // (CAST(n_keys AS HUGEINT) * n_rows)
      |    - CAST(1000000 AS HUGEINT) * (n_keys + 1) // n_keys AS BIGINT) AS gini_ppm
      |FROM agg
      |ORDER BY col_name""".stripMargin

  // ---------------------------------------------------- join advisor

  private val AdvisorBroadcastRows = 1000000L // dim fits the broadcast budget
  private val AdvisorParallelism = 32L        // target task count

  /** §8p(cz) — join-strategy advisor: the engine's own planning rules,
    * landed as a queryable table. For each fact join key, joined against
    * its dimension: recommend `broadcast` when the dim side fits the
    * broadcast budget, else `salted-shuffle` with an explicit salt factor
    * when one key's rows exceed an even task share (salt_ways = ⌈max key
    * rows / even share⌉ — exactly the replication a salted join needs to
    * level that key across tasks), else plain `shuffle-hash`. Every rule
    * is integer arithmetic over auditable inputs (fact rows, dim rows,
    * heaviest key), so the advice is reproducible anywhere — the point:
    * at 100 TB you want the join plan DECIDED from landed statistics,
    * not rediscovered per run by sampling. Cost: one pass per fact key
    * for the heaviest-key count (map-side partial), four 1-row dim
    * counts, one broadcast join. */
  def joinAdvisor(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val t = Tables(dir)
    // r14 (verdict #2): fact-side statistics fold over the same staged
    // value-count cells as [[skewAudit]] — the advisor's whole fact-table
    // cost collapses to a |cells|-row aggregate
    val facts = StorageQueries.stagedValCounts(spark, dir)
      .where(col("col_name").isin("l_orderkey", "l_partkey", "l_suppkey"))
      .unionByName(StorageQueries.stagedCustKeyCounts(spark, dir))
      .select(col("col_name").as("fact_key"), col("cnt").as("c"))
      .groupBy("fact_key").agg(sum(col("c")).as("fact_rows"), max(col("c")).as("max_key_rows"))
    val dims = Seq(
      ("l_orderkey", "orders", t.orders), ("l_partkey", "part", t.part),
      ("l_suppkey", "supplier", t.supplier), ("o_custkey", "customer", t.customer))
      .map { case (k, name, df) =>
        df.agg(count(lit(1)).as("dim_rows"))
          .select(lit(k).as("fact_key"), lit(name).as("dim_table"), col("dim_rows"))
      }.reduce(_ unionByName _)
    facts.join(broadcast(dims), Seq("fact_key"))
      .withColumn("even_share", expr(s"greatest(fact_rows div $AdvisorParallelism, 1L)"))
      .withColumn("salt_ways", expr("(max_key_rows + even_share - 1) div even_share"))
      .withColumn("strategy", expr(
        s"""CASE WHEN dim_rows <= $AdvisorBroadcastRows THEN 'broadcast'
           |     WHEN salt_ways > 1 THEN 'salted-shuffle'
           |     ELSE 'shuffle-hash' END""".stripMargin))
      .select("fact_key", "dim_table", "fact_rows", "dim_rows",
        "max_key_rows", "salt_ways", "strategy")
  }

  private val joinAdvisorSql =
    s"""WITH keyed AS (
       |  SELECT 'l_orderkey' AS fact_key, l_orderkey AS key FROM lineitem
       |  UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
       |  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem
       |  UNION ALL SELECT 'o_custkey', o_custkey FROM orders),
       |facts AS (
       |  SELECT fact_key, CAST(SUM(c) AS BIGINT) AS fact_rows, MAX(c) AS max_key_rows
       |  FROM (SELECT fact_key, key, COUNT(*) AS c FROM keyed GROUP BY 1, 2) x
       |  GROUP BY 1),
       |dims AS (
       |  SELECT 'l_orderkey' AS fact_key, 'orders' AS dim_table, COUNT(*) AS dim_rows FROM orders
       |  UNION ALL SELECT 'l_partkey', 'part', COUNT(*) FROM part
       |  UNION ALL SELECT 'l_suppkey', 'supplier', COUNT(*) FROM supplier
       |  UNION ALL SELECT 'o_custkey', 'customer', COUNT(*) FROM customer),
       |j AS (
       |  SELECT f.fact_key, d.dim_table, f.fact_rows, d.dim_rows, f.max_key_rows,
       |    GREATEST(f.fact_rows // $AdvisorParallelism, 1) AS even_share
       |  FROM facts f JOIN dims d USING (fact_key))
       |SELECT fact_key, dim_table, fact_rows, dim_rows, max_key_rows,
       |  (max_key_rows + even_share - 1) // even_share AS salt_ways,
       |  CASE WHEN dim_rows <= $AdvisorBroadcastRows THEN 'broadcast'
       |       WHEN (max_key_rows + even_share - 1) // even_share > 1 THEN 'salted-shuffle'
       |       ELSE 'shuffle-hash' END AS strategy
       |FROM j
       |ORDER BY fact_key""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_join_skew_audit" -> Q(skewAudit _, skewAuditSql, Seq(col("col_name"))),
    "storage_join_advisor" -> Q(joinAdvisor _, joinAdvisorSql, Seq(col("fact_key"))),
    "q_assoc_rules" -> Q(assocRules _, assocRulesSql, Seq(col("lhs"), col("rhs"))),
    "q_bloom_semi" -> Q(bloomSemi _, bloomSemiSql, Seq(col("l_returnflag"))),
    "q_copurchase_pairs" -> Q(copurchasePairs _, copurchaseSql, Seq(col("part_a"), col("part_b"))),
    "events_burst_pairs" -> Q(burstPairs _, burstPairsSql,
      Seq(col("user_id"), col("event_a"), col("event_b"))),
  )
}
