package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coverage / union-measure operators (SURVEY §8j(as)) — the
  * complement of the overlap JOIN: how much wall-clock is covered by a
  * set of overlapping intervals, in how many contiguous blocks.
  *
  * The classic formulation is a sweep line: sort by start, track the
  * running max end, open a new block when a start clears it. A naive
  * per-key sweep is a single-partition sort per key — with few, hot keys
  * (event types) that is one core per key at 100 TB. The plan here
  * DECOMPOSES the sweep by day first: every interval is clipped to the
  * half-open day windows it spans, and because days partition the
  * timeline, the union measure of the originals is EXACTLY the sum of
  * the per-(key, day) clip-union measures. The sweep window then runs
  * per (key, day) — thousands of independent partitions, each bounded by
  * one day's intervals — and a final hash aggregate folds days back to
  * the key. Block counts are reported at day grain (`n_day_blocks`: a
  * block crossing midnight counts once per day it touches) — the
  * decomposable, deterministic statistic. */
object IntervalCoverage {

  private val DayUs = 86400000000L

  /** Per-(key, day) sweep over half-open [cs, ce) clips: `new_block`
    * when a clip's start clears the running max end of its predecessors
    * (ties are order-invariant: zero-length clips are dropped, so any
    * tied predecessor's end strictly exceeds the shared start). */
  private def dayBlocks(iv: DataFrame, key: String): DataFrame = {
    val clipped = iv
      .withColumn("day", explode(expr(s"sequence(s_us div $DayUs, e_us div $DayUs)")))
      .withColumn("cs", greatest(col("s_us"), col("day") * DayUs))
      .withColumn("ce", least(col("e_us"), (col("day") + 1) * DayUs))
      .where(col("cs") < col("ce"))
    val w = Window.partitionBy(col(key), col("day")).orderBy(col("cs"))
    clipped
      .withColumn("prev_max_e", max(col("ce")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_block",
        when(col("prev_max_e").isNull || col("cs") >= col("prev_max_e"), 1L).otherwise(0L))
      .withColumn("block", sum(col("new_block")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(key), col("day"), col("block"))
      .agg(min(col("cs")).as("block_s"), max(col("ce")).as("block_e"),
        (max(col("ce")) - min(col("cs"))).as("block_us"))
  }

  /** Coverage of each event type's activity: typed per-user gap sessions
    * (30-min inactivity closes one), unioned ACROSS users per type —
    * users genuinely overlap, so this exercises real interval-union
    * merging, not the disjoint-by-construction per-user case. Output per
    * type: covered wall-clock micros, day-grain block count, longest
    * day-grain block. */
  def typeCoverage(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    coverageOf(typedSessions(Tables(dir)), "event_type")
  }

  /** Typed per-user gap sessions as half-open `[s, e+1)` intervals: a
    * single-event session covers one micro, so every session contributes
    * measure and the zero-length degenerate case never reaches the
    * sweep. */
  private def typedSessions(t: Tables): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    t.events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wOrd))
      .withColumn("new_sess",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_sess")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("event_type"), col("session_seq"))
      .agg(min(unix_micros(col("ts"))).as("s_us"),
        (max(unix_micros(col("ts"))) + 1).as("e_us"))
  }

  /** Union measure of half-open `[s_us, e_us)` intervals per `key`:
    * (key, covered_us, n_day_blocks, max_block_us). Inputs may overlap
    * arbitrarily within a key; zero-length intervals contribute
    * nothing. */
  def coverageOf(iv: DataFrame, key: String): DataFrame =
    dayBlocks(iv, key)
      .groupBy(col(key))
      .agg(sum(col("block_us")).as("covered_us"),
        count(lit(1)).as("n_day_blocks"),
        max(col("block_us")).as("max_block_us"))

  /** The coverage COMPLEMENT (§8j(as), difference/gap-list variant):
    * uncovered stretches BETWEEN consecutive covered blocks of the same
    * (key, day) — idle spans inside active days. Day-grain like the
    * block stats (a quiet stretch crossing midnight reports per day
    * side), so the statistic stays decomposable and the plan stays
    * partitioned by (key, day). Keys/days with a single block simply
    * contribute no gaps (inner semantics). */
  def gapsOf(iv: DataFrame, key: String): DataFrame = {
    val w = Window.partitionBy(col(key), col("day")).orderBy(col("block_s"))
    dayBlocks(iv, key)
      .withColumn("prev_e", lag(col("block_e"), 1).over(w))
      .where(col("prev_e").isNotNull)
      .withColumn("gap_us", col("block_s") - col("prev_e"))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_us")).as("idle_us"),
        max(col("gap_us")).as("max_gap_us"))
  }

  /** Per-type idle report over the same typed sessions as
    * [[typeCoverage]]. */
  def typeGaps(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    gapsOf(typedSessions(Tables(dir)), "event_type")
  }

  private val typeCoverageSql =
    s"""WITH e AS (
       |  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
       |flagged AS (
       |  SELECT user_id, event_type, ts, event_id,
       |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
       |         THEN 1 ELSE 0 END AS new_sess
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
       |numbered AS (
       |  SELECT user_id, event_type, ts,
       |    SUM(new_sess) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
       |  FROM flagged),
       |sess AS (
       |  SELECT user_id, event_type, session_seq,
       |    epoch_us(MIN(ts)) AS s_us, epoch_us(MAX(ts)) + 1 AS e_us
       |  FROM numbered GROUP BY 1, 2, 3),
       |clipped AS (
       |  SELECT event_type, d.day,
       |    GREATEST(s_us, d.day * ${DayUs}) AS cs,
       |    LEAST(e_us, (d.day + 1) * ${DayUs}) AS ce
       |  FROM sess, LATERAL (
       |    SELECT UNNEST(range(s_us // ${DayUs}, e_us // ${DayUs} + 1)) AS day) d
       |  WHERE GREATEST(s_us, d.day * ${DayUs}) < LEAST(e_us, (d.day + 1) * ${DayUs})),
       |swept AS (
       |  SELECT event_type, day, cs, ce,
       |    CASE WHEN MAX(ce) OVER (PARTITION BY event_type, day ORDER BY cs
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |           OR cs >= MAX(ce) OVER (PARTITION BY event_type, day ORDER BY cs
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |         THEN 1 ELSE 0 END AS new_block
       |  FROM clipped),
       |blocks AS (
       |  SELECT event_type, day,
       |    SUM(new_block) OVER (PARTITION BY event_type, day ORDER BY cs
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS block,
       |    cs, ce
       |  FROM swept),
       |block_spans AS (
       |  SELECT event_type, day, block, MAX(ce) - MIN(cs) AS block_us
       |  FROM blocks GROUP BY 1, 2, 3)
       |SELECT event_type, CAST(SUM(block_us) AS BIGINT) AS covered_us,
       |  COUNT(*) AS n_day_blocks, MAX(block_us) AS max_block_us
       |FROM block_spans GROUP BY 1 ORDER BY 1""".stripMargin

  private val typeGapsSql =
    s"""WITH e AS (
       |  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
       |flagged AS (
       |  SELECT user_id, event_type, ts, event_id,
       |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
       |         THEN 1 ELSE 0 END AS new_sess
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
       |numbered AS (
       |  SELECT user_id, event_type, ts,
       |    SUM(new_sess) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
       |  FROM flagged),
       |sess AS (
       |  SELECT user_id, event_type, session_seq,
       |    epoch_us(MIN(ts)) AS s_us, epoch_us(MAX(ts)) + 1 AS e_us
       |  FROM numbered GROUP BY 1, 2, 3),
       |clipped AS (
       |  SELECT event_type, d.day,
       |    GREATEST(s_us, d.day * ${DayUs}) AS cs,
       |    LEAST(e_us, (d.day + 1) * ${DayUs}) AS ce
       |  FROM sess, LATERAL (
       |    SELECT UNNEST(range(s_us // ${DayUs}, e_us // ${DayUs} + 1)) AS day) d
       |  WHERE GREATEST(s_us, d.day * ${DayUs}) < LEAST(e_us, (d.day + 1) * ${DayUs})),
       |swept AS (
       |  SELECT event_type, day, cs, ce,
       |    CASE WHEN MAX(ce) OVER (PARTITION BY event_type, day ORDER BY cs
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |           OR cs >= MAX(ce) OVER (PARTITION BY event_type, day ORDER BY cs
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |         THEN 1 ELSE 0 END AS new_block
       |  FROM clipped),
       |blocks AS (
       |  SELECT event_type, day,
       |    SUM(new_block) OVER (PARTITION BY event_type, day ORDER BY cs
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS block,
       |    cs, ce
       |  FROM swept),
       |block_spans AS (
       |  SELECT event_type, day, block, MIN(cs) AS block_s, MAX(ce) AS block_e
       |  FROM blocks GROUP BY 1, 2, 3),
       |gaps AS (
       |  SELECT event_type, day,
       |    block_s - lag(block_e) OVER (PARTITION BY event_type, day ORDER BY block_s) AS gap_us
       |  FROM block_spans)
       |SELECT event_type, COUNT(*) AS n_gaps,
       |  CAST(SUM(gap_us) AS BIGINT) AS idle_us, MAX(gap_us) AS max_gap_us
       |FROM gaps WHERE gap_us IS NOT NULL
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** §8k — interval-set INTERSECTION measure per key: wall-clock micros
    * where set A and set B are simultaneously covered. Both sides run
    * through the same (key, day) block machinery (so arbitrary internal
    * overlaps are union-merged first), then blocks join per (key, day) —
    * per-day block counts are bounded, so the pair join is bin-local, the
    * same economics as the multi-interval range join. Completes the
    * interval algebra: union ([[coverageOf]]), difference ([[gapsOf]]),
    * intersection (here) — and inclusion–exclusion ties all three
    * (spec-pinned: |A|+|B|−|A∪B| = |A∩B|). */
  def intersectionOf(a: DataFrame, b: DataFrame, key: String): DataFrame = {
    val ba = dayBlocks(a, key)
      .select(col(key), col("day"), col("block_s").as("a_s"), col("block_e").as("a_e"))
    val bb = dayBlocks(b, key)
      .select(col(key), col("day"), col("block_s").as("b_s"), col("block_e").as("b_e"))
    ba.join(bb, Seq(key, "day"))
      .withColumn("ov", least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s")))
      .where(col("ov") > 0)
      .groupBy(col(key))
      .agg(sum(col("ov")).as("both_us"))
  }

  private val PadUs = 900000000L // ±15 min attention envelope

  /** Per user: time where the view ATTENTION WINDOW and the click
    * attention window were both active (each typed gap session padded
    * ±15 min — raw sessions are mostly single-event instants, which
    * never measurably intersect; the envelope is the standard dwell
    * model). The padding can make a user's windows overlap EACH OTHER,
    * which is exactly what the block machinery union-merges before
    * intersecting. Oracle: a deliberately different formulation — merge
    * each side's padded windows with a sweep, then the quadratic pair
    * overlap; agreement checks the day-decomposition pipeline against
    * first principles. */
  def viewClickOverlap(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val sess = typedSessions(Tables(dir))
      .select(col("user_id"), col("event_type"),
        (col("s_us") - PadUs).as("s_us"), (col("e_us") + PadUs).as("e_us"))
    val a = sess.where(col("event_type") === "view").select(col("user_id"), col("s_us"), col("e_us"))
    val b = sess.where(col("event_type") === "click").select(col("user_id"), col("s_us"), col("e_us"))
    intersectionOf(a, b, "user_id")
  }

  private val viewClickOverlapSql =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |flagged AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
      |numbered AS (
      |  SELECT user_id, event_type, ts,
      |    SUM(new_sess) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM flagged),
      |sess AS (
      |  SELECT user_id, event_type, session_seq,
      |    epoch_us(MIN(ts)) AS s_us, epoch_us(MAX(ts)) + 1 AS e_us
      |  FROM numbered GROUP BY 1, 2, 3),
      |padded AS (
      |  SELECT user_id, event_type,
      |    s_us - 900000000 AS s_us, e_us + 900000000 AS e_us
      |  FROM sess WHERE event_type IN ('view', 'click')),
      |swept AS (
      |  SELECT user_id, event_type, s_us, e_us,
      |    CASE WHEN MAX(e_us) OVER (PARTITION BY user_id, event_type ORDER BY s_us, e_us
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |           OR s_us >= MAX(e_us) OVER (PARTITION BY user_id, event_type ORDER BY s_us, e_us
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |         THEN 1 ELSE 0 END AS nb
      |  FROM padded),
      |blocks AS (
      |  SELECT user_id, event_type,
      |    MIN(s_us) AS s_us, MAX(e_us) AS e_us
      |  FROM (SELECT *, SUM(nb) OVER (PARTITION BY user_id, event_type
      |          ORDER BY s_us, e_us
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS blk FROM swept) x
      |  GROUP BY user_id, event_type, blk),
      |a AS (SELECT user_id, s_us, e_us FROM blocks WHERE event_type = 'view'),
      |b AS (SELECT user_id, s_us, e_us FROM blocks WHERE event_type = 'click'),
      |ov AS (
      |  SELECT a.user_id,
      |    LEAST(a.e_us, b.e_us) - GREATEST(a.s_us, b.s_us) AS ov
      |  FROM a JOIN b ON a.user_id = b.user_id
      |  WHERE LEAST(a.e_us, b.e_us) > GREATEST(a.s_us, b.s_us))
      |SELECT user_id, CAST(SUM(ov) AS BIGINT) AS both_us
      |FROM ov GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, Q] = Map(
    "events_type_coverage" -> Q(typeCoverage _, typeCoverageSql, Seq(col("event_type"))),
    "events_type_gaps" -> Q(typeGaps _, typeGapsSql, Seq(col("event_type"))),
    "events_view_click_overlap" -> Q(viewClickOverlap _, viewClickOverlapSql,
      Seq(col("user_id"))),
  )
}
