package graft.operators

import graft.Q
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Binned interval (range) join: the fact-fact overlap join neither a
  * broadcast (both sides big) nor an equi-shuffle (no equality key)
  * can express.
  *
  * Each interval explodes into the fixed-width bins it touches; the join
  * runs as an ordinary hash-shuffle on the bin; the true overlap predicate
  * re-applies as the residual filter; and each surviving pair is counted
  * exactly once by attributing it to the bin of `max(start_a, start_b)` —
  * no post-join distinct, so nothing downstream has to deduplicate a
  * blown-up intermediate. Bin width is the knob: wider bins replicate
  * less but pack more intervals per bucket (the per-bin join is quadratic
  * in bucket occupancy — the same whale-bucket economics as the LSH band
  * join, and the same mitigation applies: pick the width near the median
  * interval length, cap or split pathological bins).
  *
  * Contrast with the two range joins already in the repo: the NGS
  * segment×gene overlap broadcasts the small annotation side, and the
  * streaming interval join bounds state by watermark — this operator is
  * the third regime, both sides large and batch. */
object RangeJoin {

  /** Derive working column names that collide with NO input column: each
    * base gets a numeric suffix until it is free of `taken` and of the
    * other derived names. Temp columns used to be fixed `_ls`/`_bin`/…
    * literals, which silently overwrote (and then dropped) same-named
    * caller columns. */
  private[operators] def fresh(taken: Set[String], bases: Seq[String]): Map[String, String] = {
    var used = taken
    bases.map { b =>
      var n = b
      var i = 0
      while (used(n)) { i += 1; n = b + i }
      used += n
      b -> n
    }.toMap
  }

  /** Overlap pairs of `left` × `right` with each pair emitted exactly
    * once. Interval columns are inclusive `[start, end]` NON-NEGATIVE
    * longs (any unit; `binWidth` in the same unit) — binning uses `div`,
    * whose truncation-toward-zero equals floor only for non-negatives;
    * epoch-like domains satisfy this by construction, shifted domains
    * must be offset first. All other columns of both inputs pass
    * through UNCHANGED — working columns are derived collision-free
    * against both schemas, so callers key their frames however they
    * like — including frames that SHARE interval column names (a
    * self-join that doesn't rename): the residual predicate binds
    * through per-side temp columns projected before the join, never a
    * bare post-join name. */
  def overlapPairs(left: DataFrame, lStart: String, lEnd: String,
                   right: DataFrame, rStart: String, rEnd: String,
                   binWidth: Long): DataFrame = {
    val n = fresh((left.columns ++ right.columns).toSet,
      Seq("_bin", "_rbin", "_ls", "_le", "_rs", "_re"))
    def binned(df: DataFrame, s: String, e: String, ts: String, te: String, bin: String) = df
      .withColumn(ts, col(s)).withColumn(te, col(e))
      .withColumn(bin,
        explode(sequence(expr(s"`$ts` div $binWidth"), expr(s"`$te` div $binWidth"))))
    val l = binned(left, lStart, lEnd, n("_ls"), n("_le"), n("_bin"))
    val r = binned(right, rStart, rEnd, n("_rs"), n("_re"), n("_rbin"))
    l.join(r,
        l(n("_bin")) === r(n("_rbin")) &&
          col(n("_ls")) <= col(n("_re")) && col(n("_rs")) <= col(n("_le")) &&
          expr(s"greatest(`${n("_ls")}`, `${n("_rs")}`) div $binWidth") === l(n("_bin")))
      .drop(n("_bin"), n("_rbin"), n("_ls"), n("_le"), n("_rs"), n("_re"))
  }

  /** Whale-bin guard (§8i(ao)): [[overlapPairs]] with each bin's
    * PER-SIDE membership capped to the `cap` earliest-starting intervals
    * (ties by the caller's `lId`/`rId` — deterministic survivors, the
    * same honest contract as the LSH whale-bucket and triangle-degree
    * caps). The per-bin join is quadratic in bin occupancy; one
    * pathological bin (every interval alive at noon) otherwise owns the
    * whole stage. Output is a deterministic SUBSET of the uncapped
    * pairs — an undercount, never an invention — and cap ≥ max occupancy
    * recovers exactness (both spec-proven). Costs one rank window per
    * side, keyed on the bin — the same shuffle the join pays anyway. */
  def overlapPairsCapped(left: DataFrame, lStart: String, lEnd: String, lId: String,
                         right: DataFrame, rStart: String, rEnd: String, rId: String,
                         binWidth: Long, cap: Int): DataFrame = {
    val n = fresh((left.columns ++ right.columns).toSet,
      Seq("_bin", "_rbin", "_ls", "_le", "_rs", "_re", "_rk"))
    def binnedCapped(df: DataFrame, s: String, e: String, id: String,
                     ts: String, te: String, bin: String) = df
      .withColumn(ts, col(s)).withColumn(te, col(e))
      .withColumn(bin,
        explode(sequence(expr(s"`$ts` div $binWidth"), expr(s"`$te` div $binWidth"))))
      .withColumn(n("_rk"), org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(bin))
          .orderBy(col(ts), col(id))))
      .where(col(n("_rk")) <= cap).drop(n("_rk"))
    val l = binnedCapped(left, lStart, lEnd, lId, n("_ls"), n("_le"), n("_bin"))
    val r = binnedCapped(right, rStart, rEnd, rId, n("_rs"), n("_re"), n("_rbin"))
    l.join(r,
        l(n("_bin")) === r(n("_rbin")) &&
          col(n("_ls")) <= col(n("_re")) && col(n("_rs")) <= col(n("_le")) &&
          expr(s"greatest(`${n("_ls")}`, `${n("_rs")}`) div $binWidth") === l(n("_bin")))
      .drop(n("_bin"), n("_rbin"), n("_ls"), n("_le"), n("_rs"), n("_re"))
  }

  /** Concurrent sessions: which gap-based sessions overlap in wall-clock
    * time with a session of another user — the session table joined to
    * itself as a fact-fact interval join (1-hour bins over epoch-micro
    * intervals). Per session, the count of concurrent partners; sessions
    * with none are omitted (inner semantics). */
  def concurrentSessions(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    // persisted: both self-join sides read ONE materialization of the
    // session build (otherwise the sessionize window runs twice — the
    // plan dump showed both branches re-deriving it from the fact scan)
    val sess = CsrQueries.eventsSessionize(spark, dir)
      .select(col("user_id"), col("session_seq"),
        unix_micros(col("session_start")).as("start_us"),
        unix_micros(col("session_end")).as("end_us"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .transform(Cached.track)
    val a = sess.toDF("a_user", "a_seq", "a_start", "a_end")
    val b = sess.toDF("b_user", "b_seq", "b_start", "b_end")
    val pairs = overlapPairs(a, "a_start", "a_end", b, "b_start", "b_end", HourUs)
      .where(col("a_user") < col("b_user")) // same-user sessions never overlap (gap-based)
    // r15 (opt, §2.4): credit BOTH endpoints of each pair in ONE pass — the
    // former self-union consumed `pairs` twice, and because each branch
    // prunes a different column pair the subtrees differ, so the whole
    // binned overlap join (the query's cost) executed twice per run (plan
    // held two BroadcastHashJoin+explode subtrees). The explode of a
    // 2-struct array is the same multiset of rows with no second join and
    // no persist barrier (the events_mad_outliers rejection).
    pairs
      .select(explode(array(
        struct(col("a_user").as("user_id"), col("a_seq").as("session_seq")),
        struct(col("b_user").as("user_id"), col("b_seq").as("session_seq")))).as("sd"))
      .groupBy(col("sd.user_id").as("user_id"), col("sd.session_seq").as("session_seq"))
      .agg(count(lit(1)).as("n_concurrent"))
  }

  private val HourUs = 3600000000L

  private val concurrentSessionsSql =
    """WITH e AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |flagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |numbered AS (
      |  SELECT user_id, ts,
      |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM flagged),
      |sess AS (
      |  SELECT user_id, session_seq,
      |    epoch_us(MIN(ts)) AS start_us, epoch_us(MAX(ts)) AS end_us
      |  FROM numbered GROUP BY user_id, session_seq),
      |pairs AS (
      |  SELECT a.user_id AS a_user, a.session_seq AS a_seq,
      |         b.user_id AS b_user, b.session_seq AS b_seq
      |  FROM sess a JOIN sess b
      |    ON a.user_id < b.user_id
      |   AND a.start_us <= b.end_us AND b.start_us <= a.end_us)
      |SELECT user_id, session_seq, COUNT(*) AS n_concurrent
      |FROM (
      |  SELECT a_user AS user_id, a_seq AS session_seq FROM pairs
      |  UNION ALL SELECT b_user, b_seq FROM pairs) x
      |GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  val queries: Map[String, Q] = Map(
    "events_concurrent_sessions" -> Q(concurrentSessions _, concurrentSessionsSql,
      Seq(col("user_id"), col("session_seq"))),
  )
}
