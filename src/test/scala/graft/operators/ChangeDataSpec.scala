package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the change-data family — properties the DuckDB
  * oracle equality can't articulate (tiling, conservation, monotonicity). */
class ChangeDataSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001
  import spark.implicits._

  test("scd2 versions tile each user's timeline with no gaps or overlaps") {
    val rows = ChangeData.scd2(spark, dir)
      .select("user_id", "state", "valid_from", "valid_to")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), Option(r.getTimestamp(3))))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (user, vs) =>
      val sorted = vs.sortBy(_._3.getTime)
      // exactly one open (current) version, and it is the last
      assert(sorted.count(_._4.isEmpty) == 1 && sorted.last._4.isEmpty, s"user $user")
      // each closed version ends exactly where the next begins
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"user $user: gap/overlap at ${a._4} -> ${b._3}")
          // consecutive versions always change state (runs were collapsed)
          assert(a._2 != b._2, s"user $user: uncollapsed run of ${a._2}")
        case _ =>
      }
    }
  }

  test("cdc apply: deletes drop, updates take the latest order's value, rest pass through") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val t = graft.sources.Tables(dir)
    val got = ChangeData.cdcApply(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getString(3))).toMap
    val latest = t.orders
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)))
      .where(col("rn") === 1)
      .select("o_custkey", "o_orderstatus", "o_totalprice")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val base = t.customer.select("c_custkey", "c_acctbal")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    base.foreach { case (key, bal) =>
      latest.get(key) match {
        case Some(("F", _)) => assert(!got.contains(key), s"deleted key $key survived")
        case Some((_, price)) => assert(got(key) == ((price, "U")), s"key $key not updated")
        case None => assert(got(key) == ((bal, "K")), s"untouched key $key changed")
      }
    }
    assert(got.keySet == base.keySet -- latest.filter(_._2._1 == "F").keySet)
  }

  test("gapfill: contiguous per-user days, event conservation, fill carries last observation") {
    val t = graft.sources.Tables(dir)(spark)
    val got = ChangeData.gapfill(spark, dir)
      .select("user_id", "day", "n_events", "value_ffill").collect()
      .map(r => (r.getLong(0), r.getDate(1), r.getLong(2), r.getDouble(3)))
    val byUser = got.groupBy(_._1)
    byUser.foreach { case (user, days) =>
      val ds = days.map(_._2.toLocalDate).sortBy(_.toEpochDay)
      ds.sliding(2).foreach {
        case Array(a, b) => assert(b.toEpochDay == a.toEpochDay + 1, s"user $user gap $a -> $b")
        case _ =>
      }
    }
    // every raw event lands in exactly one day row
    assert(got.map(_._3).sum == t.events.count())
    // fill days (n_events == 0) repeat the previous day's value
    byUser.foreach { case (user, days) =>
      days.sortBy(_._2.getTime).sliding(2).foreach {
        case Array(prev, cur) if cur._3 == 0 =>
          assert(cur._4 == prev._4, s"user $user: fill day ${cur._2} broke the carry")
        case _ =>
      }
    }
  }

  test("incremental gap-fill: split-batch merge renders identically to the one-shot") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val events = graft.sources.Tables(dir).events
    // split by event id parity — both halves carry late/out-of-order days
    val b1 = events.where(col("event_id") % 2 === 0)
    val b2 = events.where(col("event_id") % 2 === 1)
    val incremental = ChangeData.renderGapfill(
      ChangeData.mergeDaily(ChangeData.dailyState(b1), b2))
      .collect().map(_.toSeq).toSet
    val oneShot = ChangeData.gapfill(spark, dir).collect().map(_.toSeq).toSet
    assert(incremental == oneShot && oneShot.nonEmpty)
    // second-level increment: fold b2 in two sub-batches — associativity
    val b2a = b2.where(col("event_id") % 4 === 1)
    val b2b = b2.where(col("event_id") % 4 === 3)
    val twice = ChangeData.renderGapfill(
      ChangeData.mergeDaily(ChangeData.mergeDaily(ChangeData.dailyState(b1), b2a), b2b))
      .collect().map(_.toSeq).toSet
    assert(twice == oneShot)
  }

  test("backlog: conservation (final backlog zero), never negative, net sums to zero") {
    val rows = ChangeData.orderBacklog(spark, dir)
      .orderBy("day").select("net", "backlog").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._1).sum == 0L)
    rows.foreach { case (_, b) => assert(b >= 0L) }
    assert(rows.last._2 == 0L)
  }

  test("incremental backlog: split lineitem batches merge to the one-shot series") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val t = graft.sources.Tables(dir)
    // parity split cuts ORDERS ACROSS batches: an order's later lines can
    // extend its done_day, exercising the max-merge
    val b1 = t.lineitem.where(col("l_linenumber") % 2 === 0)
    val b2 = t.lineitem.where(col("l_linenumber") % 2 === 1)
    val merged = ChangeData.mergeSpans(
      ChangeData.spanState(b1, t.orders), ChangeData.spanState(b2, t.orders))
    val incremental = ChangeData.renderBacklog(merged).collect().map(_.toSeq).toSet
    val oneShot = ChangeData.orderBacklog(spark, dir).collect().map(_.toSeq).toSet
    assert(incremental == oneShot && oneShot.nonEmpty)
  }

  test("fuzzy linkage: canonical name order, distance in 1..2, block soundness, counts conserve") {
    val rows = Linkage.fuzzyParts(spark, dir)
      .select("name_a", "name_b", "dist", "n_parts_a", "n_parts_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val p = graft.sources.Tables(dir)(spark).part
      .groupBy("p_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (na, nb, d, ca, cb) =>
      assert(na < nb)
      assert(d >= 1 && d <= 2, s"$na/$nb dist $d")
      assert(na.split(" ")(1) == nb.split(" ")(1), s"cross-block pair $na / $nb")
      // carried part counts match the catalog exactly
      assert(p(na) == ca && p(nb) == cb)
    }
  }
}
