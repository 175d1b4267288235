package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private def counts(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("uncapped trianglesCapped reproduces the exact per-part counts") {
    val exact = counts(GraphQueries.triangles(spark, dir)) // top-100 view
    val full = counts(GraphQueries.trianglesCapped(spark, dir, Int.MaxValue))
    assert(exact.nonEmpty)
    // the registered query is the top-100 slice of the full counts
    exact.foreach { case (k, v) => assert(full(k) == v, s"part $k") }
  }

  /** Per-order co-purchase pair counts, computed independently in plain
    * Scala from the collected lineitem (200 parts at sf0.001). */
  private lazy val pairCounts: Map[(Long, Long), Int] = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    li.groupBy(_._1).values.flatMap { rows =>
      val s = rows.map(_._2).distinct.sorted
      for (i <- s.indices; j <- i + 1 until s.length) yield (s(i), s(j))
    }.toSeq.groupBy(identity).map { case (k, v) => k -> v.size }
  }

  test("star-contraction components match a driver union-find") {
    val es = pairCounts.filter(_._2 >= 2).keys.toSeq
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
    val groups = parent.keys.toSeq.groupBy(find)
    val expect = groups.values.map(g => g.min -> g.size.toLong).toMap
    val got = GraphQueries.components(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("incremental absorb equals full recontraction") {
    import spark.implicits._
    val all = pairCounts.filter(_._2 >= 2).keys.toSeq.sorted
    assert(all.size >= 4, "need enough backbone edges to split")
    val (h1, h2) = all.splitAt(all.size / 2)
    val df1 = h1.toDF("u", "v")
    val df2 = h2.toDF("u", "v")
    import org.apache.spark.sql.functions.{col, count, lit}
    def sizes(m: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val centers = m.select(col("v").as("node"), col("v").as("comp_id"))
      m.select(col("u").as("node"), col("v").as("comp_id"))
        .unionByName(centers).distinct()
        .groupBy("comp_id").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val full = sizes(GraphQueries.absorbComponents(df1.limit(0), df1.unionByName(df2)))
    val incr = sizes(GraphQueries.absorbComponents(
      GraphQueries.absorbComponents(df1.limit(0), df1), df2))
    assert(incr == full && full.nonEmpty)
  }

  test("bounded sssp matches a driver Bellman-Ford") {
    val wEdges = pairCounts.filter(_._2 >= 2).toSeq.flatMap { case ((a, b), n) =>
      val w = 1000000L / n
      Seq((a, b, w), (b, a, w))
    }
    val source = wEdges.map(_._1).min
    var dist = Map(source -> 0L)
    for (_ <- 1 to 4) {
      val relaxed = wEdges.flatMap { case (u, v, w) => dist.get(u).map(d => v -> (d + w)) }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    }
    val got = GraphQueries.ssspBounded(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == dist && dist.size > 1)
  }

  test("bfs hop profile matches a driver BFS") {
    val adj = pairCounts.keys.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val brandParts = spark.read.parquet(s"$dir/part.parquet")
      .where("p_brand = 'Brand#11'").select("p_partkey")
      .collect().map(_.getLong(0)).toSet
    var frontier = brandParts.intersect(adj.keySet)
    var visited = frontier
    val hist = scala.collection.mutable.Map(0 -> frontier.size.toLong)
    for (k <- 1 to 3) {
      val next = frontier.flatMap(adj(_)) -- visited
      if (next.nonEmpty) hist(k) = next.size.toLong
      visited ++= next; frontier = next
    }
    val got = GraphQueries.bfsHops(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == hist.toMap)
  }

  test("degree histogram matches a driver recompute over the full graph") {
    val deg = pairCounts.keys.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (_, v) => v.size }
    val expect = deg.groupBy(identity).map { case (d, v) => d.toLong -> v.size.toLong }
    val got = GraphQueries.degreeHist(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect && expect.nonEmpty)
    // histogram masses sum to |V|
    assert(got.values.sum == deg.size)
  }

  test("bounded k-core peel matches a driver peel at the same rounds") {
    var sym = pairCounts.filter(_._2 >= 2).keys.toSeq
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
    for (_ <- 1 to 4) {
      val deg = sym.groupBy(_._1).map { case (k, v) => k -> v.size }
      val keep = deg.filter(_._2 >= 3).keySet
      sym = sym.filter { case (u, v) => keep(u) && keep(v) }
    }
    val expect = sym.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val got = GraphQueries.kcore(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // every survivor of a CONVERGED peel keeps core degree; if the peel
    // has reached its fixpoint at this scale, all survivors have deg >= k
    val oneMore = {
      val deg = sym.groupBy(_._1).map { case (k, v) => k -> v.size }
      val keep = deg.filter(_._2 >= 3).keySet
      sym.filter { case (u, v) => keep(u) && keep(v) }
    }
    assert(oneMore.toSet == sym.toSet, "peel not converged at 4 rounds at sf0.001")
  }

  /** Driver recompute of the top-k neighbor-jaccard lists with the given
    * center cap (cap = MaxValue ⇒ exact). */
  private def driverJaccard(cap: Int): Map[(Long, Long), (Long, Long, Long)] = {
    val adj = pairCounts.keys.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val common = scala.collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
    adj.foreach { case (_, ns) =>
      val capped = ns.toSeq.sorted.take(cap)
      for (i <- capped.indices; j <- i + 1 until capped.length)
        common((capped(i), capped(j))) += 1
    }
    val directed = common.toSeq.flatMap { case ((a, b), c) => Seq((a, b, c), (b, a, c)) }
    directed.groupBy(_._1).flatMap { case (n, cands) =>
      cands.map { case (_, c, com) =>
        (c, com, com * 1000 / (adj(n).size + adj(c).size - com))
      }.sortBy { case (c, com, jpm) => (-jpm, -com, c) }
        .take(5).zipWithIndex
        .map { case ((c, com, jpm), i) => (n, (i + 1).toLong) -> ((c, com, jpm)) }
    }.toMap
  }

  test("top-k neighbor jaccard matches the capped driver recompute; uncapped form exact") {
    val got = GraphQueries.jaccardNeighbors(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == driverJaccard(24) && got.nonEmpty)
    val gotExact = GraphQueries.jaccardNeighborsCapped(spark, dir, Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(gotExact == driverJaccard(Int.MaxValue))
  }

  test("negative samples match a driver recompute and never collide with edges") {
    val edges = pairCounts.filter(_._2 >= 2).keys.toSet
    val symSet = edges.flatMap { case (a, b) => Set((a, b), (b, a)) }
    val nodes = symSet.map(_._1)
    val maxPk = spark.read.parquet(s"$dir/part.parquet")
      .agg(org.apache.spark.sql.functions.max("p_partkey")).head().getLong(0)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = (for {
      u <- nodes.toSeq; i <- 0 until 4
      cand = java.lang.Long.parseLong(md5hex(s"$u#$i").take(8), 16) % (maxPk + 1)
      if nodes(cand) && cand != u && !symSet((u, cand))
    } yield (u, i, cand)).toSet
    val got = GraphQueries.negativeSamples(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expect && got.nonEmpty)
    got.foreach { case (u, _, w) => assert(!symSet((u, w)) && nodes(w) && w != u) }
  }

  test("personalized pagerank matches a driver power iteration; seeds dominate") {
    // driver recompute with the same integer lane: scaled ranks,
    // truncating div, teleport only at seed nodes (part % 100 == 0)
    val sym = pairCounts.keys.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val outdeg = sym.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    val scale = 1000000000000L
    val teleport = scale * 15L / 100L
    var r = outdeg.keys.map(n => n -> (if (n % 100 == 0) scale else 0L)).toMap
    for (_ <- 1 to 4) {
      val in = sym.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / outdeg(src) }.sum
      }
      r = outdeg.keys.map { n =>
        n -> ((if (n % 100 == 0) teleport else 0L) + 85L * in.getOrElse(n, 0L) / 100L)
      }.toMap
    }
    val want = r.toSeq.sortBy { case (n, v) => (-v, n) }.take(50)
    val got = GraphQueries.queries("graph_ppr").fn(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(got.sortBy { case (n, v) => (-v, n) } == want)
    assert(got.map(_._2).max > 0)
    // the top of the PPR list is seed-biased: at least one seed in top-10
    assert(got.take(10).exists(_._1 % 100 == 0))
  }

  test("cusum closed form equals the sequential recursion (driver recompute)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val daily = graft.sources.Tables(dir).events
      .selectExpr("event_type", "unix_micros(ts) div 86400000000 AS day")
      .groupBy("event_type", "day").count()
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    val want = daily.groupBy(_._1).toSeq.flatMap { case (tpe, rows) =>
      val ordered = rows.sortBy(_._2).toSeq
      val tot = ordered.map(_._3).sum
      val mean = 1000L * tot / ordered.length
      var sRun = 0L
      ordered.map { case (_, day, n) =>
        val y = 1000L * n - mean - 500L
        sRun = math.max(0L, sRun + y) // Page's recursion, literally
        (tpe, day) -> ((n, sRun, sRun > 5000L))
      }
    }
    val got = EventAnalytics.queries("events_cusum_alarm").fn(spark, dir)
      .collect().map(x => (x.getString(0), x.getLong(1)) ->
        ((x.getLong(2), x.getLong(3), x.getBoolean(4)))).toMap
    assert(got.nonEmpty && got == want.toMap)
  }

  test("node-broadcast gate: broadcast inside the budget, keyed join beyond it, rows identical") {
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    // inside the budget: the deg lookups broadcast
    val small = GraphQueries.jaccardNeighborsCapped(spark, dir, 24, broadcastMax = Long.MaxValue)
    assert(planOf(small).contains("BroadcastHashJoin"))
    // beyond the budget (forced with a zero budget): no broadcast of the
    // deg table — the keyed fallback regime
    val big = GraphQueries.jaccardNeighborsCapped(spark, dir, 24, broadcastMax = 0L)
    // results must be identical either way
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(small) == rows(big) && rows(small).nonEmpty)
    // same contract for the negative sampler's node-set membership join
    val nsSmall = GraphQueries.negativeSamplesGated(spark, dir, Long.MaxValue)
    val nsBig = GraphQueries.negativeSamplesGated(spark, dir, 0L)
    assert(rows(nsSmall) == rows(nsBig) && rows(nsSmall).nonEmpty)
  }

  test("whale cap only ever undercounts, and monotonically in the cap") {
    val full = counts(GraphQueries.trianglesCapped(spark, dir, Int.MaxValue))
    val c8 = counts(GraphQueries.trianglesCapped(spark, dir, 8))
    val c32 = counts(GraphQueries.trianglesCapped(spark, dir, 32))
    assert(c8.nonEmpty)
    c8.foreach { case (k, v) => assert(v <= c32(k), s"cap 8 beat cap 32 on part $k") }
    c32.foreach { case (k, v) => assert(v <= full(k), s"cap overcounted part $k") }
    assert(c8.values.sum <= c32.values.sum && c32.values.sum <= full.values.sum)
  }

  test("weighted label propagation matches a synchronous driver recompute") {
    val sym = pairCounts.filter(_._2 >= 2).toSeq.flatMap { case ((a, b), w) =>
      Seq((a, b, w.toLong), (b, a, w.toLong))
    }
    var lbl = sym.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to 5) {
      val prev = lbl
      lbl = sym.groupBy(_._2).map { case (dst, es) =>
        val votes = es.groupBy(e => prev(e._1)).view.mapValues(_.map(_._3).sum)
        dst -> votes.toSeq.minBy { case (l, v) => (-v, l) }._1
      }
    }
    val expect = lbl.groupBy(_._2).map { case (c, m) => c -> m.size.toLong }
    val got = GraphQueries.labelProp(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect && got.nonEmpty)
  }

  test("HITS integer fixed-point matches a BigInt driver recompute") {
    val dirE = pairCounts.keys.toSeq.sorted // (a, b) with a < b = the orientation
    val S = BigInt(1000000000000L)
    var h = dirE.map(_._1).distinct.map(n => n -> S).toMap
    var a = Map.empty[Long, BigInt]
    for (_ <- 1 to 4) {
      val ar = dirE.groupBy(_._2).view.mapValues(_.map(e => h(e._1)).sum).toMap
      val amx = ar.values.max
      a = ar.view.mapValues(v => v * S / amx).toMap
      val hr = dirE.groupBy(_._1).view.mapValues(_.map(e => a(e._2)).sum).toMap
      val hmx = hr.values.max
      h = hr.view.mapValues(v => v * S / hmx).toMap
    }
    val expect = (a.keySet ++ h.keySet).toSeq
      .map(n => (n, a.getOrElse(n, BigInt(0)).toLong, h.getOrElse(n, BigInt(0)).toLong))
      .sortBy { case (n, au, hu) => (-au, -hu, n) }.take(50)
    val got = GraphQueries.hits(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
  }
}
