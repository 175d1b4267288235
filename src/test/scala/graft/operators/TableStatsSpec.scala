package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** ANALYZE-style table stats pinned against a driver recompute: the md5
  * register/rho assignment, the integer harmonic sum, the linear-counting
  * switch, and the exact count/width columns. */
class TableStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("table stats match a driver recompute of counts, widths, and HLL") {
    val rows = spark.read.parquet(s"${TestSpark.Sf0001}/lineitem.parquet")
      .selectExpr("CAST(l_orderkey AS STRING)", "CAST(l_partkey AS STRING)",
        "CAST(l_suppkey AS STRING)", "CAST(l_linenumber AS STRING)",
        "l_returnflag", "l_linestatus").collect()
    val names = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_returnflag", "l_linestatus")
    val m = 256
    val numerator = 0.7213 / (1.0 + 1.079 / m) * m.toDouble * m * (1L << 53).toDouble
    val expect = names.zipWithIndex.map { case (name, i) =>
      val vals = rows.map(_.getString(i))
      val regs = vals.distinct.map { v =>
        val h = md5hex(v)
        val reg = java.lang.Long.parseLong(h.substring(0, 2), 16)
        val tail = java.lang.Long.parseLong(h.substring(2, 15), 16)
        val rho = if (tail == 0) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(tail))
        (reg, rho)
      }.groupBy(_._1).map { case (r, rs) => r -> rs.map(_._2).max }
      val harmonic = regs.values.map(rho => 1L << (53 - rho)).sum +
        (m - regs.size).toLong * (1L << 53)
      val zeroRegs = m - regs.size
      val raw = numerator / harmonic.toDouble
      val est = if (zeroRegs > 0 && raw <= 2.5 * m)
        m * math.log(m.toDouble / zeroRegs) else raw
      (name, vals.length.toLong, 0L, 0L,
        vals.map(_.length.toLong).sum * 1000 / vals.length,
        vals.distinct.length.toLong,
        BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)
    val got = StorageQueries.tableStats(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq.sortBy(_._1)
    assert(got == expect)
    // the estimate is an estimate — but within the 3-sigma HLL band
    got.foreach { t =>
      assert(math.abs(t._7 - t._6) <= math.max(3 * 1.04 / math.sqrt(m) * t._6, 1.0))
    }
  }
}
