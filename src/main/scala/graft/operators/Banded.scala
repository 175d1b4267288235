package graft.operators

import org.apache.spark.sql.DataFrame

/** Public face of the [[graft.plans.BandedPairs]] custom operator: all id
  * pairs sharing an LSH bucket, emitted directly from one bucket-clustered
  * exchange (no self-join build/probe). See the plan node's scaladoc for
  * semantics and the `maxBucket` scale guard.
  */
object Banded {

  /** df must expose `keyCols` (the bucket key, e.g. band_id + band_hash)
    * and `idCol` (long). Returns (id_a, id_b) with id_a < id_b, one row
    * per bucket collision — callers `.distinct()` for the cross-band
    * union. `maxBucket > 0` drops buckets above the cap (whale guard);
    * 0 keeps the result exactly the self-join's. */
  def pairsExec(df: DataFrame, keyCols: Seq[String], idCol: String, maxBucket: Int = 0): DataFrame = {
    import org.apache.spark.sql.graftbridge.GraftSqlBridge
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    // NULL id / NULL bucket key can never pair; filter BELOW the exchange
    // so dead rows are dropped at the scan instead of being shuffled and
    // sorted first (the exec re-checks, but only as belt and braces)
    val df2 = df.where((idCol +: keyCols).map(c => col(c).isNotNull).reduce(_ && _))
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!classic.experimental.extraStrategies.contains(graft.plans.BandedPairsStrategy))
      classic.experimental.extraStrategies =
        classic.experimental.extraStrategies :+ graft.plans.BandedPairsStrategy
    val plan = GraftSqlBridge.logicalPlan(df2)
    def attr(name: String) = plan.output.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"column $name not in ${plan.output.map(_.name)}"))
    GraftSqlBridge.ofRows(spark,
      graft.plans.BandedPairs(keyCols.map(attr), attr(idCol), maxBucket, plan))
  }
}
