package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source priority entity merge.
  *
  * Re-expresses the reference's sources2csr attribute resolution
  * (test_data_e2e config `sources_config.json`: each entity attribute lists
  * its sources in priority order; the first source with a non-null value
  * wins — see /root/reference/test_data_e2e/xx_archive/test_data_NGS/config/
  * sources_config.json:5-102 for the Individual entity).
  *
  * Spark-first shape: every source is projected to (key, attr...), the
  * sources are chained with full-outer joins on the entity key (one shuffle
  * per source, all co-partitioned on the key — at 100 TB this is the same
  * hash-partitioned merge a MERGE INTO would do), and each attribute becomes
  * `coalesce(src0.attr, src1.attr, ...)` in priority order. Optionally emits
  * `<attr>_src` provenance columns ("src<i>" of the winning source).
  */
object EntityMerge {

  /** @param sources  priority-ordered frames, each containing `key` and any
    *                 subset of `attrs` (missing attrs are treated as null)
    * @param key      entity key column name
    * @param attrs    attribute columns to resolve
    * @param provenance also emit `<attr>_src` winning-source columns
    * @param dedupKeys dedup each source on the entity key first (the
    *                 reference dedups entity keys in sources2csr before
    *                 merging; duplicate keys would otherwise multiply rows
    *                 through the outer joins). Deterministic keep-first by
    *                 attribute value order. The window shuffle is keyed the
    *                 same as the join, so the partitioning is reused.
    */
  def merge(sources: Seq[DataFrame], key: String, attrs: Seq[String],
            provenance: Boolean = false, dedupKeys: Boolean = true): DataFrame = {
    require(sources.nonEmpty, "at least one source")
    val prepared = sources.zipWithIndex.map { case (df, i) =>
      val cols = col(key) +: attrs.map { a =>
        (if (df.columns.contains(a)) col(a) else lit(null)).as(s"${a}__$i")
      }
      val projected = df.select(cols: _*)
      if (!dedupKeys || attrs.isEmpty) projected
      else {
        // keep-first = lexicographic min over the attribute struct: same
        // result as a row_number window ordered by the attrs, but with
        // map-side partial aggregation instead of a full shuffle+sort —
        // the 100 TB-friendly shape (and the agg's hash partitioning on
        // the key is reused by the merge join right after)
        val names = attrs.map(a => s"${a}__$i")
        projected
          .groupBy(col(key))
          .agg(min(struct(names.map(col): _*)).as("__m"))
          .select(col(key) +: names.map(n => col(s"__m.$n").as(n)): _*)
      }
    }
    val joined = prepared.reduce((l, r) => l.join(r, Seq(key), "full_outer"))
    val resolved = attrs.map { a =>
      coalesce(sources.indices.map(i => col(s"${a}__$i")): _*).as(a)
    }
    val prov = if (!provenance) Nil else attrs.map { a =>
      val branches = sources.indices.map(i => (col(s"${a}__$i").isNotNull, lit(s"src$i")))
      branches.tail.foldLeft(when(branches.head._1, branches.head._2)) {
        case (acc, (c, v)) => acc.when(c, v)
      }.as(s"${a}_src")
    }
    joined.select((col(key) +: (resolved ++ prov)): _*)
  }
}
