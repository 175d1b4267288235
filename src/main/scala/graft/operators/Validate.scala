package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Config-driven record validation (reference: sources2csr validates the
  * CSR entity model — required fields, coded-value domains, referential
  * shape — and reports violations rather than silently dropping rows).
  *
  * Each rule compiles to one boolean Column; the validator emits one row
  * per (record, violated rule) via a narrow stack() — the same shape as
  * [[EavMelt]], so a 100 TB validation pass is a single scan with
  * map-side explode and no shuffle (callers aggregate the report as
  * needed).
  */
object Validate {

  sealed trait Rule { def name: String; def column: String }
  /** Column must be non-null. */
  final case class Required(column: String) extends Rule { val name = "required" }
  /** Column value must be one of `allowed`. */
  final case class InSet(column: String, allowed: Seq[String]) extends Rule { val name = "in_set" }
  /** Numeric column must lie in [min, max]. */
  final case class InRange(column: String, min: Double, max: Double) extends Rule { val name = "in_range" }

  private def violated(r: Rule): Column = r match {
    case Required(c) => col(c).isNull
    case InSet(c, allowed) => col(c).isNotNull && !col(c).isin(allowed: _*)
    case InRange(c, lo, hi) =>
      col(c).isNotNull && (col(c).cast("double") < lo || col(c).cast("double") > hi)
  }

  /** One row per violation: (key, column, rule, offending value as string). */
  def violations(df: DataFrame, keyCol: String, rules: Seq[Rule]): DataFrame = {
    val reports = rules.map { r =>
      when(violated(r), struct(
        lit(r.column).as("column"),
        lit(r.name).as("rule"),
        col(r.column).cast("string").as("value")))
    }
    df.select(col(keyCol).as("record_key"), explode(array(reports: _*)).as("v"))
      .where(col("v").isNotNull)
      .select(col("record_key"), col("v.column").as("column"),
        col("v.rule").as("rule"), col("v.value").as("value"))
  }
}
