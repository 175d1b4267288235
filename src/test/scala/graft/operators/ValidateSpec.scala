package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ValidateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("each rule kind flags exactly its violators") {
    val df = Seq[(Long, Option[String], Option[String], Option[Double])](
      (1L, Some("ok"), Some("A"), Some(5.0)),   // clean
      (2L, None, Some("A"), Some(5.0)),         // required violation
      (3L, Some("ok"), Some("X"), Some(5.0)),   // in_set violation
      (4L, Some("ok"), Some("B"), Some(99.0)),  // in_range violation
      (5L, Some("ok"), None, None),             // nulls pass in_set/in_range
    ).toDF("id", "name", "code", "v")
    val out = Validate.violations(df, "id", Seq(
        Validate.Required("name"),
        Validate.InSet("code", Seq("A", "B")),
        Validate.InRange("v", 0.0, 10.0)))
      .select("record_key", "column", "rule").as[(Long, String, String)]
      .collect().toSet
    assert(out == Set(
      (2L, "name", "required"),
      (3L, "code", "in_set"),
      (4L, "v", "in_range")))
  }

  test("a record can violate several rules at once") {
    val df = Seq[(Long, Option[String], Option[Double])]((1L, None, Some(-3.0)))
      .toDF("id", "name", "v")
    val out = Validate.violations(df, "id", Seq(
        Validate.Required("name"), Validate.InRange("v", 0.0, 1.0)))
      .select("rule").as[String].collect().sorted.toSeq
    assert(out == Seq("in_range", "required"))
  }
}
