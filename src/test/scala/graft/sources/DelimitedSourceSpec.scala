package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class DelimitedSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("per-file delimiter + per-column date formats + nulls") {
    val dir = Files.createTempDirectory("graft-delim")
    Files.write(dir.resolve("data.csv"),
      """id;born;score;label
        |1;03.02.2020;1.5;alpha
        |2;;2.25;beta
        |3;31.12.1999;;
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val cfg = DelimitedConfig(
      delimiter = ";", header = true,
      columns = Seq(
        ColSpec("id", "long"),
        ColSpec("born", "date", Some("dd.MM.yyyy")),
        ColSpec("score", "double"),
        ColSpec("label", "string")))
    val out = DelimitedSource.read(spark, dir.toString, cfg)
    assert(out.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq("id" -> "bigint", "born" -> "date", "score" -> "double", "label" -> "string"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getDate(1).toString == "2020-02-03") // dd.MM.yyyy honored
    assert(rows(1).isNullAt(1) && rows(1).getDouble(2) == 2.25)
    assert(rows(2).isNullAt(2) && rows(2).isNullAt(3))
  }

  test("date column without a format is rejected up front") {
    val cfg = DelimitedConfig(";", header = true, columns = Seq(ColSpec("d", "date")))
    assertThrows[IllegalArgumentException] {
      DelimitedSource.read(spark, "/nonexistent", cfg).schema
    }
  }
}
