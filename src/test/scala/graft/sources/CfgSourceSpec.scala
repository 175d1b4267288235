package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Cfg/INI ingestion pinned against the syntax features the reference's
  * cfg-samples exercise: inline comments, empty values, backslash
  * values, numeric fields, multi-section layouts, duplicate-key
  * last-wins, and the configparser error modes. */
class CfgSourceSpec extends AnyFunSuite {

  private val emailCfg =
    """[global]
      |log_file=/var/log/pipeline.log
      |
      |[email]
      |receiver=  # CHANGE ME
      |sender=notifications@example.org  # CHANGE ME
      |prefix=[Registry Loading Pipeline]
      |
      |[smtp]
      |port=587
      |username=notifications@example.org
      |password=<password>  # CHANGE ME
      |host=smtp.example.org
      |""".stripMargin

  private val pipelineCfg =
    """[scheduler]
      |record_task_history=True
      |# remove delay raised to one day
      |remove_delay=86400
      |
      |[GlobalConfig]
      |## absolute paths only
      |drop_dir=/srv/drop/drop_zone
      |data_repo_dir=/srv/pipeline/data
      |working_dir=/srv/pipeline/work
      |study_id=REG_STUDY
      |top_node=\Registry Root\
      |
      |[retcode]
      |already_running=10
      |task_failed=30
      |""".stripMargin

  test("email-shape cfg parses: inline comments stripped, empty values kept") {
    val e = CfgSource.emailConfig(emailCfg)
    assert(e.receiver == "")
    assert(e.sender == "notifications@example.org")
    assert(e.prefix == "[Registry Loading Pipeline]")
    assert(e.smtpHost == "smtp.example.org" && e.smtpPort == 587)
    assert(CfgSource.sections(emailCfg)("smtp")("password") == "<password>")
  }

  test("pipeline-shape cfg: backslash values, numerics, GlobalConfig binding") {
    val s = CfgSource.sections(pipelineCfg)
    assert(s("GlobalConfig")("top_node") == "\\Registry Root\\")
    assert(s("retcode")("task_failed") == "30")
    assert(CfgSource.globalPaths(pipelineCfg) ==
      (("/srv/drop/drop_zone", "/srv/pipeline/data", "/srv/pipeline/work")))
  }

  test("configparser semantics: key case-fold, last-wins, hash inside value") {
    val s = CfgSource.sections(
      "[a]\nKeY=1\nkey=2\ncolor=#ff0000\nurl: http://x/#frag\n")
    assert(s("a")("key") == "2")
    // no whitespace before '#': it is value text
    assert(s("a")("color") == "#ff0000" && s("a")("url") == "http://x/#frag")
  }

  test("error modes: key outside section, unterminated header") {
    intercept[RuntimeException](CfgSource.parse("key=1\n[a]\n"))
    intercept[IllegalArgumentException](CfgSource.parse("[a\nkey=1\n"))
  }

  test("globalPaths reports missing keys by section and key, not a raw map error") {
    val e = intercept[RuntimeException](
      CfgSource.globalPaths("[GlobalConfig]\ndata_repo_dir = /x\nworking_dir = /y\n"))
    assert(e.getMessage.contains("missing drop_dir in [GlobalConfig]"), e.getMessage)
  }

  test("the landed-table view joins like any table") {
    val df = CfgSource.toDf(TestSpark.spark, pipelineCfg)
    assert(df.columns.toSeq == Seq("section", "key", "value"))
    assert(df.where("section = 'GlobalConfig'").count() == 5)
    assert(df.count() == CfgSource.parse(pipelineCfg).size)
  }
}
