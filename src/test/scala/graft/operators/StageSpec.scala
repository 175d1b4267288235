package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class StageSpec extends AnyFunSuite {

  private def tmpFile(content: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempFile("graft_stage_src", ".dat")
    java.nio.file.Files.write(p, content.getBytes("UTF-8"))
    p
  }

  test("current is false before record, true after, false once the source changes") {
    val src = tmpFile("v1")
    val stage = java.nio.file.Files.createTempDirectory("graft_stage").toString
    assert(!Stage.current(stage, src.toString))
    Stage.record(stage, src.toString)
    assert(Stage.current(stage, src.toString))
    // change the source (content + mtime): the stage must invalidate
    Thread.sleep(5)
    java.nio.file.Files.write(src, "v2-longer".getBytes("UTF-8"))
    assert(!Stage.current(stage, src.toString))
    Stage.record(stage, src.toString)
    assert(Stage.current(stage, src.toString))
  }

  test("a recorded signature does not survive the stage dir being deleted") {
    val src = tmpFile("v1")
    val stageDir = java.nio.file.Files.createTempDirectory("graft_stage2")
    Stage.record(stageDir.toString, src.toString)
    assert(Stage.current(stageDir.toString, src.toString))
    java.nio.file.Files.delete(stageDir)
    assert(!Stage.current(stageDir.toString, src.toString))
  }

  test("directory sources fold every part file into the signature") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_stage_srcdir")
    java.nio.file.Files.write(srcDir.resolve("part-0"), "a".getBytes)
    java.nio.file.Files.write(srcDir.resolve("part-1"), "b".getBytes)
    val stage = java.nio.file.Files.createTempDirectory("graft_stage3").toString
    Stage.record(stage, srcDir.toString)
    assert(Stage.current(stage, srcDir.toString))
    Thread.sleep(5)
    java.nio.file.Files.write(srcDir.resolve("part-1"), "bb".getBytes)
    assert(!Stage.current(stage, srcDir.toString))
  }
}
