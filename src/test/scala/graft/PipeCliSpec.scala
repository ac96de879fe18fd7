package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.PipeOp
import java.nio.file.Files
import java.nio.charset.StandardCharsets

class PipeCliSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pipeBinary: per-row external process, binary-safe round trip") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](70000)(i => (i % 251).toByte)
    val ds = Seq(("a", payload), ("b", "hello".getBytes)).toDS()
    val out = PipeOp.pipeBinary(ds, (_: String) => Seq("cat"))
      .collect().toMap
    assert(java.util.Arrays.equals(out("a"), payload)) // > pipe buffer
    assert(new String(out("b")) == "hello")
  }

  test("pipeBinary: argv can depend on the row key") {
    import spark.implicits._
    val ds = Seq(("upper", "abc".getBytes), ("lower", "ABC".getBytes)).toDS()
    val out = PipeOp.pipeBinary(ds, (k: String) =>
      if (k == "upper") Seq("tr", "a-z", "A-Z") else Seq("tr", "A-Z", "a-z"))
      .collect().toMap
    assert(new String(out("upper")) == "ABC")
    assert(new String(out("lower")) == "abc")
  }

  test("runProcess: non-zero exit raises") {
    intercept[java.io.IOException] {
      PipeOp.runProcess(Seq("false"), Array.empty)
    }
  }

  test("CLI align estimated: bible json → alignment JSON tree") {
    val bible =
      """{"Gen": [[["בְּרֵאשִׁית","בָּרָא"],["וְהָאָרֶץ"]]],
        |"Rut": [[["וַיְהִי"]]]}""".stripMargin
    val f = Files.createTempFile("bible", ".json")
    Files.write(f, bible.getBytes(StandardCharsets.UTF_8))
    val out = Files.createTempDirectory("cli_out")
    graft.cli.Main.main(Array("align", f.toString, out.toString))
    val books = new java.io.File(out.toString).listFiles()
      .filter(_.getName.startsWith("book=")).map(_.getName).sorted
    assert(books.toSeq == Seq("book=Gen", "book=Rut"))
    val back = spark.read.json(s"$out/book=Gen")
    assert(back.count() == 1)
    assert(back.select("verse_count").collect().head.getLong(0) == 2)
  }

  test("CLI align greedy uses the fake transcriber end-to-end") {
    val bible = """{"Gen": [[["שָׁלוֹם","עוֹלָם"]]]}"""
    val f = Files.createTempFile("bible2", ".json")
    Files.write(f, bible.getBytes(StandardCharsets.UTF_8))
    val out = Files.createTempDirectory("cli_out2")
    graft.cli.Main.main(Array("align", f.toString, out.toString, "greedy"))
    val back = spark.read.json(s"$out/book=Gen")
    // fake transcriber echoes reference words → all matched at 0.9
    val conf = back.selectExpr("verses[0].words[0].confidence")
      .collect().head.getDouble(0)
    assert(conf == 0.9)
  }
}
