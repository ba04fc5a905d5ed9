package graft

import org.scalatest.funsuite.AnyFunSuite

class JsonBlocksV2Spec extends AnyFunSuite with SparkSuite {

  private def writeFile(dir: java.io.File, name: String, body: String): Unit = {
    val f = new java.io.File(dir, name)
    java.nio.file.Files.writeString(f.toPath, body)
    ()
  }

  test("V2 connector: one row per object, braces in strings survive, provenance per file") {
    val dir = java.nio.file.Files.createTempDirectory("jb_v2_").toFile
    // file a: two objects back to back, one spanning lines, with a
    // brace INSIDE a string value (the classic tokenizer trap)
    writeFile(dir, "a.json",
      """{"id":1,"msg":"open { not a block"}{
        |  "id": 2,
        |  "nested": {"k": "v"}
        |}""".stripMargin)
    writeFile(dir, "b.json", """{"id":3}""")
    writeFile(dir, "_SUCCESS", "ignored")

    val df = spark.read.format("graft.sources.JsonBlocksSource")
      .load(dir.getAbsolutePath)
    val rows = df.collect()
    assert(rows.length === 3)
    // files are the parallelism unit — one partition per data file,
    // metadata files skipped
    assert(df.rdd.getNumPartitions === 2)
    val byFile = rows.groupBy(_.getAs[String]("src_file")
      .split("/").last)
    assert(byFile("a.json").length === 2)
    assert(byFile("b.json").length === 1)
    // blocks parse back to the objects, including the trap string
    import spark.implicits._
    val parsed = spark.read.json(
      df.select("block").collect().map(_.getString(0)).toSeq.toDS())
    assert(parsed.count() === 3)
    assert(parsed.where("msg = 'open { not a block'").count() === 1)
    assert(parsed.where("nested.k = 'v'").count() === 1)
  }
}
