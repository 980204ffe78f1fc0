package graft

/** Single loader for the tab-separated golden snapshot files — shared by
  * OutputSchemaSpec and StatsPlanSpec so the parsing contract (UTF-8,
  * `name\tvalue`, blank lines skipped) lives in exactly one place. */
object GoldenFiles {
  def load(resource: String): Map[String, String] = {
    val stream = getClass.getResourceAsStream(resource)
    require(stream != null,
      s"golden resource $resource missing from the test classpath — " +
        "regenerate with `sbt \"runMain graft.SchemaGolden\"`")
    val src = scala.io.Source.fromInputStream(stream, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val Array(name, value) = line.split("\t", 2)
      name -> value
    }.toMap
    finally src.close()
  }
}
