package graft

/** Scratch: (re)build the planted corpus at its fixed path for manual
  * triage with OneOff / duckdb (not a ScalaTest suite). */
object PlantedBuild {
  def main(args: Array[String]): Unit = {
    PlantedCorpus.ensure(TestSpark.spark)
    println(s"planted at ${PlantedCorpus.fixedPath}")
    TestSpark.spark.stop()
  }
}
