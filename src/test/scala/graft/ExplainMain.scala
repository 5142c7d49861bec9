package graft

/** Dev tool: print the formatted physical plan of registered queries —
  * `sbt "Test/runMain graft.ExplainMain <sfDir> <query>..."`. Used for
  * the per-round plan audits (pushdown/broadcast/shuffle review).
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args(0)
    args.drop(1).foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
  }
}
