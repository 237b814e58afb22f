package graft

/** Dev helper: print one oracle SQL exactly as Verify dumps it.
  * Usage: sbt "Test/runMain graft.PrintOracle <name>" */
object PrintOracle {
  def main(args: Array[String]): Unit =
    println(SparkEntry.oracleSql(args(0)))
}
