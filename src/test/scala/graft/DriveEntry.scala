package graft

// scratch: driver-contract smoke of SparkEntry.entry (rows > 0)
object DriveEntry {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("entry-smoke", "local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$n")
    spark.stop()
  }
}
