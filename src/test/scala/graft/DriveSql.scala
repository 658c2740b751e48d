package graft

// manual drive: SQL functions registered via spark.sql.extensions
object DriveSql {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("drive-sql", "local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("SQL_DOT_LONG=" + spark.sql("SELECT graft_dot_long(array(1L,2L,3L), array(4L,5L,6L)) AS d").head())
    println("SQL_DOT_FLOAT=" + spark.sql("SELECT graft_dot_float(array(CAST(1.5 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS d").head())
    println("DESCRIBE=" + spark.sql("DESCRIBE FUNCTION graft_dot_long").collect().mkString(" | "))
    // misuse probe: wrong types
    try spark.sql("SELECT graft_dot_long(array('a'), array('b'))").head()
    catch { case e: Exception => println("TYPE_ERR=" + e.getMessage.linesIterator.next()) }
    spark.stop()
  }
}
