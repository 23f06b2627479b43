package graft.tools

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Text
import graft.sinks.JdbcSink

/** Scratch driver (dev tool): DB-to-DB word count through the JDBC
  * incrementing source and the idempotent JDBC upsert sink against an
  * in-memory Derby instance, printing the sink table after each phase.
  */
object JdbcDemo {
  def main(args: Array[String]): Unit = {
    val url = s"jdbc:derby:memory:demo${System.nanoTime()};create=true"
    def exec(sql: String): Unit = {
      val c = DriverManager.getConnection(url)
      try c.createStatement().execute(sql) finally c.close()
    }
    def dump(label: String): Unit = {
      val c = DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery("SELECT word, cnt FROM WC_OUT ORDER BY cnt DESC, word")
        val b = new StringBuilder(s"$label: ")
        while (rs.next()) b.append(s"${rs.getString(1)}=${rs.getLong(2)} ")
        println(b)
      } finally c.close()
    }

    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    exec("CREATE TABLE IN_T (id INT NOT NULL GENERATED ALWAYS AS IDENTITY (START WITH 1, INCREMENT BY 1), lines VARCHAR(256))")
    exec("CREATE TABLE WC_OUT (word VARCHAR(256) NOT NULL PRIMARY KEY, cnt BIGINT)")
    exec("INSERT INTO IN_T (lines) VALUES ('To be, or not to be,--that is the question:--')")
    exec("INSERT INTO IN_T (lines) VALUES ('Whether tis nobler in the mind to suffer')")

    val src = spark.readStream.format("graft.sources.JdbcIncrementingSource")
      .schema("id INT, lines STRING")
      .option("url", url).option("table", "IN_T")
      .option("incrementingColumn", "id").load()
    val q = JdbcSink.writeStream(
      Text.wordCount(src.select(col("lines").as("text")), "text"),
      url, "WC_OUT", Seq("word"),
      Files.createTempDirectory("jdbc_demo_ckpt_").toString)

    q.processAllAvailable(); dump("after lines 1-2")
    exec("INSERT INTO IN_T (lines) VALUES ('The slings and arrows of outrageous fortune')")
    exec("INSERT INTO IN_T (lines) VALUES ('Or to take arms against a sea of troubles,')")
    q.processAllAvailable(); dump("after lines 3-4")
    println("progress numInputRows: " +
      q.recentProgress.map(_.numInputRows).mkString(","))
    q.stop(); spark.stop()
  }
}
