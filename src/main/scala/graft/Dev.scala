package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch driver for timing individual operators during development.
  * Not part of the driver contract. Usage: runMain graft.Dev <what> [sfDir]
  */
object Dev {
  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("minhash")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dev] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    what match {
      case "minhash" =>
        val docs = Tables.documents(spark, sfDir)
        val grams = docs.select(col("doc_id"),
          ops.TextAnalysis.ngrams(col("text"), 3).as("grams"))
        time("grams only")(grams.count())
        val sigs = grams.select(col("doc_id"),
          ops.Dedup.minHashSignature(col("grams"), 64).as("sig"))
        time("signatures")(sigs.count())
        val pairs = ops.Dedup.minHashCandidatePairs(docs)
        println("[dev] pairs = " + time("candidate pairs")(pairs.count()))
      case "albers" =>
        functions.GraftFunctions.register(spark)
        spark.sql("SELECT albers_lon(-5216639.67D, 991231.688D) lon, " +
          "albers_lat(-5216639.67D, 991231.688D) lat").show(false)
        try spark.sql("SELECT albers_lon('oops', 1.0D)").show()
        catch { case e: Exception =>
          println("[dev] type-check error: " + e.getMessage.take(200)) }
      case "explain" =>
        ops.Dedup.minHashCandidatePairs(Tables.documents(spark, sfDir))
          .explain("formatted")
      case _ => println(s"unknown: $what")
    }
    spark.stop()
  }
}
