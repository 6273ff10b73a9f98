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
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
      case "scale" =>
        // would-it-survive-8x probe: union the corpus 8 times with
        // offset ids (every doc becomes an 8-strong exact-dup cluster —
        // the worst case for candidate generation) and time the heavy
        // dedup ops end-to-end
        val base = Tables.documents(spark, sfDir)
        val n = base.count()
        val big = (0 until 8).map { k =>
          base.select((col("doc_id") + lit(k * n)).as("doc_id"),
            col("text"), col("source"), col("lang"), col("n_chars"))
        }.reduce(_ unionByName _)
        println(s"[dev] scaled corpus: ${big.count()} docs (8 x $n)")
        println("[dev] minhash pairs = " + time("minhash 8x")(
          ops.Dedup.minHashCandidatePairs(big).count()))
        println("[dev] jaccard pairs = " + time("jaccard 8x")(
          ops.Dedup.ngramJaccardPairs(big, threshold = 0.5).count()))
        println("[dev] simhash pairs = " + time("simhash 8x")(
          ops.Dedup.simHashCandidatePairs(big).count()))
      case "jaccard" =>
        // stage-by-stage cost of the prefix-filtered similarity join
        val docs = Tables.documents(spark, sfDir)
        val grams = docs.select(col("doc_id"),
            ops.TextAnalysis.hashedNgrams(col("text"), 3).as("grams"))
          .withColumn("gsz", size(col("grams")))
          .filter(col("gsz") > 0)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        time("grams cache build")(grams.count())
        val posting = grams.select(col("doc_id"), col("gsz"),
          explode(col("grams")).as("gram"))
        time("posting explode")(posting.count())
        val dfreq = posting.groupBy(col("gram")).agg(count(lit(1)).as("df"))
        time("df groupBy")(dfreq.count())
        val prefixes = posting.join(dfreq, "gram")
          .groupBy(col("doc_id"), col("gsz"))
          .agg(array_sort(collect_list(struct(col("df"), col("gram"))))
            .as("sorted"))
          .select(col("doc_id"),
            explode(slice(transform(col("sorted"), s => s("gram")), lit(1),
              (col("gsz") - ceil(col("gsz") * lit(0.5)) + lit(1)).cast("int")))
              .as("gram"))
        time("prefix build")(prefixes.count())
        val full = ops.Dedup.ngramJaccardPairs(docs, threshold = 0.5)
        println("[dev] pairs = " + time("full pipeline")(full.count()))
        time("full pipeline again")(
          ops.Dedup.ngramJaccardPairs(docs, threshold = 0.5).count())
      case "minhash" =>
        val docs = Tables.documents(spark, sfDir)
        val grams = docs.select(col("doc_id"),
          ops.TextAnalysis.hashedNgrams(col("text"), 3).as("grams"))
        time("grams only")(grams.count())
        val sigs = grams.select(col("doc_id"),
          ops.Dedup.minHashSignature(col("grams"), 64).as("sig"))
        time("signatures")(sigs.count())
        val pairs = ops.Dedup.minHashCandidatePairs(docs)
        println("[dev] pairs = " + time("candidate pairs")(pairs.count()))
      case "sweep" =>
        val root = java.nio.file.Files.createTempDirectory("sweep_dev").toString
        val in = wri.Fixtures.writeCogInputs(root).head._1
        val sweep = wri.Cog.settingsSweep(spark, in, s"$root/out")
        sweep.groupBy("status", "BIGTIFF").count().orderBy("BIGTIFF").show(false)
        // BigTIFF outputs must carry magic 43
        val bigOut = sweep.filter(col("BIGTIFF") === "YES")
          .select("out_cog").head().getString(0)
        val magic = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(bigOut))(2)
        println(s"[dev] sample BIGTIFF=YES output magic byte: $magic")
      case "q23" =>
        val df = SparkEntry.queries("q23_scalar_subquery")(spark, sfDir)
        time("q23 run1")(df.count())
        time("q23 run2")(
          SparkEntry.queries("q23_scalar_subquery")(spark, sfDir).count())
        df.explain("formatted")
      case "bucket" =>
        val li = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_quantity"))
        val o = Tables.orders(spark, sfDir)
          .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
        ops.Bucketing.writeBucketed(li, "li_b", "l_orderkey", 8)
        ops.Bucketing.writeBucketed(o, "o_b", "l_orderkey", 8)
        val j = ops.Bucketing.bucketedJoin(spark, "li_b", "o_b", "l_orderkey")
        println(s"[dev] shuffle-free=${ops.Bucketing.isShuffleFree(j)} " +
          s"rows=${j.count()} (plain=${li.join(o, "l_orderkey").count()})")
        j.explain("formatted")
      case "wripipe" =>
        // full stage 00 -> 01 -> 02 over self-generated fixtures
        val root = java.nio.file.Files.createTempDirectory("wripipe_dev").toString
        val dataDir = wri.Fixtures.writeInventoryTree(root)
        val inv = wri.Inventory.run(spark, dataDir)
        wri.Inventory.assertUniqueCogFilenames(inv.consistent)
        wri.Inventory.writeOutputs(inv, s"$root/metadata")
        println(s"[dev] stage00: consistent=${inv.consistent.count()} " +
          s"inconsistent=${inv.inconsistent.count()} " +
          s"failed=${inv.raw.filter(!col("success")).count()}")
        val cogInputs = wri.Fixtures.writeCogInputs(root)
        import spark.implicits._
        val log = wri.Cog.run(spark,
          cogInputs.toDF("filepath", "cog_filename"), s"$root/cogs")
        wri.Cog.summary(log).show(false)
        val items = wri.Stac.run(spark, inv.consistent, s"$root/stac")
        println(s"[dev] stage02: items=${items.count()} " +
          s"ids=${wri.Stac.listItemIds(s"$root/stac/collections/wri_ignitR/items").mkString(",")}")
        println(s"[dev] outputs under $root")
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
