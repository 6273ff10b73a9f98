package graft.wri

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based classification invariants (SURVEY §5): ScalaCheck
  * generators build adversarial path shapes (domain x dimension x
  * archive-ness x no_mask), sampled deterministically and classified in
  * ONE DataFrame pass; every invariant from `utils.R:49-162` is asserted
  * against the raw path string. */
class ClassifyPropertySpec extends SparkSpec {
  import spark.implicits._

  private val domainGen = Gen.oneOf(Classify.domainDirs)
  private val junkSeg = Gen.oneOf("data", "v2", "final", "misc", "x1",
    "scores", "retro_2020", "archive", "final_checks")
  private val dimInfix = Gen.oneOf("_resistance_", "_recovery_", "_status_", "_")
  private val aggSuffix = Gen.oneOf("_domain_score", "_resilience",
    "_resistance", "_status", "_other")
  private val fileGen: Gen[String] = Gen.oneOf(
    for { d <- domainGen; i <- dimInfix } yield s"$d${i}v1.tif",
    for { d <- domainGen; sfx <- aggSuffix } yield s"$d$sfx.tif",
    Gen.const("WRI_score.tif"),
    Gen.const("plain_layer.tif"))
  private val midGen: Gen[Seq[String]] = Gen.listOfN(2, Gen.oneOf(
    Gen.const("indicators"), Gen.const("indicators_no_mask"),
    domainGen, junkSeg)).map(_.toSeq)
  private val pathGen: Gen[String] = for {
    mid <- midGen
    f <- fileGen
  } yield ("data" +: mid :+ f).mkString("/")

  test("classification invariants hold over 400 generated paths") {
    // deterministic sampling: fixed seed, retry-free pure generators
    val paths = Gen.listOfN(400, pathGen)
      .apply(Gen.Parameters.default, Seed(42L)).get
    val rows = paths.toDF("path")
      .select(col("path"),
        Classify.dataType(col("path")).as("dt"),
        Classify.domain(col("path")).as("dom"),
        Classify.dimension(Classify.dataType(col("path")),
          Classify.basename(col("path"))).as("dim"),
        Classify.cogFilename(col("path")).as("cog"))
      .collect()
    assert(rows.length == 400)
    rows.foreach { r =>
      val (p, dt, dom, dim, cog) = (r.getString(0), r.getString(1),
        r.getString(2), Option(r.getString(3)), r.getString(4))
      // P1 exclude-first precedence
      if (p.contains("/archive/") || p.contains("/retro_") ||
          p.contains("/final_checks/"))
        assert(dt == "exclude", s"archive precedence: $p -> $dt")
      else if (p.contains("/indicators/"))
        assert(dt == "indicator", s"indicator rule: $p -> $dt")
      // the underscore quirk: no_mask dirs do NOT make indicators
      if (p.contains("/indicators_no_mask/") && !p.contains("/indicators/") &&
          !p.contains("/archive/") && !p.contains("/retro_") &&
          !p.contains("/final_checks/"))
        assert(dt != "indicator", s"no_mask must not be indicator: $p")
      // P3 dimension only for indicator/aggregate, from the filename
      val base = p.split("/").last
      if (dt == "indicator") {
        val want =
          if (base.contains("_resistance_")) Some("resistance")
          else if (base.contains("_recovery_")) Some("recovery")
          else if (base.contains("_status_")) Some("status")
          else None
        assert(dim == want, s"indicator dim: $p -> $dim, want $want")
      }
      if (dt == "final_score" || dt == "exclude")
        assert(dim.isEmpty, s"dim must be NULL for $dt: $p")
      // P4 cog filename suffixing
      assert(cog.endsWith(".tif"), s"cog ext: $p -> $cog")
      assert(cog.endsWith("_no_mask.tif") == p.contains("/indicators_no_mask/"),
        s"no_mask suffix: $p -> $cog")
      // P2: the parent of /indicators/ wins VERBATIM (utils.R:112 takes
      // the directory name even outside the dictionary); otherwise the
      // domain must come from the dictionary or be "unknown"
      val parts = p.split("/")
      val idx = parts.indexOf("indicators")
      if (idx >= 1)
        assert(dom == parts(idx - 1), s"parent precedence: $p -> $dom")
      else
        assert((Classify.domainDirs :+ "unknown").contains(dom),
          s"domain vocab: $p -> $dom")
    }
  }
}
