package graft

import org.apache.spark.sql.functions._
import graft.ops.Privacy

/** k-anonymity / l-diversity release audits and the suppression fix. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // (id, zip, age_band, diagnosis): the textbook linkage-attack shape
  private val release = Seq(
    (1L, "94107", "30-39", "flu"),
    (2L, "94107", "30-39", "cold"),
    (3L, "94107", "30-39", "flu"),
    (4L, "02139", "40-49", "diabetes"), // singleton class → re-identifiable
    (5L, "10001", "20-29", "flu"),      // k=3 class, but sensitive is uniform
    (6L, "10001", "20-29", "flu"),
    (7L, "10001", "20-29", "flu"),
    (8L, null.asInstanceOf[String], "50-59", "flu"), // null-QI singleton
    (9L, "60601", "30-39", "asthma"),
    (10L, "60601", "30-39", "cold")
  ).toDF("id", "zip", "age_band", "diagnosis")

  private val qi = Seq("zip", "age_band")

  test("k-anonymity: class sizes and flags are exact; audit row sums them") {
    val classes = Privacy.kAnonymityClasses(release, qi, k = 3)
      .select("zip", "age_band", "class_size", "is_k_anon")
      .as[(Option[String], String, Long, Boolean)].collect().toSet
    assert(classes.contains((Some("94107"), "30-39", 3L, true)))
    assert(classes.contains((Some("02139"), "40-49", 1L, false)))
    assert(classes.contains((None, "50-59", 1L, false)), "null QI must form a real class")
    val audit = Privacy.kAnonymityAudit(release, qi, k = 3)
      .as[(Long, Long, Long, Long)].head()
    assert(audit == ((10L, 4L, 3L, 1L))) // rows, violating rows, classes, min size
  }

  test("l-diversity catches the homogeneous class k-anonymity passes") {
    val ld = Privacy.lDiversityClasses(release, qi, "diagnosis", l = 2)
      .select("zip", "age_band", "n_sensitive", "is_l_diverse")
      .as[(Option[String], String, Long, Boolean)].collect().toSet
    // the 10001 class is 3-anonymous yet reveals diagnosis=flu for everyone
    assert(ld.contains((Some("10001"), "20-29", 1L, false)))
    assert(ld.contains((Some("94107"), "30-39", 2L, true)))
  }

  test("suppression nulls exactly the under-k rows (null-QI class included) and re-audits clean") {
    val fixed = Privacy.suppressUnderK(release, qi, k = 3)
    val rows = fixed.select("id", "zip", "age_band", "suppressed")
      .as[(Long, Option[String], Option[String], Boolean)].collect()
    assert(rows.count(_._4) === 4) // ids 4, 8, 9, 10
    rows.filter(_._4).foreach { case (id, z, a, _) =>
      assert(z.isEmpty && a.isEmpty, s"row $id kept a QI value") }
    rows.filterNot(_._4).foreach { case (id, z, a, _) =>
      assert(z.nonEmpty && a.nonEmpty, s"row $id lost a QI value") }
    // released table is now k-anonymous by construction
    val reAudit = Privacy.kAnonymityAudit(fixed.drop("suppressed", "id", "diagnosis"),
      qi, k = 3).as[(Long, Long, Long, Long)].head()
    assert(reAudit._2 === 0L && reAudit._3 === 0L, s"re-audit found violations: $reAudit")
  }
}
