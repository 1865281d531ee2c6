package graft.htn

import graft.SparkSpec

class StatsSpec extends SparkSpec {

  test("prevalence cube: grand-total cell matches the flat prevalence") {
    val res = HtnPipeline.run(spark, OmopFixtures.tables(spark), OmopFixtures.codes)
    val cube = Stats.prevalenceCube(res.analytical)
    val total = cube.filter(
      "state IS NULL AND sex IS NULL AND race IS NULL AND age_group IS NULL")
      .head()
    val n = res.analytical.count()
    val htn = res.analytical.filter("hypertension_140 = 1").count()
    assert(total.getAs[Long]("n") === n)
    assert(total.getAs[Double]("prev_140") ===
      (math.round(htn.toDouble / n * 10000) / 10000.0))
    // every cube cell's n is the sum of its finer-grained children's counts
    val bySex = cube.filter(
      "state IS NULL AND sex IS NOT NULL AND race IS NULL AND age_group IS NULL")
      .collect().map(_.getAs[Long]("n")).sum
    assert(bySex === n)
  }

  test("zero-denominator metrics stay finite (JSON-safe)") {
    val m = Stats.ExclusionMetrics(cohort = 0, wra = 0,
      afterPregnancy = 0, afterEsrd = 0, afterCare = 0)
    assert(m.pregnancyPctOfWra === 0.0)
    assert(m.esrdPctOfCohort === 0.0)
    assert(!m.carePctOfCohort.isNaN)
  }
}
