package graft.htn

import graft.SparkSpec

class ModelSpec extends SparkSpec {

  test("analytical table round-trips through the typed Dataset API") {
    val res = HtnPipeline.run(spark, OmopFixtures.tables(spark), OmopFixtures.codes)
    val typed = model.phenotypes(res.analytical).collect()
      .map(p => p.PATIENT_LINKAGE -> p).toMap

    val hb = typed("PX_HTN_BP")
    assert(hb.hypertension_140 === 1 && hb.HTN140_90 === Some(1))
    assert(hb.sex === "Male" && hb.age === 53)

    val lb = typed("PX_LOOKBACK")
    assert(lb.HTN140_90.isEmpty && lb.hypertension_140 === 0) // NULL → None

    // typed transforms compile and run on the Tungsten representation
    val prevalence = model.phenotypes(res.analytical)
      .filter(_.hypertension_140 == 1).count()
    assert(prevalence === 4)
  }

  test("cohort typed view exposes the deduplicated grain") {
    val res = HtnPipeline.run(spark, OmopFixtures.tables(spark), OmopFixtures.codes)
    import sqlImplicits._
    val c = model.cohort(res.cohort)
    assert(c.count() === c.map(_.PATIENT_LINKAGE).distinct().count())
  }
}
