package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import sqlImplicits._

  test("asOf picks the latest strictly-prior right row per key") {
    val left = Seq( // (user, t, id)
      (1L, 100L, 10L), (1L, 200L, 11L), (1L, 50L, 12L),
      (2L, 100L, 20L)
    ).toDF("user_id", "t", "id")
    val right = Seq(
      (1L, 90L, 91L), (1L, 150L, 92L), (1L, 100L, 93L), // 93 at t=100: not strictly prior to left t=100
      (3L, 10L, 94L)
    ).toDF("user_id", "t", "id")

    val out = AsOfJoin.asOf(left, right, Seq("user_id"), "t", "t", "id", Seq("id"))
      .collect().map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[java.lang.Long]("asof_id")), Option(r.getAs[java.lang.Long]("asof_time"))))
      .toMap

    assert(out(10L) === ((Some(91L), Some(90L))))  // t=100 → right at 90 (not the t=100 one)
    assert(out(11L) === ((Some(92L), Some(150L)))) // t=200 → right at 150
    assert(out(12L) === ((None, None)))            // t=50 → nothing prior
    assert(out(20L) === ((None, None)))            // no right rows for user 2
  }

  test("same-instant right rows resolve to the highest tiebreak, prior instants only") {
    val left = Seq((1L, 100L, 10L)).toDF("user_id", "t", "id")
    val right = Seq((1L, 90L, 5L), (1L, 90L, 7L), (1L, 90L, 6L))
      .toDF("user_id", "t", "id")
    val out = AsOfJoin.asOf(left, right, Seq("user_id"), "t", "t", "id", Seq("id"))
      .head()
    assert(out.getAs[Long]("asof_id") === 7L) // max tiebreak wins the tie
  }

  test("forward direction picks the earliest strictly-later right row") {
    val left = Seq((1L, 100L, 10L), (1L, 300L, 11L), (2L, 50L, 20L))
      .toDF("user_id", "t", "id")
    val right = Seq(
      (1L, 100L, 90L), // same instant: excluded under strict
      (1L, 150L, 91L), (1L, 250L, 92L),
      (2L, 40L, 93L)   // earlier only: no forward match
    ).toDF("user_id", "t", "id")
    val out = AsOfJoin.asOf(left, right, Seq("user_id"), "t", "t", "id",
        Seq("id"), direction = "forward")
      .collect().map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[java.lang.Long]("asof_id")), Option(r.getAs[java.lang.Long]("asof_time"))))
      .toMap
    assert(out(10L) === ((Some(91L), Some(150L)))) // nearest later, not same-t
    assert(out(11L) === ((None, None)))            // nothing after 300
    assert(out(20L) === ((None, None)))
  }

  test("forward ties resolve to the LOWEST tiebreak; non-strict sees same instant") {
    val left = Seq((1L, 100L, 10L)).toDF("user_id", "t", "id")
    val right = Seq((1L, 100L, 7L), (1L, 100L, 5L), (1L, 100L, 6L))
      .toDF("user_id", "t", "id")
    val nonStrict = AsOfJoin.asOf(left, right, Seq("user_id"), "t", "t", "id",
      Seq("id"), strict = false, direction = "forward").head()
    assert(nonStrict.getAs[Long]("asof_id") === 5L)
    val strict = AsOfJoin.asOf(left, right, Seq("user_id"), "t", "t", "id",
      Seq("id"), strict = true, direction = "forward").head()
    assert(strict.isNullAt(strict.fieldIndex("asof_id")))
  }

  test("tolerance nulls matches beyond the bound, keeps those within it") {
    val left = Seq((1L, 100L, 10L), (1L, 500L, 11L)).toDF("user_id", "t", "id")
    val right = Seq((1L, 80L, 90L), (1L, 300L, 91L)).toDF("user_id", "t", "id")
    val out = AsOfJoin.asOf(left, right, Seq("user_id"), "t", "t", "id",
        Seq("id"), tolerance = Some(50L))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Long]("asof_id"))).toMap
    assert(out(10L) === Some(90L)) // gap 20 ≤ 50
    // latest prior is 300 (gap 200 > 50) → NULL, though right rows exist
    assert(out(11L) === None)
  }

  test("tolerance over non-numeric time columns is refused (undefined units)") {
    // DATE arithmetic would read tolerance=50 as 50 DAYS while a caller
    // holding micros meant 50 µs — refuse rather than silently mis-scale
    val left = Seq((1L, java.sql.Date.valueOf("2024-01-10"), 10L))
      .toDF("user_id", "t", "id")
    val right = Seq((1L, java.sql.Date.valueOf("2024-01-01"), 90L))
      .toDF("user_id", "t", "id")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, Seq("user_id"), "t", "t", "id",
        Seq("id"), tolerance = Some(50L))
    }
    assert(e.getMessage.contains("numeric time columns"))
    // without tolerance the same DATE columns are fine (ordering only)
    val ok = AsOfJoin.asOf(left, right, Seq("user_id"), "t", "t", "id",
      Seq("id")).head()
    assert(ok.getAs[Long]("asof_id") === 90L)
  }
}
