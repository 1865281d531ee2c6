package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants of q37/q38/q39, t20 and d07 that the hash-exact
  * oracle cannot express: bucket containment, island gap structure,
  * rule/verdict consistency, brute-force pair parity. (Exactness vs
  * DuckDB is covered by the Verify/check gate.) */
class RelationalQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q37: buckets partition the table and bound their members") {
    val out = CoreQueries.queries("q37_histogram")(spark, sf)
      .select("bucket", "n", "min_price", "max_price").collect()
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(out.map(_.getLong(1)).sum === total)
    out.foreach { r =>
      val (b, lo, hi) = (r.getLong(0), r.getDouble(2), r.getDouble(3))
      assert(lo <= hi)
      assert(math.floor(lo / 25000.0).toLong === b, s"min of bucket $b strays")
      assert(math.floor(hi / 25000.0).toLong === b, s"max of bucket $b strays")
    }
  }

  test("q38: islands are ≤30-day-step runs separated by >30-day gaps") {
    val out = CoreQueries.queries("q38_gaps_islands")(spark, sf)
      .select("o_custkey", "island", "n_orders", "start_d", "end_d").collect()
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(out.map(_.getLong(2)).sum === total) // every order is in an island
    out.groupBy(_.getLong(0)).values.foreach { is =>
      val sorted = is.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to sorted.length).toSeq,
        "islands numbered consecutively from 1 per customer")
      sorted.foreach(r =>
        assert(!r.getDate(3).after(r.getDate(4)), "start_d <= end_d"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val gapDays = (b.getDate(3).toLocalDate.toEpochDay
            - a.getDate(4).toLocalDate.toEpochDay)
          assert(gapDays > 30, s"adjacent islands closer than the gap: $gapDays")
        case _ => ()
      }
    }
  }

  test("q39: nation lists are sorted, counts match, regions complete") {
    val out = CoreQueries.queries("q39_listagg")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val names = r.getString(1).split(",").toSeq
      assert(names === names.sorted, "listagg order is the sort order")
      assert(names.length.toLong === r.getLong(2))
    }
    assert(out.map(_.getLong(2)).sum === 25L) // all nations accounted for
  }

  test("t20: verdict consistent with reasons; rules fire where they should") {
    val out = TextQueries.queries("t20_quality_filter")(spark, sf)
      .select("doc_id", "n_tokens", "reasons", "keep").collect()
    val ruleOrder = Seq("too_short", "low_ttr", "no_stopword", "long_tokens")
    out.foreach { r =>
      val reasons =
        if (r.getString(2).isEmpty) Seq.empty else r.getString(2).split(",").toSeq
      assert(r.getBoolean(3) === reasons.isEmpty, "keep ⇔ no reasons")
      assert(reasons.forall(ruleOrder.contains), s"unknown rule in $reasons")
      assert(reasons === ruleOrder.filter(reasons.contains),
        "reasons appear in fixed rule order")
      // cross-check the one rule reconstructible from the emitted columns
      assert(reasons.contains("too_short") === (r.getLong(1) < 20))
    }
    // the filter must discriminate on this corpus — some kept, some dropped
    assert(out.exists(_.getBoolean(3)) && out.exists(!_.getBoolean(3)))
  }

  test("q43: cohort offsets are non-negative; offset 0 counts every cohort member") {
    val out = CoreQueries.queries("q43_retention")(spark, sf)
      .select("cohort_wk", "wk_offset", "n_active").collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(1) >= 0L, "activity before first week"))
    // offset 0 must count exactly the users whose first week IS the cohort
    // (events via Tables.load — ts is nanosecond parquet)
    val firstWeeks = graft.io.Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        floor(datediff(to_date(col("ts")), lit("1970-01-01").cast("date")) / 7)
          .cast("long").as("wk"))
      .groupBy("user_id").agg(min(col("wk")).as("w0"))
      .collect().map(r => r.getLong(1)).groupBy(identity).view.mapValues(_.length)
    out.filter(_.getLong(1) == 0L).foreach { r =>
      assert(r.getLong(2) === firstWeeks(r.getLong(0)).toLong,
        s"cohort ${r.getLong(0)} offset-0 count wrong")
    }
  }

  test("q42: complete daily grid, gaps carry the last observed value") {
    val out = CoreQueries.queries("q42_gap_fill")(spark, sf)
      .select("user_id", "d", "value_filled", "was_gap").collect()
    out.groupBy(_.getLong(0)).values.foreach { rs =>
      val days = rs.map(_.getDate(1).toLocalDate).sortBy(_.toEpochDay)
      // grid completeness: consecutive days from first to last, no holes
      assert(days.last.toEpochDay - days.head.toEpochDay + 1 === days.length,
        s"grid has holes for user ${rs.head.getLong(0)}")
      assert(days.distinct.length === days.length)
      // forward fill: on a gap day the value equals the previous day's
      val byDay = rs.sortBy(_.getDate(1).toLocalDate.toEpochDay)
      byDay.sliding(2).foreach {
        case Array(prev, cur) if cur.getBoolean(3) =>
          assert(cur.getDouble(2) === prev.getDouble(2),
            s"gap day not carrying previous value for user ${cur.getLong(0)}")
        case _ => ()
      }
      // the first grid day is an observation by construction
      assert(!byDay.head.getBoolean(3), "grid must start at an observation")
    }
  }

  test("d07: pairs equal the brute-force overlap coefficient at ≥0.95") {
    // same tokenizer as the operator's TextFunctions.tokenSet
    // (trim + regex whitespace split + distinct) — a brute force computed
    // with a DIFFERENT tokenizer would validate nothing on irregular
    // whitespace
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.split("\\s+").toSet))
    val expected = (for {
      (ia, srcA, sa) <- docs
      (ib, srcB, sb) <- docs
      if srcA == srcB && ia < ib
      c = sa.intersect(sb).size.toDouble / math.min(sa.size, sb.size)
      if c >= 0.95
    } yield (ia, ib)).toSet
    val got = TextQueries.queries("d07_containment")(spark, sf)
      .select("doc_a", "doc_b", "containment").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet === expected)
    got.foreach(r => assert(r.getDouble(2) >= 0.95))
    assert(expected.nonEmpty, "threshold must select something on this corpus")
  }

  test("t22: quotas follow √n within rounding, sample fills each quota") {
    val out = TextQueries.queries("t22_source_quota")(spark, sf)
      .select("source", "doc_id", "rk", "quota", "n_in").collect()
    val bySource = out.groupBy(_.getString(0))
    val quotas = bySource.view.mapValues(_.head.getLong(3)).toMap
    assert(quotas.values.sum <= 200L, "floor quotas never exceed the budget")
    assert(quotas.values.sum >= 180L, "floor loss is bounded by #sources")
    bySource.foreach { case (src, rows) =>
      val (quota, nIn) = (rows.head.getLong(3), rows.head.getLong(4))
      assert(rows.length.toLong === math.min(quota, nIn),
        s"$src must fill its quota (or exhaust the source)")
      assert(rows.map(_.getInt(2)).sorted.toSeq === (1 to rows.length).toSeq,
        s"$src ranks must be 1..kept with no holes")
    }
    // temperature flattening: quota shares sit between uniform and raw n
    val nTot = bySource.values.map(_.head.getLong(4)).sum.toDouble
    val k = bySource.size.toDouble
    bySource.foreach { case (src, rows) =>
      val rawShare = rows.head.getLong(4) / nTot
      val qShare = rows.head.getLong(3) / 200.0
      val lo = math.min(rawShare, 1 / k) * 0.8
      val hi = math.max(rawShare, 1 / k) * 1.2
      assert(qShare >= lo && qShare <= hi,
        s"$src: √n share $qShare outside [$lo, $hi]")
    }
  }

  test("q47: mode is the max-count status, median splits each group in half") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderpriority", "o_orderstatus", "o_totalprice").collect()
    val out = CoreQueries.queries("q47_mode_median")(spark, sf).collect()
    assert(out.length === orders.map(_.getString(0)).distinct.length)
    out.foreach { r =>
      val grp = orders.filter(_.getString(0) == r.getString(0))
      val byStatus = grp.groupBy(_.getString(1)).view.mapValues(_.length)
      assert(byStatus(r.getString(2)) === byStatus.values.max, "mode count is max")
      assert(r.getString(2) === byStatus.filter(_._2 == byStatus.values.max)
        .keys.min, "tie broken to smallest status")
      assert(r.getLong(3).toInt === byStatus.values.max)
      val prices = grp.map(_.getDouble(2)).sorted
      assert(r.getDouble(4) === prices((grp.length + 1) / 2 - 1), "lower median")
      assert(r.getLong(1).toInt === grp.length)
    }
  }

  test("q48: is_first marks exactly one row per (user, type); count runs") {
    val out = CoreQueries.queries("q48_first_seen")(spark, sf)
      .select("user_id", "event_type", "is_first", "n_types_seen").collect()
    out.groupBy(r => (r.getLong(0), r.getString(1))).values.foreach { rows =>
      assert(rows.count(_.getBoolean(2)) === 1, "exactly one first per pair")
    }
    // rows arrive in the query's total order: per user the cumulative count
    // is non-decreasing and ends at the user's distinct type count
    out.groupBy(_.getLong(0)).values.foreach { rows =>
      val seen = rows.map(_.getLong(3))
      assert(seen.zip(seen.tail).forall { case (a, b) => b >= a })
      assert(seen.last === rows.map(_.getString(1)).distinct.length.toLong)
    }
  }

  test("d09: linkage pairs equal brute force; blocking loses nothing ≤1") {
    val custs = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_nationkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getString(2)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = (for {
      (ia, na, sa) <- custs; (ib, nb, sb) <- custs
      if na == nb && ia < ib && lev(sa, sb) <= 1
    } yield (ia, ib)).toSet
    val got = CoreQueries.queries("d09_record_linkage")(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
    assert(expected.nonEmpty, "corpus must contain near-matches")
  }

  test("q44: funnel counts are monotone non-increasing, entry pct is 1.0") {
    val out = CoreQueries.queries("q44_funnel")(spark, sf)
      .select("step", "n_users", "pct_of_entry").collect()
    assert(out.map(_.getString(0)).toSeq ===
      Seq("1_signup", "2_view", "3_click", "4_purchase"))
    val ns = out.map(_.getLong(1)).toSeq
    assert(ns === ns.sorted.reverse, s"funnel must narrow: $ns")
    assert(out.head.getDouble(2) === 1.0)
    assert(ns.head > 0 && ns.last > 0, "corpus should populate every step")
  }

  test("q45: max concurrency matches a brute-force sweep per type") {
    import graft.io.Tables
    val evs = Tables.load(spark, sf, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = evs.groupBy(_._1).map { case (ty, rows) =>
      // sweep: merged-net deltas per instant (close-open [t, t+30min))
      val deltas = rows.flatMap(r => Seq((r._2, 1), (r._2 + 1800000000L, -1)))
        .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2).sum)
      ty -> deltas.scanLeft(0)(_ + _).max
    }
    val got = CoreQueries.queries("q45_concurrency")(spark, sf)
      .select("event_type", "max_concurrent").collect()
      .map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    assert(got === expected)
    assert(got.values.forall(_ >= 1))
  }

  test("q46: SCD-2 intervals chain per user and adjacent tiers differ") {
    val out = CoreQueries.queries("q46_scd2")(spark, sf)
      .select("user_id", "tier", "valid_from_us", "valid_to_us").collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(2))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.isNullAt(3) && a.getLong(3) === b.getLong(2),
            "interval must close exactly where the next opens")
          assert(a.getLong(1) !== b.getLong(1), "adjacent tiers must differ")
        case _ => ()
      }
      assert(sorted.last.isNullAt(3), "current version stays open-ended")
      assert(sorted.init.forall(!_.isNullAt(3)))
    }
  }
}
