package graft.operators

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}


import graft.SparkSpec

/** The concurrency guards on [[Checkpoints]]' session-global mutations:
  * only one thread per session opens a lowered-shuffle-partitions window
  * (a contender runs unlowered and the conf is NEVER restored to a stale
  * value), same-thread nesting stays LIFO-correct, and sweepingOnFailure
  * refuses to sweep when builds overlap (it cannot attribute registered
  * RDDs to an owner). */
class CheckpointsGuardSpec extends SparkSpec {
  import sqlImplicits._

  test("withShufflePartitions: same-thread nesting restores LIFO") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    // the shared test session runs narrow — pick widths strictly BELOW it
    // so both windows actually lower (the override is lower-only)
    val outer = math.max(before.toInt / 2, 2)
    val inner = outer - 1
    Checkpoints.withShufflePartitions(spark, outer) {
      assert(spark.conf.get(key) === outer.toString)
      Checkpoints.withShufflePartitions(spark, inner) {
        assert(spark.conf.get(key) === inner.toString)
      }
      assert(spark.conf.get(key) === outer.toString)
    }
    assert(spark.conf.get(key) === before)
  }

  test("withShufflePartitions: a contending thread skips the lowering and " +
       "the final conf is the original value") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    val contenderDone = new CountDownLatch(1)
    val contenderSaw = new java.util.concurrent.atomic.AtomicReference[String]()
    val pool = Executors.newSingleThreadExecutor()
    val outer = math.max(before.toInt / 2, 2)
    try {
      Checkpoints.withShufflePartitions(spark, outer) {
        assert(spark.conf.get(key) === outer.toString)
        pool.submit(new Runnable {
          def run(): Unit = {
            // contender asks for an even lower width — the guard must
            // refuse the mutation entirely (the owner's width stays)
            Checkpoints.withShufflePartitions(spark, outer - 1) {
              contenderSaw.set(spark.conf.get(key))
            }
            contenderDone.countDown()
          }
        })
        assert(contenderDone.await(30, TimeUnit.SECONDS))
        assert(contenderSaw.get() === outer.toString,
          "contender must run inside the owner's window, not its own")
        assert(spark.conf.get(key) === outer.toString,
          "contender must not have mutated the conf")
      }
      assert(spark.conf.get(key) === before,
        "owner's restore must win — no stale interleaved restore")
    } finally pool.shutdown()
  }

  test("sweepingOnFailure: solo failure sweeps this build's frames") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    intercept[RuntimeException] {
      Checkpoints.sweepingOnFailure(sc) {
        val df = Seq(1L, 2L).toDF("x").persist()
        df.count()
        throw new RuntimeException("boom")
      }
    }
    assert(sc.getPersistentRDDs.size === before, "solo sweep must fire")
  }

  test("sweepingOnFailure: same-thread nesting is ONE logical build — " +
       "the sweep still fires (nesting must not read as overlap)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    intercept[RuntimeException] {
      Checkpoints.sweepingOnFailure(sc) {
        val outer = Seq(1L).toDF("x").persist()
        outer.count()
        Checkpoints.sweepingOnFailure(sc) {
          val inner = Seq(2L).toDF("y").persist()
          inner.count()
          throw new RuntimeException("boom")
        }
      }
    }
    assert(sc.getPersistentRDDs.size === before,
      "nested failure must sweep both the inner and outer builds' frames")
  }

  test("sweepingOnFailure: overlapping builds skip the sweep — a live " +
       "sibling's frames survive the other's failure") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val siblingUp = new CountDownLatch(1)
    val failDone = new CountDownLatch(1)
    val pool = Executors.newSingleThreadExecutor()
    try {
      val sibling = pool.submit(new java.util.concurrent.Callable[org.apache.spark.sql.DataFrame] {
        def call(): org.apache.spark.sql.DataFrame =
          Checkpoints.sweepingOnFailure(sc) {
            val df = Seq(10L, 20L).toDF("y").persist()
            df.count()
            siblingUp.countDown()
            // stay in-flight across the other build's failure
            assert(failDone.await(30, TimeUnit.SECONDS))
            df
          }
      })
      assert(siblingUp.await(30, TimeUnit.SECONDS))
      intercept[RuntimeException] {
        Checkpoints.sweepingOnFailure(sc) {
          throw new RuntimeException("boom")
        }
      }
      failDone.countDown()
      val df = sibling.get(30, TimeUnit.SECONDS)
      // the sibling's persisted frame must still be live and usable
      assert(df.count() === 2L)
      assert(sc.getPersistentRDDs.size === before + 1,
        "overlap must skip the sweep, leaving the sibling's frame")
      df.unpersist(blocking = true)
      ()
    } finally pool.shutdown()
    assert(sc.getPersistentRDDs.size === before)
  }
}
