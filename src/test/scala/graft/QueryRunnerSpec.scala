package graft

import graft.tools.QueryRunner

/** The gate harness itself: budget statuses, timing from task start,
  * and isolation of a cancel-ignoring zombie from later runs.
  */
class QueryRunnerSpec extends SparkSpec {

  test("ok / ERROR / TIMEOUT statuses and task-start timing") {
    val (sec, ok) = QueryRunner.runWithBudget(spark, "qr-ok", "ok", 30, "test") {
      spark.range(10).count()
    }
    assert(ok == "ok" && sec < 30)
    val (_, err) = QueryRunner.runWithBudget(spark, "qr-err", "err", 30, "test") {
      throw new RuntimeException("boom")
    }
    assert(err == "ERROR")
    val t0 = System.nanoTime()
    val (sec2, to) = QueryRunner.runWithBudget(spark, "qr-to", "to", 1, "test") {
      Thread.sleep(10000)
    }
    val wall = (System.nanoTime() - t0) / 1e9
    assert(to == "TIMEOUT")
    assert(sec2 >= 1.0 && sec2 < 5.0, s"clock stops at breach + cancel grace, got $sec2")
    assert(wall < 8.0, "the runner returns promptly after a breach")
  }

  test("a cancel-ignoring zombie cannot stall the next run or inflate its clock") {
    // A body that swallows the interrupt and keeps sleeping occupies
    // only its own abandoned executor; the next run gets a fresh
    // worker and a fresh clock.
    val (_, st1) = QueryRunner.runWithBudget(spark, "qr-z", "zombie", 1, "test") {
      val deadline = System.nanoTime() + 6L * 1000000000L
      while (System.nanoTime() < deadline) {
        try Thread.sleep(100)
        catch { case _: InterruptedException => () } // ignore cancellation
      }
    }
    assert(st1 == "TIMEOUT")
    val (sec2, st2) = QueryRunner.runWithBudget(spark, "qr-after", "after", 30, "test") {
      spark.range(5).count()
    }
    assert(st2 == "ok", "next run proceeds while the zombie still sleeps")
    assert(sec2 < 5.0, s"next run's clock starts at ITS task start, got $sec2")
  }
}
