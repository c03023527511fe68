package graft.tools

import org.apache.spark.sql.SparkSession

/** Multi-point scale curves for individual queries — the follow-up
  * probe when a [[ScaleSmoke]] 10× ratio looks high: a t10/t1 ratio
  * under 10 is sublinear ON AVERAGE but can hide a superlinear tail
  * behind fixed overhead (t = a + b·nᶜ with a large a). The marginal
  * ratio between two big scale points can't hide behind overhead:
  * t30/t10 ≤ 3 ⟹ the per-row cost is flat-or-falling where it
  * matters.
  *
  * Builds one [[ScaleSmoke.buildScaledDir]] dataset per factor
  * (cached by the completion marker) and times each query at 1× plus
  * every factor; prints per-query seconds and marginal ratios plus a
  * trailing JSON line for the round artifact.
  *
  * Usage:
  *   sbt "runMain graft.tools.ScaleCurve /root/testdata/sf0.1 /tmp/graft_curve \
  *        dedup_edit_distance,emb_knn_graph 10,30"
  */
object ScaleCurve {

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ScaleCurve <base sf dir> <out root> <queriesCsv> <factorsCsv> [timeoutSec]")
    val baseDir = args(0)
    val outRoot = args(1)
    val queries = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val factors = args(3).split(",").map(_.trim.toInt).toSeq.sorted
    val timeoutSec = if (args.length > 4) args(4).toInt else 300
    val unknown = queries.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: $unknown")

    val builder = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_INITIAL_PARTITIONS: let AQE START big shuffles at
    // this partition count and coalesce the small ones back down —
    // the production setting for runs whose largest shuffle outgrows
    // cpus × ~200 MB (the x100 curve points)
    sys.env.get("SPARK_GRAFT_INITIAL_PARTITIONS").foreach(n =>
      builder.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", n))
    // SPARK_GRAFT_ADVISORY_PARTITION_BYTES: AQE coalesces post-shuffle
    // partitions back to THIS size regardless of initialPartitionNum —
    // for hash-agg-heavy stages the in-memory hash map runs ~10x the
    // shuffle bytes, so the 64m default packs ~600 MB of agg state per
    // task and spills; 16m is the production setting for agg-bound
    // jobs (measured on the knn x100 point, KNN_PROFILE_r14)
    sys.env.get("SPARK_GRAFT_ADVISORY_PARTITION_BYTES").foreach(n =>
      builder.config("spark.sql.adaptive.advisoryPartitionSizeInBytes", n))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dirs: Seq[(Int, String)] = (1, baseDir) +: factors.map { f =>
      val d = s"$outRoot/x$f"
      ScaleSmoke.buildScaledDir(spark, baseDir, d, f)
      (f, d)
    }
    // warm-up at 1× absorbs JVM/codegen cost
    queries.headOption.foreach { q =>
      try graft.SparkEntry.queries(q)(spark, baseDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    def f2(d: Double) = BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val rows = queries.map { q =>
      val points = dirs.map { case (f, d) =>
        val t0 = System.nanoTime()
        val status =
          try { graft.SparkEntry.queries(q)(spark, d)
            .write.format("noop").mode("overwrite").save(); "ok" }
          catch { case e: Throwable => e.getClass.getSimpleName }
        val secs = (System.nanoTime() - t0) / 1e9
        if (secs > timeoutSec) println(s"[curve] WARNING: $q @${f}x ran ${f2(secs)} s")
        (f, secs, status)
      }
      val marginals = points.sliding(2).collect {
        case Seq((f1x, t1, _), (f2x, t2, _)) =>
          s""""x${f1x}_to_x$f2x":${f2(t2 / math.max(t1, 1e-9))}"""
      }.mkString(",")
      points.foreach { case (f, s, st) =>
        println(f"[curve] $q%-24s x$f%-3d ${s}%8.2f s  $st")
      }
      val ptJson = points.map { case (f, s, st) =>
        s""""x$f":{"sec":${f2(s)},"status":"$st"}""" }.mkString(",")
      s""""$q":{$ptJson,"marginal":{$marginals}}"""
    }
    println(s"""{"scale_curve":{"base":"$baseDir","factors":[${factors.mkString(",")}],"queries":{${rows.mkString(",")}}}}""")
    spark.stop()
  }
}
