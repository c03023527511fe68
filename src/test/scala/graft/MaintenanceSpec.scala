package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Maintenance

/** Small-file compaction: file-count reduction, row preservation,
  * sort clustering, and crash-safety staging.
  */
class MaintenanceSpec extends SparkSpec {

  import spark.implicits._

  test("compaction merges small files, preserves rows, clusters on sort keys") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    // 20 tiny appends — the incremental-ingest small-files pattern
    for (b <- 0 until 20)
      (0 until 50).map(i => (b * 50L + i, s"doc $b $i"))
        .toDF("id", "text").coalesce(1).write.mode("append").parquet(dir)
    def parquetFiles = new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet")).length
    assert(parquetFiles >= 20, "pre-state: many small files")

    val nOut = Maintenance.compactParquet(spark, dir, targetBytes = Long.MaxValue,
      sortCols = Seq("id"))
    assert(nOut == 1, "all files fit one target-sized output")
    assert(parquetFiles == 1, "compacted to a single file")
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000, "every row preserved")
    assert(back.agg(min("id"), max("id")).collect()(0).toSeq == Seq(0L, 999L))
    // clustering: within the file rows are sorted on the key
    val ids = back.limit(10).collect().map(_.getLong(0)).toSeq
    assert(ids == ids.sorted, "rows clustered by sort key")
  }

  test("compaction to a byte target yields multiple range-clustered files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact2").toString + "/t"
    (0 until 2000).map(i => (i.toLong, "x" * 100)).toDF("id", "payload")
      .coalesce(1).write.parquet(dir)
    val total = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val nOut = Maintenance.compactParquet(spark, dir, targetBytes = total / 3 + 1,
      sortCols = Seq("id"))
    assert(nOut == 3, s"ceil(total / (total/3+1)) target files, got $nOut")
    val back = spark.read.parquet(dir)
    assert(back.count() == 2000)
    // range clustering: per-file id ranges must not overlap
    val ranges = back.groupBy(input_file_name().as("f"))
      .agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length == 3)
    assert(ranges.sliding(2).forall { case Array(a, b) => a._2 < b._1 },
      s"non-overlapping file ranges: ${ranges.toSeq}")
  }

  test("partitioned layout is compacted per leaf, preserving directory structure") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact3").toString + "/t"
    // two date partitions, each with many small appends (the daily-
    // ingest pattern), one a two-level date/hour layout
    for (b <- 0 until 8)
      (0 until 25).map(i => (b * 25L + i, s"a $b $i")).toDF("id", "text")
        .coalesce(1).write.mode("append").parquet(s"$dir/date=2026-01-01/hour=00")
    for (b <- 0 until 8)
      (0 until 25).map(i => (1000 + b * 25L + i, s"b $b $i")).toDF("id", "text")
        .coalesce(1).write.mode("append").parquet(s"$dir/date=2026-01-02/hour=03")

    val nOut = Maintenance.compactParquet(spark, dir, targetBytes = Long.MaxValue)
    assert(nOut == 2, s"one output file per leaf partition, got $nOut")
    // directory structure preserved exactly: same leaf dirs, 1 file each
    for (leaf <- Seq(s"$dir/date=2026-01-01/hour=00", s"$dir/date=2026-01-02/hour=03")) {
      val files = new java.io.File(leaf).listFiles.filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"$leaf compacted to one file")
    }
    // the whole table still reads as a partitioned table with the
    // partition columns inferred from the (unchanged) directory names
    val back = spark.read.parquet(dir)
    assert(back.count() == 400)
    assert(back.columns.toSet == Set("id", "text", "date", "hour"))
    assert(back.groupBy("date").count().collect().map(_.getLong(1)).toSeq == Seq(200L, 200L))
    // and a later partitionBy append composes with the compacted layout
    Seq((5000L, "c", java.sql.Date.valueOf("2026-01-03"), 7))
      .toDF("id", "text", "date", "hour")
      .write.partitionBy("date", "hour").mode("append").parquet(dir)
    assert(spark.read.parquet(dir).count() == 401)
  }

  test("mixed flat + partitioned layout is refused") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact4").toString + "/t"
    Seq((1L, "x")).toDF("id", "text").write.parquet(dir)
    Seq((2L, "y")).toDF("id", "text").write.parquet(s"$dir/date=2026-01-01")
    val e = intercept[IllegalArgumentException] {
      Maintenance.compactParquet(spark, dir)
    }
    assert(e.getMessage.contains("mixes partition directories"))
  }

  test("data files at an INTERMEDIATE partition level are refused, not skipped") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact5").toString + "/t"
    Seq((1L, "deep")).toDF("id", "text").write.parquet(s"$dir/date=d1/hour=00")
    // stray data file next to the hour= dir — Spark itself cannot read
    // this layout; a silent leaf-only sweep would leave it uncompacted
    Seq((2L, "shallow")).toDF("id", "text")
      .write.mode("append").parquet(s"$dir/date=d1")
    val e = intercept[IllegalArgumentException] {
      Maintenance.compactParquet(spark, dir)
    }
    assert(e.getMessage.contains("mixes partition directories"), e.getMessage)
  }

  test("profileTable: exact per-column counts and typed min/max from one pass") {
    import org.apache.spark.sql.Row
    val df = Seq(
      (1L, Some(2.5), Some("b"), true),
      (2L, None, Some("a"), false),
      (2L, Some(-1.0), None, true)
    ).toDF("id", "score", "tag", "flag")
    val out = graft.operators.Maintenance.profileTable(df)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keys.toSeq.sorted == Seq("flag", "id", "score", "tag"))
    val id = out("id")
    assert((id.getLong(1), id.getLong(2), id.getLong(3)) == ((3L, 0L, 2L)))
    assert((id.getDouble(4), id.getDouble(5)) == ((1.0, 2.0)))
    val score = out("score")
    assert((score.getLong(2), score.getLong(3)) == ((1L, 2L)))
    assert((score.getDouble(4), score.getDouble(5)) == ((-1.0, 2.5)))
    val tag = out("tag")
    assert((tag.getLong(2), tag.getLong(3)) == ((1L, 2L)))
    assert((tag.getString(6), tag.getString(7)) == (("a", "b")))
    assert(tag.isNullAt(4) && tag.isNullAt(5), "string column has no numeric min/max")
    // boolean profiles through the string branch
    assert((out("flag").getString(6), out("flag").getString(7)) == (("false", "true")))
    // column subset + unknown column validation
    assert(graft.operators.Maintenance.profileTable(df, Seq("id")).count() == 1)
    intercept[IllegalArgumentException] {
      graft.operators.Maintenance.profileTable(df, Seq("nope"))
    }
    // empty table: zero counts, null extremes — no NPE
    val empty = graft.operators.Maintenance.profileTable(df.filter(lit(false)))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(empty("id").getLong(1) == 0L && empty("id").getLong(2) == 0L &&
      empty("id").getLong(3) == 0L && empty("id").isNullAt(4))
  }

  test("sortCols naming a partition column cluster by the remaining cols per leaf") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact6").toString + "/t"
    for (b <- 0 until 4)
      (0 until 25).map(i => (100 - (b * 25 + i.toLong), s"r$b$i")).toDF("id", "text")
        .coalesce(1).write.mode("append").parquet(s"$dir/date=2026-02-01")
    // "date" is a partition column — constant per leaf, so clustering
    // on (date, id) must degrade gracefully to (id) within the leaf
    val nOut = Maintenance.compactParquet(spark, dir, targetBytes = Long.MaxValue,
      sortCols = Seq("date", "id"))
    assert(nOut == 1)
    val back = spark.read.parquet(s"$dir/date=2026-02-01")
    val ids = back.collect().map(_.getLong(0)).toSeq
    assert(ids == ids.sorted, "rows range-clustered by id within the leaf")
  }

  test("upsert: updates replace, inserts append, untouched rows pass through") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val updates = Seq((2L, "B"), (9L, "new")).toDF("k", "v")
    val out = Maintenance.upsert(base, updates, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    assert(out === Seq((1L, "a"), (2L, "B"), (3L, "c"), (9L, "new")))
  }

  test("upsert: schema mismatch and duplicate update keys are rejected") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Maintenance.upsert(base, Seq((1L, "a", 0)).toDF("k", "v", "extra"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Maintenance.upsert(base, Seq((1L, "x"), (1L, "y")).toDF("k", "v"), Seq("k"))
    }
  }

  test("snapshotDiff: added/removed/changed classified; unchanged rows dropped; nulls compare null-safely") {
    val base = Seq((1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
      (3L, Option.empty[String], 30.0), (4L, Some("d"), 40.0))
      .toDF("k", "s", "v")
    val cur = Seq((1L, Some("a"), 10.0),          // unchanged
      (2L, Some("B"), 20.0),                      // changed (s)
      (3L, Option.empty[String], 30.0),           // unchanged (null <=> null)
      (5L, Some("e"), 50.0))                      // added; 4 removed
      .toDF("k", "s", "v")
    val out = Maintenance.snapshotDiff(base, cur, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out === Map(2L -> "changed", 4L -> "removed", 5L -> "added"))
    // Null KEYS are first-class: presence is tracked by marker
    // columns and the key join is null-safe, so a null-key row only
    // in base is `removed` (not mis-filed as `added`), only in
    // current is `added`, in both with equal values is dropped.
    val nb = Seq((Some(1L), "x", 1.0), (Option.empty[Long], "gone", 2.0),
      (Option.empty[Long], "same", 3.0)).toDF("k", "s", "v")
    val nc = Seq((Some(1L), "x", 1.0), (Option.empty[Long], "same", 3.0),
      (Option.empty[Long], "new", 4.0)).toDF("k", "s", "v")
    val nout = Maintenance.snapshotDiff(nb, nc, Seq("k", "s"))
      .collect().map(r => ((if (r.isNullAt(0)) -1L else r.getLong(0)),
        r.getString(1)) -> r.getString(2)).toMap
    assert(nout === Map((-1L, "gone") -> "removed", (-1L, "new") -> "added"))
    val bad = base.withColumnRenamed("v", "w")
    intercept[IllegalArgumentException] {
      Maintenance.snapshotDiff(base, bad, Seq("k"))
    }
  }

  test("keySkewProfile: exact counts and shares on a planted skew distribution") {
    // one hot key with 90 rows + 10 singleton keys = 100 rows, 11 keys
    val rows = (Seq.fill(90)(999L) ++ (1L to 10L)).map(k => (k, "x"))
    val out = Maintenance.keySkewProfile(rows.toDF("k", "p"), Seq("k"), topK = 3)
      .collect()(0)
    assert(out.getLong(0) === 100L && out.getLong(1) === 11L && out.getLong(2) === 90L)
    // top-3 = 90 + 1 + 1 = 92
    assert(out.getLong(3) === 92L)
    assert(out.getDouble(4) === math.floor(0.92 * 1e6 + 0.5) / 1e6)
    assert(out.getDouble(5) === math.floor(90.0 * 11.0 / 100.0 * 1e6 + 0.5) / 1e6)
    // uniform data → skew_factor exactly 1
    val uni = (1L to 50L).map(k => (k, "x"))
    assert(Maintenance.keySkewProfile(uni.toDF("k", "p"), Seq("k"))
      .collect()(0).getDouble(5) === 1.0)
  }

  test("zOrderValue: hand-computed bit interleaves; high bits beyond `bits` are masked") {
    import spark.implicits._
    val rows = Seq((3L, 1L), (5L, 3L), (0L, 0L), (65541L, 3L)).toDF("x", "y")
    val out = rows.select(col("x"), col("y"),
        graft.operators.Maintenance.zOrderValue(col("x"), col("y"), bits = 16).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // x=0b11, y=0b01 → bits (x0,y0,x1,y1) = 1,1,1,0 → 0b0111 = 7
    assert(out((3L, 1L)) === 7L)
    // x=0b101, y=0b011 → 1,1,0,1,1,0 → 0b011011 = 27
    assert(out((5L, 3L)) === 27L)
    assert(out((0L, 0L)) === 0L)
    // 65541 = 2^16 + 5: bit 16 is beyond bits=16 → same key as x=5
    assert(out((65541L, 3L)) === 27L, "out-of-range bits never leak into the key")
  }

  test("zOrderWrite: every output file has a tight bounding box on BOTH columns") {
    import spark.implicits._
    val grid = for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    val zDir = Files.createTempDirectory("zorder").toFile.getAbsolutePath
    val yDir = Files.createTempDirectory("ysort").toFile.getAbsolutePath
    graft.operators.Maintenance.zOrderWrite(df, zDir, "x", "y", numFiles = 8, bits = 5)
    // contrast layout: single-column sort — y prunes, x never does
    df.repartitionByRange(8, col("y")).sortWithinPartitions("y")
      .write.mode("overwrite").parquet(yDir)
    def boxes(dir: String): Seq[(Long, Long)] =
      new java.io.File(dir).listFiles.filter(_.getName.endsWith(".parquet")).toSeq.map { f =>
        val part = spark.read.parquet(f.getAbsolutePath)
          .agg(min("x"), max("x"), min("y"), max("y")).collect()(0)
        (part.getLong(1) - part.getLong(0), part.getLong(3) - part.getLong(2))
      }
    val zBoxes = boxes(zDir); val yBoxes = boxes(yDir)
    assert(spark.read.parquet(zDir).count() === 1024, "all rows preserved")
    // a z-range of ~128 cells spans at most a 16x8 (+ sampling slack)
    // region; the full domain is 31 on each axis
    assert(zBoxes.forall { case (rx, ry) => rx <= 24 && ry <= 24 },
      s"z-order files bound BOTH columns: $zBoxes")
    assert(yBoxes.forall(_._1 === 31L),
      s"the single-column layout never prunes x: $yBoxes")
  }

  test("upsertParquet: in-place merge with staged swap, no staging debris") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString + "/t"
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v").write.parquet(dir)
    Maintenance.upsertParquet(spark, dir,
      Seq((2L, 99.0), (5L, 50.0)).toDF("k", "v"), Seq("k"))
    val back = spark.read.parquet(dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sortBy(_._1)
    assert(back === Seq((1L, 10.0), (2L, 99.0), (5L, 50.0)))
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.listFiles().exists(_.getName.contains("_upsert")),
      s"staging dirs cleaned: ${parent.listFiles().map(_.getName).toSeq}")
  }

  test("correlationMatrix: exact ±1 on linear columns, 0 on designed-orthogonal, null on constant") {
    import spark.implicits._
    // y = 2x (corr exactly 1), z = -x (exactly -1), w alternates ±1
    // over symmetric x (Σw = 0, Σxw = 0 → corr exactly 0), k constant.
    val rows = (-8 to 7).map { i =>
      val x = i.toDouble
      (x, 2.0 * x, -x, if (i % 2 == 0) 1.0 else -1.0, 5.0)
    }
    val out = Maintenance.correlationMatrix(
        rows.toDF("x", "y", "z", "w", "k"), Seq("x", "y", "z", "w", "k"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(("x", "y")) === Some(1.0))
    assert(out(("x", "z")) === Some(-1.0))
    assert(out(("y", "z")) === Some(-1.0))
    assert(out(("x", "k")) === None, "constant column → null corr")
    // Σxw = 0 by symmetry: -8..7 pairs (i, w) — compute expectation
    // exactly: Σx = -8, Σw = 0, Σxw = Σ even i − Σ odd i
    val n = 16.0
    val sx = rows.map(_._1).sum; val sw = rows.map(_._4).sum
    val sxw = rows.map(r => r._1 * r._4).sum
    val sxx = rows.map(r => r._1 * r._1).sum; val sww = n
    val expected = (n * sxw - sx * sw) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * sww - sw * sw))
    assert(out(("x", "w")) === Some(math.floor(expected * 1e6 + 0.5) / 1e6))
  }

  test("correlationMatrix: rows with any null excluded; determinism across partitionings") {
    import spark.implicits._
    val rows = (1 to 100).map(i =>
      (i.toDouble, (i * i % 37).toDouble, if (i % 10 == 0) None else Some(i / 3.0)))
    val df = rows.toDF("a", "b", "c")
    val r1 = Maintenance.correlationMatrix(df.repartition(1), Seq("a", "b", "c")).collect()
    val r7 = Maintenance.correlationMatrix(df.repartition(7), Seq("a", "b", "c")).collect()
    assert(r1.map(_.toSeq).toSeq === r7.map(_.toSeq).toSeq,
      "exact decimal moments ⇒ identical under any partitioning")
    assert(r1.head.getLong(2) === 90L, "null-bearing rows excluded from n")
  }

  test("integrityAudit: planted orphans and null keys decompose coverage exactly") {
    // parent keys {1, 2, 3}; child: 4 valid, 2 orphans (keys 7, 8 —
    // one key repeated is still two orphan ROWS), 2 nulls
    // → coverage = 4/8 = 0.5. Duplicate parent keys must not double
    // anything (distinct-before-anti-join).
    val parent = Seq(1L, 2L, 3L, 3L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(2L), Some(3L), Some(1L),
      Some(7L), Some(8L), None, None).toDF("ck")
    val r = Maintenance.integrityAudit(child, "ck", parent, "pk", "c->p")
      .collect().head
    assert(r.toSeq === Seq("c->p", 8L, 2L, 2L, 0.5))
    // clean relation reads coverage exactly 1.0
    val clean = Maintenance.integrityAudit(
      Seq(1L, 2L).toDF("ck"), "ck", parent, "pk", "ok").collect().head
    assert(clean.toSeq === Seq("ok", 2L, 0L, 0L, 1.0))
  }

  test("integrityAudit: empty child — coverage NULL (oracle parity), never NaN") {
    // An empty child is the fully-failed-ingest case the audit pages
    // on; 0/0 must surface as NULL like the DuckDB oracle, not as a
    // NaN that poisons downstream comparisons.
    val parent = Seq(1L, 2L).toDF("pk")
    val empty = Seq.empty[Long].toDF("ck")
    val r = Maintenance.integrityAudit(empty, "ck", parent, "pk", "none")
      .collect().head
    assert(r.getLong(1) === 0L && r.getLong(2) === 0L && r.getLong(3) === 0L)
    assert(r.isNullAt(4), s"coverage must be NULL on empty child, got $r")
  }
}
