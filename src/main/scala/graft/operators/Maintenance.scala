package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Table-maintenance operators — the operational side of running the
  * engine continuously at scale.
  *
  * Incremental ingestion (e.g. [[Dedup.incrementalExact]] appends, the
  * per-shard sinks, repeated small batch writes) accumulates small
  * files; every downstream scan then pays per-file open/footer costs
  * and the scheduler pays per-split overhead. Compaction is the
  * routine fix: rewrite a directory into size-targeted files,
  * optionally range-clustered on sort keys so parquet min/max
  * statistics enable data skipping for later predicate scans.
  */
object Maintenance {

  /** Compact a parquet directory into ~`targetBytes` files.
    *
    *  - Hive-partitioned layouts (`date=.../part-*.parquet`) are
    *    compacted PER LEAF PARTITION DIRECTORY: each leaf is rewritten
    *    in place, so directory names, partition-value spellings, and
    *    the physical column layout of the data files are preserved
    *    exactly (no partition-column inference round-trip, which could
    *    retype `date=01` dirs or re-emit partition values as physical
    *    columns in flat files). This is also the scale-correct form:
    *    one partition's rewrite never shuffles another's data.
    *  - Output file count = ceil(current bytes / targetBytes) —
    *    derived from a directory listing, not a data scan.
    *  - `sortCols` non-empty: rows are globally range-partitioned and
    *    sorted within partitions on those columns, so each output
    *    file covers a narrow key range — parquet row-group min/max
    *    stats then let later scans skip whole files/groups.
    *  - Rewrite is staged into a `_compact_tmp` sibling; the swap is
    *    rename-based (orig → `_compact_old`, tmp → dir, delete old),
    *    so a failure BEFORE the final rename leaves the original
    *    either in place or restorable at `_compact_old` — never both
    *    directories gone. Rename-swap is the strongest primitive a
    *    bare filesystem offers; on object stores whose rename is
    *    copy+delete, readers concurrent with the swap window need a
    *    manifest-based table format instead.
    *
    * Returns the number of output files.
    */
  def compactParquet(spark: SparkSession, dir: String,
                     targetBytes: Long = 128L * 1024 * 1024,
                     sortCols: Seq[String] = Nil): Int = {
    require(targetBytes > 0)
    val path = new Path(dir)
    // session conf so spark.hadoop.* (fs.defaultFS, credentials)
    // resolves the same filesystem the read/write below use
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())

    // Hive-partitioned layout: recurse into each leaf partition dir and
    // compact it independently (flat path below). A mix of data files
    // and partition dirs at the same level is ambiguous — refuse it
    // rather than silently produce a layout Spark cannot read back.
    val top = fs.listStatus(path)
    val partDirs = top.filter(s => s.isDirectory && isPartitionDir(s.getPath.getName))
    if (partDirs.nonEmpty) {
      val flatData = top.exists(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      require(!flatData,
        s"$dir mixes partition directories (${partDirs.head.getPath.getName}) " +
          "with flat parquet files; compact the two layouts separately")
      return partDirs.flatMap(d => partitionLeaves(fs, d.getPath))
        .map { leaf =>
          // partition columns are CONSTANT within a leaf: a sortCol
          // naming one is a no-op there (and absent from the leaf's
          // schema) — drop it so range clustering on (date, id) means
          // "cluster by id within each date dir", which is the same
          // global layout the caller asked for
          val partKeys = leaf.toString.stripPrefix(path.toString)
            .split("/").filter(_.contains("=")).map(_.takeWhile(_ != '=')).toSet
          compactParquet(spark, leaf.toString, targetBytes,
            sortCols.filterNot(partKeys.contains))
        }
        .sum
    }

    val it = fs.listFiles(path, true)
    var totalBytes = 0L
    var nFiles = 0
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
        totalBytes += st.getLen; nFiles += 1
      }
    }
    if (nFiles == 0) return 0
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val df = spark.read.parquet(dir)
    val shaped =
      if (sortCols.isEmpty) df.repartition(nOut)
      else df.repartitionByRange(nOut, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)

    // leading "_" so staging siblings that land INSIDE a partitioned
    // table (per-leaf compaction) are ignored by Spark's file listing
    // — a reader concurrent with the swap never mistakes
    // `date=x_compact_old` for a partition value
    val tmp = new Path(path.getParent, "_" + path.getName + "_compact_tmp")
    val old = new Path(path.getParent, "_" + path.getName + "_compact_old")
    shaped.write.mode("overwrite").parquet(tmp.toString)
    // swap via renames: the original is never deleted before the
    // replacement is in place
    fs.delete(old, true) // leftover from a crashed prior run
    require(fs.rename(path, old), s"rename $path -> $old failed; original untouched")
    if (!fs.rename(tmp, path)) {
      // restore and fail loudly — dir must never be left missing
      fs.rename(old, path)
      throw new IllegalStateException(s"rename $tmp -> $path failed; original restored")
    }
    fs.delete(old, true)
    nOut
  }

  /** MERGE/upsert as a pure transform: `updates` rows REPLACE base
    * rows sharing their key; update keys absent from the base are
    * inserts; base rows with no matching update pass through. The
    * lakehouse MERGE INTO (matched → update, not matched → insert)
    * over plain parquet, CDC-batch style.
    *
    * Requires both frames to share the (selected) schema — the
    * result is `updates ∪ (base ⟕anti updates)`, ONE equi-join on
    * the key columns, no window, map-combinable, and when `updates`
    * is broadcast-sized Spark plans a broadcast anti join (the base
    * never shuffles — the common small-CDC-batch case; asserted in
    * the plan audit).
    *
    * `updates` must be key-unique (two updates for one key make the
    * merge ambiguous); callers dedup upstream — validated here with
    * a cheap count check rather than silently keeping either.
    */
  def upsert(base: org.apache.spark.sql.DataFrame, updates: org.apache.spark.sql.DataFrame,
             keyCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val cols = base.columns.toSeq
    require(updates.columns.toSeq == cols,
      s"schema mismatch: base $cols vs updates ${updates.columns.toSeq}")
    val dupKeys = updates.groupBy(keyCols.map(col): _*).count()
      .filter(col("count") > 1).limit(1).count()
    require(dupKeys == 0L,
      s"updates carry multiple rows for one key ${keyCols.mkString(",")} — ambiguous merge")
    updates.unionByName(base.join(updates.select(keyCols.map(col): _*),
      keyCols, "left_anti"))
  }

  /** [[upsert]] against a parquet directory, rewritten in place with
    * the same staged rename swap as [[compactParquet]] (replacement
    * fully written before the original moves; crash leaves either
    * the old or the new table, never neither).
    */
  def upsertParquet(spark: SparkSession, dir: String, updates: org.apache.spark.sql.DataFrame,
                    keyCols: Seq[String]): Unit = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val merged = upsert(spark.read.parquet(dir), updates, keyCols)
    val tmp = new Path(path.getParent, "_" + path.getName + "_upsert_tmp")
    val old = new Path(path.getParent, "_" + path.getName + "_upsert_old")
    merged.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(old, true)
    require(fs.rename(path, old), s"rename $path -> $old failed; original untouched")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path)
      throw new IllegalStateException(s"rename $tmp -> $path failed; original restored")
    }
    fs.delete(old, true)
  }

  /** Pairwise Pearson correlation matrix over numeric columns from
    * ONE aggregation pass — the feature-analysis companion to
    * [[profileTable]].
    *
    * Why not `corr(...)`: Spark's (and DuckDB's) native corr folds
    * doubles in partition order, so the last bits differ run-to-run
    * and engine-to-engine. Here every moment (Σx, Σx², Σxy) is an
    * EXACT DECIMAL sum — inputs cast to DECIMAL(18,6) (deterministic
    * half-up at 1e-6), products DECIMAL(37,12) with no precision
    * loss, sums DECIMAL(38,12) — so the moments are bit-identical
    * under any partitioning, and the final
    * `(n·Σxy − Σx·Σy) / (√(n·Σx²−Σx²)·√(n·Σy²−Σy²))` is a
    * fixed-shape double formula over exact inputs.
    *
    * Rows with a NULL in ANY of `cols` are excluded (one consistent
    * n for every pair). Output: (col_a, col_b, n, corr) for the
    * strict upper triangle, corr NULL when a column is constant.
    * Scale: one map-side-combined aggregation producing a single
    * O(cols²)-moment row; the matrix explode is driver-trivial.
    */
  def correlationMatrix(df: org.apache.spark.sql.DataFrame,
                        cols: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(cols.size >= 2 && cols.distinct.size == cols.size,
      s"need >= 2 distinct columns, got $cols")
    // scan-parallelism floor (r15): the decimal moment partial
    // aggregation — 14 exact-decimal sums/products per row — ran as a
    // single scan task on the single-row-group bench parquet (measured
    // 1.8 CPU-s ≈ the query's whole wall); decimal sums are
    // order-immune, so spreading the scan is free. No-op whenever scan
    // partitions already reach the session parallelism (production
    // file counts).
    val base = graft.operators.Dedup.scanParallelismFloor(
      df.filter(cols.map(col(_).isNotNull).reduce(_ && _)))
    def d(c: String) = col(c).cast("decimal(18,6)")
    val moments =
      Seq(count(lit(1)).as("__n")) ++
      cols.map(c => sum(d(c)).as(s"__s_$c")) ++
      (for (i <- cols.indices; j <- i until cols.size)
        yield sum(d(cols(i)) * d(cols(j))).as(s"__p_${cols(i)}__${cols(j)}"))
    val one = base.agg(moments.head, moments.tail: _*)
    val nD = col("__n").cast("double")
    def sD(c: String) = col(s"__s_$c").cast("double")
    def pD(a: String, b: String) = col(s"__p_${a}__${b}").cast("double")
    val pairs = for (i <- cols.indices; j <- (i + 1) until cols.size) yield {
      val (a, b) = (cols(i), cols(j))
      val numer = nD * pD(a, b) - sD(a) * sD(b)
      val denom = sqrt(nD * pD(a, a) - sD(a) * sD(a)) *
        sqrt(nD * pD(b, b) - sD(b) * sD(b))
      struct(lit(a).as("col_a"), lit(b).as("col_b"), col("__n").as("n"),
        when(denom === 0.0, lit(null).cast("double"))
          .otherwise(graft.functions.MathFunctions.roundTo(numer / denom, 6))
          .as("corr"))
    }
    one.select(explode(array(pairs: _*)).as("r"))
      .select(col("r.col_a"), col("r.col_b"), col("r.n"), col("r.corr"))
      .orderBy("col_a", "col_b")
  }

  /** `name=value` Hive partition directory — staging/hidden dirs
    * (leading `_` or `.`) are never partition dirs.
    */
  private def isPartitionDir(name: String): Boolean =
    name.contains("=") && !name.startsWith("_") && !name.startsWith(".")

  /** Leaf partition directories under `dir` (dirs whose children are
    * data files, not further `k=v` dirs). Multi-level layouts
    * (`date=…/hour=…`) recurse to the deepest `k=v` level.
    */
  private def partitionLeaves(fs: FileSystem, dir: Path): Seq[Path] = {
    val st = fs.listStatus(dir)
    val children = st.filter(s => s.isDirectory && isPartitionDir(s.getPath.getName))
    if (children.isEmpty) Seq(dir)
    else {
      // same refusal as the top level, at EVERY level: data files next
      // to deeper k=v dirs would be silently skipped by a leaf-only
      // sweep (and Spark itself rejects such conflicting layouts)
      val dataHere = st.exists(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      require(!dataHere,
        s"$dir mixes partition directories (${children.head.getPath.getName}) " +
          "with data files at the same level; fix the layout before compacting")
      children.flatMap(c => partitionLeaves(fs, c.getPath)).toSeq
    }
  }

  /** ANALYZE-style table profile: one output row per column with
    * exact row/null/distinct counts and type-appropriate min/max —
    * the stats a data engineer reads before trusting a new table,
    * and the inputs cost-based planning and partition sizing start
    * from.
    *
    * All statistics come from ONE aggregation pass over the table
    * (Spark plans the multi-column COUNT(DISTINCT)s via Expand —
    * the same plan its own ANALYZE TABLE uses; at extreme widths,
    * profile a column subset or swap in [[Sketches.hllDistinct]]
    * estimates). The single collected row is schema-sized, never
    * data-sized; the reshape to per-column rows happens on the
    * driver from that one row.
    *
    * Engine-portable output: counts are exact longs; numeric min/max
    * surface as DOUBLE (single IEEE conversion, no accumulation);
    * string min/max as-is; timestamps via an explicit
    * second-precision format so no engine's cast style leaks in.
    */
  def profileTable(df: org.apache.spark.sql.DataFrame,
                   columns: Seq[String] = Seq.empty): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profileTable: no such columns $missing")
    def isNum(dt: DataType) = dt match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
           _: FloatType | _: DoubleType | _: DecimalType => true
      case _ => false
    }
    def strOf(c: String, agg: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      df.schema(c).dataType match {
        case _: TimestampType => date_format(agg, "yyyy-MM-dd HH:mm:ss")
        case _ => agg.cast("string")
      }
    // scan-parallelism floor: the multi-countDistinct aggregate
    // EXPANDs every row once per distinct-agg (|cols| ways) before the
    // partial aggregation, and the single-row-group testdata scan runs
    // that expansion on one task — see Dedup.scanParallelismFloor
    // (no-op whenever scan partitions already reach the session
    // parallelism, i.e. at any production file count).
    val src = graft.operators.Dedup.scanParallelismFloor(df)
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      val base = Seq(
        // coalesce: SUM over an empty table is NULL, not 0
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__dist_$c"))
      if (isNum(df.schema(c).dataType))
        base ++ Seq(min(col(c)).cast("double").as(s"__min_$c"),
                    max(col(c)).cast("double").as(s"__max_$c"))
      else
        base ++ Seq(strOf(c, min(col(c))).as(s"__smin_$c"),
                    strOf(c, max(col(c))).as(s"__smax_$c"))
    }
    val r = src.agg(aggs.head, aggs.tail: _*).collect()(0)
    val nRows = r.getAs[Long]("__n")
    def opt[A](name: String): Option[A] =
      if (r.schema.fieldNames.contains(name) && !r.isNullAt(r.fieldIndex(name)))
        Some(r.getAs[A](name))
      else None
    val rows = cols.sorted.map { c =>
      (c, nRows, r.getAs[Long](s"__nulls_$c"), r.getAs[Long](s"__dist_$c"),
        opt[Double](s"__min_$c"), opt[Double](s"__max_$c"),
        opt[String](s"__smin_$c"), opt[String](s"__smax_$c"))
    }
    import spark.implicits._
    rows.toDF("col_name", "n_rows", "n_nulls", "n_distinct",
      "min_num", "max_num", "min_str", "max_str")
  }

  /** Snapshot diff between two versions of a keyed table — the CDC /
    * audit primitive ("what did this pipeline run change?"): rows are
    * `added` (key only in `current`), `removed` (key only in `base`),
    * `changed` (key in both, any non-key column differs under
    * null-safe equality), and unchanged rows are dropped. Returns the
    * key columns + `diff_status`.
    *
    * Scale shape: ONE full-outer equi-join on the key (AQE handles
    * skew/broadcast); the column comparison is a scan-side null-safe
    * conjunction — no hashing scheme to drift between engines, no
    * window, nothing collected.
    *
    * Null keys are first-class: the join is null-safe (`<=>`) per key
    * column and side-presence is tracked with explicit marker
    * columns, so a null-keyed row present only in `base` reports
    * `removed` (a key-null presence test would have mis-filed it as
    * `added`).
    */
  def snapshotDiff(base: org.apache.spark.sql.DataFrame,
                   current: org.apache.spark.sql.DataFrame,
                   keyCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(base.columns.sorted.sameElements(current.columns.sorted),
      s"schema mismatch: ${base.columns.toSeq} vs ${current.columns.toSeq}")
    val valCols = base.columns.filterNot(keyCols.contains).toSeq
    val b = base.select(base.columns.map(c => col(c).as(s"__b_$c")).toSeq
      :+ lit(true).as("__b_present"): _*)
    val cu = current.select(current.columns.map(c => col(c).as(s"__c_$c")).toSeq
      :+ lit(true).as("__c_present"): _*)
    val cond = keyCols.map(k => col(s"__b_$k") <=> col(s"__c_$k")).reduce(_ && _)
    val inBase = col("__b_present").isNotNull
    val inCur = col("__c_present").isNotNull
    val same = valCols.map(c => col(s"__b_$c") <=> col(s"__c_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    b.join(cu, cond, "full_outer")
      .withColumn("diff_status",
        when(!inBase, lit("added"))
          .when(!inCur, lit("removed"))
          .when(!same, lit("changed")))
      .filter(col("diff_status").isNotNull)
      .select(keyCols.map(k => coalesce(col(s"__b_$k"), col(s"__c_$k")).as(k)) :+
        col("diff_status"): _*)
  }

  /** Join-key skew profile — the "should I salt this join / raise AQE
    * skew thresholds?" advisor, computed without ever materializing
    * more than the per-key count table: total rows, distinct keys,
    * the heaviest key's count, the share of rows owned by the top-`k`
    * keys, and `skew_factor` = max_cnt / (rows / keys) — 1.0 means
    * perfectly uniform, 10^4 means one key owns 10^4 partitions'
    * worth of an even shuffle.
    *
    * Scale shape: ONE map-side-combined count keyed by the join key;
    * the summary rolls that table up with exact integer aggregates
    * (top-k via a bounded TakeOrderedAndProject over counts — a tie
    * at the k boundary cannot change the SUM, so the share is
    * deterministic); one final row.
    */
  def keySkewProfile(df: org.apache.spark.sql.DataFrame, keyCols: Seq[String],
                     topK: Int = 10): org.apache.spark.sql.DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counts = df.groupBy(keyCols.map(col): _*).agg(count("*").as("cnt"))
    val top = counts.select(col("cnt")).orderBy(col("cnt").desc).limit(topK)
      .agg(sum("cnt").as("topk_rows"))
    val totals = counts.agg(count("*").as("n_keys"), sum("cnt").as("n_rows"),
      max("cnt").as("max_cnt"))
    totals.crossJoin(broadcast(top))
      .select(col("n_rows"), col("n_keys"), col("max_cnt"), col("topk_rows"),
        graft.functions.MathFunctions.roundTo(
          col("topk_rows").cast("double") / col("n_rows").cast("double"), 6).as("topk_share"),
        graft.functions.MathFunctions.roundTo(
          col("max_cnt").cast("double") * col("n_keys").cast("double") /
            col("n_rows").cast("double"), 6).as("skew_factor"))
  }

  /** Morton (Z-order) value of two non-negative integer columns: the
    * low `bits` bits of `x` and `y` interleaved (x in the even
    * positions) — the space-filling-curve key behind multi-dimensional
    * data clustering (Delta OPTIMIZE ZORDER, Iceberg sort orders).
    * Rows close in z-value are close in BOTH dimensions, so files
    * written in z order carry tight min/max ranges on each column and
    * parquet row-group / file skipping prunes on either predicate —
    * where a single-column sort only prunes its leading column.
    *
    * Pure codegen'd bit arithmetic (2·bits shift/mask/or terms), no
    * UDF, no shuffle; callers pre-normalize values into [0, 2^bits)
    * (the expression masks to be safe).
    */
  def zOrderValue(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
                  bits: Int = 16): org.apache.spark.sql.Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xl = x.cast("long"); val yl = y.cast("long")
    (0 until bits).map { i =>
      (shiftleft(shiftright(xl, i).bitwiseAND(1L), 2 * i)) +
        (shiftleft(shiftright(yl, i).bitwiseAND(1L), 2 * i + 1))
    }.reduce(_ + _)
  }

  /** Rewrite `df` into a z-order-clustered parquet layout: compute the
    * Morton key over the two clustering columns, RANGE-partition on it
    * (each output file owns one contiguous z-range) and sort within
    * partitions, so every file's (x, y) bounding box is tight. At
    * 100 TB this is the layout pass run once so that every subsequent
    * selective scan on either column skips most files; the range
    * exchange samples the key distribution, so skew in x or y does
    * not skew file sizes.
    */
  def zOrderWrite(df: org.apache.spark.sql.DataFrame, path: String,
                  xCol: String, yCol: String, numFiles: Int,
                  bits: Int = 16): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.withColumn("__z", zOrderValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Referential-integrity audit for one child→parent relation — the
    * warehouse FK check a lakehouse has to run itself (plain parquet
    * enforces nothing): one row of
    * (relation, n_child, n_null_keys, n_orphans, coverage) where
    * orphans are child rows whose non-null key matches NO parent key
    * and coverage = (n_child − n_null − n_orphans) ÷ n_child. A
    * coverage dip after an ingest is the earliest signal a partial
    * load or a key-renumbering broke a join downstream.
    *
    * Scale shape: the parent side reduces to DISTINCT keys before
    * the anti-join (map-side combined — a billion-row parent with a
    * million keys ships a million); the anti-join is a key equi-join
    * Catalyst broadcasts when the key set is small; the three counts
    * are one map-side-combined pass each. Coverage is one IEEE
    * division of exact longs, 1e-6-quantized; an EMPTY child table
    * (the fully-failed-ingest case this audit exists to page on)
    * yields coverage NULL — matching the oracle's NULL on 0/0 —
    * rather than Spark's NaN, which would poison downstream
    * comparisons.
    */
  def integrityAudit(child: org.apache.spark.sql.DataFrame, childKey: String,
      parent: org.apache.spark.sql.DataFrame, parentKey: String,
      relation: String): org.apache.spark.sql.DataFrame = {
    val rd = graft.functions.MathFunctions.roundTo _
    val keys = parent.select(col(parentKey).as("__pk")).distinct()
    val base = child.select(col(childKey).as("__ck"))
    val totals = base.agg(count("*").as("n_child"),
      count(when(col("__ck").isNull, 1)).as("n_null_keys"))
    val orphans = base.filter(col("__ck").isNotNull)
      .join(keys, col("__ck") === col("__pk"), "left_anti")
      .agg(count("*").as("n_orphans"))
    totals.crossJoin(broadcast(orphans)) // two one-row frames
      .select(lit(relation).as("relation"), col("n_child"), col("n_null_keys"),
        col("n_orphans"),
        when(col("n_child") > 0L,
          rd((col("n_child") - col("n_null_keys") - col("n_orphans")).cast("double") /
            col("n_child").cast("double"), 6)).as("coverage"))
  }
}
