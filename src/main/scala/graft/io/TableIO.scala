package graft.io

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.ExtractedTurn
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg-lite table layout over a plain parquet directory — the
  * sandbox stand-in for the Iceberg contract the north rule names
  * (no Iceberg runtime jar ships with this image; SURVEY.md §7.1).
  * A real `format("iceberg")` catalog is a drop-in replacement behind
  * this object's API.
  *
  * Layout:
  *   root/bucket=<b>/…parquet        data, b = pmod(xxhash64(conv_id), B)
  *   root/_snapshots/snap-<k>.json   committed buckets + lineage rows
  *
  * Guarantees:
  *  - waves of buckets commit atomically: data written under
  *    root/_staging/<b>, renamed into place, THEN the snapshot is
  *    written via temp+rename — a crash leaves either a fully
  *    committed wave (snapshot present) or replayable staging garbage;
  *  - resume skips buckets named in the latest snapshot and rewrites
  *    any partially-written uncommitted bucket from scratch
  *    (idempotent: per-turn extraction is a pure function);
  *  - per-bucket lineage (rows, key range, error rows, wall ms) is
  *    computed from the DURABLE files (read-back after rename), not
  *    from in-flight data.
  */
object TableIO {

  final case class BucketLineage(
      bucket: Int, rows: Long, minKey: String, maxKey: String,
      errorRows: Long, wallMs: Long, snapshotId: Int, version: Int = 0)

  def bucketOf(convIdCol: org.apache.spark.sql.Column, buckets: Int) =
    pmod(xxhash64(convIdCol), lit(buckets)).cast("int")

  private def snapDir(root: String) = Paths.get(root, "_snapshots")

  /** Files.list with the underlying directory stream CLOSED (a bare
    * .iterator() leaks the fd until GC — on the operational paths that
    * scan every bucket this can exhaust the fd limit). */
  private def listDir(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    if (!Files.isDirectory(p)) return Nil
    val s = Files.list(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  /** All snapshot ids present under root/_snapshots, ascending. */
  def snapshotIds(root: String): Seq[Int] =
    listDir(snapDir(root))
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("snap-") && n.endsWith(".json"))
      .map(n => n.stripPrefix("snap-").stripSuffix(".json").toInt)
      .sorted

  /** Buckets recorded committed by the latest snapshot (with its id). */
  def committed(root: String): (Int, Set[Int]) = {
    val snaps = snapshotIds(root)
    if (snaps.isEmpty) return (-1, Set.empty)
    val latest = snaps.max
    val json = Files.readString(snapDir(root).resolve(s"snap-$latest.json"))
    val ids = "\"bucket\":\\s*(\\d+)".r.findAllMatchIn(json).map(_.group(1).toInt).toSet
    (latest, ids)
  }

  /** Lineage as recorded by snapshot `snap` — each snapshot is a full
    * manifest (one row per live bucket), Iceberg-style. */
  def lineageAt(root: String, snap: Int): Seq[BucketLineage] =
    parseManifest(snapDir(root).resolve(s"snap-$snap.json"), snap)

  /** Executor-safe manifest parse (also used by the DataSource V2
    * lineage connector, graft.sources.LineageSource). */
  private[graft] def parseManifestFile(f: java.nio.file.Path,
      snap: Int): Seq[BucketLineage] = parseManifest(f, snap)

  private def parseManifest(f: java.nio.file.Path, snap: Int): Seq[BucketLineage] = {
    if (!Files.isRegularFile(f)) return Nil
    // "version" is optional in the entry (pre-merge manifests lack it →
    // version 0, the bytes that have always lived at bucket=<b>)
    val entry = ("\\{\"bucket\":\\s*(\\d+),\\s*\"rows\":\\s*(\\d+),\\s*\"minKey\":\\s*\"([^\"]*)\"," +
      "\\s*\"maxKey\":\\s*\"([^\"]*)\",\\s*\"errorRows\":\\s*(\\d+),\\s*\"wallMs\":\\s*(\\d+)" +
      "(?:,\\s*\"version\":\\s*(\\d+))?\\}").r
    entry.findAllMatchIn(Files.readString(f)).map(m =>
      BucketLineage(m.group(1).toInt, m.group(2).toLong, m.group(3), m.group(4),
        m.group(5).toLong, m.group(6).toLong, snap,
        Option(m.group(7)).map(_.toInt).getOrElse(0))).toSeq
  }

  /** lineageAt that refuses to read back empty for a snapshot the
    * caller just validated — the manifest vanishing between the check
    * and the read (concurrent expireSnapshots) or parsing to zero
    * entries must be a loud failure, not a silently empty table
    * (publishSnapshot never writes an empty manifest). */
  private def lineageAtStrict(root: String, snap: Int): Seq[BucketLineage] = {
    val lin = lineageAt(root, snap)
    require(lin.nonEmpty,
      s"snapshot $snap under $root/_snapshots validated but its manifest read back empty " +
        "(concurrent expireSnapshots or a corrupt manifest?) — refusing to return an empty table")
    lin
  }

  /** Lineage from the LATEST snapshot. */
  def lineage(root: String): Seq[BucketLineage] = {
    val ids = snapshotIds(root)
    if (ids.isEmpty) Nil else lineageAt(root, ids.max)
  }

  /** Write (or resume writing) the extracted table in `waves` groups of
    * conv_id-hash buckets. Returns lineage rows for the buckets written
    * in THIS invocation. */
  def writeExtracted(
      ds: Dataset[ExtractedTurn],
      root: String,
      buckets: Int = 32,
      waves: Int = 4,
      stopAfterWaves: Int = Int.MaxValue): Seq[BucketLineage] =
    writeExtractedDf(ds.toDF(), root, buckets, waves, stopAfterWaves)

  /** The untyped face of writeExtracted — for waves written AFTER a
    * schema evolution, whose frames carry the added columns (the typed
    * face delegates here). Requires conv_id/turn_idx/errors columns. */
  def writeExtractedDf(
      df: org.apache.spark.sql.DataFrame,
      root: String,
      buckets: Int = 32,
      waves: Int = 4,
      stopAfterWaves: Int = Int.MaxValue): Seq[BucketLineage] = {
    val spark = df.sparkSession
    Files.createDirectories(snapDir(root))
    val (lastSnap, done) = committed(root)
    // the table's recorded spec wins over the caller's parameter (a
    // resume after a rebucket must keep the evolved layout); a fresh
    // table records the creation spec
    val effBuckets = bucketCount(root, buckets)
    if (bucketSpecs(root).isEmpty && lastSnap < 0)
      recordBucketSpec(root, effBuckets, -1)
    var snapId = lastSnap
    val written = Seq.newBuilder[BucketLineage]
    val withBucket = df.withColumn("bucket", bucketOf(col("conv_id"), effBuckets))

    for (wave <- 0 until math.min(waves, stopAfterWaves)) {
      val waveBuckets = (0 until effBuckets).filter(b => b % waves == wave && !done.contains(b))
      if (waveBuckets.nonEmpty) {
        val t0 = System.currentTimeMillis()
        // clean any partial leftovers from a crashed run (idempotence)
        for (b <- waveBuckets) {
          deleteRecursively(Paths.get(root, s"bucket=$b"))
          deleteRecursively(Paths.get(root, "_staging", b.toString))
        }
        val staged = s"$root/_staging/wave-$wave"
        deleteRecursively(Paths.get(staged))
        withBucket
          .filter(col("bucket").isin(waveBuckets.map(Integer.valueOf): _*))
          .repartition(waveBuckets.length, col("bucket"))
          // sorted within each bucket file: parquet row-group min/max
          // stats on conv_id become selective, so a point lookup prunes
          // row groups inside the bucket it already pruned to
          .sortWithinPartitions(col("bucket"), col("conv_id"), col("turn_idx"))
          .write.partitionBy("bucket").mode("overwrite").parquet(staged)
        // atomic-ish publish: rename each bucket dir into place
        for (b <- waveBuckets) {
          val src = Paths.get(staged, s"bucket=$b")
          if (Files.isDirectory(src)) {
            Files.move(src, Paths.get(root, s"bucket=$b"), StandardCopyOption.ATOMIC_MOVE)
          } else {
            Files.createDirectories(Paths.get(root, s"bucket=$b")) // empty bucket
          }
        }
        deleteRecursively(Paths.get(staged))
        val wallMs = System.currentTimeMillis() - t0
        // lineage from durable files (skip buckets that landed empty —
        // an empty dir has no schema to read)
        val nonEmpty = waveBuckets.filter { b =>
          listDir(Paths.get(root, s"bucket=$b"))
            .exists(_.getFileName.toString.endsWith(".parquet"))
        }
        val rows: Map[Int, (Long, String, String, Long)] =
          if (nonEmpty.isEmpty) Map.empty
          else spark.read.option("basePath", root)
            .parquet(nonEmpty.map(b => s"$root/bucket=$b"): _*)
            .groupBy(col("bucket")).agg(
              count(lit(1)).as("rows"),
              min(col("conv_id")).as("minKey"), max(col("conv_id")).as("maxKey"),
              sum(when(col("errors").isNotNull, 1L).otherwise(0L)).as("errs"))
            .collect()
            .map(r => r.getInt(0) -> (r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
            .toMap
        snapId += 1
        val lin = waveBuckets.map { b =>
          val (n, lo, hi, e) = rows.getOrElse(b, (0L, "", "", 0L))
          BucketLineage(b, n, lo, hi, e, wallMs, snapId)
        }
        written ++= lin
        publishSnapshot(root, snapId, lin)
      }
    }
    written.result()
  }

  private[graft] def publishSnapshot(root: String, id: Int,
      newLineage: Seq[BucketLineage]): Unit = {
    // snapshot = previous lineage ∪ this wave's (full manifest each time,
    // like an Iceberg snapshot referencing all live manifests)
    val prev = lineage(root).filter(l => !newLineage.exists(_.bucket == l.bucket))
    val all = (prev ++ newLineage).sortBy(_.bucket)
    writeManifestCas(snapDir(root), id, all)
  }

  /** Write a full manifest via temp + hard-link publish. The link(2)
    * is a compare-and-swap: it fails if the target exists, so two
    * writers that both read snapshot k and try to publish k+1 conflict
    * LOUDLY instead of one silently replacing the other's manifest
    * (rename(2) would replace) — the optimistic-concurrency contract
    * of an Iceberg commit under this layout. Shared by the main
    * snapshot line and every branch's line. */
  private def writeManifestCas(dir: java.nio.file.Path, id: Int,
      all: Seq[BucketLineage]): Unit = {
    val body = all.map(l =>
      s"""{"bucket": ${l.bucket}, "rows": ${l.rows}, "minKey": "${l.minKey}", "maxKey": "${l.maxKey}", "errorRows": ${l.errorRows}, "wallMs": ${l.wallMs}, "version": ${l.version}}""")
      .mkString("[\n  ", ",\n  ", "\n]")
    val tmp = dir.resolve(s".snap-$id.json.tmp")
    Files.writeString(tmp, s"""{"snapshot": $id, "committed": $body}""")
    try Files.createLink(dir.resolve(s"snap-$id.json"), tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"concurrent writer: snapshot $id already published under $dir — " +
            "re-read the table state and retry the operation")
    } finally Files.deleteIfExists(tmp)
  }

  /** Small-file compaction — the operational half of an Iceberg-style
    * table at scale (streaming micro-batches and per-wave task counts
    * leave buckets with many sub-target files; scan cost grows with
    * file count, not bytes). For every committed bucket whose parquet
    * file count exceeds `maxFiles`, rewrite the bucket's data as
    * ceil(bytes / targetBytes) files, content-preserving:
    *
    *  1. rewrite into _staging/compact-<b> and VERIFY the staged row
    *     count against the bucket's lineage before touching live data
    *     (a bad rewrite aborts, old files stay);
    *  2. swap live ← staged via two atomic renames with the old dir
    *     parked in _staging/old-<b>;
    *  3. publish a new snapshot carrying the bucket's UNCHANGED
    *     rows/keys lineage (compaction moves bytes, not rows).
    *
    * A crash between the two renames leaves the old dir parked;
    * `recoverCompaction` (run on entry) restores any parked bucket
    * whose live dir is missing and clears stale parks, so the table is
    * never readable-empty after a crashed compaction. Returns the
    * buckets compacted. */
  def compact(spark: SparkSession, root: String, maxFiles: Int = 8,
      targetBytes: Long = 128L << 20): Seq[Int] = {
    recoverCompaction(root)
    val (snap, done) = committed(root)
    if (snap < 0) return Nil
    var snapId = snap
    val lin = lineage(root).map(l => l.bucket -> l).toMap
    val out = Seq.newBuilder[Int]
    for (b <- done.toSeq.sorted) {
      val live = Paths.get(root, s"bucket=$b")
      val files = listDir(live).filter(_.getFileName.toString.endsWith(".parquet"))
      val totalBytes = files.map(Files.size).sum
      val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
      // only rewrite when it actually reduces the file count — a bucket
      // already at ceil(bytes/target) files is DONE even if that exceeds
      // maxFiles (otherwise every call would rewrite it forever)
      if (files.length > maxFiles && files.length > nOut) {
        val t0 = System.currentTimeMillis()
        val staged = Paths.get(root, "_staging", s"compact-$b")
        deleteRecursively(staged)
        spark.read.parquet(live.toString)
          .coalesce(nOut)
          .write.mode("overwrite").parquet(staged.toString)
        val stagedRows = spark.read.parquet(staged.toString).count()
        val expect = lin.get(b).map(_.rows).getOrElse(-1L)
        if (stagedRows != expect) {
          // bad rewrite: abort this bucket, keep the live files
          System.err.println(
            s"[TableIO.compact] bucket $b row mismatch staged=$stagedRows lineage=$expect — aborted")
          deleteRecursively(staged)
        } else {
          val parked = Paths.get(root, "_staging", s"old-$b")
          deleteRecursively(parked)
          Files.move(live, parked, StandardCopyOption.ATOMIC_MOVE)
          Files.move(staged, live, StandardCopyOption.ATOMIC_MOVE)
          deleteRecursively(parked)
          snapId += 1
          val updated = lin(b).copy(wallMs = System.currentTimeMillis() - t0,
            snapshotId = snapId)
          publishSnapshot(root, snapId, Seq(updated))
          out += b
        }
      }
    }
    out.result()
  }

  /** Restore any bucket left parked by a compaction that crashed
    * between its two renames (live dir missing → move the park back);
    * clear parks whose live dir exists (crash after the second rename,
    * before cleanup). */
  def recoverCompaction(root: String): Unit = {
    val staging = Paths.get(root, "_staging")
    if (!Files.isDirectory(staging)) return
    for (p <- listDir(staging)) {
      val name = p.getFileName.toString
      if (name.startsWith("old-")) {
        val b = name.stripPrefix("old-")
        val live = Paths.get(root, s"bucket=$b")
        if (!Files.isDirectory(live))
          Files.move(p, live, StandardCopyOption.ATOMIC_MOVE)
        else deleteRecursively(p)
      } else if (name.startsWith("compact-")) deleteRecursively(p)
    }
  }

  /** The driver-side twin of `bucketOf`: the bucket a conv_id hashes to
    * (same XxHash64 seed-42 + pmod as the write path), computed without
    * a Spark job. */
  def bucketIdOf(convId: String, buckets: Int): Int = {
    val h = new org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(convId),
        org.apache.spark.sql.types.StringType)))
      .eval(null).asInstanceOf[Long]
    (((h % buckets) + buckets) % buckets).toInt
  }

  /** Point lookup — the bucketed layout's payoff: a conv_id read opens
    * ONLY its hash bucket's directory (1/B of the table's files at any
    * scale), then filters within it. The conv_id filter still pushes to
    * the parquet row groups inside that bucket. */
  def lookupConv(spark: SparkSession, root: String, convId: String,
      buckets: Int = 32): Dataset[ExtractedTurn] = {
    import spark.implicits._
    recoverCompaction(root) // a crashed compaction must not read as a miss
    recoverMerge(root)      // nor a crashed merge as unpublished data
    val b = bucketIdOf(convId, bucketCount(root, buckets))
    val dir = Paths.get(root, s"bucket=$b")
    val hasData = listDir(dir).exists(_.getFileName.toString.endsWith(".parquet"))
    if (!hasData) spark.emptyDataset[ExtractedTurn] // point-lookup miss
    else {
      val base = spark.read.parquet(dir.toString)
        .filter(col("conv_id") === convId)
      val (snap, _) = committed(root)
      val df = if (snap < 0) base
               else applyMorDeletes(base, spark, root, snap,
                 lineage(root).filter(_.bucket == b))
      df.as[ExtractedTurn]
    }
  }

  def readExtracted(spark: SparkSession, root: String): Dataset[ExtractedTurn] = {
    import spark.implicits._
    recoverCompaction(root) // restore any bucket parked by a crashed compaction
    recoverMerge(root)      // roll back any merge that died before its publish
    val base = spark.read.option("basePath", root).parquet(root)
      .drop("bucket")
    val (snap, _) = committed(root)
    val df = if (snap < 0) base
             else applyMorDeletes(base, spark, root, snap, lineage(root))
    df.as[ExtractedTurn]
  }

  /** Snapshot time travel — read the table as of snapshot `asOfSnapshot`.
    *
    * Exactness argument for this layout: a bucket named in a snapshot's
    * manifest is IMMUTABLE afterwards — resume only (re)writes buckets
    * absent from the latest snapshot, and compaction's rewrite is
    * row-verified content-preserving before the swap — so "the table at
    * snap-k" is exactly "today's bytes of the buckets snap-k's manifest
    * names". Later snapshots only ADD buckets (or re-pack existing ones
    * without changing rows), which is what the restriction hides. Real
    * Iceberg pins file paths per snapshot instead; the bucket-set pin is
    * the equivalent under this layout's immutability contract. */
  def readExtracted(spark: SparkSession, root: String,
      asOfSnapshot: Int): Dataset[ExtractedTurn] = {
    import spark.implicits._
    recoverCompaction(root)
    recoverMerge(root)
    require(snapshotIds(root).contains(asOfSnapshot),
      s"no snapshot $asOfSnapshot under $root/_snapshots (have ${snapshotIds(root).mkString(",")})")
    val lin = lineageAtStrict(root, asOfSnapshot)
    applyMorDeletes(versionedDf(spark, root, lin), spark, root,
      asOfSnapshot, lin).as[ExtractedTurn]
  }

  /** Incremental read — the rows added OR rewritten between `fromSnap`
    * (exclusive) and `toSnap` (inclusive), from the manifest diff:
    * (bucket, version) pairs named by snap-to but not snap-from. A
    * bucket first committed in the window arrives whole; a bucket
    * MERGED in the window arrives as its post-merge version (bucket-
    * level change granularity, like Iceberg's incremental read over
    * overwrite snapshots). Compaction-only snapshots contribute nothing
    * (compaction re-packs bytes without bumping the version), so a
    * downstream consumer polling readChanges never re-sees re-packed
    * rows. `fromSnap = -1` means "from before the first snapshot" and
    * yields the whole table at `toSnap`. */
  def readChanges(spark: SparkSession, root: String, fromSnap: Int,
      toSnap: Int): Dataset[ExtractedTurn] = {
    import spark.implicits._
    recoverCompaction(root)
    recoverMerge(root)
    require(fromSnap == -1 || snapshotIds(root).contains(fromSnap),
      s"no snapshot $fromSnap under $root/_snapshots")
    require(snapshotIds(root).contains(toSnap), s"no snapshot $toSnap under $root/_snapshots")
    require(fromSnap <= toSnap, s"readChanges range is backwards: $fromSnap > $toSnap")
    val before: Set[(Int, Int)] =
      if (fromSnap == -1) Set.empty
      else lineageAtStrict(root, fromSnap).map(l => (l.bucket, l.version)).toSet
    val linTo = lineageAtStrict(root, toSnap)
    val added = linTo.filterNot(l => before((l.bucket, l.version)))
    // MoR records applicable at toSnap filter the incremental state
    // exactly like a full read (a consumer materializing changes must
    // not resurrect rows a delete file already removed)
    applyMorDeletes(versionedDf(spark, root, added), spark, root,
      toSnap, linTo).as[ExtractedTurn]
  }

  /** Net-effect changelog (CDC scan) between two snapshots: one row per
    * row-level change with `op` ∈ insert | delete — an update surfaces
    * as its delete(old payload) + insert(new payload) pair. "Net
    * effect" = the diff of the two materialized states (Iceberg's
    * changelog-with-net-changes semantics): a row inserted and deleted
    * inside the window contributes nothing; a row inserted then updated
    * arrives as one insert carrying its final payload.
    *
    * Scale shape: bucket versions are immutable, so a (bucket, version)
    * pair present in BOTH manifests is proven row-identical by the
    * manifest alone and is never read — the manifest is the merkle
    * tree. Only version-changed buckets are scanned (old version from
    * the copy-on-write archive, new from the live dir), and the
    * old-vs-new classification is one per-bucket-keyed full outer join.
    * A changelog between adjacent snapshots of a 100 TB table costs
    * O(touched buckets), not O(table). */
  def changelog(spark: SparkSession, root: String, fromSnap: Int,
      toSnap: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    recoverCompaction(root)
    recoverMerge(root)
    require(snapshotIds(root).contains(fromSnap),
      s"no snapshot $fromSnap under $root/_snapshots")
    require(snapshotIds(root).contains(toSnap),
      s"no snapshot $toSnap under $root/_snapshots")
    require(fromSnap <= toSnap, s"changelog range is backwards: $fromSnap > $toSnap")
    val la = lineageAtStrict(root, fromSnap)
    val lb = lineageAtStrict(root, toSnap)
    val va = la.map(l => (l.bucket, l.version)).toSet
    val vb = lb.map(l => (l.bucket, l.version)).toSet
    // both states are delete-APPLIED so the version-diff below sees
    // exactly what a reader at each snapshot sees (a bucket rewritten
    // in-window after an MoR delete folds the delete into new bytes;
    // the old state must drop the same keys only if the delete was
    // already committed at fromSnap)
    val oldRows = applyMorDeletes(
      versionedDf(spark, root, la.filterNot(l => vb((l.bucket, l.version)))),
      spark, root, fromSnap, la)
    val newRows = applyMorDeletes(
      versionedDf(spark, root, lb.filterNot(l => va((l.bucket, l.version)))),
      spark, root, toSnap, lb)
    // ordering-based struct compare: null fields compare equal, arrays
    // elementwise — exactly the row-identity the archive bytes carry
    val o = oldRows.select(col("conv_id").as("k1"), col("turn_idx").as("k2"),
      struct(col("*")).as("o_row"))
    val n = newRows.select(col("conv_id").as("k1"), col("turn_idx").as("k2"),
      struct(col("*")).as("n_row"))
    val j = o.join(n, Seq("k1", "k2"), "full_outer")
    val dels = j.filter(col("o_row").isNotNull &&
        (col("n_row").isNull || col("o_row") =!= col("n_row")))
      .select(lit("delete").as("op"), col("o_row").as("row"))
    val ins = j.filter(col("n_row").isNotNull &&
        (col("o_row").isNull || col("o_row") =!= col("n_row")))
      .select(lit("insert").as("op"), col("n_row").as("row"))
    // MoR-delta: delete records committed in-window against buckets
    // whose (bucket, version) is UNCHANGED between the two manifests —
    // those buckets never enter the version diff above, so their
    // delete files are the only change and the shared bytes carry the
    // old payloads. (A bucket rewritten in-window surfaces its MoR
    // deletes through the delete-applied version diff already.)
    val common = la.filter(l => vb((l.bucket, l.version)))
    val commonPairs = common.map(l => (l.bucket, l.version)).toSet
    val hit = deleteSetIds(root)
      .filter(id => id > fromSnap && id <= toSnap)
      .filter(id => deleteSetPairs(root, id).exists(commonPairs))
    val morDels =
      if (hit.isEmpty) None
      else {
        val hitPairs = hit.flatMap(deleteSetPairs(root, _)).toSet & commonPairs
        val recs = spark.read.parquet(
          hit.map(id => deleteSetDir(root, id).resolve("keys").toString): _*)
        val linDf = spark.createDataFrame(hitPairs.toSeq.sorted)
          .toDF("bucket", "version")
        val keys0 = recs.join(broadcast(linDf), Seq("bucket", "version"), "left_semi")
          .select(col("conv_id").as("k1"), col("turn_idx").as("k2")).distinct()
        // a key some EARLIER delete file already removed at fromSnap
        // was not visible then — deleting it again is not a net change
        val keys = applicableDeletes(spark, root, fromSnap, la) match {
          case None    => keys0
          case Some(d) => keys0.join(
            d.select(col("conv_id").as("k1"), col("turn_idx").as("k2")),
            Seq("k1", "k2"), "left_anti")
        }
        val payload = versionedDf(spark, root,
          common.filter(l => hitPairs((l.bucket, l.version))))
        Some(payload
          .select(col("conv_id").as("k1"), col("turn_idx").as("k2"),
            struct(col("*")).as("row"))
          .join(keys, Seq("k1", "k2"), "left_semi")
          .select(lit("delete").as("op"), col("row")))
      }
    val cow = dels.unionByName(ins)
    morDels.fold(cow)(cow.unionByName(_)).select(col("op"), col("row.*"))
  }

  /** The manifest entries as one DataFrame, resolving each (bucket,
    * version) to its bytes: the live dir when the version is current,
    * else the copy-on-write archive `_archive/bucket=<b>/v<k>` that the
    * merge parked it in. Leaf dirs are read WITHOUT basePath so no
    * partition column is inferred (archive paths sit at a different
    * depth than live ones; the data files carry the full row schema).
    * Empty set / all-empty buckets → empty result with the
    * ExtractedTurn schema. */
  private def versionedDf(spark: SparkSession, root: String,
      entries: Seq[BucketLineage],
      branch: Option[String] = None): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Encoders
    val current = lineage(root).map(l => l.bucket -> l.version).toMap
    val dirs = entries.sortBy(_.bucket).map { l =>
      // a branch-private version dir shadows main resolution: branch
      // merges only ever write under _branches/<name>, so its presence
      // means THIS branch produced that (bucket, version)
      val bdir = branch.map(n => branchDataDir(root, n, l.bucket, l.version))
      if (bdir.exists(Files.isDirectory(_))) bdir.get
      else if (current.getOrElse(l.bucket, l.version) == l.version) {
        // live resolution — but a bucket DROPPED from the head by a
        // rollback keeps its bytes only in the archive; fall back there
        // so the rolled-past snapshots stay readable
        val live = Paths.get(root, s"bucket=${l.bucket}")
        if (listDir(live).exists(_.getFileName.toString.endsWith(".parquet"))) live
        else {
          val arch = archiveDir(root, l.bucket, l.version)
          if (Files.isDirectory(arch)) arch else live
        }
      } else archiveDir(root, l.bucket, l.version)
    }.filter(d => listDir(d).exists(_.getFileName.toString.endsWith(".parquet")))
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        Encoders.product[ExtractedTurn].schema)
    else
      spark.read.parquet(dirs.map(_.toString): _*)
  }

  private def archiveDir(root: String, bucket: Int, version: Int) =
    Paths.get(root, "_archive", s"bucket=$bucket", s"v$version")

  /** Row-level MERGE (upsert) — the engine analog of the reference's
    * re-POST-a-folder workflow (re-running extraction over a corrected
    * subset overwrites per-doc results, scripts/app_interaction/
    * test_app_all.py:113-132 save_result): rows in `updates` REPLACE
    * table rows with the same (conv_id, turn_idx) key; unmatched update
    * rows are inserted into their hash bucket.
    *
    * Copy-on-write by bucket: only the buckets the update keys hash to
    * are rewritten (1/B of the table per touched bucket at any scale —
    * the update join streams against just those buckets' rows, never
    * the full table), each in a NEW version, with the replaced version
    * atomically parked under `_archive/bucket=<b>/v<old>` so snapshot
    * time travel still reads the exact pre-merge bytes. The manifest
    * entry pins (bucket, version); `versionedDf` resolves old versions
    * to the archive. Crash safety: the archive move happens before the
    * staged move-in and the snapshot publish is last, so `recoverMerge`
    * (run on every entry) can always restore the pre-merge state — an
    * archive dir at the CURRENT manifest version is the in-flight-merge
    * marker (a published merge always leaves the archive strictly
    * behind the manifest version).
    *
    * Buckets not named by the latest manifest are committed as
    * update-only buckets (the merge upserts into the table "as
    * committed"; an in-progress writeExtracted resume wave skips them
    * like any committed bucket). Returns the new lineage rows. */
  def mergeExtracted(updates: Dataset[ExtractedTurn], root: String,
      buckets: Int = 32): Seq[BucketLineage] = {
    val spark = updates.sparkSession
    recoverCompaction(root)
    recoverMerge(root)
    val (snap, _) = committed(root)
    require(snap >= 0, s"mergeExtracted needs an existing table under $root (write waves first)")
    val effB = bucketCount(root, buckets) // recorded spec wins post-rebucket
    val lin = lineage(root).map(l => l.bucket -> l).toMap
    val t0 = System.currentTimeMillis()
    val upd = updates.toDF().withColumn("bucket", bucketOf(col("conv_id"), effB))
      .localCheckpoint(true) // updates are read 3× below (keys, union, count)
    // affected buckets: bounded by B — a driver-side list, not data
    val affected = upd.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (affected.isEmpty) { upd.unpersist(); return Nil }
    val committedAffected = affected.filter(b => lin.contains(b) &&
      listDir(Paths.get(root, s"bucket=$b"))
        .exists(_.getFileName.toString.endsWith(".parquet")))
    val existing =
      if (committedAffected.isEmpty) None
      else Some(applyMorDeletes(
        // fold pending MoR deletes while rewriting: the new version's
        // bytes must not resurrect rows a delete file removed (the
        // version bump below makes those records inert)
        spark.read.parquet(
          committedAffected.map(b => s"$root/bucket=$b"): _*)
          .withColumn("bucket", bucketOf(col("conv_id"), effB)),
        spark, root, snap, lineage(root)))
    val keep = existing.map(
      _.join(upd.select(col("conv_id"), col("turn_idx")).distinct(),
        Seq("conv_id", "turn_idx"), "left_anti"))
    // allowMissingColumns: typed updates merged into a schema-EVOLVED
    // table lack the added columns — they land as null, which readTable
    // presents as the column default (NOT-NULL-with-default contract)
    val merged = keep match {
      case Some(k) => k.unionByName(upd, allowMissingColumns = true)
      case None    => upd
    }
    val staged = Paths.get(root, "_staging", "merge")
    deleteRecursively(staged)
    merged
      .repartition(affected.length, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("conv_id"), col("turn_idx"))
      .write.partitionBy("bucket").mode("overwrite").parquet(staged.toString)
    upd.unpersist()
    // swap: archive the replaced version FIRST, then move the staged
    // bucket in; the snapshot publish below is the commit point
    for (b <- affected) {
      val live = Paths.get(root, s"bucket=$b")
      val src = staged.resolve(s"bucket=$b")
      if (lin.contains(b) && Files.isDirectory(live)) {
        val arch = archiveDir(root, b, lin(b).version)
        Files.createDirectories(arch.getParent)
        Files.move(live, arch, StandardCopyOption.ATOMIC_MOVE)
      } else if (Files.exists(live)) {
        deleteRecursively(live) // uncommitted partial from a crashed wave
      }
      if (Files.isDirectory(src))
        Files.move(src, live, StandardCopyOption.ATOMIC_MOVE)
      else Files.createDirectories(live)
    }
    deleteRecursively(staged)
    // lineage from the durable post-merge files (same read-back
    // discipline as writeExtracted)
    val nonEmpty = affected.filter(b =>
      listDir(Paths.get(root, s"bucket=$b"))
        .exists(_.getFileName.toString.endsWith(".parquet")))
    val rows: Map[Int, (Long, String, String, Long)] =
      if (nonEmpty.isEmpty) Map.empty
      else spark.read.option("basePath", root)
        .parquet(nonEmpty.map(b => s"$root/bucket=$b"): _*)
        .groupBy(col("bucket")).agg(
          count(lit(1)).as("rows"),
          min(col("conv_id")).as("minKey"), max(col("conv_id")).as("maxKey"),
          sum(when(col("errors").isNotNull, 1L).otherwise(0L)).as("errs"))
        .collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
        .toMap
    val wallMs = System.currentTimeMillis() - t0
    val snapId = snap + 1
    val newLin = affected.map { b =>
      val (n, lo, hi, e) = rows.getOrElse(b, (0L, "", "", 0L))
      BucketLineage(b, n, lo, hi, e, wallMs, snapId,
        lin.get(b).map(_.version + 1).getOrElse(0))
    }
    publishSnapshot(root, snapId, newLin)
    newLin
  }

  /** Row-level DELETE by conversation key — the right-to-be-forgotten
    * shape (drop EVERY turn of the named conversations). Copy-on-write
    * by bucket exactly like mergeExtracted: the key hashes bound the
    * candidate buckets (1/B of the table per bucket at any scale), an
    * existence semi-join prunes to buckets that actually lose rows,
    * each replaced version is atomically parked under `_archive` so
    * snapshot time travel through the delete stays exact, and the
    * snapshot publish is the commit point — `recoverMerge` rolls back a
    * crash-before-publish via the same archive-at-current-version
    * marker. A fully-emptied bucket keeps a 0-row lineage entry (the
    * tombstone that proves the delete was deliberate, not data loss).
    * Returns the new lineage rows (Nil when no key matched). */
  def deleteConvs(convIds: Dataset[String], root: String,
      buckets: Int = 32): Seq[BucketLineage] = {
    val spark = convIds.sparkSession
    recoverCompaction(root)
    recoverMerge(root)
    val (snap, _) = committed(root)
    require(snap >= 0, s"deleteConvs needs an existing table under $root")
    val effB = bucketCount(root, buckets) // recorded spec wins post-rebucket
    val lin = lineage(root).map(l => l.bucket -> l).toMap
    val t0 = System.currentTimeMillis()
    val keys = convIds.toDF("conv_id").distinct()
      .withColumn("bucket", bucketOf(col("conv_id"), effB))
      .localCheckpoint(true) // read 3× below (candidates, semi, anti)
    val candidate = keys.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
      .filter(b => lin.contains(b) &&
        listDir(Paths.get(root, s"bucket=$b"))
          .exists(_.getFileName.toString.endsWith(".parquet")))
    if (candidate.isEmpty) { keys.unpersist(); return Nil }
    val existing = applyMorDeletes(
      spark.read.parquet(
        candidate.map(b => s"$root/bucket=$b"): _*)
        .withColumn("bucket", bucketOf(col("conv_id"), effB)),
      spark, root, snap, lineage(root))
    val affected = existing
      .join(keys.select(col("conv_id")), Seq("conv_id"), "left_semi")
      .select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (affected.isEmpty) { keys.unpersist(); return Nil }
    val kept = existing.filter(col("bucket").isin(affected.map(Int.box): _*))
      .join(keys.select(col("conv_id")), Seq("conv_id"), "left_anti")
    val staged = Paths.get(root, "_staging", "delete")
    deleteRecursively(staged)
    kept
      .repartition(affected.length, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("conv_id"), col("turn_idx"))
      .write.partitionBy("bucket").mode("overwrite").parquet(staged.toString)
    keys.unpersist()
    // swap: archive the replaced version FIRST (same protocol as merge)
    for (b <- affected) {
      val live = Paths.get(root, s"bucket=$b")
      val src = staged.resolve(s"bucket=$b")
      val arch = archiveDir(root, b, lin(b).version)
      Files.createDirectories(arch.getParent)
      Files.move(live, arch, StandardCopyOption.ATOMIC_MOVE)
      if (Files.isDirectory(src))
        Files.move(src, live, StandardCopyOption.ATOMIC_MOVE)
      else Files.createDirectories(live)
    }
    deleteRecursively(staged)
    val nonEmpty = affected.filter(b =>
      listDir(Paths.get(root, s"bucket=$b"))
        .exists(_.getFileName.toString.endsWith(".parquet")))
    val rows: Map[Int, (Long, String, String, Long)] =
      if (nonEmpty.isEmpty) Map.empty
      else spark.read.option("basePath", root)
        .parquet(nonEmpty.map(b => s"$root/bucket=$b"): _*)
        .groupBy(col("bucket")).agg(
          count(lit(1)).as("rows"),
          min(col("conv_id")).as("minKey"), max(col("conv_id")).as("maxKey"),
          sum(when(col("errors").isNotNull, 1L).otherwise(0L)).as("errs"))
        .collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
        .toMap
    val wallMs = System.currentTimeMillis() - t0
    val snapId = snap + 1
    val newLin = affected.map { b =>
      val (n, lo, hi, e) = rows.getOrElse(b, (0L, "", "", 0L))
      BucketLineage(b, n, lo, hi, e, wallMs, snapId, lin(b).version + 1)
    }
    publishSnapshot(root, snapId, newLin)
    newLin
  }

  /** Roll back any merge that crashed before its snapshot publish: an
    * archive dir at a bucket's CURRENT manifest version means the live
    * dir holds unpublished merge bytes (or is missing) — delete what's
    * live and restore the archived version. Published merges always
    * leave archives strictly BELOW the manifest version, so this never
    * touches a committed state. Also clears merge staging leftovers. */
  def recoverMerge(root: String): Unit = {
    val staging = Paths.get(root, "_staging", "merge")
    if (Files.exists(staging)) deleteRecursively(staging)
    val stagingDel = Paths.get(root, "_staging", "delete")
    if (Files.exists(stagingDel)) deleteRecursively(stagingDel)
    recoverMorDeletes(root)
    recoverSpecHistory(root)
    if (!Files.isDirectory(Paths.get(root, "_archive"))) return
    for (l <- lineage(root)) {
      val arch = archiveDir(root, l.bucket, l.version)
      if (Files.isDirectory(arch)) {
        val live = Paths.get(root, s"bucket=${l.bucket}")
        deleteRecursively(live)
        Files.move(arch, live, StandardCopyOption.ATOMIC_MOVE)
      }
    }
  }

  /** Snapshot retention (Iceberg's expire_snapshots): drop snapshot
    * manifests older than the newest `keep`, so time travel's window is
    * bounded and the _snapshots dir doesn't grow forever under
    * streaming ingest. Live data files are untouched — every bucket
    * named by a surviving manifest stays readable. Archived bucket
    * versions (parked by merges for time travel) whose every
    * referencing manifest has expired ARE vacuumed — the parallel of
    * Iceberg's remove_orphan_files. Never drops the latest snapshot.
    * Returns the expired snapshot ids. */
  def expireSnapshots(root: String, keep: Int = 5): Seq[Int] = {
    require(keep >= 1, "must keep at least the latest snapshot")
    val ids = snapshotIds(root)
    // a TAGGED snapshot is retained regardless of age (Iceberg's tag
    // retention contract) — readTag must keep resolving
    val tagged = tags(root).map(tagSnapshotId(root, _)).toSet
    val expire = ids.dropRight(keep).filterNot(tagged)
    for (id <- expire) Files.deleteIfExists(snapDir(root).resolve(s"snap-$id.json"))
    // vacuum archive versions no surviving manifest references
    val archRoot = Paths.get(root, "_archive")
    if (Files.isDirectory(archRoot)) {
      // keep every (bucket, version) referenced by a surviving MAIN
      // manifest, a TAGGED snapshot, or any BRANCH manifest — a branch
      // created before a merge pins the pre-merge (archived) versions
      // and must stay readable for as long as the branch exists
      val referenced = referencedVersions(root)
      for (bdir <- listDir(archRoot);
           bname = bdir.getFileName.toString if bname.startsWith("bucket=");
           vdir <- listDir(bdir); vname = vdir.getFileName.toString
           if vname.startsWith("v")) {
        val key = (bname.stripPrefix("bucket=").toInt, vname.stripPrefix("v").toInt)
        if (!referenced(key)) deleteRecursively(vdir)
      }
    }
    vacuumMorDeletes(root) // drop delete files nothing can apply anymore
    expire
  }

  // ---------------------------------------------------------------
  // Merge-on-read equality deletes (Iceberg v2 delete files).
  //
  // deleteTurnsMoR records the deleted (conv_id, turn_idx) keys in a
  // DELETE FILE instead of rewriting any data bucket — O(keys) write
  // cost regardless of table size, the whole point of merge-on-read
  // at 100 TB. Each key is stamped with its bucket's manifest VERSION
  // at delete time; a record applies to a read iff its delete set's
  // snapshot id <= the read snapshot AND the stamped version still
  // matches that bucket's version in the read snapshot's manifest. A
  // later copy-on-write rewrite (merge / deleteConvs / rewriteDeletes)
  // folds pending deletes into bytes and bumps the version, making the
  // records inert — so records never double-apply across rewrites, and
  // time travel to any snapshot applies exactly the deletes that were
  // committed and unfolded at that snapshot.
  //
  // Layout:
  //   root/_deletes/snap-<id>/keys/…parquet  (conv_id, turn_idx, bucket, version)
  //   root/_deletes/snap-<id>/meta.json      {"snapshot":id,"pairs":[{bucket,version}…]}
  //
  // Crash safety: keys + meta are written FIRST, the snapshot publish
  // is the commit point. An orphaned delete dir (id above the latest
  // committed snapshot) is swept by recoverMorDeletes — which runs
  // inside recoverMerge, i.e. on every read and mutation entry — so a
  // later publish at the same id can never adopt a crashed delete's
  // records. Branch reads deliberately do NOT apply main's delete
  // records (branch isolation); after publishBranch the records keep
  // applying to any (bucket, version) the fast-forwarded manifest
  // still shares with main's history.
  // ---------------------------------------------------------------

  private def deletesDir(root: String) = Paths.get(root, "_deletes")
  private def deleteSetDir(root: String, id: Int) =
    deletesDir(root).resolve(s"snap-$id")

  /** Committed-or-not ids of delete sets on disk, ascending. */
  private def deleteSetIds(root: String): Seq[Int] =
    listDir(deletesDir(root))
      .map(_.getFileName.toString)
      .filter(_.startsWith("snap-"))
      .map(_.stripPrefix("snap-").toInt)
      .sorted

  /** (bucket, version) pairs a delete set's records were stamped with
    * (from its meta sidecar — no parquet read needed driver-side). */
  private def deleteSetPairs(root: String, id: Int): Set[(Int, Int)] = {
    val f = deleteSetDir(root, id).resolve("meta.json")
    if (!Files.isRegularFile(f)) return Set.empty
    val pair = "\\{\"bucket\":\\s*(\\d+),\\s*\"version\":\\s*(\\d+)\\}".r
    pair.findAllMatchIn(Files.readString(f))
      .map(m => (m.group(1).toInt, m.group(2).toInt)).toSet
  }

  /** Sweep delete dirs whose snapshot publish never happened (id above
    * the latest committed snapshot) — the MoR analog of recoverMerge's
    * staging cleanup. Runs inside recoverMerge. */
  private def recoverMorDeletes(root: String): Unit = {
    if (!Files.isDirectory(deletesDir(root))) return
    val ids = snapshotIds(root)
    val latest = if (ids.isEmpty) -1 else ids.max
    for (id <- deleteSetIds(root) if id > latest)
      deleteRecursively(deleteSetDir(root, id))
  }

  /** The delete records applicable at snapshot `atSnap` given that
    * snapshot's manifest `lin`, as (conv_id, turn_idx, bucket) rows —
    * None when no set can apply (the overwhelmingly common case,
    * decided from meta sidecars alone without reading any parquet). */
  private def applicableDeletes(spark: SparkSession, root: String,
      atSnap: Int, lin: Seq[BucketLineage]): Option[org.apache.spark.sql.DataFrame] = {
    val vers = lin.map(l => (l.bucket, l.version)).toSet
    val live = deleteSetIds(root)
      .filter(_ <= atSnap)
      .filter(id => deleteSetPairs(root, id).exists(vers))
    if (live.isEmpty) return None
    val recs = spark.read.parquet(
      live.map(id => deleteSetDir(root, id).resolve("keys").toString): _*)
    val linDf = spark.createDataFrame(lin.map(l => (l.bucket, l.version)))
      .toDF("bucket", "version")
    // version-match semi-join against the (tiny, broadcast) manifest:
    // records for buckets rewritten since the delete drop out here
    Some(recs.join(broadcast(linDf), Seq("bucket", "version"), "left_semi")
      .select(col("conv_id"), col("turn_idx"), col("bucket")))
  }

  /** Anti-join `df` against the delete records applicable at `atSnap`
    * — the merge-on-read half of every read path. No-op (and no plan
    * nodes added) when nothing applies. */
  private def applyMorDeletes(df: org.apache.spark.sql.DataFrame,
      spark: SparkSession, root: String, atSnap: Int,
      lin: Seq[BucketLineage]): org.apache.spark.sql.DataFrame =
    applicableDeletes(spark, root, atSnap, lin) match {
      case None    => df
      case Some(d) =>
        df.join(d.select(col("conv_id"), col("turn_idx")),
          Seq("conv_id", "turn_idx"), "left_anti")
    }

  /** Row-level DELETE, merge-on-read: record the (conv_id, turn_idx)
    * keys in a delete file and publish a snapshot — no data bucket is
    * read or rewritten. Keys that match no committed bucket are
    * dropped; keys that match no row are harmless (equality-delete
    * semantics). Returns the new snapshot id. */
  def deleteTurnsMoR(keys: org.apache.spark.sql.DataFrame, root: String,
      buckets: Int = 32): Int = {
    val spark = keys.sparkSession
    recoverCompaction(root)
    recoverMerge(root)
    val (snap, _) = committed(root)
    require(snap >= 0, s"deleteTurnsMoR needs an existing table under $root")
    val effB = bucketCount(root, buckets) // recorded spec wins post-rebucket
    val lin = lineage(root)
    val linDf = spark.createDataFrame(lin.map(l => (l.bucket, l.version)))
      .toDF("bucket", "version")
    val annotated = keys.select(col("conv_id"), col("turn_idx")).distinct()
      .withColumn("bucket", bucketOf(col("conv_id"), effB))
      .join(broadcast(linDf), Seq("bucket"), "inner")
      .select(col("conv_id"), col("turn_idx"), col("bucket"), col("version"))
      .localCheckpoint(true) // read twice below (write + pair collect)
    val id = snap + 1
    val dir = deleteSetDir(root, id)
    deleteRecursively(dir)
    annotated.write.parquet(dir.resolve("keys").toString)
    // pairs are bounded by the bucket count — a driver-side list
    val pairs = annotated.select(col("bucket"), col("version")).distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1))).sortBy(identity)
    annotated.unpersist()
    if (pairs.isEmpty) { deleteRecursively(dir); return snap }
    val body = pairs.map(p => s"""{"bucket": ${p._1}, "version": ${p._2}}""")
      .mkString("[", ", ", "]")
    Files.writeString(dir.resolve("meta.json"),
      s"""{"snapshot": $id, "pairs": $body}""")
    // commit point — same lineage (physical rows unchanged; the
    // manifest's row counts stay pre-delete by MoR design)
    publishSnapshot(root, id, lin.map(_.copy(snapshotId = id)))
    id
  }

  /** Materialize pending delete records into bytes (Iceberg's
    * rewrite_position_delete_files ∘ rewrite_data_files): every bucket
    * with an applicable record is rewritten without its deleted rows
    * in a NEW version (old version archived for time travel), after
    * which the records are inert everywhere and expireSnapshots can
    * vacuum the delete files. Returns the new lineage rows. */
  def rewriteDeletes(spark: SparkSession, root: String,
      buckets: Int = 32): Seq[BucketLineage] = {
    recoverCompaction(root)
    recoverMerge(root)
    val (snap, _) = committed(root)
    require(snap >= 0, s"rewriteDeletes needs an existing table under $root")
    val linSeq = lineage(root)
    val lin = linSeq.map(l => l.bucket -> l).toMap
    val t0 = System.currentTimeMillis()
    val dels = applicableDeletes(spark, root, snap, linSeq) match {
      case None    => return Nil
      case Some(d) => d.localCheckpoint(true)
    }
    val affected = dels.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
      .filter(b => lin.contains(b) &&
        listDir(Paths.get(root, s"bucket=$b"))
          .exists(_.getFileName.toString.endsWith(".parquet")))
    if (affected.isEmpty) { dels.unpersist(); return Nil }
    val existing = spark.read.parquet(
        affected.map(b => s"$root/bucket=$b"): _*)
      .withColumn("bucket", bucketOf(col("conv_id"), bucketCount(root, buckets)))
    val kept = existing.join(dels.select(col("conv_id"), col("turn_idx")),
      Seq("conv_id", "turn_idx"), "left_anti")
    val staged = Paths.get(root, "_staging", "delete")
    deleteRecursively(staged)
    kept
      .repartition(affected.length, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("conv_id"), col("turn_idx"))
      .write.partitionBy("bucket").mode("overwrite").parquet(staged.toString)
    dels.unpersist()
    // swap: archive the replaced version FIRST (merge/delete protocol)
    for (b <- affected) {
      val live = Paths.get(root, s"bucket=$b")
      val src = staged.resolve(s"bucket=$b")
      val arch = archiveDir(root, b, lin(b).version)
      Files.createDirectories(arch.getParent)
      Files.move(live, arch, StandardCopyOption.ATOMIC_MOVE)
      if (Files.isDirectory(src))
        Files.move(src, live, StandardCopyOption.ATOMIC_MOVE)
      else Files.createDirectories(live)
    }
    deleteRecursively(staged)
    val nonEmpty = affected.filter(b =>
      listDir(Paths.get(root, s"bucket=$b"))
        .exists(_.getFileName.toString.endsWith(".parquet")))
    val rows: Map[Int, (Long, String, String, Long)] =
      if (nonEmpty.isEmpty) Map.empty
      else spark.read.option("basePath", root)
        .parquet(nonEmpty.map(b => s"$root/bucket=$b"): _*)
        .groupBy(col("bucket")).agg(
          count(lit(1)).as("rows"),
          min(col("conv_id")).as("minKey"), max(col("conv_id")).as("maxKey"),
          sum(when(col("errors").isNotNull, 1L).otherwise(0L)).as("errs"))
        .collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
        .toMap
    val wallMs = System.currentTimeMillis() - t0
    val snapId = snap + 1
    val newLin = affected.map { b =>
      val (n, lo, hi, e) = rows.getOrElse(b, (0L, "", "", 0L))
      BucketLineage(b, n, lo, hi, e, wallMs, snapId, lin(b).version + 1)
    }
    publishSnapshot(root, snapId, newLin)
    newLin
  }

  /** Vacuum delete files no surviving snapshot can ever apply again:
    * a set is removable iff for EVERY surviving main snapshot S with
    * S >= the set's id, none of the set's stamped (bucket, version)
    * pairs survive in S's manifest (all folded by later rewrites).
    * Decided entirely from meta sidecars + manifests — no data read.
    * Called by expireSnapshots after manifest expiry. */
  private def vacuumMorDeletes(root: String): Seq[Int] = {
    if (!Files.isDirectory(deletesDir(root))) return Nil
    val survivors = (snapshotIds(root) ++ tags(root).map(tagSnapshotId(root, _)))
      .distinct.sorted
    val out = Seq.newBuilder[Int]
    for (id <- deleteSetIds(root)) {
      val pairs = deleteSetPairs(root, id)
      val applies = survivors.exists(s => s >= id &&
        lineageAt(root, s).exists(l => pairs((l.bucket, l.version))))
      if (!applies) { deleteRecursively(deleteSetDir(root, id)); out += id }
    }
    out.result()
  }

  // ---------------------------------------------------------------
  // Partition-spec evolution (Iceberg's partition evolution, applied
  // to the conv_id hash-bucket spec): the table's bucket count lives
  // in `_table.json` as a HISTORY of (sinceSnapshot, buckets) entries,
  // so every snapshot resolves the spec that was active when it was
  // the head — mutators hash new rows with the head's spec, and
  // rollback across a rebucket reactivates the old spec. `rebucket`
  // itself is one whole-table copy-on-write relayout: every old-spec
  // bucket is parked in the archive at its current version (time
  // travel through the rebucket stays exact), the new spec's buckets
  // land at bumped versions, and the manifest is published as a FULL
  // REPLACE so old-spec bucket names cannot leak into the new head.
  // Pending MoR delete records fold in (the relayout reads through
  // readExtracted) and go inert (every version bumps).
  //
  // Crash safety: the spec entry is recorded BEFORE the CAS publish
  // with sinceSnapshot = the id being published; recoverMerge sweeps
  // spec entries above the committed head (exactly like orphaned MoR
  // delete sets), so a crash between the two steps can never leave a
  // later, unrelated publish adopting the wrong spec.
  // ---------------------------------------------------------------

  private def tableMetaFile(root: String) = Paths.get(root, "_table.json")

  final case class BucketSpec(sinceSnapshot: Int, buckets: Int)

  /** Spec history, ascending by sinceSnapshot ("-1" = since creation).
    * Empty when the table predates spec tracking. */
  def bucketSpecs(root: String): Seq[BucketSpec] = {
    val f = tableMetaFile(root)
    if (!Files.isRegularFile(f)) return Nil
    val entry = "\\{\"sinceSnapshot\":\\s*(-?\\d+),\\s*\"buckets\":\\s*(\\d+)\\}".r
    entry.findAllMatchIn(Files.readString(f))
      .map(m => BucketSpec(m.group(1).toInt, m.group(2).toInt))
      .toSeq.sortBy(_.sinceSnapshot)
  }

  /** The bucket count in force at snapshot `atSnap` (default: head).
    * Falls back to `default` for tables without spec tracking — the
    * pre-evolution contract where callers supply the count. */
  def bucketCount(root: String, default: Int,
      atSnap: Int = Int.MaxValue): Int =
    bucketSpecs(root).filter(_.sinceSnapshot <= atSnap)
      .lastOption.map(_.buckets).getOrElse(default)

  private def writeSpecHistory(root: String, specs: Seq[BucketSpec]): Unit = {
    val body = specs.sortBy(_.sinceSnapshot)
      .map(s => s"""{"sinceSnapshot": ${s.sinceSnapshot}, "buckets": ${s.buckets}}""")
      .mkString("[", ", ", "]")
    val tmp = Paths.get(root, "._table.json.tmp")
    Files.writeString(tmp, s"""{"specs": $body}""")
    Files.move(tmp, tableMetaFile(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def recordBucketSpec(root: String, buckets: Int,
      sinceSnapshot: Int): Unit =
    writeSpecHistory(root,
      bucketSpecs(root).filterNot(_.sinceSnapshot == sinceSnapshot) :+
        BucketSpec(sinceSnapshot, buckets))

  /** Sweep spec entries above the committed head — a rebucket that
    * recorded its spec but crashed before its CAS publish (runs inside
    * recoverMerge, like recoverMorDeletes). */
  private def recoverSpecHistory(root: String): Unit = {
    val specs = bucketSpecs(root)
    if (specs.isEmpty) return
    val ids = snapshotIds(root)
    val latest = if (ids.isEmpty) -1 else ids.max
    val live = specs.filter(_.sinceSnapshot <= latest)
    if (live.size != specs.size) writeSpecHistory(root, live)
  }

  /** Relayout the whole table onto `newBuckets` hash buckets — one
    * copy-on-write pass, snapshot-exact. Returns the new lineage. */
  def rebucket(spark: SparkSession, root: String,
      newBuckets: Int): Seq[BucketLineage] = {
    require(newBuckets >= 1, "newBuckets must be >= 1")
    recoverCompaction(root)
    recoverMerge(root)
    val (snap, _) = committed(root)
    require(snap >= 0, s"rebucket needs an existing table under $root")
    val linSeq = lineage(root)
    val lin = linSeq.map(l => l.bucket -> l).toMap
    // a pre-spec-tracking table gets its creation entry backfilled
    // (inferred from the dense bucket ids writeExtracted commits), so
    // rollback across this rebucket can reactivate the old layout
    if (bucketSpecs(root).isEmpty)
      recordBucketSpec(root, linSeq.map(_.bucket).max + 1, -1)
    val t0 = System.currentTimeMillis()
    // MoR-applied current state: pending delete records fold in here
    val data = readExtracted(spark, root).toDF()
    val staged = Paths.get(root, "_staging", "rebucket")
    deleteRecursively(staged)
    data.withColumn("bucket", bucketOf(col("conv_id"), newBuckets))
      .repartition(newBuckets, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("conv_id"), col("turn_idx"))
      .write.partitionBy("bucket").mode("overwrite").parquet(staged.toString)
    // swap: park EVERY old-spec bucket at its current version first
    // (the in-flight marker recoverMerge restores from), then move the
    // new spec's buckets in
    for (l <- linSeq) {
      val live = Paths.get(root, s"bucket=${l.bucket}")
      if (Files.isDirectory(live)) {
        val arch = archiveDir(root, l.bucket, l.version)
        Files.createDirectories(arch.getParent)
        Files.move(live, arch, StandardCopyOption.ATOMIC_MOVE)
      }
    }
    for (b <- 0 until newBuckets) {
      val live = Paths.get(root, s"bucket=$b")
      val src = staged.resolve(s"bucket=$b")
      if (Files.exists(live)) deleteRecursively(live) // uncommitted partial
      if (Files.isDirectory(src))
        Files.move(src, live, StandardCopyOption.ATOMIC_MOVE)
      else Files.createDirectories(live)
    }
    deleteRecursively(staged)
    val nonEmpty = (0 until newBuckets).filter(b =>
      listDir(Paths.get(root, s"bucket=$b"))
        .exists(_.getFileName.toString.endsWith(".parquet")))
    val rows: Map[Int, (Long, String, String, Long)] =
      if (nonEmpty.isEmpty) Map.empty
      else spark.read.option("basePath", root)
        .parquet(nonEmpty.map(b => s"$root/bucket=$b"): _*)
        .groupBy(col("bucket")).agg(
          count(lit(1)).as("rows"),
          min(col("conv_id")).as("minKey"), max(col("conv_id")).as("maxKey"),
          sum(when(col("errors").isNotNull, 1L).otherwise(0L)).as("errs"))
        .collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
        .toMap
    val wallMs = System.currentTimeMillis() - t0
    val snapId = snap + 1
    val newLin = (0 until newBuckets).map { b =>
      val (n, lo, hi, e) = rows.getOrElse(b, (0L, "", "", 0L))
      BucketLineage(b, n, lo, hi, e, wallMs, snapId,
        lin.get(b).map(_.version + 1).getOrElse(0))
    }
    // spec first, CAS publish second (recoverSpecHistory sweeps the
    // spec if the publish never lands)
    recordBucketSpec(root, newBuckets, snapId)
    writeManifestCas(snapDir(root), snapId, newLin) // FULL replace
    newLin
  }

  // ---------------------------------------------------------------
  // Branches and tags (zero-copy named refs — Iceberg's ref contract)
  // ---------------------------------------------------------------

  private def branchRoot(root: String, name: String) =
    Paths.get(root, "_branches", name)
  private def branchSnapDir(root: String, name: String) =
    branchRoot(root, name).resolve("_snapshots")
  private def branchDataDir(root: String, name: String, bucket: Int, version: Int) =
    branchRoot(root, name).resolve(s"bucket=$bucket").resolve(s"v$version")

  def branches(root: String): Seq[String] =
    listDir(Paths.get(root, "_branches"))
      .filter(Files.isDirectory(_))
      .map(_.getFileName.toString).sorted

  def branchSnapshotIds(root: String, name: String): Seq[Int] =
    listDir(branchSnapDir(root, name))
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("snap-") && n.endsWith(".json"))
      .map(n => n.stripPrefix("snap-").stripSuffix(".json").toInt)
      .sorted

  def branchLineageAt(root: String, name: String, snap: Int): Seq[BucketLineage] =
    parseManifest(branchSnapDir(root, name).resolve(s"snap-$snap.json"), snap)

  /** Create branch `name` pointing at main snapshot `atSnapshot` —
    * ZERO-COPY: the branch manifest pins the same (bucket, version)
    * entries the main manifest does; no data moves. Creating an
    * existing branch fails loudly (the CAS link guards the first
    * manifest, so two concurrent creators conflict instead of one
    * silently winning). Branch snapshot ids continue from the
    * branched-at id in the branch's OWN _snapshots line. */
  def createBranch(root: String, name: String, atSnapshot: Int): Unit = {
    require(name.matches("[A-Za-z0-9_\\-]+"), s"bad branch name: $name")
    require(snapshotIds(root).contains(atSnapshot),
      s"no snapshot $atSnapshot under $root/_snapshots (have ${snapshotIds(root).mkString(",")})")
    val lin = lineageAtStrict(root, atSnapshot)
    Files.createDirectories(branchSnapDir(root, name))
    writeManifestCas(branchSnapDir(root, name), atSnapshot, lin.sortBy(_.bucket))
  }

  /** Read branch `name` at its latest branch snapshot. Resolution per
    * manifest entry: the branch-private version dir if this branch
    * wrote it, else main's live bucket when the version is current,
    * else the copy-on-write archive — exactly the time-travel rule
    * with the branch storage layered on top. */
  def readBranch(spark: SparkSession, root: String, name: String): Dataset[ExtractedTurn] = {
    import spark.implicits._
    recoverCompaction(root)
    recoverMerge(root)
    val ids = branchSnapshotIds(root, name)
    require(ids.nonEmpty, s"no branch $name under $root/_branches")
    val lin = branchLineageAt(root, name, ids.max)
    require(lin.nonEmpty, s"branch $name manifest snap-${ids.max} read back empty")
    versionedDf(spark, root, lin, Some(name)).as[ExtractedTurn]
  }

  /** Row-level MERGE into a branch — same copy-on-write-by-bucket
    * semantics as `mergeExtracted`, but every rewritten bucket version
    * lands in BRANCH-PRIVATE storage (`_branches/<name>/bucket=<b>/
    * v<k>`): main's live buckets, archive, and snapshot line are never
    * touched, so main readers see nothing and the branch diverges in
    * isolation (the Iceberg write-audit-publish pattern). The branch
    * snapshot publish is the commit point; a crash before it leaves
    * only inert unreferenced version dirs (resolution is manifest-
    * driven), and the staged dir is cleared on the next merge. */
  def mergeIntoBranch(updates: Dataset[ExtractedTurn], root: String, name: String,
      buckets: Int = 32): Seq[BucketLineage] = {
    val spark = updates.sparkSession
    recoverCompaction(root)
    recoverMerge(root)
    val ids = branchSnapshotIds(root, name)
    require(ids.nonEmpty, s"no branch $name under $root/_branches")
    val branchSnap = ids.max
    val prevLin = branchLineageAt(root, name, branchSnap)
    require(prevLin.nonEmpty, s"branch $name manifest snap-$branchSnap read back empty")
    val lin = prevLin.map(l => l.bucket -> l).toMap
    val t0 = System.currentTimeMillis()
    val effB = bucketCount(root, buckets) // recorded spec wins post-rebucket
    val upd = updates.toDF().withColumn("bucket", bucketOf(col("conv_id"), effB))
      .localCheckpoint(true)
    val affected = upd.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (affected.isEmpty) { upd.unpersist(); return Nil }
    val entries = affected.flatMap(lin.get)
    val existing =
      if (entries.isEmpty) None
      else Some(versionedDf(spark, root, entries, Some(name))
        .withColumn("bucket", bucketOf(col("conv_id"), buckets)))
    val keep = existing.map(
      _.join(upd.select(col("conv_id"), col("turn_idx")).distinct(),
        Seq("conv_id", "turn_idx"), "left_anti"))
    val merged = keep match {
      case Some(k) => k.unionByName(upd, allowMissingColumns = true)
      case None    => upd
    }
    val staged = branchRoot(root, name).resolve("_staging")
    deleteRecursively(staged)
    merged
      .repartition(affected.length, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("conv_id"), col("turn_idx"))
      .write.partitionBy("bucket").mode("overwrite").parquet(staged.toString)
    upd.unpersist()
    val newVersion = affected.map(b =>
      b -> lin.get(b).map(_.version + 1).getOrElse(0)).toMap
    for (b <- affected) {
      val src = staged.resolve(s"bucket=$b")
      val dst = branchDataDir(root, name, b, newVersion(b))
      deleteRecursively(dst)
      Files.createDirectories(dst.getParent)
      if (Files.isDirectory(src))
        Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
      else Files.createDirectories(dst)
    }
    deleteRecursively(staged)
    val nonEmpty = affected.filter(b =>
      listDir(branchDataDir(root, name, b, newVersion(b)))
        .exists(_.getFileName.toString.endsWith(".parquet")))
    val rows: Map[Int, (Long, String, String, Long)] =
      if (nonEmpty.isEmpty) Map.empty
      else spark.read.parquet(
          nonEmpty.map(b => branchDataDir(root, name, b, newVersion(b)).toString): _*)
        .withColumn("bucket", bucketOf(col("conv_id"), effB))
        .groupBy(col("bucket")).agg(
          count(lit(1)).as("rows"),
          min(col("conv_id")).as("minKey"), max(col("conv_id")).as("maxKey"),
          sum(when(col("errors").isNotNull, 1L).otherwise(0L)).as("errs"))
        .collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
        .toMap
    val wallMs = System.currentTimeMillis() - t0
    val snapId = branchSnap + 1
    val newLin = affected.map { b =>
      val (n, lo, hi, e) = rows.getOrElse(b, (0L, "", "", 0L))
      BucketLineage(b, n, lo, hi, e, wallMs, snapId, newVersion(b))
    }
    val all = (prevLin.filterNot(l => affected.contains(l.bucket)) ++ newLin)
      .sortBy(_.bucket)
    writeManifestCas(branchSnapDir(root, name), snapId, all)
    newLin
  }

  /** Roll the table head back to an earlier snapshot — Iceberg's
    * rollback semantics: publish a NEW head snapshot whose manifest is
    * exactly the target's lineage (buckets added after the target drop
    * out of the live tree into the archive; merged/deleted buckets
    * return to the target's archived versions). History is preserved —
    * the rolled-past snapshots stay time-travel-readable via the
    * archive — and the CAS manifest publish conflicts loudly with a
    * concurrent writer.
    *
    * Crash safety rides the merge contract: step 1 parks every
    * divergent live bucket at its CURRENT version (the in-flight
    * marker `recoverMerge` honors), so a crash before the publish
    * restores the pre-rollback head, and a crash after it lets the
    * next entry's `recoverMerge` finish restoring the target's
    * versions to live. Returns the new head snapshot id. */
  def rollbackTo(root: String, snap: Int): Int = {
    recoverCompaction(root)
    recoverMerge(root)
    val target = lineageAtStrict(root, snap)
    val (head, _) = committed(root)
    require(snap <= head, s"cannot roll forward: snapshot $snap is beyond head $head")
    val id = head + 1
    val targetV = target.map(l => l.bucket -> l.version).toMap
    // 1. park every live bucket the target does not pin at its current
    //    version
    for (l <- lineageAt(root, head)
         if !targetV.get(l.bucket).contains(l.version)) {
      val live = Paths.get(root, s"bucket=${l.bucket}")
      if (Files.isDirectory(live)) {
        val park = archiveDir(root, l.bucket, l.version)
        Files.createDirectories(park.getParent)
        Files.move(live, park, StandardCopyOption.ATOMIC_MOVE)
      }
    }
    // 2. reactivate the bucket spec that was in force at the target —
    //    rolling back across a rebucket must restore the old layout's
    //    hashing for every later mutation (recorded BEFORE the CAS,
    //    swept by recoverSpecHistory if the publish never lands)
    if (bucketSpecs(root).nonEmpty)
      recordBucketSpec(root, bucketCount(root, Int.MinValue, snap), id)
    // 3. publish the target lineage as the new head (CAS)
    writeManifestCas(snapDir(root), id, target)
    // 4. restore the target's archived versions to live — exactly the
    //    archive-at-current-version contract recoverMerge implements
    recoverMerge(root)
    id
  }

  /** Publish a branch to main — the third leg of Iceberg's
    * write-audit-publish: after `createBranch` (write isolation) and
    * `mergeIntoBranch` (staged writes) and whatever audit the caller
    * ran against `readBranch`, fast-forward main's head to the
    * branch's latest state. Refuses loudly if main advanced past the
    * branched-at snapshot (a diverged publish would silently drop the
    * concurrent writer — the caller must re-branch and re-audit).
    *
    * Crash safety rides the merge contract end to end:
    *  1. every live bucket the branch rewrote is PARKED at its
    *     current version (`_archive/bucket=b/v<j>`) — pre-publish
    *     time travel stays exact;
    *  2. the branch-private version dirs are COPIED (not moved) into
    *     the archive at their branch versions — inert until the
    *     publish because they sit ABOVE the current manifest version,
    *     and the branch itself stays readable afterward (refs are
    *     independent, Iceberg semantics);
    *  3. the CAS manifest publish is the commit point; a crash before
    *     it leaves archive-at-current-version markers that
    *     recoverMerge rolls back, a crash after it leaves markers the
    *     next recoverMerge rolls FORWARD (restore the new head's
    *     versions to live).
    * Returns the new head snapshot id. */
  def publishBranch(root: String, name: String): Int = {
    recoverCompaction(root)
    recoverMerge(root)
    val ids = branchSnapshotIds(root, name)
    require(ids.nonEmpty, s"no branch $name under $root/_branches")
    val branchedAt = ids.min
    val latest = ids.max
    val (head, _) = committed(root)
    if (head != branchedAt)
      throw new IllegalStateException(
        s"cannot fast-forward: main head $head diverged from branch $name " +
          s"(branched at $branchedAt) — re-branch from $head and re-audit")
    if (latest == branchedAt) return head // nothing staged on the branch
    val lin = branchLineageAt(root, name, latest)
    require(lin.nonEmpty, s"branch $name manifest snap-$latest read back empty")
    val headV = lineageAtStrict(root, head).map(l => l.bucket -> l.version).toMap
    val rewritten = lin.filter(l => !headV.get(l.bucket).contains(l.version))
    // 1. park the current live version of every rewritten bucket
    for (l <- rewritten; j <- headV.get(l.bucket)) {
      val live = Paths.get(root, s"bucket=${l.bucket}")
      if (Files.isDirectory(live)) {
        val park = archiveDir(root, l.bucket, j)
        Files.createDirectories(park.getParent)
        Files.move(live, park, StandardCopyOption.ATOMIC_MOVE)
      }
    }
    // 2. copy the branch-private bytes into the archive at their slot
    for (l <- rewritten) {
      val src = branchDataDir(root, name, l.bucket, l.version)
      require(Files.isDirectory(src),
        s"branch $name manifest pins bucket=${l.bucket}/v${l.version} but the dir is missing")
      val dst = archiveDir(root, l.bucket, l.version)
      if (!Files.isDirectory(dst)) {
        val tmp = dst.getParent.resolve(s".v${l.version}.publish-tmp")
        deleteRecursively(tmp)
        Files.createDirectories(tmp)
        for (f <- listDir(src) if Files.isRegularFile(f))
          Files.copy(f, tmp.resolve(f.getFileName.toString))
        Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
      }
    }
    // 3. commit point: CAS-publish the branch lineage as the new head,
    //    then roll the archive markers forward to live
    val id = head + 1
    writeManifestCas(snapDir(root), id, lin.sortBy(_.bucket))
    recoverMerge(root)
    id
  }

  private def tagDir(root: String) = Paths.get(root, "_tags")

  def tags(root: String): Seq[String] =
    listDir(tagDir(root))
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".json") && !n.startsWith("."))
      .map(_.stripSuffix(".json")).sorted

  /** Tag main snapshot `snap` with an immutable name (Iceberg tag):
    * CAS-linked, so re-tagging an existing name fails loudly. Tagged
    * snapshots are exempt from expireSnapshots and pin their archived
    * versions against the vacuum. */
  def tagSnapshot(root: String, tag: String, snap: Int): Unit = {
    require(tag.matches("[A-Za-z0-9_\\-]+"), s"bad tag name: $tag")
    require(snapshotIds(root).contains(snap),
      s"no snapshot $snap under $root/_snapshots (have ${snapshotIds(root).mkString(",")})")
    Files.createDirectories(tagDir(root))
    val tmp = tagDir(root).resolve(s".$tag.json.tmp")
    Files.writeString(tmp, s"""{"tag": "$tag", "snapshot": $snap}""")
    try Files.createLink(tagDir(root).resolve(s"$tag.json"), tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(s"tag $tag already exists under $root")
    } finally Files.deleteIfExists(tmp)
  }

  def tagSnapshotId(root: String, tag: String): Int = {
    val f = tagDir(root).resolve(s"$tag.json")
    require(Files.isRegularFile(f), s"no tag $tag under $root/_tags")
    "\"snapshot\":\\s*(\\d+)".r.findFirstMatchIn(Files.readString(f))
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(s"tag $tag unparseable under $root"))
  }

  /** Read the table as of the tagged snapshot (time travel by name). */
  def readTag(spark: SparkSession, root: String, tag: String): Dataset[ExtractedTurn] =
    readExtracted(spark, root, tagSnapshotId(root, tag))

  // ---------------------------------------------------------------
  // Schema evolution (add-column-with-default)
  // ---------------------------------------------------------------

  final case class AddedColumn(
      name: String, ddlType: String, defaultSql: String, sinceSnapshot: Int)

  private def schemaFile(root: String) = Paths.get(root, "_schema.json")

  /** Columns added by schema evolution, in add order. */
  def addedColumns(root: String): Seq[AddedColumn] = {
    val f = schemaFile(root)
    if (!Files.isRegularFile(f)) return Nil
    val entry = ("\\{\"name\":\\s*\"([^\"]+)\",\\s*\"type\":\\s*\"([^\"]+)\"," +
      "\\s*\"default\":\\s*\"([^\"]*)\",\\s*\"sinceSnapshot\":\\s*(-?\\d+)\\}").r
    entry.findAllMatchIn(Files.readString(f)).map(m =>
      AddedColumn(m.group(1), m.group(2), m.group(3), m.group(4).toInt)).toSeq
  }

  /** Add a column with a default to the table schema — Iceberg's
    * add-column contract under this layout: NO data files are touched;
    * the column is recorded in `_schema.json` with the snapshot it was
    * added after, and `readTable` projects it at read time — files
    * written before the evolution read as the default (the column's
    * initial-default, applied when the file lacks the column OR holds
    * null there: an added column is NOT-NULL-with-default by contract,
    * which keeps old and new files indistinguishable to the reader).
    * Snapshots at or before `sinceSnapshot` keep the OLD schema — time
    * travel reads them without the column. `defaultSql` is a SQL
    * literal (e.g. "'unscored'", "0"). Returns the recorded
    * sinceSnapshot. */
  def evolveSchema(root: String, name: String, ddlType: String,
      defaultSql: String): Int = {
    val (snap, _) = committed(root)
    require(snap >= 0, s"evolveSchema needs an existing table under $root")
    val base = org.apache.spark.sql.Encoders.product[ExtractedTurn].schema.fieldNames.toSet
    require(!base.contains(name), s"column $name already exists in the base schema")
    require(!addedColumns(root).exists(_.name == name), s"column $name already added")
    // validate the type DDL eagerly — a typo must fail here, not at read
    org.apache.spark.sql.types.DataType.fromDDL(ddlType)
    val all = addedColumns(root) :+ AddedColumn(name, ddlType, defaultSql, snap)
    val body = all.map(c =>
      s"""{"name": "${c.name}", "type": "${c.ddlType}", "default": "${c.defaultSql}", "sinceSnapshot": ${c.sinceSnapshot}}""")
      .mkString("[\n  ", ",\n  ", "\n]")
    val tmp = Paths.get(root, "_schema.json.tmp")
    Files.writeString(tmp, s"""{"schema": $body}""")
    Files.move(tmp, schemaFile(root), StandardCopyOption.REPLACE_EXISTING)
    snap
  }

  /** Read the table under its EVOLVED schema (current, or as of a
    * snapshot): base ExtractedTurn columns plus every added column
    * visible at that snapshot (added strictly BEFORE it — a snapshot at
    * or before the evolution keeps the old schema). Files lacking an
    * added column — or holding null in it — read as the column's
    * default, so pre-evolution buckets and post-evolution waves present
    * one uniform schema. */
  def readTable(spark: SparkSession, root: String,
      asOfSnapshot: Option[Int] = None): org.apache.spark.sql.DataFrame = {
    recoverCompaction(root)
    recoverMerge(root)
    val visible = asOfSnapshot match {
      case None => addedColumns(root)
      case Some(s) =>
        require(snapshotIds(root).contains(s),
          s"no snapshot $s under $root/_snapshots")
        addedColumns(root).filter(_.sinceSnapshot < s)
    }
    val baseSchema = org.apache.spark.sql.Encoders.product[ExtractedTurn].schema
    val full = visible.foldLeft(baseSchema)((sc, c) =>
      sc.add(c.name, org.apache.spark.sql.types.DataType.fromDDL(c.ddlType)))
    val entries = asOfSnapshot match {
      case None    => lineage(root)
      case Some(s) => lineageAtStrict(root, s)
    }
    val current = lineage(root).map(l => l.bucket -> l.version).toMap
    val dirs = entries.sortBy(_.bucket).map { l =>
      if (current.getOrElse(l.bucket, l.version) == l.version)
        Paths.get(root, s"bucket=${l.bucket}")
      else archiveDir(root, l.bucket, l.version)
    }.filter(d => listDir(d).exists(_.getFileName.toString.endsWith(".parquet")))
    val base =
      if (dirs.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full)
      else spark.read.schema(full).parquet(dirs.map(_.toString): _*)
    val snapIdsAll = snapshotIds(root)
    val morApplied =
      if (snapIdsAll.isEmpty) base
      else applyMorDeletes(base, spark, root,
        asOfSnapshot.getOrElse(snapIdsAll.max), entries)
    visible.foldLeft(morApplied)((df, c) =>
      df.withColumn(c.name, coalesce(col(c.name), expr(c.defaultSql).cast(
        org.apache.spark.sql.types.DataType.fromDDL(c.ddlType)))))
  }

  /** Idempotent micro-batch commit — the foreachBatch sink contract:
    * batch data lands under root/_batches/batch=<id> and becomes
    * visible only when the commit marker exists (written atomically
    * AFTER the data). A restarted stream that replays an already-
    * committed batchId is a no-op; a batch that crashed mid-write left
    * no marker, so the replay wipes the partial dir and rewrites it —
    * exactly-once table contents from an at-least-once replay. */
  def commitBatch(df: org.apache.spark.sql.DataFrame, root: String,
      batchId: Long): Boolean = {
    val bdir = Paths.get(root, "_batches")
    Files.createDirectories(bdir)
    val marker = bdir.resolve(s"batch-$batchId.committed")
    if (Files.exists(marker)) return false // replayed batch: drop it
    val dir = bdir.resolve(s"batch=$batchId")
    deleteRecursively(dir) // partial from a crash mid-write
    df.write.mode("overwrite").parquet(dir.toString)
    val tmp = bdir.resolve(s".batch-$batchId.committed.tmp")
    Files.writeString(tmp,
      s"""{"batch": $batchId, "committedAtMs": ${System.currentTimeMillis()}}""")
    Files.move(tmp, marker, StandardCopyOption.ATOMIC_MOVE)
    true
  }

  /** foreachBatch body for the streaming UPSERT sink: row-level-MERGE
    * one micro-batch into the bucketed table. Replayed batch ids are
    * dropped via a marker (restart safety); the marker commits AFTER
    * the merge publishes, and a crash in between is harmless because
    * re-merging the identical rows is content-idempotent (same keys,
    * same values — only bucket versions bump). Returns false for a
    * dropped replay. */
  def mergeBatch(df: org.apache.spark.sql.DataFrame, root: String,
      batchId: Long, buckets: Int = 32): Boolean = {
    val bdir = Paths.get(root, "_merge_batches")
    Files.createDirectories(bdir)
    val marker = bdir.resolve(s"batch-$batchId.committed")
    if (Files.exists(marker)) return false
    // an at-least-once feed can deliver the same correction twice in
    // one micro-batch; mergeExtracted requires unique update keys, so
    // collapse per-key first (identical payloads collapse
    // deterministically; CONFLICTING same-key payloads in one batch
    // have no defined order in a stream — callers needing last-wins
    // must carry and resolve on a sequence column upstream)
    mergeExtracted(df.dropDuplicates("conv_id", "turn_idx")
      .as[ExtractedTurn](
        org.apache.spark.sql.Encoders.product[ExtractedTurn]), root, buckets)
    val tmp = bdir.resolve(s".batch-$batchId.committed.tmp")
    Files.writeString(tmp,
      s"""{"batch": $batchId, "committedAtMs": ${System.currentTimeMillis()}}""")
    Files.move(tmp, marker, StandardCopyOption.ATOMIC_MOVE)
    true
  }

  /** Committed micro-batch ids (marker files), ascending. */
  def committedBatchIds(root: String): Seq[Long] =
    listDir(Paths.get(root, "_batches"))
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("batch-") && n.endsWith(".committed"))
      .map(n => n.stripPrefix("batch-").stripSuffix(".committed").toLong)
      .sorted

  /** All committed micro-batches as one DataFrame (uncommitted/partial
    * batch dirs are invisible — no marker, no read). `upToBatch` gives
    * the streaming table the same as-of story as the wave table's
    * snapshot time travel: batches are immutable once marked, so "the
    * table as of batch k" is exactly the committed batches ≤ k. */
  def readCommittedBatches(spark: SparkSession, root: String,
      upToBatch: Long = Long.MaxValue): org.apache.spark.sql.DataFrame = {
    val dirs = committedBatchIds(root)
      .filter(_ <= upToBatch)
      .map(id => s"$root/_batches/batch=$id")
    require(dirs.nonEmpty, s"no committed batches under $root/_batches (upTo=$upToBatch)")
    spark.read.parquet(dirs: _*)
  }

  /** Incremental read over the batch table: rows of batches in
    * (fromBatch, toBatch] — the consumer-poll analog of readChanges.
    * Empty-range reads return an empty frame with the batches' schema
    * (schema comes from any committed batch). */
  def readNewBatches(spark: SparkSession, root: String, fromBatch: Long,
      toBatch: Long = Long.MaxValue): org.apache.spark.sql.DataFrame = {
    require(fromBatch <= toBatch, s"readNewBatches range is backwards: $fromBatch > $toBatch")
    val all = committedBatchIds(root)
    require(all.nonEmpty, s"no committed batches under $root/_batches")
    val picked = all.filter(id => id > fromBatch && id <= toBatch)
    if (picked.isEmpty) {
      val schema = spark.read.parquet(s"$root/_batches/batch=${all.head}").schema
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else spark.read.parquet(picked.map(id => s"$root/_batches/batch=$id"): _*)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
  }

  // ---------------------------------------------------------------
  // Orphan-file maintenance (Iceberg's remove_orphan_files contract)
  // ---------------------------------------------------------------

  /** One orphan candidate: a directory no surviving snapshot, tag, or
    * branch references. `kind` ∈ staging | live-bucket | archive. */
  final case class Orphan(path: String, kind: String, bytes: Long)

  /** Every (bucket, version) any surviving main snapshot, tagged
    * snapshot, or branch manifest still references (the liveness set
    * expireSnapshots vacuums against). */
  private def referencedVersions(root: String): Set[(Int, Int)] =
    (snapshotIds(root) ++ tags(root).map(tagSnapshotId(root, _)))
      .flatMap(id => lineageAt(root, id).map(l => (l.bucket, l.version))).toSet ++
      branches(root).flatMap(n => branchSnapshotIds(root, n)
        .flatMap(id => branchLineageAt(root, n, id).map(l => (l.bucket, l.version))))

  private def dirBytes(p: java.nio.file.Path): Long =
    if (!Files.isDirectory(p)) 0L
    else {
      val s = Files.walk(p)
      try s.iterator().asScala.filter(Files.isRegularFile(_))
        .map(Files.size).sum
      finally s.close()
    }

  /** DRY-RUN orphan scan — the reclaimable-storage report a table
    * maintenance job prints before vacuuming: walks the data tree and
    * subtracts everything any surviving snapshot/tag/branch manifest
    * references. Crash-recovery runs FIRST so a legitimately in-flight
    * compaction/merge is repaired, never reported as garbage. Reports:
    *  - staging leftovers (replayable by construction once recovery
    *    has run — the layout doc's invariant),
    *  - live `bucket=<b>` dirs for buckets absent from EVERY manifest
    *    (a crashed pre-publish wave),
    *  - `_archive/bucket=<b>/v<k>` versions nothing references (what
    *    expireSnapshots deletes; surfaced here without deleting). */
  def planOrphans(root: String): Seq[Orphan] = {
    recoverCompaction(root)
    recoverMerge(root)
    val referenced = referencedVersions(root)
    val liveBuckets = referenced.map(_._1)
    val staging = listDir(Paths.get(root, "_staging"))
      .map(p => Orphan(p.toString, "staging", dirBytes(p)))
    val liveOrphans = listDir(Paths.get(root))
      .filter(p => p.getFileName.toString.startsWith("bucket="))
      .filter(p => !liveBuckets(p.getFileName.toString.stripPrefix("bucket=").toInt))
      .map(p => Orphan(p.toString, "live-bucket", dirBytes(p)))
    val archOrphans =
      for (bdir <- listDir(Paths.get(root, "_archive"));
           bname = bdir.getFileName.toString if bname.startsWith("bucket=");
           vdir <- listDir(bdir); vname = vdir.getFileName.toString
           if vname.startsWith("v")
           if !referenced((bname.stripPrefix("bucket=").toInt,
             vname.stripPrefix("v").toInt)))
        yield Orphan(vdir.toString, "archive", dirBytes(vdir))
    (staging ++ liveOrphans ++ archOrphans).sortBy(_.path)
  }

  /** Execute the orphan plan. `olderThanMs` is Iceberg's age guard
    * (remove_orphan_files' older_than): only candidates whose newest
    * file predates now−olderThanMs are deleted, so a writer that is
    * mid-flight right now (staged bytes newer than the guard) is never
    * swept. Production callers should pass a multi-hour guard; 0 sweeps
    * everything planned. Returns what was deleted. */
  def removeOrphans(root: String, olderThanMs: Long = 0L): Seq[Orphan] = {
    val cutoff = System.currentTimeMillis() - olderThanMs
    def newestMs(p: java.nio.file.Path): Long =
      if (!Files.isDirectory(p)) 0L
      else {
        val s = Files.walk(p)
        try {
          val times = s.iterator().asScala.filter(Files.isRegularFile(_))
            .map(Files.getLastModifiedTime(_).toMillis).toSeq
          if (times.isEmpty) 0L else times.max
        } finally s.close()
      }
    val swept = planOrphans(root).filter(o => newestMs(Paths.get(o.path)) <= cutoff)
    swept.foreach(o => deleteRecursively(Paths.get(o.path)))
    swept
  }
}
