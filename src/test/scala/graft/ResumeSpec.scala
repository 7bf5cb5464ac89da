package graft

import graft.core._
import graft.io.TableIO
import java.nio.file.{Files, Paths}

/** Checkpoint/resume semantics (SURVEY.md §5 item 5): kill after wave
  * k, resume from the snapshot, byte-equal final table + lineage rows
  * covering every bucket exactly once. */
class ResumeSpec extends SparkSuite {

  private def freshDir(name: String): String = {
    val d = Files.createTempDirectory(name).toString
    d
  }

  private def extracted() = {
    val turns = graft.pipeline.Pipeline.synthTurns(spark, 150L, 8)
    graft.pipeline.Pipeline.extractTurns(turns)
  }

  private def dump(root: String): Seq[String] = {
    TableIO.readExtracted(spark, root)
      .orderBy("conv_id", "turn_idx")
      .collect()
      .map(Json.turnJson)
      .toSeq
  }

  test("one-shot write: lineage covers every bucket exactly once, counts add up") {
    val root = freshDir("graft-oneshot")
    val lin = TableIO.writeExtracted(extracted(), root, buckets = 16, waves = 4)
    assert(lin.map(_.bucket).sorted == (0 until 16).toVector)
    assert(TableIO.lineage(root).map(_.bucket).sorted == (0 until 16).toVector)
    val total = TableIO.readExtracted(spark, root).count()
    assert(lin.map(_.rows).sum == total && total > 0)
    // key ranges are real
    assert(lin.filter(_.rows > 0).forall(l => l.minKey <= l.maxKey))
  }

  test("kill after wave 2 → resume → byte-equal to one-shot write") {
    val rootA = freshDir("graft-full")
    val rootB = freshDir("graft-resumed")
    TableIO.writeExtracted(extracted(), rootA, buckets = 16, waves = 4)

    // crash: only 2 of 4 waves commit
    val firstLin = TableIO.writeExtracted(extracted(), rootB, buckets = 16, waves = 4,
      stopAfterWaves = 2)
    assert(firstLin.map(_.bucket).toSet.size == 8)
    val (snap1, done1) = TableIO.committed(rootB)
    assert(done1.size == 8 && snap1 >= 0)

    // simulate a partially-written uncommitted bucket left by the crash
    val partial = (0 until 16).find(b => !done1.contains(b)).get
    Files.createDirectories(Paths.get(rootB, s"bucket=$partial"))
    Files.writeString(Paths.get(rootB, s"bucket=$partial", "garbage.parquet"), "not parquet")

    // resume: writes only the remaining buckets, replacing the partial
    val secondLin = TableIO.writeExtracted(extracted(), rootB, buckets = 16, waves = 4)
    assert(secondLin.map(_.bucket).toSet == (0 until 16).toSet -- done1)
    assert(TableIO.lineage(rootB).map(_.bucket).sorted == (0 until 16).toVector)

    assert(dump(rootB) == dump(rootA))
  }

  test("crash, resume, crash again mid-resume, resume → byte-equal") {
    val rootA = freshDir("graft-full2")
    val rootB = freshDir("graft-doublecrash")
    TableIO.writeExtracted(extracted(), rootA, buckets = 16, waves = 4)

    TableIO.writeExtracted(extracted(), rootB, buckets = 16, waves = 4, stopAfterWaves = 1)
    val (_, done1) = TableIO.committed(rootB)
    assert(done1.size == 4)
    // resume crashes again after one more wave (snapshots accumulate;
    // stopAfterWaves counts wave INDICES, and wave 0 is already done)
    TableIO.writeExtracted(extracted(), rootB, buckets = 16, waves = 4, stopAfterWaves = 2)
    val (_, done2) = TableIO.committed(rootB)
    assert(done2.size == 8 && done1.subsetOf(done2))
    // final resume completes the remaining buckets exactly once
    val lin = TableIO.writeExtracted(extracted(), rootB, buckets = 16, waves = 4)
    assert(lin.map(_.bucket).toSet == (0 until 16).toSet -- done2)
    assert(TableIO.lineage(rootB).map(_.bucket).sorted == (0 until 16).toVector)
    assert(dump(rootB) == dump(rootA))
  }

  test("JSON-lines sink (S8): ordered canonical lines equal to the in-memory dump") {
    val root = freshDir("graft-jsonl")
    val ds = extracted()
    graft.pipeline.Pipeline.writeJsonLines(ds, root)
    val back = spark.read.textFile(root).collect().sorted.toSeq
    val expect = graft.pipeline.Pipeline.ordered(ds).collect().map(Json.turnJson).sorted.toSeq
    assert(back == expect && back.nonEmpty)
  }

  test("compaction collapses small files, preserves content, advances the snapshot") {
    val root = freshDir("graft-compact")
    TableIO.writeExtracted(extracted(), root, buckets = 8, waves = 2)
    val before = dump(root)
    val linBefore = TableIO.lineage(root).map(l => l.bucket -> l.rows).toMap
    val (snapBefore, _) = TableIO.committed(root)
    // manufacture the small-file state streaming appends would leave:
    // shatter two buckets into many tiny files (content unchanged)
    import scala.jdk.CollectionConverters._
    def deleteRec(p: java.nio.file.Path): Unit =
      if (Files.exists(p))
        Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    def parquetFiles(b: Int) =
      Files.list(Paths.get(root, s"bucket=$b")).iterator()
        .asScala.filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    for (b <- Seq(0, 3)) {
      val live = Paths.get(root, s"bucket=$b")
      val tmp = Paths.get(root, "_staging", s"shatter-$b")
      spark.read.parquet(live.toString).repartition(12)
        .write.mode("overwrite").parquet(tmp.toString)
      deleteRec(live)
      Files.move(tmp, live)
      assert(parquetFiles(b).length > 8)
    }
    assert(dump(root) == before, "shatter setup must be content-preserving")
    val compacted = TableIO.compact(spark, root, maxFiles = 8)
    assert(compacted == Seq(0, 3))
    for (b <- Seq(0, 3)) assert(parquetFiles(b).length <= 2,
      s"bucket $b still has ${parquetFiles(b).length} files")
    assert(dump(root) == before, "compaction must be content-preserving")
    val linAfter = TableIO.lineage(root).map(l => l.bucket -> l.rows).toMap
    assert(linAfter == linBefore, "lineage rows must be unchanged")
    val (snapAfter, doneAfter) = TableIO.committed(root)
    assert(snapAfter > snapBefore && doneAfter.size == 8)
    // idempotent: nothing left above the threshold
    assert(TableIO.compact(spark, root, maxFiles = 8).isEmpty)
  }

  test("a compaction crashed between its renames recovers without data loss") {
    val root = freshDir("graft-compact-crash")
    TableIO.writeExtracted(extracted(), root, buckets = 8, waves = 2)
    val before = dump(root)
    // manufacture the mid-swap crash: live dir parked, nothing in place
    val live = Paths.get(root, s"bucket=2")
    val parked = Paths.get(root, "_staging", "old-2")
    Files.createDirectories(parked.getParent)
    Files.move(live, parked)
    assert(!Files.isDirectory(live))
    TableIO.compact(spark, root) // recovery runs on entry
    assert(Files.isDirectory(live) && !Files.exists(parked))
    assert(dump(root) == before, "recovered table must be byte-equal")
  }

  test("point lookup reads only the conv's hash bucket (1/B of the files)") {
    val root = freshDir("graft-lookup")
    val ds = extracted()
    TableIO.writeExtracted(ds, root, buckets = 16, waves = 4)
    val someConv = ds.head().conv_id
    val viaLookup = TableIO.lookupConv(spark, root, someConv, buckets = 16)
    // correctness: identical rows to a full-table filter
    val viaScan = TableIO.readExtracted(spark, root)
      .filter(_.conv_id == someConv).collect().map(Json.turnJson).sorted.toSeq
    assert(viaLookup.collect().map(Json.turnJson).sorted.toSeq == viaScan)
    assert(viaScan.nonEmpty)
    // pruning: every input file of the lookup plan is inside the ONE
    // bucket directory the driver-side hash names
    val b = TableIO.bucketIdOf(someConv, 16)
    val files = viaLookup.toDF().inputFiles
    assert(files.nonEmpty && files.forall(_.contains(s"bucket=$b")),
      s"lookup read outside bucket=$b: ${files.mkString(", ")}")
    // the driver-side hash matches the write path's bucket assignment
    // for every conv in the table
    val assigned = TableIO.readExtracted(spark, root)
      .select("conv_id").distinct().collect().map(_.getString(0))
    for (c <- assigned.take(50))
      assert(TableIO.lookupConv(spark, root, c, 16).count() > 0)
  }

  test("point-lookup misses return empty, never throw") {
    val root = freshDir("graft-lookup-miss")
    TableIO.writeExtracted(extracted(), root, buckets = 64, waves = 2)
    // a conv_id that is not in the table: its bucket may exist
    // (possibly empty) or hold other convs — either way, empty result
    val ghost = "conv-does-not-exist-9999"
    assert(TableIO.lookupConv(spark, root, ghost, 64).count() == 0)
    // bucket dir physically missing (e.g. narrower table than B): still
    // an empty result, not a schema-inference crash
    val b = TableIO.bucketIdOf(ghost, 64)
    def deleteRec(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (Files.exists(p))
        Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
    deleteRec(Paths.get(root, s"bucket=$b"))
    assert(TableIO.lookupConv(spark, root, ghost, 64).count() == 0)
  }

  test("snapshot time travel + incremental read across waves and compaction") {
    val root = freshDir("graft-timetravel")
    def dumpAsOf(snap: Int): Seq[String] =
      TableIO.readExtracted(spark, root, snap)
        .orderBy("conv_id", "turn_idx").collect().map(Json.turnJson).toSeq
    def dumpChanges(from: Int, to: Int): Seq[String] =
      TableIO.readChanges(spark, root, from, to)
        .orderBy("conv_id", "turn_idx").collect().map(Json.turnJson).toSeq

    // wave 0 commits → snap1; full write → snap2
    TableIO.writeExtracted(extracted(), root, buckets = 8, waves = 2, stopAfterWaves = 1)
    val (snap1, done1) = TableIO.committed(root)
    assert(done1.size == 4)
    val content1 = dump(root)
    TableIO.writeExtracted(extracted(), root, buckets = 8, waves = 2)
    val (snap2, done2) = TableIO.committed(root)
    assert(snap2 > snap1 && done2.size == 8)
    val content2 = dump(root)
    assert(content1.size < content2.size)

    // as-of reads reproduce each committed state
    assert(dumpAsOf(snap1) == content1)
    assert(dumpAsOf(snap2) == content2)

    // incremental reads: manifest diff = exactly the wave-1 rows
    assert(dumpChanges(-1, snap1) == content1)
    assert(dumpChanges(snap1, snap2).sorted == (content2.toSet -- content1.toSet).toSeq.sorted)
    assert(dumpChanges(snap1, snap2).size + content1.size == content2.size)

    // compaction advances the snapshot but rows don't re-appear as changes
    import scala.jdk.CollectionConverters._
    def deleteRec(p: java.nio.file.Path): Unit =
      if (Files.exists(p))
        Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    val shatterB = done2.toSeq.sorted.head
    val live = Paths.get(root, s"bucket=$shatterB")
    val tmp = Paths.get(root, "_staging", s"shatter-$shatterB")
    spark.read.parquet(live.toString).repartition(12)
      .write.mode("overwrite").parquet(tmp.toString)
    deleteRec(live); Files.move(tmp, live)
    val compacted = TableIO.compact(spark, root, maxFiles = 8)
    assert(compacted == Seq(shatterB))
    val (snap3, _) = TableIO.committed(root)
    assert(snap3 > snap2)
    assert(dumpAsOf(snap1) == content1, "as-of-1 must survive compaction")
    assert(dumpAsOf(snap3) == content2)
    assert(dumpChanges(snap2, snap3).isEmpty,
      "compaction-only snapshot must contribute no incremental rows")

    // unknown snapshot fails loudly
    intercept[IllegalArgumentException] { TableIO.readExtracted(spark, root, 999) }
    intercept[IllegalArgumentException] { TableIO.readChanges(spark, root, 999, snap3) }
  }

  test("snapshot retention drops old manifests, keeps reads + resume intact") {
    val root = freshDir("graft-expire")
    TableIO.writeExtracted(extracted(), root, buckets = 16, waves = 4)
    val before = dump(root)
    val ids = TableIO.snapshotIds(root)
    assert(ids.size == 4) // one per wave
    val expired = TableIO.expireSnapshots(root, keep = 2)
    assert(expired == ids.dropRight(2))
    assert(TableIO.snapshotIds(root) == ids.takeRight(2))
    // current reads, time travel within the window, and lineage survive
    assert(dump(root) == before)
    assert(TableIO.readExtracted(spark, root, ids.last).orderBy("conv_id", "turn_idx")
      .collect().map(Json.turnJson).toSeq == before)
    assert(TableIO.lineage(root).map(_.bucket).sorted == (0 until 16).toVector)
    // expired snapshots now fail loudly instead of reading stale state
    intercept[IllegalArgumentException] {
      TableIO.readExtracted(spark, root, ids.head)
    }
    // resume still sees the table as fully committed (no rewrites)
    assert(TableIO.writeExtracted(extracted(), root, buckets = 16, waves = 4).isEmpty)
    // the latest snapshot can never be expired
    assert(TableIO.expireSnapshots(root, keep = 1) == Seq(ids(2)))
    assert(TableIO.snapshotIds(root) == Seq(ids.last))
    intercept[IllegalArgumentException] { TableIO.expireSnapshots(root, keep = 0) }
  }

  test("resume on a fully-committed table is a no-op") {
    val root = freshDir("graft-noop")
    TableIO.writeExtracted(extracted(), root, buckets = 8, waves = 2)
    val again = TableIO.writeExtracted(extracted(), root, buckets = 8, waves = 2)
    assert(again.isEmpty)
  }

  test("row-level merge: replaces matched keys, inserts new rows, time travel stays exact") {
    import spark.implicits._
    val root = freshDir("graft-merge")
    val ds = extracted()
    TableIO.writeExtracted(ds, root, buckets = 8, waves = 2)
    val (preSnap, _) = TableIO.committed(root)
    val before = dump(root)
    val preVersions = TableIO.lineage(root).map(l => l.bucket -> l.version).toMap
    assert(preVersions.values.forall(_ == 0))

    // updates: every 3rd conv re-extracted with a corrected score, plus
    // one brand-new conv (pure insert)
    val corrected = ds.filter(t => math.abs(t.conv_id.hashCode % 3) == 0)
      .map(t => t.copy(total_score = t.total_score + 1000))
    assert(corrected.count() > 0)
    val insert = spark.createDataset(Seq(ExtractedTurn(
      "zzz-merge-insert", 0, None, None, None, None, 7,
      Seq(), "inserted row", Seq(), None, None)))
    val updates = corrected.union(insert)

    val newLin = TableIO.mergeExtracted(updates, root, buckets = 8)
    val (postSnap, _) = TableIO.committed(root)
    assert(postSnap > preSnap)
    // every affected committed bucket bumped to version 1
    assert(newLin.forall(l => l.version == preVersions.getOrElse(l.bucket, -1) + 1
      || (l.version == 0 && !preVersions.contains(l.bucket))))

    // merged content == (before minus matched keys) ∪ updates
    val updKeys = updates.collect().map(t => (t.conv_id, t.turn_idx)).toSet
    val beforeRows = ds.collect().toSeq
    val expected = (beforeRows.filterNot(t => updKeys((t.conv_id, t.turn_idx))) ++
      updates.collect().toSeq)
      .sortBy(t => (t.conv_id, t.turn_idx)).map(Json.turnJson)
    assert(dump(root) == expected)

    // time travel to the pre-merge snapshot reads the archived bytes
    assert(TableIO.readExtracted(spark, root, preSnap)
      .orderBy("conv_id", "turn_idx").collect().map(Json.turnJson).toSeq == before)

    // incremental read over the merge window = the affected buckets'
    // post-merge content (bucket-level change granularity)
    val changed = TableIO.readChanges(spark, root, preSnap, postSnap)
      .collect().map(Json.turnJson).toSet
    val mergedAll = dump(root).toSet
    assert(changed.subsetOf(mergedAll))
    assert(updates.collect().map(Json.turnJson).toSet.subsetOf(changed),
      "every update row must appear in the merge-window changes")

    // point lookup sees the post-merge row
    val someUpdated = corrected.head()
    val found = TableIO.lookupConv(spark, root, someUpdated.conv_id, buckets = 8)
      .filter(_.turn_idx == someUpdated.turn_idx).head()
    assert(found.total_score == someUpdated.total_score)
    assert(TableIO.lookupConv(spark, root, "zzz-merge-insert", buckets = 8).count() == 1)
  }

  test("merge then compaction: as-of-pre-merge survives both") {
    import spark.implicits._
    val root = freshDir("graft-merge-compact")
    val ds = extracted()
    TableIO.writeExtracted(ds, root, buckets = 8, waves = 2)
    val (preSnap, _) = TableIO.committed(root)
    val before = dump(root)
    val updates = ds.filter(t => math.abs(t.conv_id.hashCode % 4) == 0)
      .map(t => t.copy(total_score = 0))
    TableIO.mergeExtracted(updates, root, buckets = 8)
    val after = dump(root)
    // shatter one merged bucket then compact it
    val b = TableIO.lineage(root).filter(_.version > 0).map(_.bucket).min
    import scala.jdk.CollectionConverters._
    def deleteRec(p: java.nio.file.Path): Unit =
      if (Files.exists(p))
        Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    val live = Paths.get(root, s"bucket=$b")
    val tmp = Paths.get(root, "_staging", s"shatter-$b")
    spark.read.parquet(live.toString).repartition(12)
      .write.mode("overwrite").parquet(tmp.toString)
    deleteRec(live); Files.move(tmp, live)
    assert(TableIO.compact(spark, root, maxFiles = 8) == Seq(b))
    assert(dump(root) == after, "compaction after merge must preserve merged content")
    assert(TableIO.readExtracted(spark, root, preSnap)
      .orderBy("conv_id", "turn_idx").collect().map(Json.turnJson).toSeq == before,
      "pre-merge time travel must survive compaction of the merged bucket")
  }

  test("a merge crashed before its snapshot publish rolls back cleanly") {
    import spark.implicits._
    val root = freshDir("graft-merge-crash")
    val ds = extracted()
    TableIO.writeExtracted(ds, root, buckets = 8, waves = 2)
    val before = dump(root)
    // manufacture the crash window: live bucket archived at its CURRENT
    // manifest version, unpublished merge bytes (garbage) live
    val b = TableIO.lineage(root).head.bucket
    val live = Paths.get(root, s"bucket=$b")
    val arch = Paths.get(root, "_archive", s"bucket=$b", "v0")
    Files.createDirectories(arch.getParent)
    Files.move(live, arch)
    Files.createDirectories(live)
    Files.writeString(live.resolve("unpublished.parquet"), "not parquet")
    // any entry point runs recoverMerge and restores the pre-merge state
    assert(dump(root) == before)
    assert(!Files.exists(arch), "in-flight archive must be restored, not kept")
    // and a fresh merge over the recovered table works
    val updates = ds.limit(5).map(t => t.copy(total_score = 1))
    val u0 = updates.head()
    TableIO.mergeExtracted(updates, root, buckets = 8)
    val got = TableIO.lookupConv(spark, root, u0.conv_id, buckets = 8)
      .filter(_.turn_idx == u0.turn_idx).head()
    assert(got.total_score == 1)
  }

  test("DSv2 lineage source: snapshot pushdown prunes to one manifest partition; projection order holds") {
    import org.apache.spark.sql.functions.col
    val root = freshDir("graft-dsv2")
    TableIO.writeExtracted(extracted(), root, buckets = 8, waves = 2)
    val df = spark.read.format("graft.sources.LineageSource")
      .option("path", root).load()
    val nSnaps = TableIO.snapshotIds(root).size
    assert(nSnaps >= 2)
    assert(df.rdd.getNumPartitions == nSnaps,
      "unfiltered scan must plan one partition per manifest")
    val (snap, _) = TableIO.committed(root)
    val one = df.filter(col("snapshot") === snap)
    assert(one.rdd.getNumPartitions == 1,
      "snapshot equality must prune to exactly one manifest partition")
    // content equals the driver-side lineage read
    val got = one.select("bucket", "rows", "version").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
    val want = TableIO.lineage(root).map(l => (l.bucket, l.rows, l.version)).toSet
    assert(got == want)
    // pruned + REORDERED projection comes back in the requested order
    val row = one.select("maxKey", "bucket").orderBy(col("bucket")).head()
    assert(row.schema.fieldNames.toSeq == Seq("maxKey", "bucket"))
    assert(row.getString(0).nonEmpty && row.getInt(1) >= 0)
  }

  test("row-level delete: drops named convs, empties a bucket to a tombstone, time travel stays exact") {
    import spark.implicits._
    val root = freshDir("graft-delete")
    val ds = extracted()
    TableIO.writeExtracted(ds, root, buckets = 8, waves = 2)
    val (preSnap, _) = TableIO.committed(root)
    val before = dump(root)
    val preVersions = TableIO.lineage(root).map(l => l.bucket -> l.version).toMap

    // delete every conv of one whole bucket (tombstone case) plus a
    // few convs from other buckets, plus a key that matches nothing
    val allConvs = ds.map(_.conv_id).distinct().collect().toSeq.sorted
    val emptied = preVersions.keys.min
    val wholeBucket = allConvs.filter(c => TableIO.bucketIdOf(c, 8) == emptied)
    assert(wholeBucket.nonEmpty)
    val others = allConvs.filterNot(c => TableIO.bucketIdOf(c, 8) == emptied).take(3)
    val keys = wholeBucket ++ others :+ "zzz-no-such-conv"
    val newLin = TableIO.deleteConvs(spark.createDataset(keys), root, buckets = 8)
    val (postSnap, _) = TableIO.committed(root)
    assert(postSnap > preSnap)

    // only buckets that actually lost rows were rewritten, each bumped
    val touched = (wholeBucket ++ others).map(TableIO.bucketIdOf(_, 8)).toSet
    assert(newLin.map(_.bucket).toSet == touched)
    assert(newLin.forall(l => l.version == preVersions(l.bucket) + 1))
    // the emptied bucket keeps a 0-row lineage entry (deliberate tombstone)
    assert(newLin.find(_.bucket == emptied).get.rows == 0L)

    // live content == before minus the named convs, byte-exact
    val gone = keys.toSet
    val expected = ds.collect().toSeq.filterNot(t => gone(t.conv_id))
      .sortBy(t => (t.conv_id, t.turn_idx)).map(Json.turnJson)
    assert(dump(root) == expected)
    assert(TableIO.lookupConv(spark, root, wholeBucket.head, buckets = 8).count() == 0)

    // time travel to the pre-delete snapshot reads the archived bytes
    assert(TableIO.readExtracted(spark, root, preSnap)
      .orderBy("conv_id", "turn_idx").collect().map(Json.turnJson).toSeq == before)

    // deleting only unknown keys is a no-op: no new snapshot
    assert(TableIO.deleteConvs(
      spark.createDataset(Seq("zzz-still-no-such-conv")), root, buckets = 8).isEmpty)
    assert(TableIO.committed(root)._1 == postSnap)
  }

  test("schema evolution: add-column-with-default; old snapshots keep the old schema") {
    import org.apache.spark.sql.functions._
    val root = freshDir("graft-evolve")
    val ds = extracted()
    TableIO.writeExtracted(ds, root, buckets = 8, waves = 2, stopAfterWaves = 1)
    val (snap1, _) = TableIO.committed(root)
    val since = TableIO.evolveSchema(root, "quality_tier", "STRING", "'unscored'")
    assert(since == snap1)
    intercept[IllegalArgumentException] {
      TableIO.evolveSchema(root, "quality_tier", "STRING", "'x'")
    }
    intercept[IllegalArgumentException] {
      TableIO.evolveSchema(root, "conv_id", "STRING", "'x'")
    }
    // wave 2 written WITH the column populated
    val withCol = ds.toDF().withColumn("quality_tier",
      when(col("total_score") >= 50, lit("high")).otherwise(lit("low")))
    TableIO.writeExtractedDf(withCol, root, buckets = 8, waves = 2)
    val (snap2, _) = TableIO.committed(root)

    // current read: one uniform schema, no nulls; wave-1 bytes (files
    // without the column) read as the default, wave-2 as written
    val cur = TableIO.readTable(spark, root)
    assert(cur.columns.contains("quality_tier"))
    assert(cur.filter(col("quality_tier").isNull).count() == 0)
    val w1keys = TableIO.readExtracted(spark, root, snap1)
      .collect().map(t => (t.conv_id, t.turn_idx)).toSet
    val rows = cur.select("conv_id", "turn_idx", "quality_tier").collect()
    val (w1rows, w2rows) = rows.partition(r => w1keys((r.getString(0), r.getInt(1))))
    assert(w1rows.nonEmpty && w1rows.forall(_.getString(2) == "unscored"))
    assert(w2rows.nonEmpty && w2rows.forall(r =>
      r.getString(2) == "high" || r.getString(2) == "low"))

    // time travel: the snapshot at/before the evolution keeps the OLD
    // schema; the one after carries the column (defaults for old bytes)
    assert(!TableIO.readTable(spark, root, Some(snap1)).columns.contains("quality_tier"))
    val asOf2 = TableIO.readTable(spark, root, Some(snap2))
    assert(asOf2.columns.contains("quality_tier"))
    assert(asOf2.count() == cur.count())

    // a typed merge into the evolved table: update rows surface the
    // default, untouched rows keep their written values
    import spark.implicits._
    val updates = ds.limit(10).map(t => t.copy(total_score = 9999))
    TableIO.mergeExtracted(updates, root, buckets = 8)
    val merged = TableIO.readTable(spark, root)
    assert(merged.filter(col("quality_tier").isNull).count() == 0)
    assert(merged.filter(col("total_score") === 9999)
      .select("quality_tier").collect().forall(_.getString(0) == "unscored"))
  }

  test("rollback: head returns to the target state; rolled-past snapshots stay readable") {
    val root = freshDir("graft-rollback")
    def dumpAsOf(snap: Int): Seq[String] =
      TableIO.readExtracted(spark, root, snap)
        .orderBy("conv_id", "turn_idx").collect().map(Json.turnJson).toSeq

    TableIO.writeExtracted(extracted(), root, buckets = 8, waves = 2, stopAfterWaves = 1)
    val (snap1, _) = TableIO.committed(root)
    val content1 = dump(root)
    TableIO.writeExtracted(extracted(), root, buckets = 8, waves = 2)
    val (snap2, _) = TableIO.committed(root)
    val content2 = dump(root)
    assert(content1 != content2)

    // rollback publishes a NEW head that reads as the target state
    val head = TableIO.rollbackTo(root, snap1)
    assert(head > snap2)
    assert(TableIO.committed(root)._1 == head)
    assert(dump(root) == content1)
    assert(dumpAsOf(head) == content1)
    // history preserved: the rolled-past snapshot still time-travels
    assert(dumpAsOf(snap2) == content2)
    // rolling forward is refused
    intercept[IllegalArgumentException] { TableIO.rollbackTo(root, head + 5) }
    // resume semantics after rollback: the missing buckets re-commit
    // and the table returns to the full deterministic state
    TableIO.writeExtracted(extracted(), root, buckets = 8, waves = 2)
    assert(dump(root) == content2)
  }

  test("snapshot publish is a compare-and-swap: double-publish of an id fails loudly") {
    val root = freshDir("graft-cas")
    TableIO.writeExtracted(extracted(), root, buckets = 8, waves = 2)
    val (snap, _) = TableIO.committed(root)
    val lin = TableIO.lineage(root)
    // two writers that both read snapshot `snap` race to publish snap+1:
    // the second link(2) fails instead of silently replacing the first
    TableIO.publishSnapshot(root, snap + 1, lin.take(1))
    val e = intercept[IllegalStateException] {
      TableIO.publishSnapshot(root, snap + 1, lin.take(1))
    }
    assert(e.getMessage.contains("concurrent writer"))
    // the first publish's manifest is intact
    assert(TableIO.lineageAt(root, snap + 1).nonEmpty)
  }

  test("retention vacuums archive versions no surviving manifest references") {
    import spark.implicits._
    val root = freshDir("graft-merge-expire")
    val ds = extracted()
    TableIO.writeExtracted(ds, root, buckets = 8, waves = 2)
    val (preSnap, _) = TableIO.committed(root)
    val updates = ds.limit(20).map(t => t.copy(total_score = 0))
    TableIO.mergeExtracted(updates, root, buckets = 8)
    val after = dump(root)
    val archRoot = Paths.get(root, "_archive")
    assert(Files.isDirectory(archRoot) && TableIO.snapshotIds(root).size >= 3)
    // while the pre-merge manifest survives, its archive must too
    TableIO.expireSnapshots(root, keep = 2) // keeps pre-merge + merge snaps
    assert(TableIO.readExtracted(spark, root, preSnap).count() > 0)
    // expire down to the merge snapshot only → archives orphaned → vacuumed
    TableIO.expireSnapshots(root, keep = 1)
    import scala.jdk.CollectionConverters._
    val leftoverVersions = {
      if (!Files.isDirectory(archRoot)) Nil
      else {
        val s = Files.walk(archRoot)
        try s.iterator().asScala.filter(p =>
          p.getFileName.toString.endsWith(".parquet")).toSeq
        finally s.close()
      }
    }
    assert(leftoverVersions.isEmpty, s"orphan archive files survived: $leftoverVersions")
    intercept[IllegalArgumentException] { TableIO.readExtracted(spark, root, preSnap) }
    assert(dump(root) == after, "latest state must be untouched by the vacuum")
  }

  test("branches: zero-copy create, isolated merge, divergence; main untouched byte-for-byte") {
    import spark.implicits._
    val root = freshDir("graft-branch")
    val ds = extracted()
    TableIO.writeExtracted(ds, root, buckets = 8, waves = 2)
    val (snap, _) = TableIO.committed(root)
    val mainBefore = dump(root)

    TableIO.createBranch(root, "exp", snap)
    // zero-copy: branch read == main read; no branch data dirs yet
    assert(TableIO.readBranch(spark, root, "exp").orderBy("conv_id", "turn_idx")
      .collect().map(Json.turnJson).toSeq == mainBefore)
    assert((0 until 8).forall(b =>
      !Files.isDirectory(Paths.get(root, "_branches", "exp", s"bucket=$b"))))
    // creating an existing branch must CAS-fail, not silently rewrite
    intercept[IllegalStateException] { TableIO.createBranch(root, "exp", snap) }

    // branch merge: corrected subset visible ONLY on the branch
    val branchUpd = ds.filter(t => math.abs(t.conv_id.hashCode % 3) == 1)
      .map(t => t.copy(total_score = t.total_score + 5000))
    assert(branchUpd.count() > 0)
    TableIO.mergeIntoBranch(branchUpd, root, "exp", buckets = 8)
    val updKeys = branchUpd.collect().map(t => (t.conv_id, t.turn_idx)).toSet
    val expectedBranch = (ds.collect().toSeq
      .filterNot(t => updKeys((t.conv_id, t.turn_idx))) ++ branchUpd.collect().toSeq)
      .sortBy(t => (t.conv_id, t.turn_idx)).map(Json.turnJson)
    assert(TableIO.readBranch(spark, root, "exp").orderBy("conv_id", "turn_idx")
      .collect().map(Json.turnJson).toSeq == expectedBranch)
    assert(dump(root) == mainBefore, "branch merge leaked into main")

    // divergence: main merges a DIFFERENT subset; both lines stay exact
    val mainUpd = ds.filter(t => math.abs(t.conv_id.hashCode % 3) == 2)
      .map(t => t.copy(total_score = t.total_score + 100))
    assert(mainUpd.count() > 0)
    TableIO.mergeExtracted(mainUpd, root, buckets = 8)
    val mainKeys = mainUpd.collect().map(t => (t.conv_id, t.turn_idx)).toSet
    val expectedMain = (ds.collect().toSeq
      .filterNot(t => mainKeys((t.conv_id, t.turn_idx))) ++ mainUpd.collect().toSeq)
      .sortBy(t => (t.conv_id, t.turn_idx)).map(Json.turnJson)
    assert(dump(root) == expectedMain)
    // the branch still reads ITS state: inherited buckets that main
    // re-versioned resolve via the archive, branch-written ones via the
    // branch-private dirs
    assert(TableIO.readBranch(spark, root, "exp").orderBy("conv_id", "turn_idx")
      .collect().map(Json.turnJson).toSeq == expectedBranch,
      "main's merge changed what the branch reads")
    assert(TableIO.branches(root) == Seq("exp"))
  }

  test("tags: named time travel, immutable, exempt from retention and vacuum") {
    val root = freshDir("graft-tag")
    TableIO.writeExtracted(extracted(), root, buckets = 8, waves = 4)
    val firstSnap = TableIO.snapshotIds(root).head
    val asOf = TableIO.readExtracted(spark, root, firstSnap)
      .orderBy("conv_id", "turn_idx").collect().map(Json.turnJson).toSeq
    TableIO.tagSnapshot(root, "v1", firstSnap)
    assert(TableIO.tags(root) == Seq("v1"))
    assert(TableIO.readTag(spark, root, "v1").orderBy("conv_id", "turn_idx")
      .collect().map(Json.turnJson).toSeq == asOf)
    // tags are immutable names
    intercept[IllegalStateException] { TableIO.tagSnapshot(root, "v1", firstSnap) }
    // retention keeps the tagged manifest alive (Iceberg tag contract)
    TableIO.expireSnapshots(root, keep = 1)
    assert(TableIO.snapshotIds(root).contains(firstSnap))
    assert(TableIO.readTag(spark, root, "v1").orderBy("conv_id", "turn_idx")
      .collect().map(Json.turnJson).toSeq == asOf)
  }

  test("changelog: net-effect CDC equals the brute snapshot diff; unchanged buckets never read") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = freshDir("graft-changelog")
    val ds = extracted()
    TableIO.writeExtracted(ds, root, buckets = 8, waves = 2)
    val (preSnap, _) = TableIO.committed(root)
    // touch few buckets on purpose: update ONE conv, insert one new
    // conv, delete one other conv — so pruning below has teeth
    val convs = ds.map(_.conv_id).distinct().collect().sorted
    val updConv = convs.head
    val delConv = convs.last
    assert(updConv != delConv)
    val corrected = ds.filter(t => t.conv_id == updConv)
      .map(t => t.copy(total_score = t.total_score + 77))
    val insert = spark.createDataset(Seq(ExtractedTurn(
      "zzz-cdc-insert", 0, None, None, None, None, 3,
      Seq(), "cdc inserted row", Seq(), None, None)))
    TableIO.mergeExtracted(corrected.union(insert), root, buckets = 8)
    TableIO.deleteConvs(spark.createDataset(Seq(delConv)), root, buckets = 8)
    val (postSnap, _) = TableIO.committed(root)

    val ch = TableIO.changelog(spark, root, preSnap, postSnap)
    // brute-force reference: full diff of the two snapshot reads
    val a = TableIO.readExtracted(spark, root, preSnap).collect()
      .map(t => ((t.conv_id, t.turn_idx), Json.turnJson(t))).toMap
    val b = TableIO.readExtracted(spark, root, postSnap).collect()
      .map(t => ((t.conv_id, t.turn_idx), Json.turnJson(t))).toMap
    val expDel = a.filter { case (k, v) => b.get(k).forall(_ != v) }.keySet
    val expIns = b.filter { case (k, v) => a.get(k).forall(_ != v) }.keySet
    def keys(op: String) = ch.filter(col("op") === op)
      .select("conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(keys("delete") == expDel)
    assert(keys("insert") == expIns)
    // the update pair carries old payload on the delete side, new on
    // the insert side
    val updPair = ch.filter(col("conv_id") === updConv && col("turn_idx") === 0)
      .select("op", "total_score").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(updPair("insert") == updPair("delete") + 77)
    // inserted/deleted convs classify as pure ops
    assert(expIns.exists(_._1 == "zzz-cdc-insert"))
    assert(expDel.exists(_._1 == delConv) && !expIns.exists(_._1 == delConv))
    // pruning: only version-changed buckets are ever read — every input
    // file sits in a dirty bucket's live or archive dir, and at least
    // one bucket was proven clean by the manifest alone
    val va = TableIO.lineageAt(root, preSnap).map(l => (l.bucket, l.version)).toSet
    val vb = TableIO.lineageAt(root, postSnap).map(l => (l.bucket, l.version)).toSet
    val dirty = ((va diff vb) ++ (vb diff va)).map(_._1)
    assert(dirty.size < 8, s"test corpus touched every bucket: $dirty")
    val files = ch.inputFiles
    assert(files.nonEmpty)
    assert(files.forall(f => dirty.exists(bkt => f.contains(s"bucket=$bkt/"))),
      s"changelog read a clean bucket:\n${files.mkString("\n")}")
  }

  test("orphan scan: clean table reports nothing; planted garbage is found, swept, and reads survive") {
    val root = freshDir("graft-orphans")
    TableIO.writeExtracted(extracted(), root, buckets = 8, waves = 2)
    val before = dump(root)
    // a healthy table has zero orphans
    assert(TableIO.planOrphans(root).isEmpty,
      s"clean table reported orphans: ${TableIO.planOrphans(root)}")

    // plant all three garbage kinds: a staging leftover (crashed wave),
    // a live bucket dir no manifest references (crashed pre-publish
    // write), and an unreferenced archive version
    val staging = Paths.get(root, "_staging", "wave-9")
    Files.createDirectories(staging)
    Files.writeString(staging.resolve("part-000.parquet"), "garbage")
    val deadLive = Paths.get(root, "bucket=99")
    Files.createDirectories(deadLive)
    Files.writeString(deadLive.resolve("part-000.parquet"), "garbage")
    val deadArch = Paths.get(root, "_archive", "bucket=3", "v7")
    Files.createDirectories(deadArch)
    Files.writeString(deadArch.resolve("part-000.parquet"), "garbage")

    val plan = TableIO.planOrphans(root)
    assert(plan.map(_.kind).sorted == Seq("archive", "live-bucket", "staging"),
      s"plan found: $plan")
    assert(plan.forall(_.bytes > 0))

    // the age guard protects bytes newer than the cutoff: nothing is
    // swept with a 1-hour guard (all garbage was written just now)...
    assert(TableIO.removeOrphans(root, olderThanMs = 3600L * 1000).isEmpty)
    assert(Files.exists(staging) && Files.exists(deadLive) && Files.exists(deadArch))
    // ...and a zero guard sweeps exactly the plan
    val swept = TableIO.removeOrphans(root)
    assert(swept.map(_.kind).sorted == Seq("archive", "live-bucket", "staging"))
    assert(!Files.exists(staging) && !Files.exists(deadLive) && !Files.exists(deadArch))
    // table reads byte-identically after the sweep
    assert(dump(root) == before)
    assert(TableIO.planOrphans(root).isEmpty)
  }

  test("write-audit-publish: branch merge fast-forwards to main; divergence refuses; time travel intact") {
    val root = freshDir("graft-wap")
    TableIO.writeExtracted(extracted(), root, buckets = 8, waves = 2)
    val (preSnap, _) = TableIO.committed(root)
    val before = dump(root)
    // WRITE: isolated branch carries the correction
    TableIO.createBranch(root, "audit", preSnap)
    import spark.implicits._
    val upd = TableIO.readExtracted(spark, root).limit(3)
      .map(t => t.copy(warnings =
        Some(t.warnings.getOrElse(Nil) :+ "wap touch")))
    TableIO.mergeIntoBranch(upd, root, "audit", buckets = 8)
    // AUDIT: the branch sees the change, main does not
    val branchDump = TableIO.readBranch(spark, root, "audit")
      .orderBy("conv_id", "turn_idx").collect().map(Json.turnJson).toSeq
    assert(branchDump != before && branchDump.size == before.size)
    assert(branchDump.count(_.contains("wap touch")) == 3)
    assert(dump(root) == before, "main leaked the unpublished branch write")
    // PUBLISH: fast-forward
    val newHead = TableIO.publishBranch(root, "audit")
    assert(newHead == preSnap + 1)
    assert(dump(root) == branchDump, "main does not read the published state")
    // pre-publish time travel still reads the exact old bytes
    val asOf = TableIO.readExtracted(spark, root, asOfSnapshot = preSnap)
      .orderBy("conv_id", "turn_idx").collect().map(Json.turnJson).toSeq
    assert(asOf == before, "publish broke time travel to the pre-publish state")
    // the branch ref stays readable after the publish (independent ref)
    assert(TableIO.readBranch(spark, root, "audit")
      .count() == before.size)
    // a second publish is a divergence (main advanced past branched-at)
    intercept[IllegalStateException] { TableIO.publishBranch(root, "audit") }
    // no orphans were created by the publish dance
    assert(TableIO.planOrphans(root).isEmpty,
      s"publish left orphans: ${TableIO.planOrphans(root)}")
  }

  test("publish with nothing staged is a no-op; publish onto a diverged main refuses") {
    val root = freshDir("graft-wap2")
    TableIO.writeExtracted(extracted(), root, buckets = 8, waves = 2)
    val (snap, _) = TableIO.committed(root)
    TableIO.createBranch(root, "empty", snap)
    assert(TableIO.publishBranch(root, "empty") == snap) // nothing staged
    // diverge main with a direct merge, then try to publish a stale branch
    TableIO.createBranch(root, "stale", snap)
    import spark.implicits._
    val upd = TableIO.readExtracted(spark, root).limit(2)
      .map(t => t.copy(warnings =
        Some(t.warnings.getOrElse(Nil) :+ "mainline touch")))
    TableIO.mergeIntoBranch(upd, root, "stale", buckets = 8)
    val upd2 = TableIO.readExtracted(spark, root).limit(1)
      .map(t => t.copy(warnings =
        Some(t.warnings.getOrElse(Nil) :+ "concurrent main write")))
    TableIO.mergeExtracted(upd2, root, buckets = 8)
    intercept[IllegalStateException] { TableIO.publishBranch(root, "stale") }
  }

  test("orphan scan never touches referenced bytes: archive versions pinned by a branch survive") {
    val root = freshDir("graft-orphans-branch")
    val ds = extracted()
    TableIO.writeExtracted(ds, root, buckets = 8, waves = 2)
    val (preSnap, _) = TableIO.committed(root)
    TableIO.createBranch(root, "audit", preSnap)
    // a merge archives the replaced versions; the branch pins them
    import spark.implicits._
    val upd = TableIO.readExtracted(spark, root).limit(3)
      .map(t => t.copy(warnings =
        Some(t.warnings.getOrElse(Nil) :+ "orphan-spec touch")))
    TableIO.mergeExtracted(upd, root, buckets = 8)
    val archived = TableIO.planOrphans(root)
    assert(archived.isEmpty,
      s"branch-pinned archive reported as orphan: $archived")
    assert(TableIO.removeOrphans(root).isEmpty)
    // branch still reads the pre-merge state
    assert(TableIO.readBranch(spark, root, "audit").count() == ds.count())
  }

  /** Physical (delete-file-blind) row count of the live bucket dirs. */
  private def physicalRows(root: String): Long =
    spark.read.option("basePath", root).parquet(root).count()

  test("merge-on-read delete: zero bytes rewritten, reads apply records, time travel exact") {
    val root = freshDir("graft-mor")
    val ds = extracted()
    TableIO.writeExtracted(ds, root, buckets = 8, waves = 2)
    val (preSnap, _) = TableIO.committed(root)
    val before = dump(root)
    val preVersions = TableIO.lineage(root).map(l => l.bucket -> l.version).toMap
    val physBefore = physicalRows(root)

    val all = ds.collect().toSeq
    val delKeys = all.filter(t => t.turn_idx % 4 == 1).map(t => (t.conv_id, t.turn_idx))
    assert(delKeys.nonEmpty)
    import spark.implicits._
    val morSnap = TableIO.deleteTurnsMoR(
      delKeys.toDF("conv_id", "turn_idx"), root, buckets = 8)
    assert(morSnap > preSnap)

    // merge-on-read contract: NO data bucket touched — same versions,
    // same physical rows; only a delete file + a manifest were written
    assert(TableIO.lineage(root).map(l => l.bucket -> l.version).toMap == preVersions)
    assert(physicalRows(root) == physBefore)

    // logical reads drop exactly the keys
    val keySet = delKeys.toSet
    val expected = all.filterNot(t => keySet((t.conv_id, t.turn_idx)))
      .sortBy(t => (t.conv_id, t.turn_idx)).map(Json.turnJson)
    assert(dump(root) == expected)
    // point lookup applies the records too
    val victim = all.find(t => t.turn_idx % 4 == 1).get
    val looked = TableIO.lookupConv(spark, root, victim.conv_id, buckets = 8)
      .collect().map(_.turn_idx).toSet
    assert(!looked(victim.turn_idx))
    assert(looked == all.filter(t => t.conv_id == victim.conv_id)
      .filter(t => t.turn_idx % 4 != 1).map(_.turn_idx).toSet)
    // time travel to before the delete sees everything
    assert(TableIO.readExtracted(spark, root, preSnap)
      .orderBy("conv_id", "turn_idx").collect().map(Json.turnJson).toSeq == before)
  }

  test("MoR deletes fold into later merges; an upsert of a deleted key resurrects it") {
    import spark.implicits._
    val root = freshDir("graft-mor-fold")
    val ds = extracted()
    TableIO.writeExtracted(ds, root, buckets = 8, waves = 2)
    val all = ds.collect().toSeq
    val delKeys = all.filter(t => t.turn_idx % 5 == 2).map(t => (t.conv_id, t.turn_idx))
    val morSnap = TableIO.deleteTurnsMoR(
      delKeys.toDF("conv_id", "turn_idx"), root, buckets = 8)
    val keySet = delKeys.toSet

    // a merge touching every bucket with OTHER keys must keep the
    // deleted rows gone (fold-into-rewrite), and the version bump must
    // not resurrect them on the live read
    val untouched = ds.filter(t => t.turn_idx % 5 != 2)
    val upd = untouched.filter(t => t.turn_idx == 0)
      .map(t => t.copy(total_score = t.total_score + 77))
    TableIO.mergeExtracted(upd, root, buckets = 8)
    val updKeys = upd.collect().map(t => (t.conv_id, t.turn_idx)).toSet
    val expectedAfterMerge = (all.filterNot(t => keySet((t.conv_id, t.turn_idx)))
      .filterNot(t => updKeys((t.conv_id, t.turn_idx))) ++ upd.collect().toSeq)
      .sortBy(t => (t.conv_id, t.turn_idx)).map(Json.turnJson)
    assert(dump(root) == expectedAfterMerge)
    // the as-of-MoR read still applies the records over the archive
    assert(TableIO.readExtracted(spark, root, morSnap).count() ==
      all.size - keySet.size)

    // upserting a DELETED key re-inserts it — update wins over the
    // older delete record (the merged bucket's new version makes the
    // record inert there)
    val victim = all.find(t => t.turn_idx % 5 == 2).get
    val revived = spark.createDataset(Seq(victim.copy(total_score = 9999)))
    TableIO.mergeExtracted(revived, root, buckets = 8)
    val back = TableIO.lookupConv(spark, root, victim.conv_id, buckets = 8)
      .filter(_.turn_idx == victim.turn_idx).collect()
    assert(back.length == 1 && back(0).total_score == 9999)
  }

  test("rewriteDeletes materializes records; retention vacuums the dead delete files") {
    import spark.implicits._
    val root = freshDir("graft-mor-rewrite")
    val ds = extracted()
    TableIO.writeExtracted(ds, root, buckets = 8, waves = 2)
    val all = ds.collect().toSeq
    val delKeys = all.filter(t => t.turn_idx % 3 == 0).map(t => (t.conv_id, t.turn_idx))
    val morSnap = TableIO.deleteTurnsMoR(
      delKeys.toDF("conv_id", "turn_idx"), root, buckets = 8)
    val logical = dump(root)
    assert(physicalRows(root) == all.size.toLong) // records not yet material

    val newLin = TableIO.rewriteDeletes(spark, root, buckets = 8)
    assert(newLin.nonEmpty && newLin.forall(_.version > 0))
    // bytes now match the logical state; the live read is unchanged
    assert(physicalRows(root) == all.size.toLong - delKeys.size)
    assert(dump(root) == logical)
    // time travel to the MoR snapshot applies records over the archive
    assert(TableIO.readExtracted(spark, root, morSnap)
      .orderBy("conv_id", "turn_idx").collect().map(Json.turnJson).toSeq == logical)
    // a second rewrite is a no-op — everything is inert
    assert(TableIO.rewriteDeletes(spark, root, buckets = 8).isEmpty)

    // retention: once the pre-rewrite manifests expire, nothing can
    // apply the records and the delete files are vacuumed
    def deleteSets(): Long = {
      val p = Paths.get(root, "_deletes")
      if (!Files.isDirectory(p)) 0L
      else { val s = Files.list(p); try s.count() finally s.close() }
    }
    assert(deleteSets() > 0)
    TableIO.expireSnapshots(root, keep = 1)
    assert(deleteSets() == 0)
    assert(dump(root) == logical)
  }

  test("a MoR delete that crashed before its publish is swept, never adopted") {
    import spark.implicits._
    val root = freshDir("graft-mor-crash")
    val ds = extracted()
    TableIO.writeExtracted(ds, root, buckets = 8, waves = 2)
    val (snap, _) = TableIO.committed(root)
    val before = dump(root)

    // plant an orphan delete set at the NEXT snapshot id — exactly what
    // a deleteTurnsMoR crash between its file write and publish leaves
    val orphanId = snap + 1
    val dir = Paths.get(root, "_deletes", s"snap-$orphanId")
    val someKeys = ds.limit(5).collect().map(t => (t.conv_id, t.turn_idx)).toSeq
    someKeys.toDF("conv_id", "turn_idx")
      .withColumn("bucket", TableIO.bucketOf(org.apache.spark.sql.functions.col("conv_id"), 8))
      .withColumn("version", org.apache.spark.sql.functions.lit(0))
      .write.parquet(dir.resolve("keys").toString)
    val pairs = (0 until 8).map(b => s"""{"bucket": $b, "version": 0}""").mkString("[", ", ", "]")
    Files.writeString(dir.resolve("meta.json"), s"""{"snapshot": $orphanId, "pairs": $pairs}""")

    // the orphan must not hide rows from the current head…
    assert(dump(root) == before)
    // …and a merge that publishes the same id must not adopt it
    val upd = TableIO.readExtracted(spark, root).limit(2)
      .map(t => t.copy(total_score = t.total_score + 5))
    TableIO.mergeExtracted(upd, root, buckets = 8)
    assert(!Files.isDirectory(dir), "orphan delete set should be swept on recovery")
    assert(TableIO.readExtracted(spark, root).count() == before.size.toLong)
  }

  test("changelog surfaces MoR deletes: pure-MoR window and post-rewrite window agree") {
    import spark.implicits._
    val root = freshDir("graft-mor-changelog")
    val ds = extracted()
    TableIO.writeExtracted(ds, root, buckets = 8, waves = 2)
    val (preSnap, _) = TableIO.committed(root)
    val all = ds.collect().toSeq
    val delKeys = all.filter(t => t.turn_idx % 6 == 3).map(t => (t.conv_id, t.turn_idx))
    assert(delKeys.nonEmpty)
    val morSnap = TableIO.deleteTurnsMoR(
      delKeys.toDF("conv_id", "turn_idx"), root, buckets = 8)

    // pure-MoR window: identical manifests, every row from the
    // delete-file delta path
    val pure = TableIO.changelog(spark, root, preSnap, morSnap)
      .select("op", "conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(pure == delKeys.map(k => ("delete", k._1, k._2)).toSet)

    // after materialization the same window reports through the
    // version-diff path — net effect identical
    TableIO.rewriteDeletes(spark, root, buckets = 8)
    val (postSnap, _) = TableIO.committed(root)
    val cow = TableIO.changelog(spark, root, preSnap, postSnap)
      .select("op", "conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(cow == pure)
    // and the pure-MoR window STILL reads the same after the rewrite
    val pureAfter = TableIO.changelog(spark, root, preSnap, morSnap)
      .select("op", "conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(pureAfter == pure)
  }

  test("partition evolution: rebucket grows the spec, content-neutral, time travel exact") {
    import spark.implicits._
    val root = freshDir("graft-rebucket")
    val ds = extracted()
    TableIO.writeExtracted(ds, root, buckets = 8, waves = 2)
    val (preSnap, _) = TableIO.committed(root)
    val before = dump(root)
    assert(TableIO.bucketCount(root, -1) == 8) // creation spec recorded

    val newLin = TableIO.rebucket(spark, root, 16)
    assert(newLin.map(_.bucket).sorted == (0 until 16).toVector)
    assert(TableIO.bucketCount(root, -1) == 16)
    assert(TableIO.bucketCount(root, -1, atSnap = preSnap) == 8)
    // relayout is content-neutral
    assert(dump(root) == before)
    // the head manifest names ONLY new-spec buckets
    assert(TableIO.lineage(root).map(_.bucket).sorted == (0 until 16).toVector)
    // time travel to the old spec reads the archived old buckets
    assert(TableIO.readExtracted(spark, root, preSnap)
      .orderBy("conv_id", "turn_idx").collect().map(Json.turnJson).toSeq == before)

    // mutations after the rebucket hash with the NEW spec even when the
    // caller passes the stale count
    val victim = ds.head()
    val upd = spark.createDataset(Seq(victim.copy(total_score = victim.total_score + 123)))
    TableIO.mergeExtracted(upd, root, buckets = 8) // stale param, spec wins
    val found = TableIO.lookupConv(spark, root, victim.conv_id, buckets = 8)
      .filter(_.turn_idx == victim.turn_idx).head()
    assert(found.total_score == victim.total_score + 123)
    assert(TableIO.readExtracted(spark, root).count() == before.size.toLong)
  }

  test("rebucket folds pending MoR deletes; rollback across it reactivates the old spec") {
    import spark.implicits._
    val root = freshDir("graft-rebucket-mor")
    val ds = extracted()
    TableIO.writeExtracted(ds, root, buckets = 8, waves = 2)
    val all = ds.collect().toSeq
    val delKeys = all.filter(t => t.turn_idx % 7 == 3).map(t => (t.conv_id, t.turn_idx))
    assert(delKeys.nonEmpty)
    TableIO.deleteTurnsMoR(delKeys.toDF("conv_id", "turn_idx"), root, buckets = 8)
    val logical = dump(root)
    val (morSnap, _) = TableIO.committed(root)

    TableIO.rebucket(spark, root, 4) // shrink + fold
    // physical bytes carry the folded state; records are inert
    assert(spark.read.option("basePath", root).parquet(root).count() ==
      (all.size - delKeys.size).toLong)
    assert(dump(root) == logical)
    // time travel to the MoR snapshot still applies records over the
    // archived 8-bucket layout
    assert(TableIO.readExtracted(spark, root, morSnap)
      .orderBy("conv_id", "turn_idx").collect().map(Json.turnJson).toSeq == logical)

    // rollback across the rebucket: head returns to the 8-bucket
    // layout AND the 8-bucket spec reactivates for later mutations
    TableIO.rollbackTo(root, morSnap)
    assert(TableIO.bucketCount(root, -1) == 8)
    assert(dump(root) == logical)
    val victim = all.find(t => t.turn_idx % 7 != 3).get
    val upd = spark.createDataset(Seq(victim.copy(total_score = 4242)))
    TableIO.mergeExtracted(upd, root, buckets = 8)
    assert(TableIO.lookupConv(spark, root, victim.conv_id, buckets = 8)
      .filter(_.turn_idx == victim.turn_idx).head().total_score == 4242)
  }
}
