package graft.sinks

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Real Iceberg v2 table format (the reference's `iceberg` output,
  * internal/impl/iceberg/committer.go): versioned metadata.json +
  * version-hint, Avro manifest list + manifests, snapshot lineage,
  * schema evolution, copy-on-write upsert with manifest carry-forward,
  * optimistic commit conflicts, and parquet field-ids.
  */
class IcebergSpec extends SparkSpec {
  import spark.implicits._

  private def freshLoc(): String =
    Files.createTempDirectory("iceberg_spec").toString

  private def hconf = spark.sparkContext.hadoopConfiguration

  test("append creates a v1 metadata tree an independent parse can walk") {
    val loc = freshLoc()
    Iceberg.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), loc)
    val fs = new Path(loc).getFileSystem(hconf)
    assert(fs.exists(new Path(s"$loc/metadata/v1.metadata.json")))
    val hint = fs.open(new Path(s"$loc/metadata/version-hint.text"))
    assert(new String(hint.readAllBytes()).trim == "1")
    hint.close()
    val (v, m) = Iceberg.load(spark, loc).get
    assert(v == 1 && m.currentSnapshotId.isDefined && m.lastSeq == 1L)
    assert(m.schema.map(f => (f.id, f.name)) == Seq((1, "k"), (2, "v")))
    val out = Iceberg.readTable(spark, loc).orderBy("k")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "b")))
  }

  test("snapshot lineage: parent ids + monotonic sequence numbers + time travel") {
    val loc = freshLoc()
    Iceberg.append(Seq((1L, "a")).toDF("k", "v"), loc)
    Iceberg.append(Seq((2L, "b")).toDF("k", "v"), loc)
    val (v, m) = Iceberg.load(spark, loc).get
    assert(v == 2 && m.snapshots.size == 2)
    val Seq(s1, s2) = m.snapshots
    assert(s2.parentId.contains(s1.id))
    assert(s1.seq == 1L && s2.seq == 2L && m.lastSeq == 2L)
    // time travel: first snapshot sees only the first append
    val t1 = Iceberg.readTable(spark, loc, Some(s1.id)).as[(Long, String)]
      .collect().toSeq
    assert(t1 == Seq((1L, "a")))
    assert(Iceberg.readTable(spark, loc).count() == 2L)
    // metadata-log points at the previous version
    assert(m.metadataLog.map(_._2) == Seq(s"$loc/metadata/v1.metadata.json"))
  }

  test("schema evolution: new column gets a fresh id and a new schema-id") {
    val loc = freshLoc()
    Iceberg.append(Seq((1L, "a")).toDF("k", "v"), loc)
    Iceberg.append(Seq((2L, "b", 9.5)).toDF("k", "v", "score"), loc)
    val (_, m) = Iceberg.load(spark, loc).get
    assert(m.currentSchemaId == 1 && m.schemas.map(_._1) == Seq(0, 1))
    assert(m.schema.find(_.name == "score").get.id == 3 && m.lastColumnId == 3)
    val out = Iceberg.readTable(spark, loc).orderBy("k").collect()
    assert(out(0).isNullAt(2), "pre-evolution file must read null for the added column")
    assert(out(1).getDouble(2) == 9.5)
  }

  test("manifest list + manifest parse: counts and partition tuples") {
    val loc = freshLoc()
    Iceberg.append(Seq((1L, "x", 0L), (2L, "y", 1L), (3L, "z", 0L))
      .toDF("k", "v", "pb").repartition(1), loc, partitionCols = Seq("pb"))
    val (_, m) = Iceberg.load(spark, loc).get
    val snap = m.snapshots.head
    val refs = Iceberg.readManifestList(spark, snap.manifestList)
    assert(refs.size == 1 && refs.head.added == 2 && refs.head.addedRows == 3L)
    val entries = Iceberg.readManifest(spark, m, refs.head.path)
    assert(entries.size == 2)
    assert(entries.map(_.partition.head.asInstanceOf[Long]).sorted == Seq(0L, 1L))
    assert(entries.forall(_.status == Iceberg.StAdded))
    assert(entries.map(_.recordCount).sum == 3L)
    // partition pruning: plan only pb=0 files
    val pb0 = Iceberg.planFiles(spark, loc)
      .filter(_.partition.head == 0L)
    assert(pb0.size == 1 && pb0.head.recordCount == 2L)
  }

  test("upsert rewrites only touched partitions; untouched manifests carried by path") {
    val loc = freshLoc()
    // two appends so the table has a manifest the upsert will NOT touch
    val rows = (0L until 100L).map(k => (k, s"v$k", k % 4))
    Iceberg.append(rows.filter(_._3 != 1L).toDF("k", "v", "pb"),
      loc, partitionCols = Seq("pb"))
    Iceberg.append(rows.filter(_._3 == 1L).toDF("k", "v", "pb"), loc)
    val (_, m1) = Iceberg.load(spark, loc).get
    def byPart() = Iceberg.planFiles(spark, loc)
      .groupBy(_.partition.head).map { case (p, es) => (p, es.map(_.path).toSet) }
    val files1 = byPart()
    // second snapshot only touches pb=1
    Iceberg.upsert(Seq((1L, "UPDATED", 1L), (101L, "NEW", 1L))
      .toDF("k", "v", "pb"), loc, keyCols = Seq("k", "pb"))
    val (_, m2) = Iceberg.load(spark, loc).get
    val snap2 = m2.snapshots.last
    assert(snap2.operation == "overwrite")
    val refs2 = Iceberg.readManifestList(spark, snap2.manifestList)
    // the untouched prior manifest must appear in the new list BY PATH
    val refs1 = Iceberg.readManifestList(spark, m1.snapshots.head.manifestList)
    assert(refs1.map(_.path).exists(refs2.map(_.path).contains),
      "untouched manifests must be carried forward, not rewritten")
    // untouched partition files unchanged; pb=1 files replaced
    val files2 = byPart()
    assert(files2(0L) == files1(0L) && files2(2L) == files1(2L) && files2(3L) == files1(3L))
    assert(files2(1L).intersect(files1(1L)).isEmpty)
    val out = Iceberg.readTable(spark, loc)
    assert(out.count() == 101L)
    assert(out.filter($"k" === 1L).select("v").as[String].head() == "UPDATED")
  }

  test("upsert deletes rows via deleteCol; emptied keys gone") {
    val loc = freshLoc()
    Iceberg.append((0L until 20L).map(k => (k, s"v$k")).toDF("k", "v"), loc)
    Iceberg.upsert(
      (0L until 20L).filter(_ % 3 == 0).map(k => (k, "x", true))
        .toDF("k", "v", "__del"),
      loc, keyCols = Seq("k"), deleteCol = Some("__del"))
    val keys = Iceberg.readTable(spark, loc).select("k").as[Long].collect().sorted
    assert(keys.toSeq == (0L until 20L).filter(_ % 3 != 0))
    val (_, m) = Iceberg.load(spark, loc).get
    assert(m.snapshots.last.operation == "delete")
  }

  test("scan is manifest-driven: an orphan parquet in data/ is invisible") {
    val loc = freshLoc()
    Iceberg.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), loc)
    // drop an unreferenced parquet file into data/ (a failed-commit orphan)
    Seq((99L, "ORPHAN")).toDF("k", "v").coalesce(1)
      .write.mode("append").parquet(s"$loc/data")
    val out = Iceberg.readTable(spark, loc).select("k").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L), "orphan file must not be scanned")
    // the default age cutoff protects a just-written (possibly
    // in-flight-commit) file from a concurrent sweep
    assert(Iceberg.removeOrphanFiles(spark, loc).isEmpty,
      "fresh unreferenced files survive the default cutoff")
    // the maintenance sweep (no age floor) removes EXACTLY the orphan
    val removed = Iceberg.removeOrphanFiles(spark, loc, olderThanMs = 0L)
    assert(removed.size == 1 && removed.head.contains("part-"),
      s"only the orphan goes: $removed")
    assert(Iceberg.readTable(spark, loc).count() == 2L,
      "referenced files survive the sweep")
    assert(Iceberg.removeOrphanFiles(spark, loc, olderThanMs = 0L).isEmpty,
      "idempotent")
  }

  test("data files carry Iceberg field-ids in the parquet schema") {
    val loc = freshLoc()
    Iceberg.append(Seq((1L, "a")).toDF("k", "v"), loc)
    val file = Iceberg.planFiles(spark, loc).head.path
    val rdr = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), hconf))
    val fields = try rdr.getFooter.getFileMetaData.getSchema.getFields
                 finally rdr.close()
    assert(fields.get(0).getId.intValue == 1 && fields.get(1).getId.intValue == 2,
      "parquet field ids must match the Iceberg column ids")
  }

  test("manifest column bounds skip files at scan planning") {
    val loc = freshLoc()
    // three appends with disjoint k ranges → three files with
    // non-overlapping bounds
    Iceberg.append((0L until 100L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartition(1), loc)
    Iceberg.append((100L until 200L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartition(1), loc)
    Iceberg.append((200L until 300L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartition(1), loc)
    val all = Iceberg.planFiles(spark, loc)
    assert(all.size == 3)
    assert(all.forall(e => e.lowerBounds.nonEmpty && e.upperBounds.nonEmpty),
      "every data file must carry footer-derived bounds")
    // bounds round-trip through the avro manifest
    val ks = all.map { e =>
      val f = Iceberg.load(spark, loc).get._2.schema.find(_.name == "k").get
      (Iceberg.deserializeBound(e.lowerBounds(f.id), f.typ),
        Iceberg.deserializeBound(e.upperBounds(f.id), f.typ))
    }.sortBy(_._1.asInstanceOf[Long])
    assert(ks == Seq((0L, 99L), (100L, 199L), (200L, 299L)))
    // the scan plan skips files whose range cannot match
    val hit = Iceberg.planFilesWhere(spark, loc, "k",
      lower = Some(150L), upper = Some(160L))
    assert(hit.size == 1, s"one file overlaps [150,160]: ${hit.size}")
    val open = Iceberg.planFilesWhere(spark, loc, "k",
      lower = Some(250L), upper = None)
    assert(open.size == 1, "open-ended predicate prunes to the last file")
    // string bounds too
    val vHit = Iceberg.planFilesWhere(spark, loc, "v",
      lower = Some("v150"), upper = Some("v150"))
    assert(vHit.nonEmpty && vHit.size < 3)
    // readTableWhere = pruned files + residual row filter
    val rows = Iceberg.readTableWhere(spark, loc, "k",
      Some(150L), Some(160L)).select("k").as[Long].collect().sorted
    assert(rows.toSeq == (150L to 160L))
  }

  test("racing appends all land through optimistic retry (no loss)") {
    val loc = freshLoc()
    Iceberg.append(Seq((0L, "base")).toDF("k", "v"), loc)
    // 8 threads × 2 appends racing the same table: every commit must
    // land via conflict-retry, none may clobber another
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val futures = (1 to 8).map { t =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = (0 until 2).foreach { j =>
          val k = t * 100L + j
          Iceberg.append(Seq((k, s"r$k")).toDF("k", "v"), loc)
        }
      })
    }
    futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    val (v, m) = Iceberg.load(spark, loc).get
    assert(m.snapshots.size == 17, s"17 snapshots expected, got ${m.snapshots.size}")
    assert(v == 17)
    assert(Iceberg.readTable(spark, loc).count() == 17L, "no lost appends")
  }

  test("optimistic commit: a claimed next version makes the commit fail") {
    val loc = freshLoc()
    Iceberg.append(Seq((1L, "a")).toDF("k", "v"), loc)
    val fs = new Path(loc).getFileSystem(hconf)
    // a concurrent committer claims v2 first
    val out = fs.create(new Path(s"$loc/metadata/v2.metadata.json"), false)
    out.write("{}".getBytes); out.close()
    intercept[IllegalStateException] {
      Iceberg.append(Seq((2L, "b")).toDF("k", "v"), loc)
    }
  }

  test("merge-on-read upsert: delete file lands, NO data file rewritten") {
    val loc = freshLoc()
    Iceberg.append((0L until 50L).map(k => (k, s"v$k")).toDF("k", "v"), loc)
    val files1 = Iceberg.planFiles(spark, loc).map(_.path).toSet
    Iceberg.upsertMergeOnRead(
      Seq((3L, "UPD"), (60L, "NEW")).toDF("k", "v"), loc, Seq("k"))
    // the original data files survive untouched — the MOR contract
    assert(files1.subsetOf(Iceberg.planFiles(spark, loc).map(_.path).toSet),
      "merge-on-read must not rewrite existing data files")
    val dels = Iceberg.planEntries(spark, loc)
      .filter(_.content == Iceberg.ContentEqDeletes)
    assert(dels.size == 1 && dels.head.recordCount == 2L,
      "one equality-delete file over the batch's 2 keys")
    assert(dels.head.equalityIds.nonEmpty)
    val out = Iceberg.readTable(spark, loc)
    assert(out.count() == 51L)
    assert(out.filter($"k" === 3L).select("v").as[String].head() == "UPD",
      "the delete removes the OLD row; the new row (same seq) survives")
    // delete rows via deleteCol: key 7 gone entirely
    Iceberg.upsertMergeOnRead(
      Seq((7L, "x", true)).toDF("k", "v", "__del"), loc, Seq("k"),
      deleteCol = Some("__del"))
    assert(Iceberg.readTable(spark, loc).filter($"k" === 7L).count() == 0L)
    // sequence rule: re-inserting key 7 AFTER the delete survives it
    Iceberg.upsertMergeOnRead(Seq((7L, "back")).toDF("k", "v"), loc, Seq("k"))
    assert(Iceberg.readTable(spark, loc).filter($"k" === 7L)
      .select("v").as[String].head() == "back")
    // time travel still sees the pre-delete state
    val (_, m) = Iceberg.load(spark, loc).get
    assert(Iceberg.readTable(spark, loc, Some(m.snapshots.head.id))
      .count() == 50L)
  }

  test("merge-on-read works on a PARTITIONED table (global delete file)") {
    val loc = freshLoc()
    Iceberg.append((0L until 40L).map(k => (k, s"v$k", k % 4))
      .toDF("k", "v", "pb"), loc, partitionCols = Seq("pb"))
    Iceberg.upsertMergeOnRead(
      Seq((2L, "UPD", 2L), (41L, "NEW", 1L)).toDF("k", "v", "pb"),
      loc, Seq("k"))
    val dels = Iceberg.planEntries(spark, loc)
      .filter(_.content == Iceberg.ContentEqDeletes)
    assert(dels.size == 1 && dels.head.partition.forall(_ == null),
      "the equality delete is GLOBAL: null partition tuple")
    val out = Iceberg.readTable(spark, loc)
    assert(out.count() == 41L)
    assert(out.filter($"k" === 2L).select("v").as[String].head() == "UPD")
    assert(out.filter($"k" === 41L).select("pb").as[Long].head() == 1L)
    // new data files landed under their partition dirs
    assert(Iceberg.planFiles(spark, loc)
      .filter(_.seq == 2L).forall(_.partition.head != null))
  }

  test("position deletes (content 1) apply by (file, row) — external-writer interop") {
    val loc = freshLoc()
    Iceberg.append((0L until 10L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartition(1).sortWithinPartitions("k"), loc)
    val dataFile = Iceberg.planFiles(spark, loc).head.path
    // an external engine deletes rows 2 and 7 of that file by position
    Iceberg.commitPositionDeletes(spark, loc,
      Seq((dataFile, 2L), (dataFile, 7L)))
    val out = Iceberg.readTable(spark, loc).select("k").as[Long]
      .collect().sorted
    assert(out.toSeq == (0L until 10L).filterNot(k => k == 2L || k == 7L),
      s"rows at positions 2 and 7 must vanish: ${out.toSeq}")
    // a LATER append is untouched by the earlier position delete
    Iceberg.append(Seq((2L, "back")).toDF("k", "v"), loc)
    assert(Iceberg.readTable(spark, loc).filter($"k" === 2L).count() == 1L)
    // the delete manifest carries content=1 in the manifest list
    val (_, m) = Iceberg.load(spark, loc).get
    val refs = Iceberg.readManifestList(spark,
      m.snapshots(1).manifestList)
    assert(refs.exists(_.content == 1), "pos-delete manifest content flag")
  }

  test("merge-on-read UPDATE writes position deletes: pruned scan, no rewrite") {
    val loc = freshLoc()
    Iceberg.append((0L until 100L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartition(4, $"k"), loc)
    val files1 = Iceberg.planFiles(spark, loc).map(_.path).toSet
    // UPDATE 3 keys + insert 1 via position deletes
    Iceberg.upsertPositionDeletes(
      Seq((5L, "UPD5"), (17L, "UPD17"), (63L, "UPD63"), (200L, "NEW"))
        .toDF("k", "v"), loc, Seq("k"))
    assert(files1.subsetOf(Iceberg.planFiles(spark, loc).map(_.path).toSet),
      "position-delete MOR must not rewrite existing data files")
    val pos = Iceberg.planEntries(spark, loc)
      .filter(_.content == Iceberg.ContentPosDeletes)
    assert(pos.size == 1 && pos.head.recordCount == 3L,
      s"one content-1 file naming the 3 existing keys' positions: $pos")
    val out = Iceberg.readTable(spark, loc)
    assert(out.count() == 101L)
    assert(out.filter($"k" === 5L).select("v").as[String].head() == "UPD5")
    assert(out.filter($"k" === 63L).select("v").as[String].head() == "UPD63")
    assert(out.filter($"k" === 200L).count() == 1L)
    // delete rows via deleteCol; a later re-insert survives (seq rule)
    Iceberg.upsertPositionDeletes(
      Seq((17L, "x", true)).toDF("k", "v", "__del"), loc, Seq("k"),
      deleteCol = Some("__del"))
    assert(Iceberg.readTable(spark, loc).filter($"k" === 17L).count() == 0L)
    Iceberg.upsertPositionDeletes(Seq((17L, "back")).toDF("k", "v"),
      loc, Seq("k"))
    assert(Iceberg.readTable(spark, loc).filter($"k" === 17L)
      .select("v").as[String].head() == "back")
    // the INDEPENDENT python reader reproduces the final row count
    val summary = scala.sys.process.Process(
      Seq("python3", "scripts/iceberg_check.py", loc)).!!
    val rows = """"rows": (\d+)""".r.findFirstMatchIn(summary)
      .map(_.group(1).toInt)
    assert(rows.contains(101),
      s"python cross-reader must see 101 rows: $summary")
    assert(summary.contains("\"delete_files\": 3"),
      s"3 pos-delete files on the read path: $summary")
  }

  test("copy-on-write upsert COMPACTS a table carrying delete files") {
    val loc = freshLoc()
    Iceberg.append((0L until 20L).map(k => (k, s"v$k")).toDF("k", "v"), loc)
    Iceberg.upsertMergeOnRead(Seq((1L, "mor")).toDF("k", "v"), loc, Seq("k"))
    assert(Iceberg.planEntries(spark, loc)
      .exists(_.content == Iceberg.ContentEqDeletes))
    Iceberg.upsert(Seq((2L, "cow")).toDF("k", "v"), loc, Seq("k"))
    // compaction: no delete files remain, results still correct
    assert(!Iceberg.planEntries(spark, loc)
      .exists(_.content == Iceberg.ContentEqDeletes),
      "COW on a MOR table must compact the delete files away")
    val out = Iceberg.readTable(spark, loc).orderBy("k")
      .as[(Long, String)].collect().toSeq
    assert(out.size == 20 && out(1) == ((1L, "mor")) && out(2) == ((2L, "cow")))
  }

  test("compact folds delete files; expireSnapshots removes only dead files") {
    val loc = freshLoc()
    Iceberg.append((0L until 30L).map(k => (k, s"v$k")).toDF("k", "v"), loc)
    Iceberg.upsertMergeOnRead(Seq((5L, "five")).toDF("k", "v"), loc, Seq("k"))
    Iceberg.compact(spark, loc, Seq("k"))
    assert(!Iceberg.planEntries(spark, loc)
      .exists(_.content == Iceberg.ContentEqDeletes))
    Iceberg.compact(spark, loc, Seq("k")) // idempotent no-op
    val (_, m0) = Iceberg.load(spark, loc).get
    assert(m0.snapshots.size == 3, "compact on a clean table commits nothing")
    val before = Iceberg.readTable(spark, loc).orderBy("k")
      .as[(Long, String)].collect().toSeq
    assert(before.size == 30 && before(5) == ((5L, "five")))
    // expire: keep only the current snapshot
    val fs = new Path(loc).getFileSystem(hconf)
    val oldList = m0.snapshots.head.manifestList
    Iceberg.expireSnapshots(spark, loc, keepLast = 1)
    val (_, m1) = Iceberg.load(spark, loc).get
    assert(m1.snapshots.size == 1)
    assert(!fs.exists(new Path(oldList)),
      "expired snapshot's manifest list must be deleted")
    // current state fully intact after the physical sweep
    assert(Iceberg.readTable(spark, loc).orderBy("k")
      .as[(Long, String)].collect().toSeq == before)
    intercept[Exception] { // expired time travel is gone
      Iceberg.readTable(spark, loc, Some(m0.snapshots.head.id)).collect()
    }
  }

  test("overwrite replaces the table in one snapshot; history intact") {
    val loc = freshLoc()
    Iceberg.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), loc)
    Iceberg.overwrite(Seq((9L, "z")).toDF("k", "v"), loc)
    val (_, m) = Iceberg.load(spark, loc).get
    assert(m.snapshots.size == 2 && m.snapshots.last.operation == "overwrite")
    assert(Iceberg.readTable(spark, loc).select("k").as[Long].collect().toSeq == Seq(9L))
    // first snapshot still readable (time travel across overwrite)
    assert(Iceberg.readTable(spark, loc, Some(m.snapshots.head.id)).count() == 2L)
  }
}
