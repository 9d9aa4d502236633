package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Lakehouse (Iceberg-shaped) table sink — the behavioral contract of
  * the reference's flagship `iceberg` output
  * (internal/impl/iceberg/output_iceberg.go: row_operation
  * insert/upsert/delete with `identifier_fields`, schema evolution on
  * write, partitioned warehouse tables) re-expressed against Spark
  * catalog tables. With an Iceberg runtime jar on the cluster the same
  * calls target `catalog.db.table` and Spark's Iceberg source handles
  * MERGE natively; this module implements the identical semantics
  * against any saveAsTable-capable catalog so the contract is testable
  * without the jar.
  *
  * Scale shape: the merge is ONE left-anti join of target vs batch keys
  * (broadcast when the batch is micro-batch-sized — the common CDC
  * case) plus a union — no driver-side state, no per-row lookups. The
  * rewrite funnels through a staging table because a catalog table
  * cannot be overwritten while it is being read.
  */
object Lakehouse {

  /** Drop a managed table AND its orphaned warehouse directory: a fresh
    * session's in-memory metastore doesn't know tables a previous JVM
    * created, so `DROP TABLE IF EXISTS` no-ops while the directory
    * still blocks re-creation (LOCATION_ALREADY_EXISTS).
    */
  def dropTable(spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    // an EXTERNAL table's location is user data, not ours to delete —
    // only sweep the warehouse path for managed (or catalog-unknown,
    // i.e. orphaned) tables
    val isExternal = spark.catalog.tableExists(table) &&
      spark.catalog.getTable(table).tableType == "EXTERNAL"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    if (isExternal) return
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    // managed location: <warehouse>/<tbl> for the default database,
    // <warehouse>/<db>.db/<tbl> for qualified names
    val rel = table.toLowerCase.split("\\.") match {
      case Array(tbl) => tbl
      case Array(db, tbl) => s"$db.db/$tbl"
      case parts => parts.init.mkString(".") + ".db/" + parts.last
    }
    val dir = new java.io.File(warehouse, rel)
    if (dir.exists) {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      Files.walk(dir.toPath).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => { Files.deleteIfExists(p); () })
    }
  }

  /** Upsert `batch` into `table` by `keyCols` (the reference's
    * `identifier_fields`), creating it (partitioned) on first write.
    *
    * Schema evolution (output_iceberg.go schema_evolution config):
    * batch-only columns are ADDED to the table (null for pre-existing
    * rows); table-only columns survive (null for batch rows). A column
    * present in both keeps the TABLE's type — the batch side casts.
    *
    * `deleteCol`: boolean column marking delete rows (row_operation
    * `delete`) — their keys are removed from the table and not
    * re-inserted. Batch rows are assumed key-unique (apply
    * Cdc.latestState upstream for changelogs).
    */
  def upsert(batch: DataFrame, table: String, keyCols: Seq[String],
             partitionCols: Seq[String] = Seq.empty,
             deleteCol: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    require(keyCols.nonEmpty, "upsert needs identifier_fields")
    val inserts = deleteCol match {
      case Some(c) => batch.filter(!coalesce(col(c), lit(false))).drop(c)
      case None => batch
    }
    val deleteKeys = deleteCol.map(c =>
      batch.filter(coalesce(col(c), lit(false))).select(keyCols.map(col): _*))

    if (!spark.catalog.tableExists(table)) {
      val w = inserts.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .saveAsTable(table)
    } else {
      val target = spark.table(table)
      // evolve: append batch-only columns to the table schema
      val newCols = inserts.schema.fields
        .filterNot(f => target.columns.contains(f.name))
      val evolved =
        if (newCols.isEmpty) target
        else target.select(col("*") +:
          newCols.map(f => lit(null).cast(f.dataType).as(f.name)).toSeq: _*)
      // align the batch to the evolved schema (order + types)
      val aligned = inserts.select(evolved.schema.fields.map { f =>
        if (inserts.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toSeq: _*)
      val touchedKeys = {
        val ins = aligned.select(keyCols.map(col): _*)
        deleteKeys.map(ins.unionByName(_)).getOrElse(ins)
      }
      val merged = evolved
        .join(broadcast(touchedKeys.distinct()), keyCols, "left_anti")
        .unionByName(aligned)
      // stage swap: a table can't be overwritten while being read; a
      // crashed previous run may have orphaned the stage's directory
      val stage = table + "__stage"
      dropTable(spark, stage)
      merged.write.mode("overwrite").saveAsTable(stage)
      val w = spark.table(stage).write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .saveAsTable(table)
      spark.sql(s"DROP TABLE $stage")
    }
  }

  /** Streaming form: every micro-batch MERGEs into the table via
    * [[upsert]] (the foreachBatch shape Iceberg's own Spark writer
    * uses for CDC apply).
    */
  def upsertStream(df: DataFrame, table: String, keyCols: Seq[String],
                   checkpoint: String,
                   partitionCols: Seq[String] = Seq.empty,
                   deleteCol: Option[String] = None): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, _: Long) =>
        upsert(b, table, keyCols, partitionCols, deleteCol)
      }
      .start()
}
