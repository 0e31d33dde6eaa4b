package graft.delta.write

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}

import graft.delta._

/** Change-data-file writer (the producer side of the protocol's
  * `AddCDCFile` action, ref actions.scala:164-172).
  *
  * Change rows are the table schema plus `_change_type`
  * (insert / delete / update_preimage / update_postimage). They land as
  * parquet under `_change_data/` — an underscore directory, so table
  * scans and VACUUM's data-file walk never see them — and are committed
  * as AddCDCFile actions (never part of table state, `dataChange=false`).
  */
object CdcWriter {

  val ChangeTypeCol = "_change_type"
  val ChangeDir = "_change_data"

  /** Write `changes` (table columns + _change_type) and return the
    * AddCDCFile actions for the commit. Renamed columns write their
    * PHYSICAL name ([[ColumnMapping]]) so change files decode like data
    * files. */
  def writeChangeFiles(changes: DataFrame, deltaLog: DeltaLog,
                       mapping: Map[String, String] = Map.empty): Seq[AddCDCFile] = {
    val fs = deltaLog.dataPath.getFileSystem(deltaLog.hadoopConf)
    val staging = new Path(deltaLog.dataPath,
      s"_staging_cdc_${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      val phys =
        if (mapping.isEmpty) changes
        else changes.select(changes.columns.map(c => org.apache.spark.sql
          .functions.col(s"`$c`").as(mapping.getOrElse(c, c))).toIndexedSeq: _*)
      phys.write.mode(SaveMode.Overwrite).parquet(staging.toString)
      val files = fs.listStatus(staging)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      val destDir = new Path(deltaLog.dataPath, ChangeDir)
      if (!fs.exists(destDir)) fs.mkdirs(destDir)
      files.toSeq.map { st =>
        val rel = s"$ChangeDir/${st.getPath.getName}"
        val dest = new Path(deltaLog.dataPath, rel)
        if (!fs.rename(st.getPath, dest)) {
          throw new java.io.IOException(s"Failed to move CDC file to $dest")
        }
        AddCDCFile(path = rel, size = st.getLen)
      }
    } finally fs.delete(staging, true)
  }

  /** Is change-data capture enabled for this table? */
  def enabled(metadata: Metadata): Boolean =
    DeltaConfigs.ENABLE_CHANGE_DATA_FEED.fromMetadata(metadata)
}
