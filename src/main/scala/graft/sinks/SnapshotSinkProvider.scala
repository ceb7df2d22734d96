package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister}
import org.apache.spark.sql.types.StructType

/** `df.write.format("graft-snapshot")` — the Spark-native write
  * surface over [[SnapshotMerge]] / [[SnapshotStore]], so a user who
  * knows only the DataFrameWriter API gets the store's cross-partition
  * atomic commit without touching graft classes:
  *
  * {{{
  *   df.write.format("graft-snapshot")
  *     .option("path", "/tables/docs")
  *     .option("keys", "doc_id")              // merge keys
  *     .option("partitionBy", "shard")        // partition columns
  *     .option("evolve", "true")              // opt-in schema evolution
  *     .mode(SaveMode.Append)                 // upsert-update (K2)
  *     .save()
  * }}}
  *
  * SaveMode mapping (whole-frame transactional semantics, the JDBC
  * adapter's sink contract re-expressed over the snapshot store):
  *  - Append        → K2 upsert-update (incoming wins per key);
  *                    with `evolve=true`, add-column schema evolution
  *  - Ignore        → K1 upsert-ignore (existing rows win)
  *  - ErrorIfExists → seed a NEW table; fails if one is committed
  *  - Overwrite     → full logical replacement: every existing
  *                    partition not re-produced by this frame is
  *                    dropped in the SAME atomic commit (readers see
  *                    all-old or all-new, never a mix)
  *
  * The sink is a [[CreatableRelationProvider]] (the whole-frame v1
  * sink API, same surface JDBC uses) rather than a DSv2 BatchWrite:
  * the store's unit of atomicity is the MANIFEST, one commit per
  * frame — per-task commit messages would only re-implement the
  * staging the store already does with its batch dirs + pointer swap.
  */
class SnapshotSinkProvider extends CreatableRelationProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  override def createRelation(ctx: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = data.sparkSession
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-snapshot requires option 'path'"))
    def listOpt(name: String): Seq[String] =
      parameters.get(name).orElse(parameters.get(name.toLowerCase))
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(throw new IllegalArgumentException(
          s"graft-snapshot requires option '$name' (comma-separated)"))
    val keys = listOpt("keys")
    val partCols = listOpt("partitionBy")
    val evolve = parameters.get("evolve").exists(_.toBoolean)
    val store = new SnapshotStore(spark, new Path(path))

    mode match {
      case SaveMode.Append =>
        if (evolve)
          SnapshotMerge.upsertEvolve(spark, path, data, keys, partCols)
        else
          SnapshotMerge.upsertUpdate(spark, path, data, keys, partCols)
      case SaveMode.Ignore =>
        SnapshotMerge.upsertIgnore(spark, path, data, keys, partCols)
      case SaveMode.ErrorIfExists =>
        if (store.currentVersion().isDefined)
          throw new IllegalStateException(
            s"graft-snapshot table already committed at $path")
        SnapshotMerge.upsertUpdate(spark, path, data, keys, partCols)
      case SaveMode.Overwrite =>
        SnapshotMerge.replaceAll(spark, path, data, partCols)
    }
    SnapshotSinkProvider.relation(ctx, data.schema)
  }

}

object SnapshotSinkProvider {
  private def relation(ctx: SQLContext, s: StructType): BaseRelation =
    new BaseRelation {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = s
    }
}
