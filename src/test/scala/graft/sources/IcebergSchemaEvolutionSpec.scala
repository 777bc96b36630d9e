package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Metadata-only schema evolution (reference ddl/alter_rename.test,
  * add_column family; Iceberg's core evolution contract): ADD/DROP/RENAME
  * COLUMN rewrite no data files; old files serve renamed columns via the
  * persisted name mapping and read added columns as NULL. */
class IcebergSchemaEvolutionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private lazy val dir = TestSpark.sfDir
  private val table = sys.props("java.io.tmpdir") + "/graft-iceberg-evo"

  private def docs = Tables.documents(spark, dir)
    .select("doc_id", "lang", "n_chars")

  test("add / rename / drop column evolve without rewriting data files") {
    IcebergTables.createOrReplace(docs.filter(col("doc_id") < 100), table)
    val filesBefore = IcebergTables.read(spark, table).inputFiles.toSet

    // ADD: existing rows read the new column as NULL
    IcebergTables.addColumn(spark, table, "score", LongType)
    val afterAdd = IcebergTables.read(spark, table)
    assert(afterAdd.columns.toSeq == Seq("doc_id", "lang", "n_chars", "score"))
    assert(afterAdd.filter(col("score").isNotNull).count() == 0)

    // appends after ADD carry the column; old files still read NULL
    IcebergTables.append(
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 120)
        .withColumn("score", col("doc_id") * 2), table)
    val mixed = IcebergTables.read(spark, table)
    assert(mixed.filter(col("score").isNotNull).count() == 20)
    assert(mixed.count() == 120)

    // RENAME: both generations of files serve the new name
    IcebergTables.renameColumn(spark, table, "n_chars", "len_chars")
    val afterRename = IcebergTables.read(spark, table)
    assert(afterRename.columns.contains("len_chars") &&
      !afterRename.columns.contains("n_chars"))
    val wantSum = docs.filter(col("doc_id") < 120)
      .agg(sum("n_chars")).head().getLong(0)
    assert(afterRename.agg(sum("len_chars")).head().getLong(0) == wantSum)

    // appends after RENAME write the new name; reads stay consistent
    IcebergTables.append(
      docs.filter(col("doc_id") >= 120 && col("doc_id") < 140)
        .withColumnRenamed("n_chars", "len_chars")
        .withColumn("score", lit(null).cast(LongType))
        .select("doc_id", "lang", "len_chars", "score"), table)
    val threeGen = IcebergTables.read(spark, table)
    assert(threeGen.count() == 140)
    val wantSum2 = docs.filter(col("doc_id") < 140)
      .agg(sum("n_chars")).head().getLong(0)
    assert(threeGen.agg(sum("len_chars")).head().getLong(0) == wantSum2)

    // DROP: the column disappears from reads, files untouched
    IcebergTables.dropColumn(spark, table, "score")
    val afterDrop = IcebergTables.read(spark, table)
    assert(afterDrop.columns.toSeq == Seq("doc_id", "lang", "len_chars"))

    // the original files were never rewritten by any of the four commits
    val filesAfter = IcebergTables.read(spark, table).inputFiles.toSet
    assert(filesBefore.subsetOf(filesAfter),
      "schema evolution must not rewrite existing data files")

    // time travel composes: the pre-evolution snapshot reads through the
    // CURRENT schema (Iceberg reads resolve schema at query time)
    val s1 = IcebergTables.snapshots(spark, table).min
    val tt = IcebergTables.read(spark, table, Some(s1))
    assert(tt.columns.toSeq == Seq("doc_id", "lang", "len_chars"))
    assert(tt.count() == 100)
  }

  test("guards: duplicate add, missing drop, partition column protection") {
    val t = table + "-guards"
    IcebergTables.createOrReplace(
      docs.filter(col("doc_id") < 50), t, partitionBy = Some("lang"))
    intercept[IllegalArgumentException](
      IcebergTables.addColumn(spark, t, "lang", StringType))
    intercept[IllegalArgumentException](
      IcebergTables.dropColumn(spark, t, "nope"))
    intercept[IllegalArgumentException](
      IcebergTables.dropColumn(spark, t, "lang"))
    // renaming the partition column keeps partition pruning working
    IcebergTables.renameColumn(spark, t, "lang", "language")
    val pruned = IcebergTables.read(spark, t, partitionValue = Some("en"))
    assert(pruned.columns.contains("language"))
    assert(pruned.count() ==
      docs.filter(col("doc_id") < 50 && col("lang") === "en").count())
  }
}
