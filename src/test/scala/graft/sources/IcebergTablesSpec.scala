package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Iceberg table semantics: snapshot isolation under append, time travel,
  * schema enforcement on commit, and spec-shaped metadata (v2 format,
  * manifest-list field names, record counts). */
@graft.SlowTest
class IcebergTablesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private lazy val dir = TestSpark.sfDir
  private val table = sys.props("java.io.tmpdir") + "/graft-iceberg-spec"

  private def docs = Tables.documents(spark, dir)
    .select("doc_id", "lang", "source", "n_chars")

  test("append commits are snapshot-isolated and time travel replays them") {
    val s1 = IcebergTables.createOrReplace(docs.filter(col("doc_id") % 2 === 0), table)
    val s2 = IcebergTables.append(docs.filter(col("doc_id") % 2 === 1), table)
    assert(IcebergTables.snapshots(spark, table) == Seq(s1, s2))

    val total = docs.count()
    val even = docs.filter(col("doc_id") % 2 === 0).count()
    assert(IcebergTables.read(spark, table).count() == total)
    assert(IcebergTables.read(spark, table, Some(s1)).count() == even)
    // as-of values, not just counts: snapshot 1 must hold exactly the evens
    val s1Ids = IcebergTables.read(spark, table, Some(s1))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1Ids == docs.filter(col("doc_id") % 2 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("append rejects a mismatched schema") {
    IcebergTables.createOrReplace(docs, table + "-schema")
    val bad = docs.withColumn("n_chars", col("n_chars").cast("int"))
    val e = intercept[IllegalArgumentException](
      IcebergTables.append(bad, table + "-schema"))
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("metadata layout follows the v2 spec shape") {
    IcebergTables.createOrReplace(docs.limit(50), table + "-meta")
    IcebergTables.append(docs.limit(10), table + "-meta")
    val metaDir = new java.io.File(table + "-meta/metadata")
    val names = metaDir.listFiles().map(_.getName).toSet
    assert(names.contains("version-hint.text"))
    assert(names.contains("v1.metadata.json") && names.contains("v2.metadata.json"))
    assert(names.exists(_.startsWith("snap-")), "manifest list missing")

    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(new java.io.File(metaDir, "v2.metadata.json"))
    assert(meta.get("format-version").asInt == 2)
    assert(meta.get("snapshots").size == 2)
    assert(meta.get("partition-specs").get(0).get("fields").size == 0)

    // manifest list rows carry the spec's counting fields
    val curList = meta.get("snapshots").asScala
      .find(_.get("snapshot-id").asLong == meta.get("current-snapshot-id").asLong)
      .get.get("manifest-list").asText
    val in = new java.io.FileInputStream(curList.stripPrefix("file:"))
    val rdr = new org.apache.avro.file.DataFileStream(in,
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val rows = rdr.iterator().asScala.toVector
    rdr.close(); in.close()
    assert(rows.size == 2, "current list must reference both manifests")
    assert(rows.map(_.get("added_rows_count").asInstanceOf[Long]).sum == 60)
    assert(rows.forall(_.getSchema.getField("manifest_path") != null))
  }

  test("partition pruning plans only the matching partition's files") {
    val t = table + "-part"
    IcebergTables.createOrReplace(docs, t, partitionBy = Some("lang"))
    val all = IcebergTables.read(spark, t)
    val en = IcebergTables.read(spark, t, partitionValue = Some("en"))
    assert(en.inputFiles.length < all.inputFiles.length,
      "a partition-filtered read must plan strictly fewer files")
    assert(en.inputFiles.forall(_.contains("lang=en")),
      "pruned plan must reference only the en partition's files")
    // restored partition column + values match the plain filter
    val want = docs.filter(col("lang") === "en")
      .collect().map(_.toSeq).toSet
    assert(en.collect().map(_.toSeq).toSet == want)
  }

  test("upsert rewrites ONLY the touched partitions; insert-ignore is pure append") {
    val t = table + "-upsert"
    val s1 = IcebergTables.createOrReplace(docs, t, partitionBy = Some("lang"))
    val beforeOther = IcebergTables.read(spark, t).inputFiles
      .filterNot(_.contains("lang=en")).toSet
    assert(beforeOther.nonEmpty)

    // upsert touches only lang='en' rows: replace some, insert a new key
    val updates = docs.filter(col("lang") === "en" && col("doc_id") % 7 === 0)
      .withColumn("n_chars", col("n_chars") + 5000)
      .unionByName(docs.filter(col("lang") === "en").limit(1)
        .withColumn("doc_id", col("doc_id") + 9000000))
    val s2 = IcebergTables.upsert(spark, t, updates, "doc_id")

    // untouched partitions keep their EXACT data files — partition-scoped CoW
    val afterOther = IcebergTables.read(spark, t).inputFiles
      .filterNot(_.contains("lang=en")).toSet
    assert(afterOther == beforeOther,
      s"upsert must not rewrite unaffected partitions:\n$beforeOther\nvs\n$afterOther")

    // merge semantics: replaced keys carry new values, others unchanged
    val got = IcebergTables.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val base = docs.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val updRows = updates.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == base ++ updRows)

    // time travel: the pre-upsert snapshot still sees the old values
    assert(IcebergTables.read(spark, t, Some(s1)).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap == base)

    // insert-ignore: conflicting keys skipped, new keys appended, and the
    // commit adds files without rewriting ANY existing one
    val beforeAll = IcebergTables.read(spark, t).inputFiles.toSet
    IcebergTables.insertIgnore(spark, t,
      docs.limit(5).unionByName(
        docs.limit(2).withColumn("doc_id", col("doc_id") + 8000000)), "doc_id")
    val afterAll = IcebergTables.read(spark, t).inputFiles.toSet
    assert(beforeAll.subsetOf(afterAll), "insert-ignore must be append-only")
    assert(IcebergTables.read(spark, t).count() ==
      docs.count() + 1 + 2) // one upsert insert + two ignore inserts
    assert(IcebergTables.snapshots(spark, t).size == 3)
    assert(s2 > s1)
  }

  test("delete/update RETURNING report affected rows, stay partition-scoped, keep NULL-pred rows") {
    val t = table + "-returning"
    val s1 = IcebergTables.createOrReplace(docs, t, partitionBy = Some("lang"))
    val beforeOther = IcebergTables.read(spark, t).inputFiles
      .filterNot(_.contains("lang=en")).toSet

    // DELETE ... RETURNING: rows where pred is TRUE come back; the table
    // loses exactly those; pred-NULL rows survive (SQL delete semantics)
    val delPred = col("lang") === "en" && col("doc_id") % 11 === 0
    val expectedDel = docs.filter(delPred).select("doc_id").collect().map(_.getLong(0)).toSet
    val returned = IcebergTables.deleteWhere(spark, t, delPred)
    assert(returned.select("doc_id").collect().map(_.getLong(0)).toSet == expectedDel)
    assert(IcebergTables.read(spark, t).count() == docs.count() - expectedDel.size)
    // untouched partitions keep their exact files
    assert(IcebergTables.read(spark, t).inputFiles
      .filterNot(_.contains("lang=en")).toSet == beforeOther)

    // UPDATE ... RETURNING: post-images come back; only matched rows change
    val updPred = col("lang") === "en" && col("doc_id") % 7 === 0
    val post = IcebergTables.updateWhere(spark, t, updPred,
      Map("n_chars" -> (col("n_chars") + 5000)))
    val postMap = post.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(postMap.nonEmpty)
    val now = IcebergTables.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    postMap.foreach { case (id, v) => assert(now(id) == v, s"post-image mismatch for $id") }
    // time travel: the original snapshot still sees everything pre-DML
    assert(IcebergTables.read(spark, t, Some(s1)).count() == docs.count())
  }

  test("merge applies delete/update/insert clauses and stays partition-scoped") {
    val t = table + "-merge"
    val s1 = IcebergTables.createOrReplace(docs, t, partitionBy = Some("lang"))
    val beforeOther = IcebergTables.read(spark, t).inputFiles
      .filterNot(_.contains("lang=en")).toSet
    assert(beforeOther.nonEmpty)

    // source: every en key (matched), plus one brand-new en key (insert)
    val minEn = docs.filter(col("lang") === "en")
      .agg(min(col("doc_id"))).head().getLong(0)
    val src = docs.filter(col("lang") === "en")
      .withColumn("n_chars", col("n_chars") + 5000)
      .unionByName(docs.filter(col("lang") === "en" && col("doc_id") === minEn)
        .withColumn("doc_id", col("doc_id") + 9100000))
    val median = docs.filter(col("lang") === "en")
      .selectExpr("percentile(n_chars, 0.5)").head().getDouble(0).toLong
    IcebergTables.merge(spark, t, src, "doc_id",
      deleteCond = Some(col("n_chars") < median),       // target value
      updateSet = Map("n_chars" -> col("src_n_chars"))) // source value

    val base = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    val expected = base.flatMap {
      case (id, "en", nc) if nc < median => None                 // deleted
      case (id, "en", nc)               => Some(id -> (nc + 5000)) // updated
      case (id, _, nc)                  => Some(id -> nc)          // untouched
    }.toMap + {
      val (id, _, nc) = base.find(x => x._1 == minEn && x._2 == "en").get
      (id + 9100000) -> nc                                        // inserted
    }
    val got = IcebergTables.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == expected)

    // only the en partition was re-authored
    val afterOther = IcebergTables.read(spark, t).inputFiles
      .filterNot(_.contains("lang=en")).toSet
    assert(afterOther == beforeOther,
      "merge must not rewrite partitions without matches or inserts")
    // one atomic commit; time travel still sees the pre-merge table
    assert(IcebergTables.snapshots(spark, t).size == 2)
    assert(IcebergTables.read(spark, t, Some(s1)).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap ==
      base.map(x => x._1 -> x._3).toMap)
  }

  test("dropPartition deletes at file level and time travel restores it") {
    val t = table + "-drop"
    val s1 = IcebergTables.createOrReplace(docs, t, partitionBy = Some("lang"))
    val s2 = IcebergTables.dropPartition(spark, t, "de")
    val langs = IcebergTables.read(spark, t)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(!langs.contains("de") && langs.contains("en"))
    assert(IcebergTables.read(spark, t).count() ==
      docs.filter(col("lang") =!= "de").count())
    // the delete rewrote METADATA only; time travel still sees 'de'
    assert(IcebergTables.read(spark, t, Some(s1)).count() == docs.count())
    assert(IcebergTables.snapshots(spark, t) == Seq(s1, s2))
  }

  test("min/max bounds skip files outside a key range") {
    val t = table + "-stats"
    IcebergTables.createOrReplace(
      docs.repartitionByRange(8, col("doc_id")).sortWithinPartitions("doc_id"), t)
    val all = IcebergTables.read(spark, t)
    assert(all.inputFiles.length == 8)
    val ranged = IcebergTables.read(spark, t, range = Some(("doc_id", 100L, 299L)))
    assert(ranged.inputFiles.length < all.inputFiles.length,
      "range-clustered files outside the interval must be skipped")
    // pruning is sound: with the residual filter the answer is exact
    val want = docs.filter(col("doc_id").between(100L, 299L))
      .collect().map(_.toSeq).toSet
    assert(ranged.filter(col("doc_id").between(100L, 299L))
      .collect().map(_.toSeq).toSet == want)
  }

  test("compaction rewrites files but not history") {
    val t = table + "-compact"
    val s1 = IcebergTables.createOrReplace(
      docs.repartitionByRange(8, col("doc_id")), t)
    val s2 = IcebergTables.compact(spark, t, targetFiles = 2)
    val after = IcebergTables.read(spark, t)
    assert(after.inputFiles.length == 2, "compaction must shrink the file count")
    assert(after.count() == docs.count())
    assert(after.collect().map(_.toSeq).toSet == docs.collect().map(_.toSeq).toSet)
    // the pre-compaction snapshot still reads its original 8 files
    assert(IcebergTables.read(spark, t, Some(s1)).inputFiles.length == 8)
    assert(IcebergTables.snapshots(spark, t) == Seq(s1, s2))
  }

  test("scan keeps parquet pushdown through the snapshot resolution") {
    IcebergTables.createOrReplace(docs, table + "-push")
    val scan = IcebergTables.read(spark, table + "-push")
      .filter(col("n_chars") > 500).select("doc_id")
    val physical = scan.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.contains("n_chars"),
      s"filter must reach the parquet scan:\n$physical")
  }
}
