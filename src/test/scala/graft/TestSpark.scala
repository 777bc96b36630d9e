package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    // isolate the object catalog from other JVMs' leftovers in the shared
    // tmp dir (Verify/Bench runs persist theirs) — one fresh dir for the
    // whole test JVM, so cross-suite state stays deterministic
    graft.catalog.ObjectCatalog.baseDirOverride = Some(
      java.nio.file.Files.createTempDirectory("graft-objtest").toString)
    GraftSession.local(cores = 4, shufflePartitions = 4)
  }
  val sfDir = "/root/testdata/sf0.001"
}
