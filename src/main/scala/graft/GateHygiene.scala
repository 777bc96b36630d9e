package graft

/** From-scratch state for the driver gates.
  *
  * The engine's durable artifacts — index segments under
  * `java.io.tmpdir/graft-index`, the object catalog under
  * `java.io.tmpdir/graft-objects`, the session `spark-warehouse` — are
  * DESIGNED to survive JVM exits (that durability is itself under test:
  * restart-visibility entries reload them). But the verification gates run
  * on a shared, long-lived VM, so those same dirs can hold state from an
  * unrelated earlier run: a different scale factor, a mid-edit tree, or a
  * JVM that died mid-segment-write. Round 15's correctness artifact was
  * poisoned exactly this way — 78 entries mismatched against the oracle,
  * while clean-state reruns of the identical tree were 263/263 green.
  *
  * So the gate entrypoints ([[Verify]], [[Bench]]) reset the DEFAULT dirs
  * before creating a session, making every gate run measure this tree on a
  * from-scratch build. Explicitly overridden locations (`GRAFT_INDEX_DIR`,
  * `GRAFT_CATALOG_DIR`) are never touched — an override says the caller
  * owns that state. Filtered (local-iteration) runs skip the reset so fast
  * probes can reuse warm artifacts; the driver always runs unfiltered.
  */
object GateHygiene {
  def resetDurableState(): Unit = {
    val tmp = sys.props("java.io.tmpdir").stripSuffix("/")
    val targets = Seq(
      if (sys.env.contains("GRAFT_INDEX_DIR")) None else Some(s"$tmp/graft-index"),
      if (sys.env.contains("GRAFT_CATALOG_DIR")) None else Some(s"$tmp/graft-objects"),
      Some(sys.props("user.dir").stripSuffix("/") + "/spark-warehouse")
    ).flatten
    targets.foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
  }
}
