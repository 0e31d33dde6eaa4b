ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "connectorsspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // forked JVMs inherit the container's POSIX locale; partition paths may
  // contain non-ASCII characters, so pin the file-path codec to UTF-8
  "-Dfile.encoding=UTF-8",
  "-Dsun.jnu.encoding=UTF-8",
  // 8g forced multi-second GC pauses during the sf0.1 bench (local[32]
  // keeps 32 partitions of shuffle/broadcast state live at once) and made
  // per-query timings swing 2-3x run to run; 24g removes the stalls on
  // the 128 GiB container. SPARK_DRIVER_MEM still overrides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
Test / envVars ++= Map("LC_ALL" -> "C.UTF-8", "LANG" -> "C.UTF-8")
run / envVars ++= Map("LC_ALL" -> "C.UTF-8", "LANG" -> "C.UTF-8")

// ---- Parallel forked test groups (r16) ----
// The suite ran as ONE forked JVM, sequentially: ~50 min wall on slower
// hosts, which is what broke the r15 test gate (tests_ok=false with zero
// failing assertions — the suite outlived the driver's budget). Suites
// are independent: each JVM builds its own SparkSession (getOrCreate)
// and every suite writes only per-suite temp dirs, so run K forked JVMs,
// each executing its share of suites sequentially. Same tests, same
// assertions — only the wall clock changes.
val testGroupCount = 6
// Measured suite-wall seconds (r16 session, 32-core host, sequential
// run) used to balance groups with greedy longest-first assignment;
// unlisted suites default to 5 s. Stale weights only cost balance,
// never correctness.
val suiteWeights: Map[String, Int] = Map(
  "graft.operators.SemanticCapSpec" -> 324,
  "graft.operators.IncrementalSubstrFuzzSpec" -> 143,
  "graft.delta.InitialSnapshotChunkingSpec" -> 134,
  "graft.delta.CrossProcessStoreSpec" -> 129,
  "graft.delta.ChangeDataFeedSpec" -> 91,
  "graft.operators.PostingsChurnSpec" -> 66,
  "graft.delta.FileCountScaleSpec" -> 53,
  "graft.delta.CrossProcessCheckpointSpec" -> 49,
  "graft.operators.QuantRecallSpec" -> 48,
  "graft.operators.IncrementalSubstrIndexSpec" -> 46,
  "graft.operators.AnnIndexSpec" -> 43,
  "graft.delta.DistributedStateSpec" -> 42,
  "graft.sql.GraftCatalogSpec" -> 37,
  "graft.delta.CheckpointAndStoreSpec" -> 30,
  "graft.delta.StreamChunkingFuzzSpec" -> 30,
  "graft.delta.DataSkippingSpec" -> 29,
  "graft.delta.V2CarryOverFuzzSpec" -> 29,
  "graft.delta.LogCompactionFuzzSpec" -> 27,
  "graft.operators.HeavyHittersSpec" -> 26,
  "graft.operators.ExactSubstrFuzzSpec" -> 25,
  "graft.delta.LogCompactionSpec" -> 24,
  "graft.delta.StreamingSpec" -> 23,
  "graft.delta.LiquidClusteringIncrementalSpec" -> 22,
  "graft.delta.CrossProcessCommitSpec" -> 22,
  "graft.delta.CompactionAndVacuumSpec" -> 21,
  "graft.operators.IncrementalDedupIndexSpec" -> 20,
  "graft.operators.OperatorsSpec" -> 20,
  "graft.delta.MergeSpec" -> 20,
  "graft.delta.V2CheckpointSpec" -> 19,
  "graft.operators.KeepCanonicalSpec" -> 18,
  "graft.delta.DvWriteSpec" -> 17,
  "graft.streaming.SessionizeSpec" -> 14,
  "graft.delta.ConstraintsSpec" -> 14,
  "graft.delta.DataSkippingPropertySpec" -> 13,
  "graft.delta.CdfReconstructionFuzzSpec" -> 13,
  "graft.operators.NgramDictGuardSpec" -> 13,
  "graft.delta.CoordinatedBackfillCadenceSpec" -> 13,
  "graft.delta.GoldenCompatSpec" -> 13,
  "graft.delta.DeltaTableSpec" -> 12,
  "graft.delta.IncrementalAggSpec" -> 12,
  "graft.operators.SearchAndLineDedupSpec" -> 12,
  "graft.delta.StreamingRestartFuzzSpec" -> 12,
  "graft.streaming.StreamingFunnelSpec" -> 11,
  "graft.delta.ChecksumSpec" -> 10,
  "graft.delta.TimestampParsingSpec" -> 10,
  "graft.delta.CombinedFeatureSpec" -> 10,
  "graft.operators.BpeSegmentFuzzSpec" -> 10,
  "graft.delta.BloomSkippingSpec" -> 10,
  "graft.delta.DomainMetadataSpec" -> 10,
  "graft.delta.SymlinkManifestSpec" -> 9,
  "graft.delta.FeatureRemovalSpec" -> 9,
  "graft.delta.ZOrderSpec" -> 9,
  "graft.delta.RestoreSpec" -> 9,
  "graft.delta.SqlTableFunctionSpec" -> 8,
  "graft.operators.PageRankSpec" -> 8,
  "graft.delta.CloneSpec" -> 8,
  "graft.delta.IncrementalStateFuzzSpec" -> 8,
  "graft.delta.VacuumLiteSpec" -> 8,
  "graft.operators.PipelinePlanQualitySpec" -> 8,
  "graft.delta.ReplaceWhereSpec" -> 8,
  "graft.delta.StreamingDvShadeSpec" -> 7,
  "graft.operators.ContainmentSpec" -> 7,
  "graft.delta.PlanQualitySpec" -> 7,
  "graft.delta.SqlInsertSpec" -> 7,
  "graft.delta.CopyIntoSpec" -> 7,
  "graft.delta.IncrementalSnapshotSpec" -> 7,
  "graft.delta.DmlSpec" -> 6,
  "graft.delta.RowTrackingSpec" -> 6,
  "graft.delta.GoldenWriteCompatSpec" -> 6,
  "graft.delta.GeneratedColumnsSpec" -> 6,
  "graft.streaming.StreamingTopKSpec" -> 6,
  "graft.delta.DeletionVectorSpec" -> 6,
  "graft.delta.DeepCloneSpec" -> 6,
  "graft.delta.SetTransactionRetentionSpec" -> 5,
  "graft.delta.CheckpointStatsPolicySpec" -> 5,
)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val base = (Test / forkOptions).value
  // per-group JVMs need far less heap than the single shared JVM did;
  // the LAST -Xmx on the command line wins
  val opts = base.withRunJVMOptions(base.runJVMOptions ++
    Seq(s"-Xmx${sys.env.getOrElse("SPARK_TEST_GROUP_MEM", "10g")}"))
  val buckets = Array.fill(testGroupCount)(
    scala.collection.mutable.ArrayBuffer.empty[sbt.TestDefinition])
  val load = Array.fill(testGroupCount)(0L)
  // deterministic: sort by (weight desc, name), then greedy least-loaded
  tests.sortBy(t => (-suiteWeights.getOrElse(t.name, 5), t.name))
    .foreach { t =>
      val i = load.indices.minBy(load(_))
      buckets(i) += t
      load(i) += suiteWeights.getOrElse(t.name, 5).toLong
    }
  buckets.zipWithIndex.toSeq.map { case (ts, i) =>
    Tests.Group(s"g$i", ts.toSeq, Tests.SubProcess(opts))
  }
}
// sbt caps concurrent forked test groups at 1 by default; lift it to the
// group count (keep the stock limitAll/Clean restrictions)
Global / concurrentRestrictions := Seq(
  Tags.limitAll(math.max(testGroupCount + 2, java.lang.Runtime.getRuntime.availableProcessors())),
  Tags.limit(Tags.ForkedTestGroup, testGroupCount),
  Tags.exclusiveGroup(Tags.Clean))
