package graft

import graft.ops.Manifest
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The session memo of resolved manifests must be invisible except in
  * cost: repeat resolutions serve identical rows, long chains resolve
  * losslessly, and a root rebuilt at the SAME path (new claim dirs,
  * same version numbers) must never be served the old root's rows. */
class ManifestMemoSpec extends SparkSuite {

  test("50-commit chain resolves losslessly and repeat reads are memo-served") {
    val root = Files.createTempDirectory("graft-memo-chain").toString
    import spark.implicits._
    (1 to 50).foreach { i =>
      Manifest.commitAppend(spark, root, "t", Seq((i.toLong, s"r$i")).toDF("k", "v"))
    }
    val v = Manifest.snapshotVersion(root)
    val first = Manifest.manifestRows(spark, root, v)
    assert(first.count(_._1 == "t") === 50, "one file per append must resolve")
    // repeat resolution: identical rows (memo hit path)
    assert(Manifest.manifestRows(spark, root, v) === first)
    // and the data behind them is intact
    assert(Manifest.readTable(spark, root, "t").count() === 50L)
  }

  test("a rebuilt root at the same path never serves the old root's rows") {
    val root = Files.createTempDirectory("graft-memo-rebuild").toString
    import spark.implicits._
    Manifest.commitAppend(spark, root, "t", Seq((1L, "old")).toDF("k", "v"))
    val v1 = Manifest.snapshotVersion(root)
    val old = Manifest.manifestRows(spark, root, v1) // primes the memo
    assert(old.nonEmpty)
    graft.ops.Staging.deleteRecursively(java.nio.file.Paths.get(root))
    // same path, same version number, different content
    Files.createDirectories(java.nio.file.Paths.get(root))
    Manifest.commitAppend(spark, root, "u", Seq((2L, "new")).toDF("k", "v"))
    val again = Manifest.manifestRows(spark, root, Manifest.snapshotVersion(root))
    assert(again.forall(_._1 == "u"), s"stale memo rows served: $again")
    assert(Manifest.readTable(spark, root, "u")
      .select(col("v")).head().getString(0) === "new")
  }
}
