package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-behavior smoke: build an N× copy of the sf0.1 fixtures by
  * unioning key-shifted replicas (dimensions stay fixed, fact/entity
  * keys shift per replica so join cardinalities grow linearly), then
  * time a representative query subset at 1× and N× and report the
  * wall-clock ratio per query.
  *
  * This is the empirical check behind every "would this survive 100×?"
  * claim in SURVEY/README: a query whose ratio ≈ N scales linearly
  * (scan-bound); a ratio ≫ N exposes superlinear pair generation or a
  * shuffle that outgrew the partition budget. Copies of a doc/vector
  * are IDENTICAL near-dups by construction, so the dedup queries also
  * stress-test candidate-pair growth under duplicate-heavy data — the
  * realistic hard case for web-scale corpora.
  *
  * Usage: runMain graft.tools.ScaleSmoke [factor] [queries...]
  * Writes replicas under target/scale<N>x/ (never outside the repo).
  */
object ScaleSmoke {

  private val keyCols: Map[String, Seq[String]] = Map(
    "orders"     -> Seq("o_orderkey", "o_custkey"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "customer"   -> Seq("c_custkey"),
    "supplier"   -> Seq("s_suppkey"),
    "part"       -> Seq("p_partkey"),
    "events"     -> Seq("event_id", "user_id"),
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  // dimension tables: one copy, never replicated
  private val dims = Seq("region", "nation")

  def buildScaled(spark: SparkSession, srcDir: String, outDir: String, factor: Int): Unit = {
    dims.foreach { t =>
      Tables.load(spark, srcDir, t).write.mode("overwrite")
        .parquet(s"$outDir/$t.parquet")
    }
    keyCols.foreach { case (t, keys) =>
      val base = Tables.load(spark, srcDir, t)
      // shift span: next power of 10 above the max key, shared by all
      // key columns of the table so relationships stay aligned
      val maxRow = base.select(keys.map(k => max(col(k).cast("long")).as(k)): _*).head()
      val maxKey = keys.indices.map(maxRow.getLong).max
      val span = math.pow(10, math.ceil(math.log10(maxKey + 2))).toLong
      val copies = (0 until factor).map { i =>
        keys.foldLeft(base)((df, k) => df.withColumn(k, col(k) + lit(i * span)))
      }
      copies.reduce(_.unionByName(_)).write.mode("overwrite")
        .parquet(s"$outDir/$t.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val defaults = Seq("q01", "q03", "q24", "q32", "q40", "q41", "q43", "q46",
      "q48", "q49", "q50", "q51", "q53", "q63", "q75", "q76", "q77")
    val wanted = if (args.length > 1) args.drop(1).toSeq else defaults
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = s"target/scale${factor}x"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/graft-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)

    if (!new java.io.File(s"$outDir/lineitem.parquet").exists()) {
      println(s"[scale] building ${factor}x replicas in $outDir ...")
      buildScaled(spark, srcDir, outDir, factor)
    }

    // Same timed action as Bench: a noop-sink write, not count() —
    // count() lets Catalyst prune computed columns, so scale ratios for
    // projection-heavy queries would compare partially-dead plans.
    def time(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val selected = SparkEntry.all.filter(q => wanted.exists(q.name.startsWith))
    println(f"${"query"}%-28s ${"t_1x"}%8s ${"t_" + factor + "x"}%8s ${"ratio"}%7s")
    val rows = selected.map { q =>
      val t1 = math.min(time(q.fn, srcDir), time(q.fn, srcDir)) // best-of-2
      val tN = math.min(time(q.fn, outDir), time(q.fn, outDir))
      println(f"${q.name}%-28s $t1%8.2f $tN%8.2f ${tN / t1}%7.1f")
      q.name -> (t1, tN)
    }
    val js = rows.map { case (n, (a, b)) =>
      f""""${n.takeWhile(_ != '_')}":{"t1":$a%.2f,"tN":$b%.2f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_smoke","factor":$factor,"queries":$js}""")
    spark.stop()
  }
}
