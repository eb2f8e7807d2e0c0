package graft

import org.apache.spark.sql.SparkSession

/** Driver bench contract: run every SparkEntry query at
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  * Each query is fully evaluated via count() (results are small;
  * the work is in the pipelines, not the collect).
  *
  * Interference robustness (round-2 verdict "Next round #5": the driver
  * recorded 151 s for a suite that reproducibly runs ~55-66 s — this VM's
  * co-tenant bursts inflate single jobs up to 40×): the suite runs TWICE,
  * with graft.Caches cleared in between so pass 2 re-pays every pipeline's
  * real cost instead of reading memos. The headline per-query value and
  * total are the per-query MIN of the two passes; both raw passes plus the
  * /proc/stat steal-jiffy deltas are emitted alongside so a burst is
  * visible in the artifact instead of silently inflating it.
  */
object Bench {

  private def stealJiffies(): Long =
    try {
      val cpu = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).getOrElse("")
      val f = cpu.trim.split("\\s+")
      if (f.length > 8) f(8).toLong else 0L // cpu user nice sys idle iowait irq softirq steal
    } catch { case _: Throwable => 0L }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Force the EPHEMERAL pipeline-intermediate path: with a durable ckpt
    // root inherited from the environment, pass 2 would READ committed
    // snapshots instead of recomputing, and the min-merge would promote
    // those artificially fast times to the headline. An empty conf value
    // short-circuits the env fallback (PipelineQueries.durableRoot).
    spark.conf.set("spark.graft.pipeline.ckpt", "")

    val names = SparkEntry.queries.toSeq.sortBy(_._1)

    def runPass(): Seq[(String, Double, Boolean)] = names.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }

    val s0 = stealJiffies()
    val pass1 = runPass()
    val s1 = stealJiffies()
    Caches.clear(spark) // memos dropped: pass 2 re-pays the real pipeline cost
    val pass2 = runPass()
    val s2 = stealJiffies()

    val merged = pass1.zip(pass2).map { case ((n, t1, ok1), (_, t2, ok2)) =>
      // a query only counts as passing if BOTH passes pass; the headline
      // time is the min over passing passes (interference-burst filter)
      val ok = ok1 && ok2
      val t = (if (ok1) Seq(t1) else Nil) ++ (if (ok2) Seq(t2) else Nil) match {
        case Nil => math.min(t1, t2)
        case ts  => ts.min
      }
      (n, t, ok, (t1, ok1), (t2, ok2))
    }
    def qjson(f: ((String, Double, Boolean, (Double, Boolean), (Double, Boolean))) => (Double, Boolean)) =
      merged.map { m => val (v, ok) = f(m); "\"" + m._1 + "\":" + (if (ok) v else -v) }
        .mkString("{", ",", "}")
    // a failed query reports NEGATIVE elapsed + a nonzero failures count, so
    // a failing bench run is machine-distinguishable from a passing one;
    // the raw per-pass fields carry THAT pass's own ok, so a
    // pass-asymmetric failure is attributed to the pass that failed
    val qs = qjson(m => (m._2, m._3))
    val raw1 = qjson(_._4)
    val raw2 = qjson(_._5)
    val total = merged.map(_._2).sum
    val failed = merged.count(!_._3)
    val line = s"""{"metric":"total","value":$total,"unit":"sec","failures":$failed,"queries":$qs,"queries_pass1":$raw1,"queries_pass2":$raw2,"steal_jiffies_pass1":${s1 - s0},"steal_jiffies_pass2":${s2 - s1},"sf":"$sfDir"}"""
    // The artifact line ALSO lands in a file (round-4 verdict "Next round
    // #5": the driver's stdout tail-grab truncated pass 1 out of the
    // captured artifact) — a consumer can always recover the full two-pass
    // record from the file even when the console capture clips.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}") }
    println(line)
    spark.stop()
  }
}
