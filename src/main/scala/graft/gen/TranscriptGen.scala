package graft.gen

import java.security.MessageDigest
import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.Turn

/** Deterministic synthetic transcript generator — FIXTURES.md §2.
  *
  * Pure function of (seed, nConvs): same inputs ⇒ identical table, row for
  * row, regardless of parallelism. Each conversation is generated
  * independently from `seed ^ murmur(conv_id)`, so generation distributes
  * over `spark.range(nConvs)` with no cross-partition state — at 10^12-turn
  * scale this is an embarrassingly parallel scan, not a driver loop.
  *
  * Skew is manufactured on purpose (Zipf conversation lengths, Zipf tool
  * popularity) so hub-vertex handling (SURVEY.md §4.2) is exercised by
  * every test and bench run.
  */
object TranscriptGen {

  val ToolVocabSize = 50
  val MaxTurns = 200
  private val Epoch = 1767225600L // 2026-01-01T00:00:00Z, seconds

  /** Inverse-CDF Zipf sampler over {1..max} with exponent s. */
  final class Zipf(s: Double, max: Int) extends Serializable {
    private val cdf: Array[Double] = {
      val w = Array.tabulate(max)(k => math.pow(k + 1.0, -s))
      val c = w.scanLeft(0.0)(_ + _).drop(1)
      val tot = c(max - 1)
      c.map(_ / tot)
    }
    /** u in [0,1) -> value in [1, max] */
    def sample(u: Double): Int = {
      val i = java.util.Arrays.binarySearch(cdf, u)
      val idx = if (i >= 0) i else -i - 1
      math.min(idx + 1, max)
    }
  }

  // Shared immutable samplers + per-thread digest: generation is
  // allocation-bound at bench scale, and these were the hot allocations.
  private val lenZipf = new Zipf(1.3, MaxTurns)
  private val toolZipf = new Zipf(1.2, ToolVocabSize)
  private val sha1 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("SHA-1")
  }
  private val hexDigits = "0123456789abcdef".toCharArray

  def sha1Hex12(s: String): String = {
    val md = sha1.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](12)
    var i = 0
    while (i < 12) {
      val b = d(i / 2) & 0xff
      out(i) = hexDigits(if (i % 2 == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    new String(out)
  }

  def convId(i: Long): String = f"c$i%06d"

  /** Generate the turns of one conversation; deterministic in (seed, i). */
  def genConv(seed: Long, i: Long): Seq[Turn] = {
    val cid = convId(i)
    val rng = new scala.util.Random(seed ^ scala.util.hashing.MurmurHash3.stringHash(cid).toLong)
    val nTurns = 2 + lenZipf.sample(rng.nextDouble())
    val baseTs = (Epoch + i * 13L) * 1000L
    (0 until nTurns).map { t =>
      val role = if (t == 0) "user" else if (t % 2 == 1) "assistant" else "user"
      val tool =
        if (role == "assistant" && rng.nextDouble() < 0.6)
          Some(f"t${toolZipf.sample(rng.nextDouble()) - 1}%03d")
        else None
      val text = s"msg|$cid|$t|" + sha1Hex12(s"$seed|$cid|$t")
      Turn(cid, t, role, text, tool, new Timestamp(baseTs + 7000L * t))
    }
  }

  /** Distributed generation: one task range per slice of conversations. */
  def transcripts(spark: SparkSession, nConvs: Long, seed: Long = 42L,
                  numPartitions: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
                else spark.sparkContext.defaultParallelism
    spark.range(0, nConvs, 1, parts).flatMap(i => genConv(seed, i))
  }
}
