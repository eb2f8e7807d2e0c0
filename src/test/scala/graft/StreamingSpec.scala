package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger

import graft.gen.TranscriptGen
import graft.graph.GraphBuilder
import graft.streaming.IncrementalIngest

/** SURVEY.md §2.9: incremental ingest produces the same edge multiset as
  * the batch builder; watermarked windowed aggregation; replay idempotence.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-stream-").toString

  lazy val allTurns: Seq[Turn] =
    (0 until 30).flatMap(i => TranscriptGen.genConv(seed = 99, i))

  test("streaming edges across microbatches == batch edges") {
    val inDir = tmp()
    val ckpt = tmp()
    val outDir = tmp()
    // drop turns in two chunks per conversation (split mid-conversation, so
    // adjacency must span the batch boundary via state)
    val (early, late) = allTurns.partition(t => t.turn_idx < 3)
    early.toDS().repartition(2).write.mode("append").parquet(s"$inDir/data")

    val schema = allTurns.toDS().schema
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$inDir/data")
      val edges = IncrementalIngest.streamingEdges(stream.as[Turn])
      val q = edges.writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    late.toDS().repartition(2).write.mode("append").parquet(s"$inDir/data")
    runOnce()

    val got = spark.read.parquet(outDir)
      .groupBy("src_key", "dst_key", "kind").count()
      .as[(String, String, Int, Long)].collect().toSet

    // batch reference: raw string edges from GraphBuilder's derivation
    val keyed = allTurns.toDF()
    val g = GraphBuilder.fromTranscripts(keyed)
    val dict = g.dict.as[(String, Long)].collect().toMap.map(_.swap)
    val want = g.edges.as[(Long, Long, Int, Double)].collect()
      .map { case (s, d, k, w) => (dict(s), dict(d), k, w.toLong) }.toSet
    assert(got == want)
  }

  test("windowed tool counts with watermark run on a stream") {
    val inDir = tmp()
    allTurns.toDS().write.parquet(s"$inDir/b0")
    val schema = allTurns.toDS().schema
    val stream = spark.readStream.schema(schema).parquet(s"$inDir/*")
    val agg = IncrementalIngest.windowedToolCounts(stream.toDF())
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("tool_windows")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.sql("SELECT * FROM tool_windows").collect()
    assert(rows.nonEmpty)
    // reference: batch computation of the same windowed aggregate
    val want = IncrementalIngest.windowedToolCounts(allTurns.toDF()).count()
    assert(rows.length.toLong == want)
  }

  test("streaming incremental dedup across microbatches == batch exact dedup") {
    import graft.streaming.StreamingDedup
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[StreamingDedup.DocRow]
      .collect().sortBy(_.doc_id)
    val inDir = tmp(); val ckpt = tmp(); val outDir = tmp()
    val schema = docs.toSeq.toDS().schema
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$inDir/data")
      val q = StreamingDedup.dedupStream(stream.as[StreamingDedup.DocRow])
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // arrival in doc_id order, split across two microbatch rounds; the
    // fixture has no exact-dup texts, so inject three duplicates of
    // EARLY-batch documents into the LATE batch — the dup pairs straddle
    // the microbatch boundary and must resolve via per-hash state
    val (early, late) = docs.partition(_.doc_id < 250)
    val synth = early.take(3).zipWithIndex.map { case (d, i) =>
      StreamingDedup.DocRow(100000L + i, d.text)
    }
    early.toSeq.toDS().repartition(2).write.mode("append").parquet(s"$inDir/data")
    runOnce()
    (late ++ synth).toSeq.toDS().repartition(2).write.mode("append").parquet(s"$inDir/data")
    runOnce()
    val got = spark.read.parquet(outDir)
      .as[StreamingDedup.DedupLabel].collect().toSet

    // fixture docs: labels must equal the batch exact-dedup operator's
    // (synthetic ids are larger than every fixture id and duplicate
    // existing texts, so fixture canonicals are unchanged by them)
    val want = graft.queries.PipelineQueries.queries("d_dedup_exact")(spark, sf)
      .as[StreamingDedup.DedupLabel].collect().toSet
    val gotFixture = got.filter(_.doc_id < 100000L)
    assert(gotFixture == want,
      s"streaming labels diverge: ${(gotFixture diff want).take(3)} vs ${(want diff gotFixture).take(3)}")
    // synthetic dups: labeled against the cross-batch canonical, flagged
    val byId = got.map(l => l.doc_id -> l).toMap
    synth.zip(early.take(3)).foreach { case (s, orig) =>
      val l = byId(s.doc_id)
      assert(l.is_dup && l.canonical_id == orig.doc_id,
        s"synthetic ${s.doc_id} got $l, expected canonical ${orig.doc_id}")
    }
  }

  test("streaming near-dup pairs across microbatches == batch simhash64 pairs") {
    import graft.streaming.{StreamingDedup, StreamingNearDup}
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[StreamingDedup.DocRow]
      .collect().sortBy(_.doc_id)
    val inDir = tmp(); val ckpt = tmp(); val outDir = tmp()
    val schema = docs.toSeq.toDS().schema
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$inDir/data")
      val q = StreamingNearDup.nearDupStream(stream.as[StreamingDedup.DocRow])
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val (early, late) = docs.partition(_.doc_id < 250)
    early.toSeq.toDS().repartition(2).write.mode("append").parquet(s"$inDir/data")
    runOnce()
    late.toSeq.toDS().repartition(2).write.mode("append").parquet(s"$inDir/data")
    runOnce()
    // a pair may be emitted once per agreeing chunk — dedup like the batch
    // operator's .distinct(), then compare the full sets
    val got = spark.read.parquet(outDir)
      .select("da", "db", "hamming").distinct()
      .as[(Long, Long, Int)].collect().toSet
    val want = graft.queries.PipelineQueries.queries("d_simhash64_pairs")(spark, sf)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == want,
      s"pair sets diverge: extra=${(got diff want).take(3)} missing=${(want diff got).take(3)}")
    assert(want.nonEmpty, "fixture should contain near-dup pairs")
    // pairs must straddle the microbatch boundary (state actually used)
    assert(got.exists { case (da, db, _) => da < 250 && db >= 250 },
      "no cross-batch pair — state not exercised")
  }

  test("streaming dedup replay: canonical survives, labels stay consistent") {
    import graft.streaming.StreamingDedup
    val state = new TestGroupState[StreamingDedup.HashState](None)
    val first = StreamingDedup.emitHash("h", Iterator((7L, "h"), (3L, "h")), state).toVector
    assert(first.map(l => (l.doc_id, l.canonical_id, l.is_dup)) ==
      Vector((3L, 3L, false), (7L, 3L, true)))
    // a later batch (or an exact replay) labels against the SAME canonical
    val second = StreamingDedup.emitHash("h", Iterator((3L, "h"), (11L, "h")), state).toVector
    assert(second.map(l => (l.doc_id, l.canonical_id, l.is_dup)) ==
      Vector((3L, 3L, false), (11L, 3L, true)))
  }

  test("streaming near-dup on a dup-heavy corpus == batch (occupancy-guard equivalence)") {
    import graft.streaming.{StreamingDedup, StreamingNearDup}
    // degenerate corpus (round-3 verdict #1): two exact-dup groups — one
    // of 200 — sharing a simhash (word permutation), plus singletons; the
    // per-bucket state must group by hash, not scan every member
    val textA = "alpha bravo charlie delta echo"
    val textB = "echo delta charlie bravo alpha"
    val docs = ((0 until 200).map(i => StreamingDedup.DocRow((i * 2).toLong, textA)) ++
      (0 until 60).map(i => StreamingDedup.DocRow((i * 2 + 1).toLong, textB)) ++
      (0 until 10).map(i => StreamingDedup.DocRow((10000 + i).toLong,
        s"w${i}a w${i}b w${i}c"))).sortBy(_.doc_id)
    val corpusDir = tmp()
    docs.toDS().toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")

    val inDir = tmp(); val ckpt = tmp(); val outDir = tmp()
    val schema = docs.toDS().schema
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$inDir/data")
      val q = StreamingNearDup.nearDupStream(stream.as[StreamingDedup.DocRow])
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // split MID-GROUP so most dup pairs straddle the batch boundary
    val (early, late) = docs.partition(_.doc_id < 150)
    early.toDS().write.mode("append").parquet(s"$inDir/data")
    runOnce()
    late.toDS().write.mode("append").parquet(s"$inDir/data")
    runOnce()
    val got = spark.read.parquet(outDir)
      .select("da", "db", "hamming").distinct()
      .as[(Long, Long, Int)].collect().toSet
    val want = graft.queries.PipelineQueries.queries("d_simhash64_pairs")(spark, corpusDir)
      .as[(Long, Long, Int)].collect().toSet
    // C(200,2) + C(60,2) + 200·60 cross-group at Hamming 0
    assert(want.size == 19900 + 1770 + 12000)
    assert(got == want,
      s"extra=${(got diff want).take(3)} missing=${(want diff got).take(3)}")
    assert(got.exists { case (da, db, _) => da < 150 && db >= 150 },
      "no cross-batch pair — state not exercised")
  }

  test("streaming dedup equivalence holds under the RocksDB state store provider") {
    import graft.streaming.StreamingDedup
    val saved = StreamingDedup.rocksDbConf.keys
      .map(k => k -> spark.conf.getOption(k)).toSeq
    StreamingDedup.rocksDbConf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val docs = (0 until 120).map(i => StreamingDedup.DocRow(i.toLong, s"text ${i % 40}"))
      val inDir = tmp(); val ckpt = tmp(); val outDir = tmp()
      val schema = docs.toDS().schema
      def runOnce(): Unit = {
        val stream = spark.readStream.schema(schema).parquet(s"$inDir/data")
        val q = StreamingDedup.dedupStream(stream.as[StreamingDedup.DocRow])
          .writeStream.outputMode("append").format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val (early, late) = docs.partition(_.doc_id < 60)
      early.toDS().write.mode("append").parquet(s"$inDir/data"); runOnce()
      late.toDS().write.mode("append").parquet(s"$inDir/data"); runOnce()
      val got = spark.read.parquet(outDir).as[StreamingDedup.DedupLabel].collect()
      assert(got.length == 120)
      // min-id canonicalization holds across the batch boundary (ordered
      // arrival): canonical of "text k" is k, dups are ids 40+k, 80+k
      got.foreach { l =>
        assert(l.canonical_id == l.doc_id % 40, s"$l")
        assert(l.is_dup == (l.doc_id >= 40), s"$l")
      }
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("streaming near-dup pairs survive the RocksDB state store provider") {
    import graft.streaming.{StreamingDedup, StreamingNearDup}
    val saved = StreamingDedup.rocksDbConf.keys
      .map(k => k -> spark.conf.getOption(k)).toSeq
    StreamingDedup.rocksDbConf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 3 copies each of 10 distinct texts → every intra-text pair is a
      // Hamming-0 near-dup; cross-batch pairs must come out of RocksDB state
      val docs = (0 until 30).map(i =>
        StreamingDedup.DocRow(i.toLong, s"alpha beta gamma delta text${i % 10}"))
      val inDir = tmp(); val ckpt = tmp(); val outDir = tmp()
      val schema = docs.toDS().schema
      def runOnce(): Unit = {
        val stream = spark.readStream.schema(schema).parquet(s"$inDir/data")
        val q = StreamingNearDup.nearDupStream(stream.as[StreamingDedup.DocRow])
          .writeStream.outputMode("append").format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val (early, late) = docs.partition(_.doc_id < 15)
      early.toDS().write.mode("append").parquet(s"$inDir/data"); runOnce()
      late.toDS().write.mode("append").parquet(s"$inDir/data"); runOnce()
      val got = spark.read.parquet(outDir)
        .select("da", "db").as[(Long, Long)].collect().toSet
      val want = (for {
        a <- 0L until 30L; b <- (a + 1) until 30L
        if a % 10 == b % 10
      } yield (a, b)).toSet
      assert(got == want, s"missing ${want -- got}, extra ${got -- want}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("expiring dedup: hash re-canonicalizes after the watermark passes its TTL") {
    import graft.streaming.StreamingDedup
    import graft.streaming.StreamingDedup.TimedDocRow
    val inDir = tmp(); val ckpt = tmp(); val outDir = tmp()
    // positive epoch base: a row whose event time equals the INITIAL
    // watermark (0) is dropped as late before reaching the operator
    def ts(min: Long) = new Timestamp(86400000L + min * 60000L)
    val schema = Seq(TimedDocRow(0L, "x", ts(0))).toDS().schema
    def add(rows: TimedDocRow*): Unit = {
      rows.toSeq.toDS().write.mode("append").parquet(s"$inDir/data")
      val stream = spark.readStream.schema(schema).parquet(s"$inDir/data")
      val q = StreamingDedup.dedupStreamExpiring(
          stream.as[TimedDocRow], "0 seconds", ttlMs = 60L * 60 * 1000)
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    add(TimedDocRow(1, "dup me", ts(0)))    // canonical 1; watermark → 0
    add(TimedDocRow(2, "dup me", ts(10)))   // within TTL: dup of 1; wm → 10m
    add(TimedDocRow(3, "other", ts(200)))   // wm → 200m after this batch
    add(TimedDocRow(4, "filler", ts(201)))  // wm 200m > timeout 70m ⇒ "dup me" state expires
    add(TimedDocRow(5, "dup me", ts(202)))  // EXPIRED hash: fresh canonical
    val got = spark.read.parquet(outDir).as[StreamingDedup.DedupLabel]
      .collect().map(l => l.doc_id -> l).toMap
    assert(got(2).is_dup && got(2).canonical_id == 1L, s"${got(2)}")
    assert(!got(5).is_dup && got(5).canonical_id == 5L,
      s"expired hash did not re-canonicalize: ${got(5)}")
  }

  test("near-dup re-delivered doc neither re-emits nor re-appends (membership guard)") {
    import graft.streaming.StreamingNearDup
    val h = 42L
    val key = (0, h & 0xFFFFL)
    def banded(id: Long) = StreamingNearDup.BandedDoc(0, h & 0xFFFFL, id, h)
    val st = new TestGroupState[Map[Long, List[Long]]](None)
    val first = StreamingNearDup.emitBucket(3)(key, Iterator(banded(1)), st).toVector
    assert(first.isEmpty)
    val second = StreamingNearDup.emitBucket(3)(key,
      Iterator(banded(1), banded(2)), st).toVector
    assert(second == Vector(StreamingNearDup.NearDupPair(1, 2, 0)))
    // full replay: no duplicate pairs, state unchanged
    val third = StreamingNearDup.emitBucket(3)(key,
      Iterator(banded(1), banded(2)), st).toVector
    assert(third.isEmpty)
    assert(st.value.get == Map(h -> List(2L, 1L)))
  }

  test("expiring near-dup kernel: expired members stop pairing; re-delivery refreshes") {
    import graft.streaming.StreamingNearDup
    val ttl = 60L * 60 * 1000
    def t(min: Long) = new Timestamp(86400000L + min * 60000L)
    def banded(id: Long, h: Long, min: Long) =
      StreamingNearDup.TimedBandedDoc(0, h & 0xFFFFL, id, h, t(min))
    val h = 42L
    val key = (0, h & 0xFFFFL)
    val st = new TestGroupState[Map[Long, List[(Long, Long)]]](None)
    val kernel = StreamingNearDup.emitBucketExpiring(3, ttl) _

    assert(kernel(key, Iterator(banded(1, h, 0)), st).isEmpty)
    assert(st.timeoutTs == t(0).getTime + ttl, "timeout = newest member + TTL")
    // within horizon: pairs against member 1
    st.watermarkMs = t(10).getTime
    assert(kernel(key, Iterator(banded(2, h, 10)), st).toVector ==
      Vector(StreamingNearDup.NearDupPair(1, 2, 0)))
    // re-delivery of 2: no re-emission, recency refreshed
    st.watermarkMs = t(20).getTime
    assert(kernel(key, Iterator(banded(2, h, 30)), st).isEmpty)
    assert(st.value.get(h).find(_._1 == 2L).get._2 == t(30).getTime)
    // watermark passes 1's horizon (0 + 60m) but not 2's (30m + 60m): a new
    // arrival pairs with 2 only — the expired member is forgotten
    st.watermarkMs = t(80).getTime
    assert(kernel(key, Iterator(banded(3, h, 81)), st).toVector ==
      Vector(StreamingNearDup.NearDupPair(2, 3, 0)))
    assert(!st.value.get(h).exists(_._1 == 1L), "expired member must leave state")
    // bucket-level timeout removes the whole state
    st.timedOut = true
    assert(kernel(key, Iterator.empty, st).isEmpty)
    assert(st.value.isEmpty)
  }

  test("expiring near-dup e2e (RocksDB provider): pairs stop at the TTL horizon") {
    import graft.streaming.{StreamingDedup, StreamingNearDup}
    import graft.streaming.StreamingDedup.TimedDocRow
    val saved = StreamingDedup.rocksDbConf.keys
      .map(k => k -> spark.conf.getOption(k)).toSeq
    StreamingDedup.rocksDbConf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val inDir = tmp(); val ckpt = tmp(); val outDir = tmp()
      def ts(min: Long) = new Timestamp(86400000L + min * 60000L)
      val textA = "alpha bravo charlie delta echo"
      val schema = Seq(TimedDocRow(0L, "x", ts(0))).toDS().schema
      def add(rows: TimedDocRow*): Unit = {
        rows.toSeq.toDS().write.mode("append").parquet(s"$inDir/data")
        val stream = spark.readStream.schema(schema).parquet(s"$inDir/data")
        val q = StreamingNearDup.nearDupStreamExpiring(
            stream.as[TimedDocRow], "0 seconds", ttlMs = 60L * 60 * 1000)
          .writeStream.outputMode("append").format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      add(TimedDocRow(1, textA, ts(0)))      // wm → 0
      add(TimedDocRow(2, textA, ts(10)))     // within TTL: pair (1,2); wm → 10m
      add(TimedDocRow(3, "unrelated words here", ts(200))) // wm → 200m
      add(TimedDocRow(4, "more filler text", ts(201)))     // textA buckets expire
      add(TimedDocRow(5, textA, ts(202)))    // horizon passed: NO pair with 1/2
      add(TimedDocRow(6, textA, ts(203)))    // fresh window: pairs with 5 only
      val got = spark.read.parquet(outDir)
        .select("da", "db", "hamming").distinct()
        .as[(Long, Long, Int)].collect().toSet
      assert(got == Set((1L, 2L, 0), (5L, 6L, 0)),
        s"expected the TTL horizon to split the dup groups, got $got")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("replayed turns are dropped by the state guard (idempotence)") {
    // direct unit test of emitConv: feeding the same turns twice emits once
    val conv = allTurns.filter(_.conv_id == TranscriptGen.convId(0))
    val state = new TestGroupState[IncrementalIngest.ConvState](None)
    val first = IncrementalIngest.emitConv(conv.head.conv_id, conv.iterator, state).toVector
    val second = IncrementalIngest.emitConv(conv.head.conv_id, conv.iterator, state).toVector
    assert(first.nonEmpty)
    assert(second.isEmpty)
  }
}

/** Minimal GroupState stub for unit-testing the stateful function.
  * `watermarkMs`/`timedOut` are settable so expiring kernels can be driven
  * through their event-time lifecycle; `timeoutTs` records the last
  * setTimeoutTimestamp for assertions. */
class TestGroupState[S](var value: Option[S])
    extends org.apache.spark.sql.streaming.GroupState[S] {
  var watermarkMs: Long = 0L
  var timedOut: Boolean = false
  var timeoutTs: Long = -1L
  override def exists: Boolean = value.isDefined
  override def get: S = value.get
  override def getOption: Option[S] = value
  override def update(s: S): Unit = value = Some(s)
  override def remove(): Unit = value = None
  override def setTimeoutDuration(d: Long): Unit = ()
  override def setTimeoutDuration(d: String): Unit = ()
  override def setTimeoutTimestamp(t: Long): Unit = timeoutTs = t
  override def setTimeoutTimestamp(t: Long, additional: String): Unit = timeoutTs = t
  override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date, additional: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = watermarkMs
  override def getCurrentProcessingTimeMs(): Long = 0L
  override def hasTimedOut: Boolean = timedOut
}
