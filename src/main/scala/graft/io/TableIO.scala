package graft.io

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}

/** "Iceberg-shaped" table commit layer — SURVEY.md §4.5.
  *
  * The binding spec calls for Iceberg checkpoints with per-partition lineage
  * (BASELINE.json:6), but no Iceberg runtime jar exists in this zero-egress
  * sandbox. This trait isolates the commit protocol; the v1 backend is
  * partitioned Parquet plus an atomic JSON manifest per commit (write
  * temp → atomic rename). Binding a real `iceberg-spark-runtime` catalog
  * later is a new implementation of this trait, call sites unchanged.
  *
  * Commit invariants (what makes mid-iteration kills safe):
  *  - data files for snapshot k live under `<root>/<table>/iter=<k>/`
  *  - a snapshot EXISTS iff `<root>/_commits/<table>-<k>.json` exists
  *  - the manifest is written with temp-file + ATOMIC_MOVE, so it is
  *    all-or-nothing; a job killed mid-write leaves data without manifest,
  *    which readers ignore and the retry overwrites
  *  - the manifest records the per-partition file list + sizes + row count
  *    ("per-partition lineage") and the iteration's convergence metrics
  */
trait TableIO {
  /** Atomically commit `df` as snapshot `iter` of `table`; returns a frame
    * reading the committed data (lineage-truncated). With `bucket =
    * Some((col, n))` the snapshot is written HASH-BUCKETED on `col` into
    * `n` buckets and `read` reconstructs a scan that REPORTS
    * HashPartitioning(col, n) — so a resumed iterative loop keeps the
    * one-shuffle-per-round contract from its first iteration instead of
    * paying a recovery re-shuffle. */
  def commit(table: String, iter: Int, df: DataFrame, meta: Map[String, Any],
             bucket: Option[(String, Int)] = None): DataFrame
  def read(table: String, iter: Int): DataFrame
  /** Highest committed snapshot of `table`, if any. */
  def latest(table: String): Option[Int]
  /** Attach post-commit metrics to snapshot `iter` (atomic side file). */
  def note(table: String, iter: Int, meta: Map[String, Any]): Unit
  /** All commit metadata of `table` (manifest ∪ notes), ascending by iter. */
  def commitLog(table: String): Seq[Map[String, Any]]
}

object ParquetManifestIO {
  private val mapper = new ObjectMapper()
}

final class ParquetManifestIO(spark: SparkSession, root: String) extends TableIO {
  import ParquetManifestIO.mapper

  private def tableDir(table: String, iter: Int): Path =
    Paths.get(root, table, s"iter=$iter")
  private def commitsDir: Path = Paths.get(root, "_commits")
  private def manifestPath(table: String, iter: Int): Path =
    commitsDir.resolve(s"$table-$iter.json")

  /** Deterministic catalog identifier for a bucketed snapshot — re-derivable
    * by a RESUMING session that only knows (root, table, iter). */
  private def catalogName(table: String, iter: Int): String =
    s"graft_${table}_${iter}_${Integer.toHexString(root.hashCode)}"
      .replaceAll("[^a-zA-Z0-9_]", "_")

  override def commit(table: String, iter: Int, df: DataFrame, meta: Map[String, Any],
                      bucket: Option[(String, Int)] = None): DataFrame = {
    val dir = tableDir(table, iter)
    // Overwrite fully: a previous torn (un-manifested) attempt is erased.
    deleteRecursively(dir)
    bucket match {
      case Some((col, n)) =>
        // Bucketed external table: bucket id = pmod(murmur3(col), n), the
        // same function as HashPartitioning — the committing loop's state is
        // already partitioned that way, so each task writes ONE bucket file.
        val tbl = catalogName(table, iter)
        spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
        df.write.mode("overwrite").bucketBy(n, col)
          .option("path", dir.toString).format("parquet").saveAsTable(tbl)
      case None =>
        df.write.mode("overwrite").parquet(dir.toString)
    }
    val files = Files.list(dir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("part-"))
      .map(p => Map("file" -> p.getFileName.toString, "bytes" -> Files.size(p)))
      .toSeq.sortBy(_("file").toString)
    val manifest = new java.util.LinkedHashMap[String, Any]()
    manifest.put("table", table)
    manifest.put("iter", iter)
    manifest.put("files", files.map(_.asJava).asJava)
    manifest.put("committed_at", java.time.Instant.now().toString)
    bucket.foreach { case (col, n) =>
      manifest.put("bucket_col", col)
      manifest.put("bucket_n", n)
      manifest.put("schema_ddl", df.schema.toDDL)
    }
    meta.foreach { case (k, v) => manifest.put(k, v) }
    Files.createDirectories(commitsDir)
    val tmp = commitsDir.resolve(s".tmp-$table-$iter-${System.nanoTime()}.json")
    Files.write(tmp, mapper.writeValueAsBytes(manifest))
    Files.move(tmp, manifestPath(table, iter),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    read(table, iter)
  }

  override def read(table: String, iter: Int): DataFrame = {
    require(Files.exists(manifestPath(table, iter)),
      s"no committed snapshot $table/iter=$iter")
    val manifest = mapper.readValue(Files.readAllBytes(manifestPath(table, iter)),
      classOf[java.util.Map[String, Any]]).asScala
    manifest.get("bucket_col") match {
      case Some(col: String) =>
        // Re-declare the bucketed table if this session doesn't know it yet
        // (the resume-after-restart path): the CLUSTERED BY declaration is
        // what makes the scan report HashPartitioning(col, n) — no shuffle.
        val n = manifest("bucket_n").toString.toInt
        val ddl = manifest("schema_ddl").toString
        val tbl = catalogName(table, iter)
        if (!spark.catalog.tableExists(tbl)) {
          spark.sql(
            s"""CREATE TABLE `$tbl` ($ddl) USING parquet
               |CLUSTERED BY (`$col`) INTO $n BUCKETS
               |LOCATION '${tableDir(table, iter)}'""".stripMargin)
        }
        spark.table(tbl)
      case _ =>
        spark.read.parquet(tableDir(table, iter).toString)
    }
  }

  override def latest(table: String): Option[Int] = {
    if (!Files.exists(commitsDir)) return None
    val re = s"^${java.util.regex.Pattern.quote(table)}-(\\d+)\\.json$$".r
    val iters = Files.list(commitsDir).iterator().asScala
      .flatMap(p => re.findFirstMatchIn(p.getFileName.toString).map(_.group(1).toInt))
      .toSeq
    if (iters.isEmpty) None else Some(iters.max)
  }

  override def note(table: String, iter: Int, meta: Map[String, Any]): Unit = {
    val m = new java.util.LinkedHashMap[String, Any]()
    meta.foreach { case (k, v) => m.put(k, v) }
    Files.createDirectories(commitsDir)
    val tmp = commitsDir.resolve(s".tmp-note-$table-$iter-${System.nanoTime()}.json")
    Files.write(tmp, mapper.writeValueAsBytes(m))
    Files.move(tmp, commitsDir.resolve(s"$table-$iter.note.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  override def commitLog(table: String): Seq[Map[String, Any]] = {
    if (!Files.exists(commitsDir)) return Seq.empty
    val re = s"^${java.util.regex.Pattern.quote(table)}-(\\d+)\\.json$$".r
    def readJson(p: Path): Map[String, Any] =
      mapper.readValue(Files.readAllBytes(p), classOf[java.util.Map[String, Any]]).asScala.toMap
    Files.list(commitsDir).iterator().asScala
      .flatMap(p => re.findFirstMatchIn(p.getFileName.toString).map(m => (m.group(1).toInt, p)))
      .toSeq.sortBy(_._1)
      .map { case (i, p) =>
        val notePath = commitsDir.resolve(s"$table-$i.note.json")
        val note = if (Files.exists(notePath)) readJson(notePath) else Map.empty[String, Any]
        readJson(p) ++ note
      }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.delete)
    }
  }
}
