package graft.crawl

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Iceberg-style snapshot layer over Parquet (SURVEY.md §0, §2.1 S3):
  * no Iceberg runtime jar exists in this sandbox, so the engine provides
  * its own immutable-data-files + manifest-log table format delivering the
  * north_rule's requirements (BASELINE.json:14): atomic per-round commits,
  * resume from any committed snapshot, per-partition lineage and metrics.
  *
  * Layout under `root`:
  * {{{
  *   manifest.jsonl          one JSON object per committed round (append-only,
  *                           atomically replaced via temp-file + rename)
  *   round=R/frontier/       parquet — the frontier entering round R
  *   round=R/seen_delta/     parquet — url hashes first seen in round R-1's
  *                           expansion (round 0 delta = the seed list)
  *   round=R/fetchlog/       parquet — fetches performed in round R
  *   round=R/blooms/         one immutable file per bloom shard UPDATED in
  *                           round R; the manifest's bloom_paths array maps
  *                           every shard id to its current file (untouched
  *                           shards keep pointing at older rounds' files —
  *                           no per-round copying)
  *   round=R/hostready/      parquet — per-host virtual ready time entering
  *                           round R (a Dataset, not a driver map: 10^7+
  *                           hosts at web scale)
  * }}}
  *
  * A round is visible iff its manifest line is present; partially-written
  * round directories without a manifest line are ignored on resume (the
  * atomic-commit contract).
  */
final class SnapshotStore(val root: String) {

  private val mapper = new ObjectMapper()

  def manifestPath: Path = Paths.get(root, "manifest.jsonl")
  def roundDir(r: Int): String = s"$root/round=$r"
  def frontierPath(r: Int): String = s"${roundDir(r)}/frontier"
  def seenDeltaPath(r: Int): String = s"${roundDir(r)}/seen_delta"
  def seenBasePath(r: Int): String = s"${roundDir(r)}/seen_base"
  def fetchLogPath(r: Int): String = s"${roundDir(r)}/fetchlog"
  def bloomsDir(r: Int): String = s"${roundDir(r)}/blooms"
  def hostReadyPath(r: Int): String = s"${roundDir(r)}/hostready"

  def wipe(): Unit = deleteDir(root)

  def deleteDir(path: String): Unit = {
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p)) Files.list(p).iterator().asScala.foreach(rm)
      Files.deleteIfExists(p)
    }
    val p = Paths.get(path)
    if (Files.exists(p)) rm(p)
  }

  /** Rounds with a committed manifest line, ascending. */
  def committedRounds(): Seq[Int] = {
    if (!Files.exists(manifestPath)) return Seq.empty
    Files.readAllLines(manifestPath).asScala.toSeq
      .filter(_.nonEmpty)
      .map(l => mapper.readTree(l).get("round").asInt())
  }

  def lastCommitted(): Option[Int] = committedRounds().lastOption

  def readManifest(): Seq[Map[String, Any]] = {
    if (!Files.exists(manifestPath)) return Seq.empty
    Files.readAllLines(manifestPath).asScala.toSeq.filter(_.nonEmpty).map { l =>
      mapper.readValue(l, classOf[java.util.Map[String, Any]]).asScala.toMap
    }
  }

  /** Atomic append: rewrite manifest to temp + rename. Single-FS rename is
    * the same atomicity primitive Iceberg's HadoopTableOperations uses. */
  def commit(entryJson: String): Unit = {
    Files.createDirectories(Paths.get(root))
    val existing =
      if (Files.exists(manifestPath))
        new String(Files.readAllBytes(manifestPath), StandardCharsets.UTF_8)
      else ""
    val tmp = Paths.get(root, s".manifest.tmp")
    Files.write(tmp, (existing + entryJson + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, manifestPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Serialize one manifest entry. `lineage` carries per-partition
    * (pmod(url_hash, P) bucket) row counts of the seen delta,
    * `seenPaths` the live seen-set files after compaction, and
    * `bloomPaths` the current file of every bloom shard —
    * BASELINE.json:14 "per-partition lineage + metrics". */
  def entryJson(round: Int, parent: Int, rows: Map[String, Long],
                lineage: Seq[Long], metrics: Map[String, Double],
                seenPaths: Seq[String], bloomPaths: Seq[String] = Seq.empty,
                partitions: Int = 0): String = {
    val node = mapper.createObjectNode()
    node.put("round", round)
    node.put("parent", parent)
    node.put("partitions", partitions)
    val rowsNode = node.putObject("rows")
    rows.toSeq.sortBy(_._1).foreach { case (k, v) => rowsNode.put(k, v) }
    val lin = node.putArray("seen_delta_partition_rows")
    lineage.foreach(lin.add)
    val sp = node.putArray("seen_paths")
    seenPaths.foreach(sp.add)
    val bp = node.putArray("bloom_paths")
    bloomPaths.foreach(p => if (p == null) bp.addNull() else bp.add(p))
    val met = node.putObject("metrics")
    metrics.toSeq.sortBy(_._1).foreach { case (k, v) => met.put(k, v) }
    mapper.writeValueAsString(node)
  }

  /** Live seen-set parquet paths as of the last committed round. */
  def liveSeenPaths(): Seq[String] =
    readManifest().lastOption.map(
      _("seen_paths").asInstanceOf[java.util.List[String]]
        .asScala.toSeq).getOrElse(Seq.empty)

  /** Partition/shard count the snapshot was written with (0 = unknown,
    * pre-round-2 manifests). */
  def livePartitions(): Int =
    readManifest().lastOption
      .flatMap(e => Option(e.getOrElse("partitions", null)))
      .map(_.asInstanceOf[Number].intValue()).getOrElse(0)

  /** Per-shard bloom file paths as of the last committed round (null
    * entries = never-written shards); empty when blooms are disabled. */
  def liveBloomPaths(): Array[String] =
    readManifest().lastOption.map(
      _("bloom_paths").asInstanceOf[java.util.List[String]]
        .asScala.toArray).getOrElse(Array.empty[String])
}
