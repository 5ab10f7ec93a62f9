package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import IvfObjectStore.{ManifestConflict, ManifestStoreException}

/** The VERSIONED AT-REST KEEP-SET — the dedup decision table
  * ([[GraftDedup.keepSet]]: id → cluster_id, keep) as a
  * manifest-committed object-store table whose daily mutation is an
  * INCREMENT-sized write, completing the daily-100-TB-increment story:
  * [[GraftDedup.keepSetIncremental]] computes the new decisions, this
  * store persists them without rewriting the corpus.
  *
  * Same substrate guarantees as [[IvfObjectStore]] / [[ImpactObjectStore]]
  * (no rename, no listing consistency, SHA-256-trailed immutable manifest
  * versions, torn-manifest fallback, optimistic version race) — the full
  * argument lives on [[IvfObjectStore]]'s class doc.
  *
  * Layout under `dir`:
  * {{{
  *   manifests/v<20-digit>.manifest    base/delta/tomb file lists + tags
  *   data/<file>.parquet               (doc_id, cluster_id, __v) rows,
  *                                     or (doc_id) tombstone slivers
  * }}}
  *
  * Versioning model — base ⊕ deltas, LAST-WINS per id:
  *   - [[create]] stages the full table as the BASE of v1;
  *   - [[increment]] stages ONLY the rows the increment changed — the
  *     new ids plus the old rows whose cluster label the contraction
  *     remapped (located by a broadcast of the sliver-sized remap
  *     against the resolved table's scan — never a corpus shuffle) —
  *     stamped `__v` = the publishing version, and publishes
  *     v+1 = base + deltas + the new sliver;
  *   - [[read]] resolves per-id last-wins (max `__v`); with no deltas
  *     (fresh create, or after [[compact]]) that is a PURE SCAN, so the
  *     serve path pays the resolution aggregation only between compacts;
  *   - [[compact]] folds base ⊕ deltas into a new base (one corpus
  *     rewrite, scheduled off the increment path) — run it after each
  *     increment and the NEXT increment's resolve is again a pure scan:
  *     the daily cadence at 100 TB is increment (sliver write) →
  *     compact (one rewrite) with no corpus-sized shuffle anywhere;
  *   - [[readAt]]/[[versions]]/[[vacuum]] give the same bounded
  *     time-travel window as the sibling stores — "which docs were kept
  *     on day N" is one readAt, the provenance/compliance query a dedup
  *     pipeline owes its consumers.
  *
  * `keep` is derived at read (id == cluster_id) — storing it would be
  * a redundant byte per row that could only ever disagree.
  *
  * Exactness: an increment's rows are exactly where
  * [[GraftDedup.keepSetIncremental]]'s full output differs from the
  * stored table (same contraction kernel — [[GraftDedup.keepSetRemap]]),
  * so resolved(base ⊕ deltas) ≡ the from-scratch [[GraftDedup.keepSet]]
  * over all ids and pairs folded so far (KeepSetStoreSpec pins chained
  * increments against the from-scratch closure). Preconditions are the
  * increment kernel's: new ids disjoint from stored ids, pair endpoints
  * within stored ∪ new.
  */
object KeepSetStore {

  private val Header = "graft-keepset-manifest v1"

  private[graft] final case class KeepSetManifest(version: Long,
                                                  base: Seq[String],
                                                  deltas: Seq[String],
                                                  tags: Set[String],
                                                  tombs: Seq[String] = Nil) {
    def render: String = {
      val body = new StringBuilder
      body.append(Header).append('\n')
      body.append("version ").append(version).append('\n')
      tags.toSeq.sorted.foreach(t => body.append("tag ").append(t).append('\n'))
      base.sorted.foreach(f => body.append("base ").append(f).append('\n'))
      deltas.sorted.foreach(f => body.append("delta ").append(f).append('\n'))
      tombs.sorted.foreach(f => body.append("tomb ").append(f).append('\n'))
      val digest = IvfObjectStore.sha256(body.toString)
      body.append("end ").append(digest).append('\n')
      body.toString
    }
  }

  private[graft] def parseManifest(text: String): Option[KeepSetManifest] = {
    val lines = text.split("\n", -1).toSeq.dropRight(
      if (text.endsWith("\n")) 1 else 0)
    if (lines.isEmpty || lines.head != Header) return None
    val endIdx = lines.lastIndexWhere(_.startsWith("end "))
    if (endIdx != lines.length - 1) return None
    val expected = lines(endIdx).stripPrefix("end ")
    val payload = lines.take(endIdx).mkString("", "\n", "\n")
    if (IvfObjectStore.sha256(payload) != expected) return None
    var version = -1L
    val base = Seq.newBuilder[String]; val deltas = Seq.newBuilder[String]
    val tombs = Seq.newBuilder[String]
    val tags = Set.newBuilder[String]
    for (l <- lines.slice(1, endIdx)) l.split(" ", 2) match {
      case Array("version", v) => version = v.toLong
      case Array("tag", t) => tags += t
      case Array("base", f) => base += f
      case Array("delta", f) => deltas += f
      case Array("tomb", f) => tombs += f
      case _ => return None
    }
    if (version < 1) return None
    Some(KeepSetManifest(version, base.result(), deltas.result(),
                         tags.result(), tombs.result()))
  }

  private[graft] def currentManifest(fs: FileSystem,
                                     dir: String): Option[KeepSetManifest] = {
    val root = new Path(s"$dir/manifests")
    if (!fs.exists(root)) return None
    fs.listStatus(root)
      .filter(f => f.isFile && f.getPath.getName.matches("v\\d{20}\\.manifest"))
      .sortBy(_.getPath.getName)(Ordering[String].reverse)
      .iterator
      .flatMap(f => parseManifest(IvfObjectStore.readFully(fs, f.getPath)))
      .nextOption()
  }

  private def publish(fs: FileSystem, dir: String,
                      m: KeepSetManifest): Boolean = {
    val p = new Path(f"$dir/manifests/v${m.version}%020d.manifest")
    fs.mkdirs(p.getParent)
    val out =
      try fs.create(p, false)
      catch { case _: java.io.IOException => return false }
    try out.write(m.render.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    true
  }

  private def healTorn(fs: FileSystem, dir: String, version: Long): Unit = {
    val p = new Path(f"$dir/manifests/v$version%020d.manifest")
    try {
      val st = fs.getFileStatus(p)
      if (st.getModificationTime < System.currentTimeMillis() -
            IvfObjectStore.TornManifestGraceMs &&
          parseManifest(IvfObjectStore.readFully(fs, p)).isEmpty)
        fs.delete(p, false)
    } catch { case _: java.io.FileNotFoundException => }
  }

  private def stage(df: DataFrame, dir: String, v: Long,
                    idCol: String): Seq[String] =
    IvfObjectStore.writeVia(
      df.select(col(idCol).cast("long").as(idCol),
                col("cluster_id").cast("long").as("cluster_id"),
                lit(v).as("__v")),
      s"$dir/data", Nil).map(r => s"data/$r")

  /** Create the store from a [[GraftDedup.keepSet]]-shaped table
    * (idCol, cluster_id[, keep]) — the full table becomes v1's base.
    * Refuses a dir that already holds a manifest chain. */
  def create(keepSet: DataFrame, dir: String,
             idCol: String = "doc_id"): Long = {
    val fs = IvfObjectStore.fsOf(keepSet.sparkSession, dir)
    currentManifest(fs, dir).foreach { m =>
      throw new ManifestStoreException(
        s"KeepSetStore.create: $dir already holds manifest v${m.version}" +
        " — use increment to mutate an existing store")
    }
    val base = stage(keepSet, dir, 1L, idCol)
    if (!publish(fs, dir, KeepSetManifest(1L, base, Nil, Set.empty)))
      throw new ManifestConflict(
        s"KeepSetStore.create: lost the v1 publish race on $dir")
    1L
  }

  private def resolveFrom(spark: SparkSession, dir: String,
                          m: KeepSetManifest, idCol: String): DataFrame = {
    val all = spark.read.parquet(
      (m.base ++ m.deltas).map(r => s"$dir/$r"): _*)
    val lbl =
      if (m.deltas.isEmpty) all.select(col(idCol), col("cluster_id"))
      else all
        .groupBy(col(idCol))
        .agg(max(struct(col("__v"), col("cluster_id")))
          .getField("cluster_id").as("cluster_id"))
    // takedown mask ([[delete]]): tombstoned ids' ROWS drop at serve —
    // an O(ids) broadcast anti join; survivors' rows are bit-unchanged
    // (their cluster label is an opaque identity, not a liveness claim)
    val masked =
      if (m.tombs.isEmpty) lbl
      else lbl.join(
        broadcast(spark.read.parquet(m.tombs.map(r => s"$dir/$r"): _*)
          .select(col(idCol)).distinct()),
        Seq(idCol), "left_anti")
    masked.withColumn("keep", col(idCol) === col("cluster_id"))
  }

  /** The resolved live table (idCol, cluster_id, keep) — a pure scan
    * when the store is freshly created or compacted, a per-id last-wins
    * aggregation while increments' deltas are outstanding. */
  def read(spark: SparkSession, dir: String,
           idCol: String = "doc_id"): DataFrame = {
    val fs = IvfObjectStore.fsOf(spark, dir)
    val m = currentManifest(fs, dir).getOrElse(
      throw new ManifestStoreException(
        s"KeepSetStore.read: no valid manifest under $dir"))
    resolveFrom(spark, dir, m, idCol)
  }

  /** Time travel: the keep-set exactly as version `version` served it —
    * "which docs were kept on day N". */
  def readAt(spark: SparkSession, dir: String, version: Long,
             idCol: String = "doc_id"): DataFrame = {
    val fs = IvfObjectStore.fsOf(spark, dir)
    val p = new Path(f"$dir/manifests/v$version%020d.manifest")
    val m = (if (fs.exists(p))
               parseManifest(IvfObjectStore.readFully(fs, p))
             else None)
      .getOrElse(throw new ManifestStoreException(
        s"KeepSetStore.readAt: no valid manifest v$version under $dir — " +
        s"readable versions: ${versions(spark, dir).mkString(", ")}"))
    resolveFrom(spark, dir, m, idCol)
  }

  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val fs = IvfObjectStore.fsOf(spark, dir)
    val root = new Path(s"$dir/manifests")
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root)
      .filter(f => f.isFile && f.getPath.getName.matches("v\\d{20}\\.manifest"))
      .flatMap(f => parseManifest(IvfObjectStore.readFully(fs, f.getPath)))
      .map(_.version).toSeq.sorted
  }

  /** Fold an increment into the stored table: stage ONLY the changed
    * sliver (new ids + old rows whose label the contraction remapped)
    * as a delta of v+1. `batchTag` gives replays idempotence exactly as
    * [[IvfObjectStore.append]]'s (the tag rides the manifest chain).
    * On a publish conflict the pass re-reads the chain and RE-STAGES —
    * the delta depends on the stored labels, which the winner may have
    * moved. Returns the published version.
    *
    * `newIds` are CANDIDATE new ids: ids already stored under the SAME
    * manifest snapshot the stage resolves from are filtered out
    * in-place (one id-pruned scan, sliver-broadcast semi-join), and the
    * filter re-derives on every retry — so the contraction kernel's
    * new-ids-disjoint-from-stored precondition holds by construction
    * even when a concurrent committer lands between the caller's read
    * and this publish (ADVICE r15: a caller-side disjointness check
    * reads a DIFFERENT manifest than the stage and can pass a stored id
    * as 'new', staging a duplicate row in the same delta version).
    */
  def increment(spark: SparkSession, dir: String, newIds: DataFrame,
                newPairs: DataFrame, idCol: String = "doc_id",
                aCol: String = "a_id", bCol: String = "b_id",
                batchTag: Option[String] = None): Long = {
    batchTag.foreach(t => require(t.matches("[A-Za-z0-9_]+"),
      s"batchTag '$t' must match [A-Za-z0-9_]+ (same tag grammar as the " +
      "sibling stores)"))
    val fs = IvfObjectStore.fsOf(spark, dir)
    var staged: Seq[String] = null
    var stagedAgainst: Seq[String] = null
    var attempt = 0
    while (attempt < IvfObjectStore.PublishRetries) {
      val m = currentManifest(fs, dir).getOrElse(
        throw new ManifestStoreException(
          s"KeepSetStore.increment: no valid manifest under $dir — " +
          "create() first"))
      if (batchTag.exists(m.tags.contains)) return m.version // replay
      val liveFiles = m.base ++ m.deltas ++ m.tombs
      if (staged == null || stagedAgainst != liveFiles) {
        // the staged delta references the RESOLVED table three times
        // (remap's touched lookup, the moved-label locate, the stored-id
        // disjointness filter) and the remap sliver twice — persist both
        // for exactly the staging scope (guide §1.2 fewer passes; the
        // r17 keepset probe put the increment at ~3.3 s of its row's
        // ~5.9, mostly these repeated resolve scans as sequential jobs),
        // and unpersist before returning: bounded lifetime, no r11 leak.
        // remap is pair-sliver-sized by construction; the resolved table
        // is corpus-KEYED but skinny (two longs per id), and it is
        // re-derived per retry attempt, so nothing outlives the call.
        val prevLbl = resolveFrom(spark, dir, m, idCol)
          .select(col(idCol), col("cluster_id")).persist()
        val remap = GraftDedup.keepSetRemap(prevLbl, newPairs, idCol,
                                            aCol, bCol).persist()
        try {
          // old rows whose label moved: broadcast the sliver-sized remap
          // against the resolved scan — the identity rows (a merged
          // component's surviving min label) change nothing and are
          // filtered out, so the delta is exactly the changed set
          val moved = remap.filter(col("component") =!= col("__node"))
          val oldChanged = prevLbl
            .join(broadcast(moved.select(col("__node").as("cluster_id"),
                                         col("component"))),
                  Seq("cluster_id"), "inner")
            .select(col(idCol), col("component").as("cluster_id"))
          // genuinely-new ids under THIS snapshot: already-stored ids come
          // back from an id-pruned scan semi-joined with the sliver-sized
          // candidate set, and are excepted — re-derived on every retry so
          // the disjointness precondition survives concurrent committers
          val cand = newIds.select(col(idCol)).distinct()
          val genuinelyNew = cand.exceptAll(
            prevLbl.select(col(idCol))
              .join(broadcast(cand), Seq(idCol), "left_semi"))
          val newRows = genuinelyNew
            .join(ScaleHints.gated(remap.select(col("__node").as(idCol),
                                                col("component"))),
                  Seq(idCol), "left")
            .select(col(idCol),
                    coalesce(col("component"), col(idCol)).as("cluster_id"))
          staged = stage(oldChanged.unionByName(newRows), dir,
                         m.version + 1, idCol)
          stagedAgainst = liveFiles
        } finally { remap.unpersist(); prevLbl.unpersist() }
      }
      val next = KeepSetManifest(m.version + 1, m.base, m.deltas ++ staged,
                                 m.tags ++ batchTag, m.tombs)
      if (publish(fs, dir, next)) return next.version
      healTorn(fs, dir, m.version + 1)
      IvfObjectStore.publishBackoff(attempt)
      attempt += 1
    }
    throw new ManifestConflict(
      s"KeepSetStore.increment: lost the publish race " +
      s"${IvfObjectStore.PublishRetries} times on $dir — serialize " +
      "committers or raise retries")
  }

  /** Fold base ⊕ deltas into a new single-generation base (one corpus
    * rewrite, off the increment path) so [[read]] and the next
    * [[increment]]'s resolve are pure scans again. Doubles as the
    * takedown PURGE: the fold reads through the tombstone mask, so the
    * new base physically omits every [[delete]]d id's rows and the new
    * manifest clears its tombstones (deleted bytes leave disk once
    * [[vacuum]] ages out the pre-compact versions — the compliance
    * eraser; a formerly-deleted id can be re-added by [[increment]]
    * afterwards). No-op (returns the current version) when no deltas
    * and no tombstones are outstanding. */
  def compact(spark: SparkSession, dir: String,
              idCol: String = "doc_id"): Long = {
    val fs = IvfObjectStore.fsOf(spark, dir)
    var staged: Seq[String] = null
    var stagedAgainst: Seq[String] = null
    var attempt = 0
    while (attempt < IvfObjectStore.PublishRetries) {
      val m = currentManifest(fs, dir).getOrElse(
        throw new ManifestStoreException(
          s"KeepSetStore.compact: no valid manifest under $dir"))
      if (m.deltas.isEmpty && m.tombs.isEmpty) return m.version
      val liveFiles = m.base ++ m.deltas ++ m.tombs
      if (staged == null || stagedAgainst != liveFiles) {
        staged = stage(resolveFrom(spark, dir, m, idCol), dir,
                       m.version + 1, idCol)
        stagedAgainst = liveFiles
      }
      if (publish(fs, dir, KeepSetManifest(m.version + 1, staged, Nil,
                                           m.tags)))
        return m.version + 1
      healTorn(fs, dir, m.version + 1)
      IvfObjectStore.publishBackoff(attempt)
      attempt += 1
    }
    throw new ManifestConflict(
      s"KeepSetStore.compact: lost the publish race " +
      s"${IvfObjectStore.PublishRetries} times on $dir — schedule " +
      "compaction off the increment path")
  }

  /** TAKEDOWN from the dedup decision table (r16 — completing the
    * tri-store compliance story: `IvfObjectStore.delete` rewrites cell
    * slivers, `ImpactObjectStore.delete` masks postings, and this masks
    * decisions): publish v+1 whose manifest carries an O(ids) tombstone
    * sliver that every [[read]]/[[readAt]]-of-this-version masks
    * IMMEDIATELY — deleted ids' rows drop from the served table;
    * survivors' rows are BIT-UNCHANGED. Stated consequences, plainly:
    * a survivor's `cluster_id` may reference a deleted id (the label is
    * an opaque cluster identity), and a cluster whose KEEPER was taken
    * down serves with NO kept member until an upstream rebuild —
    * deliberately conservative for training-data selection (the one
    * copy you were going to train on is gone by request; electing a
    * different member requires re-running dedup without the deleted
    * doc's pairs, which no store can derive from the decision table
    * alone). [[compact]] is the physical purge and clears the mask; a
    * deleted id stays masked even if a later [[increment]] re-adds it,
    * until that purge runs (takedown outranks re-crawl). `batchTag`
    * gives replays idempotence; ids absent from the store tombstone
    * harmlessly. Returns the published version. */
  def delete(spark: SparkSession, dir: String, ids: DataFrame,
             idCol: String = "doc_id",
             batchTag: Option[String] = None): Long = {
    batchTag.foreach(t => require(t.matches("[A-Za-z0-9_]+"),
      s"batchTag '$t' must match [A-Za-z0-9_]+ (same tag grammar as the " +
      "sibling stores)"))
    val fs = IvfObjectStore.fsOf(spark, dir)
    // the tombstone sliver is snapshot-independent (just the id set) —
    // stage once, retry only the publish
    var staged: Seq[String] = null
    var attempt = 0
    while (attempt < IvfObjectStore.PublishRetries) {
      val m = currentManifest(fs, dir).getOrElse(
        throw new ManifestStoreException(
          s"KeepSetStore.delete: no valid manifest under $dir — " +
          "create() first"))
      if (batchTag.exists(m.tags.contains)) return m.version // replay
      if (staged == null)
        staged = IvfObjectStore.writeVia(
          ids.select(col(idCol).cast("long").as(idCol)).distinct(),
          s"$dir/data", Nil).map(r => s"data/$r")
      val next = KeepSetManifest(m.version + 1, m.base, m.deltas,
                                 m.tags ++ batchTag, m.tombs ++ staged)
      if (publish(fs, dir, next)) return next.version
      healTorn(fs, dir, m.version + 1)
      IvfObjectStore.publishBackoff(attempt)
      attempt += 1
    }
    throw new ManifestConflict(
      s"KeepSetStore.delete: lost the publish race " +
      s"${IvfObjectStore.PublishRetries} times on $dir — serialize " +
      "committers or raise retries")
  }

  /** Streaming opt-out twin of [[delete]] (r16 — the
    * [[IvfObjectStore.deleteStream]] contract on the decision table):
    * an unbounded stream of doc ids drains into tagged tombstone
    * versions, one per micro-batch (`<streamId>_d<batchId>`), so a
    * checkpoint replay no-ops on the manifest's tag set and every
    * opted-out id's row leaves the served keep-set at the NEXT read
    * after its batch commits; [[compact]] remains the physical purge on
    * its own cadence. */
  def deleteStream(dir: String, ids: DataFrame, streamId: String,
                   idCol: String = "doc_id")
      : org.apache.spark.sql.streaming.DataStreamWriter[
          org.apache.spark.sql.Row] = {
    require(streamId.matches("[A-Za-z0-9_]+"),
      s"streamId '$streamId' must match [A-Za-z0-9_]+ (it prefixes the " +
      "store's idempotency tags)")
    ids.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        delete(batch.sparkSession, dir, batch.select(col(idCol)), idCol,
               batchTag = Some(s"${streamId}_d$batchId"))
        ()
    }
  }

  /** Delete data objects NO surviving manifest references and superseded
    * manifests, both older than `olderThanMs` — the time-travel
    * retention knob, same contract as the sibling stores. The manifest
    * sweep runs FIRST and the live set is the union over every manifest
    * that remains readable (ADVICE r15: sweeping data by the current
    * manifest alone could delete a file a retained older manifest still
    * serves — staging time precedes publish time). */
  def vacuum(spark: SparkSession, dir: String, olderThanMs: Long): Int = {
    require(olderThanMs > 0, s"olderThanMs must be positive: $olderThanMs")
    val fs = IvfObjectStore.fsOf(spark, dir)
    val cur = currentManifest(fs, dir).getOrElse(
      throw new ManifestStoreException(
        s"KeepSetStore.vacuum: no valid manifest under $dir"))
    val cutoff = System.currentTimeMillis() - olderThanMs
    var deleted = 0
    val mRoot = new Path(s"$dir/manifests")
    for (st <- fs.listStatus(mRoot)
           if st.isFile && st.getModificationTime < cutoff &&
              st.getPath.getName.matches("v\\d{20}\\.manifest") &&
              st.getPath.getName < f"v${cur.version}%020d.manifest") {
      fs.delete(st.getPath, false); deleted += 1
    }
    val live: Set[String] = fs.listStatus(mRoot)
      .filter(f => f.isFile &&
                   f.getPath.getName.matches("v\\d{20}\\.manifest"))
      .flatMap(f => parseManifest(IvfObjectStore.readFully(fs, f.getPath)))
      .flatMap(m => m.base ++ m.deltas ++ m.tombs)
      .toSet
    val p = new Path(s"$dir/data")
    if (fs.exists(p))
      for (st <- fs.listStatus(p)
           if st.isFile && st.getModificationTime < cutoff &&
              !live.contains(s"data/${st.getPath.getName}")) {
        fs.delete(st.getPath, false); deleted += 1
      }
    deleted
  }
}
