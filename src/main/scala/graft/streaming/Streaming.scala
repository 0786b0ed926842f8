package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming twins of the batch event operators: watermarked
  * tumbling-window aggregation and stateful gap-based sessionization.
  * The batch versions (graft.etl.TimeBuckets / Sessionize) carry the
  * driver's correctness gate; these run the same logic incrementally.
  */
object EventAggregates {

  /** A file-based event stream with the given schema (parquet dir). */
  def readStream(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Watermarked hourly tumbling-window counts per event type. Late events
    * beyond the watermark are dropped; state is bounded by watermark age.
    */
  def hourlyByType(events: DataFrame, tsCol: String = "ts",
      typeCol: String = "event_type", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 hour").as("w"), col(typeCol))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("bucket_ts"), col(typeCol), col("n"))
}

final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
final case class SessionState(sessionCount: Long, lastMs: Long)
final case class UserSessions(user_id: Long, n_sessions: Long)
final case class FinalSession(user_id: Long, n_events: Long, start_ms: Long,
    end_ms: Long)
final case class OpenSession(nEvents: Long, startMs: Long, lastMs: Long)

object StreamEnrich {

  /** Stream-static enrichment: every micro-batch joins against a broadcast
    * snapshot of the dimension — the streaming twin of StarJoin.enrich.
    * Left join so events with no dim match still flow (classify/repair
    * downstream rather than silently dropping).
    */
  def withDim(stream: org.apache.spark.sql.DataFrame,
      dim: org.apache.spark.sql.DataFrame,
      cond: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), cond, "left")
}

object StreamJoin {

  /** Watermarked stream-stream inner join: rows match on `key` when the
    * right event lands within [left_ts, left_ts + `within`]. BOTH sides
    * carry watermarks and the join condition bounds event-time distance,
    * so each side's state buffer is evicted once the watermark passes the
    * window — without the time bound, stream-stream join state grows
    * forever. Column names must be disjoint apart from `key`.
    */
  def withinInterval(leftDf: org.apache.spark.sql.DataFrame, leftTs: String,
      rightDf: org.apache.spark.sql.DataFrame, rightTs: String, key: String,
      within: String, watermark: String = "1 hour")
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val l = leftDf.withWatermark(leftTs, watermark)
    val r = rightDf.withWatermark(rightTs, watermark)
    l.join(r, l(key) === r(key) &&
      col(rightTs) >= col(leftTs) &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"))
      .drop(r(key))
  }
}

object StreamSink {

  /** Stream → warehouse: land each micro-batch through the same
    * idempotent month-upsert the batch pipeline uses (foreachBatch is
    * the bridge between Structured Streaming and an arbitrary batch
    * sink). Dynamic partition overwrite makes a REPLAYED micro-batch
    * rewrite its months instead of appending duplicates — exactly-once
    * results over an at-least-once trigger, provided a batch carries
    * whole months or replays carry identical batches.
    */
  def monthlyUpsert(stream: org.apache.spark.sql.DataFrame, dateCol: String,
      clusterCol: String, path: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.etl.PartitionedSink.upsertMonths(batch, dateCol, clusterCol, path)
    }
}

object StreamDedup {

  /** Streaming exact dedup with BOUNDED state: one state entry per key,
    * evicted once the event-time watermark passes it — the streaming twin
    * of ExactDedup for an at-least-once source. Without the watermark
    * bound, dedup state grows with every distinct key forever.
    */
  def dropDuplicates(events: org.apache.spark.sql.DataFrame, tsCol: String,
      keyCols: Seq[String], watermark: String = "1 hour")
      : org.apache.spark.sql.DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)
}

final case class CdcEvent(k: Long, seq: Long, op: String, v: String)
final case class CdcState(seq: Long, op: String, v: String)
final case class CdcRow(k: Long, op: String, v: String)

object StreamCdc {

  /** Streaming latest-wins CDC apply — the incremental twin of
    * [[graft.etl.CdcMerge]]: per-key state holds the highest-seq
    * (op, payload); every trigger emits the key's current row (Update
    * mode), so a downstream materialized view always reflects the merged
    * snapshot. Out-of-order arrivals within AND across triggers resolve
    * by seq exactly like the batch merge — replaying the changelog
    * through the stream converges to the same table. Deletes keep a
    * TOMBSTONE in state (op='D') rather than removing it, so a late
    * lower-seq update cannot resurrect a deleted key; state is one small
    * row per live key — the streaming warehouse's table state.
    */
  def run(spark: SparkSession, changes: Dataset[CdcEvent]): Dataset[CdcRow] = {
    import spark.implicits._
    def fn(k: Long, it: Iterator[CdcEvent],
        state: GroupState[CdcState]): Iterator[CdcRow] = {
      var st = state.getOption.getOrElse(CdcState(Long.MinValue, "S", null))
      it.foreach { e => if (e.seq > st.seq) st = CdcState(e.seq, e.op, e.v) }
      state.update(st)
      Iterator.single(CdcRow(k, st.op, st.v))
    }
    changes
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
  }
}

final case class HllItem(g: String, h: Long)
final case class HllRegsState(regs: Array[Int])
final case class HllEstimate(g: String, v_zero: Long, s_harmonic: Long,
    est_hll: Long, estimate: Long)

object StreamHll {

  /** Streaming HyperLogLog — the incremental twin of
    * [[graft.functions.Hll.sketch]]: per-group state is EXACTLY the 64
    * max-merged registers (the whole point of an HLL in a stream — a
    * running distinct-count gauge whose state never grows past 64
    * bytes-ish per group, where streaming exact distinct would hold
    * every key forever). Every trigger emits the group's current
    * estimate (Update mode) using the same integer-only fold as the
    * batch sketch — same ρ bit algebra, same exact harmonic sum, same
    * driver-fixed linear-counting table — so after any prefix of
    * batches the stream's answer equals the batch sketch over the
    * union of everything absorbed so far (StreamingSpec pins it
    * non-vacuously across multiple triggers).
    */
  def run(spark: SparkSession, items: Dataset[HllItem], p: Int = 6)
      : Dataset[HllEstimate] = {
    import spark.implicits._
    // precision inherits the batch sketch's parameterization (VERDICT
    // r16 next-task 7): same registers, same rho cap, same constants —
    // p = 6 is the frozen default contract
    val m = graft.functions.Hll.registers(p)
    val cap = graft.functions.Hll.rhoCap(p)
    val estNum = graft.functions.Hll.estNumerator(p)
    val small = graft.functions.Hll.smallRange(p)
    val table = graft.functions.Hll.linearTable(p)
    def fn(g: String, it: Iterator[HllItem],
        state: GroupState[HllRegsState]): Iterator[HllEstimate] = {
      val regs = state.getOption match {
        case Some(prior) =>
          // restoring a checkpointed stream with a DIFFERENT p would
          // index past a smaller stored array (AIOOBE) or silently skew
          // v_zero/S over a larger one (ADVICE r17) — p is part of the
          // checkpointed contract, fail loudly if it changed
          if (prior.regs.length != m)
            throw new IllegalStateException(
              s"StreamHll: restored state has ${prior.regs.length} " +
                s"registers but p=$p needs $m — precision cannot change " +
                "across a checkpointed stream (start a new checkpoint)")
          prior.regs
        case None => new Array[Int](m)
      }
      it.foreach { x =>
        val reg = (x.h & (m - 1L)).toInt
        val rest = x.h >>> p
        val rho =
          if (rest == 0L) cap
          else math.min(java.lang.Long.numberOfTrailingZeros(rest) + 1, cap)
        if (rho > regs(reg)) regs(reg) = rho
      }
      state.update(HllRegsState(regs))
      var vZero = 0L; var s = 0L
      var i = 0
      while (i < m) {
        s += 1L << (cap - regs(i))
        if (regs(i) == 0) vZero += 1
        i += 1
      }
      val est = estNum / (10000L * s)
      val estimate =
        if (est <= small && vZero > 0L) table(vZero.toInt - 1)
        else est
      Iterator.single(HllEstimate(g, vZero, s, est, estimate))
    }
    items
      .groupByKey(_.g)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
  }
}

object StatefulSessionize {

  /** Stateful sessionization with flatMapGroupsWithState: per-user state is
    * (session count, last event time); a gap > gapMs opens a new session.
    * Emits the running per-user session count on every trigger (Update mode).
    */
  def run(spark: SparkSession, events: Dataset[SessionEvent],
      gapMs: Long): Dataset[UserSessions] = {
    import spark.implicits._
    def fn(userId: Long, it: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[UserSessions] = {
      var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
      it.toSeq.sortBy(e => e.ts.getTime).foreach { e =>
        val ms = e.ts.getTime
        if (st.lastMs == Long.MinValue || ms - st.lastMs > gapMs)
          st = SessionState(st.sessionCount + 1, ms)
        else st = st.copy(lastMs = ms)
      }
      state.update(st)
      Iterator.single(UserSessions(userId, st.sessionCount))
    }
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
  }

  /** Production-shaped sessionization with BOUNDED state: event-time
    * timeout tied to the watermark. A session is emitted (Append mode)
    * when no event arrives for `gapMs` past the watermark, and its state
    * is removed — so state size tracks the number of OPEN sessions, not
    * the number of users ever seen. The caller must `withWatermark` the
    * source before grouping (EventTimeTimeout requires it).
    */
  def runFinalizing(spark: SparkSession, events: Dataset[SessionEvent],
      gapMs: Long): Dataset[FinalSession] = {
    import spark.implicits._
    def fn(userId: Long, it: Iterator[SessionEvent],
        state: GroupState[OpenSession]): Iterator[FinalSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator.single(FinalSession(userId, s.nEvents, s.startMs, s.lastMs))
      }
      // per-trigger batch for one user: bounded by trigger size, sorted to
      // apply the gap rule in event order
      val sorted = it.toSeq.sortBy(_.ts.getTime)
      var open = state.getOption
      val closed = Seq.newBuilder[FinalSession]
      sorted.foreach { e =>
        val ms = e.ts.getTime
        open match {
          case Some(s) if ms - s.lastMs <= gapMs =>
            open = Some(s.copy(nEvents = s.nEvents + 1, lastMs = ms))
          case Some(s) =>
            closed += FinalSession(userId, s.nEvents, s.startMs, s.lastMs)
            open = Some(OpenSession(1L, ms, ms))
          case None =>
            open = Some(OpenSession(1L, ms, ms))
        }
      }
      open.foreach { s =>
        state.update(s)
        // Clamp to just past the watermark: flatMapGroupsWithState does not
        // auto-drop late rows, and a batch whose newest event already sits
        // behind the watermark (lastMs + gapMs < watermark) would make an
        // unclamped setTimeoutTimestamp throw and kill the query.
        state.setTimeoutTimestamp(
          math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs + 1))
      }
      closed.result().iterator
    }
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}

object WebIngestStream {

  /** Streaming twin of the web-ingest layer (q100/q108 → q111 routing →
    * q103 → q99 → q104 composed): captures arrive as a stream of
    * (ts, url, content_type, body) rows; each micro-batch ROUTES on the
    * declared media type first (q111's dispatch — html, text subtypes,
    * and application/pdf continue, the last through the bounded-subset
    * PdfText extractor exactly like the batch funnel's text chain;
    * image/binary/unlabeled captures drop here
    * rather than mangling through the HTML scanner; a batch-side
    * [[graft.sources.ContentRoute.routed]] pass is where a full
    * pipeline would count them), transcodes (labeled charset strictly,
    * charset-less text captures via the WHATWG sniff), extracts visible
    * text for the html route (plain text passes through), gates on the
    * encoding-garbage signals, and dedups on the canonical URL with
    * BOUNDED state
    * (dropDuplicatesWithinWatermark — one state entry per canonical URL
    * inside the watermark horizon, evicted as event time advances; a
    * crawl frontier's refetch window, not an unbounded seen-set).
    * Every kernel is map-side, so the only stateful operator is the
    * dedup — the streaming plan is scan → project → filter → dedup.
    *
    * `qualityGates = true` additionally gates each capture on the batch
    * quality batteries — the Gopher document rules ([[graft.functions
    * .GopherRules.pass]], q115) and the C4 page verdict
    * ([[graft.functions.C4Filters.keep]], q116) over the extracted text,
    * plus the URL filter battery ([[graft.functions.UrlFilter.annotate]],
    * q119) over the canonical URL when `urlBlockDim` supplies a
    * blocklist dim. All three are the SAME column expressions the batch
    * entries evaluate, so stream ≡ batch verdicts by construction
    * (StreamingSpec asserts it on a shared slice); the only non-map-side
    * addition is the blocklist's broadcast hash joins, which
    * stream-static joins run per micro-batch.
    */
  def cleanCaptures(captures: org.apache.spark.sql.DataFrame,
      watermark: String = "1 hour",
      qualityGates: Boolean = false,
      urlBlockDim: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.{C4Filters, GopherRules, HtmlText, TextStats,
      UrlFilter, UrlNorm}
    import graft.sources.{ContentRoute, WarcTranscode}
    val cs = WarcTranscode.charsetOf(col("content_type"))
    val utf8 = when(cs.isNotNull, WarcTranscode.utf8Text(col("body"), cs))
      .otherwise(WarcTranscode.sniffedText(col("body")))
    val route = ContentRoute.route(col("content_type"))
    // unlabeled captures DROP here, exactly like the batch router and
    // ContentRoute.routed: an unknown payload is either secretly html
    // (extracting without the label is a guess) or secretly plain text
    // (html-extracting it would tag-strip legitimate '<'), and the r12
    // streaming twin's html-extract-the-unknowns path mangled the latter
    // (ADVICE r12). Keeping the skip symmetric also makes the
    // stream ≡ batch parity specs exact rather than carve-out-laden.
    // Only the declared-html route runs the HTML scanner; pdf captures
    // run the bounded-subset extractor over the RAW bytes (q123 —
    // transcoding a binary container would corrupt it), with
    // out-of-subset PDFs yielding NULL text and dropping at the same
    // gate the batch funnel uses.
    captures
      .where(route.isin(ContentRoute.RouteHtml, ContentRoute.RoutePlain,
        ContentRoute.RoutePdf))
      .withColumn("page_text",
        when(route === ContentRoute.RouteHtml,
          // robots-meta noindex drops here exactly like the batch
          // funnel: NULL text into the shared gate (q125 parity)
          when(!graft.functions.RobotsMeta.noindex(utf8),
            HtmlText.extract(utf8)))
          .when(route === ContentRoute.RoutePdf,
            element_at(graft.functions.F.pdfExtract(col("body")), 1))
          .otherwise(utf8))
      .where(col("page_text").isNotNull &&
        TextStats.replacementCount(col("page_text")) +
        TextStats.mojibakeCount(col("page_text")) +
        TextStats.controlCharCount(col("page_text")) === 0)
      .withColumn("url_canon", UrlNorm.canonicalize(col("url")))
      .where(col("url_canon").isNotNull)
      .transform { df =>
        if (!qualityGates) df
        else {
          val g = df.where(GopherRules.pass(col("page_text")) &&
            C4Filters.keep(col("page_text")))
          urlBlockDim.fold(g)(dim =>
            UrlFilter.annotate(g, "url_canon", dim).where(col("url_ok")))
        }
      }
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("url_canon")
      .select(col("ts"), col("url_canon"), col("page_text"))
  }
}

/** Streaming twin of the q137b persisted-index dedup probe — the
  * production near-dup GATE at micro-batch cadence: new documents
  * arrive as a stream, each micro-batch computes its OWN minhash
  * signatures (map-side column kernels) and runs the SAME probe body
  * as the batch path against the bucketed index tables, emitting the
  * q137 verdict shape (best index match or novelty). foreachBatch is
  * the right engine surface here — the probe's occupancy census and
  * best-match aggregations are per-batch batch semantics, not
  * cross-batch state (the index IS the cross-batch state, owned by the
  * absorb step, not by stream state) — and because the per-batch body
  * is literally [[graft.dedup.MinHashDedup.probePersisted]] +
  * [[graft.dedup.MinHashDedup.bestMatch]], stream ≡ batch verdicts by
  * construction (StreamingSpec asserts it on a shared slice). The
  * index side of every probe join arrives pre-bucketed — zero
  * index-side exchange per micro-batch.
  */
object StreamDedupProbe {

  /** The per-micro-batch body: signatures → persisted-index probe →
    * verdicts. Also usable directly on any batch frame.
    */
  def probeBatch(tableBase: String, docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, shingleK: Int = 3,
      numPerms: Int = 128, bands: Int = 16, minJaccardPct: Int = 50,
      maxBucket: Int = 256): org.apache.spark.sql.DataFrame = {
    import graft.dedup.MinHashDedup
    val sigs = MinHashDedup.signatures(docs, idCol, textCol, shingleK,
      numPerms, bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cand = MinHashDedup.probePersisted(docs.sparkSession, tableBase,
        sigs, numPerms, minJaccardPct, maxBucket)
      MinHashDedup.bestMatch(sigs, cand)
        .localCheckpoint(true) // materialize before the cache drops
    } finally sigs.unpersist(false)
  }

  /** Wire a document stream through [[probeBatch]] into a parquet
    * verdict sink (append — one file set per micro-batch).
    */
  def start(stream: org.apache.spark.sql.DataFrame, tableBase: String,
      idCol: String, textCol: String, outPath: String,
      checkpoint: String, shingleK: Int = 3, numPerms: Int = 128,
      bands: Int = 16, minJaccardPct: Int = 50, maxBucket: Int = 256)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        probeBatch(tableBase, batch, idCol, textCol, shingleK, numPerms,
          bands, minJaccardPct, maxBucket)
          .write.mode("append").parquet(outPath)
      }
      .start()

  /** The absorb leg of the streaming loop: append the batch's NOVEL
    * docs' signatures into the index so the NEXT micro-batch dedups
    * against them. Replay-safe by construction: ids already present in
    * the index anti-join away before the append, so a foreachBatch
    * replay (or an at-least-once source redelivering a batch) absorbs
    * NOTHING the first run already absorbed — the absorb is effectively
    * exactly-once even though the engine's contract is at-least-once.
    * The anti-join reads only the id column of the id-bucketed payload
    * table (the batch side, small, shuffles into its layout). The
    * candidate frame snapshots via localCheckpoint BEFORE the append
    * mutates the very tables it read.
    */
  def absorbNovel(tableBase: String,
      sigs: org.apache.spark.sql.DataFrame,
      verdicts: org.apache.spark.sql.DataFrame,
      numBuckets: Int = 32): Unit = {
    import graft.dedup.MinHashDedup
    val novel = verdicts.where(col("is_novel"))
      .select(col("doc_id").as("id"))
    val existing = sigs.sparkSession
      .table(s"${tableBase}_sigs").select(col("id"))
    val toAbsorb = sigs.join(novel, "id")
      .join(existing, Seq("id"), "left_anti")
      .localCheckpoint(true)
    if (!toAbsorb.isEmpty)
      MinHashDedup.absorbIndex(toAbsorb, tableBase, numBuckets)
  }

  /** [[probeBatch]] + [[absorbNovel]] in one per-micro-batch body: the
    * verdicts are computed against the index AS OF the batch start
    * (docs within one batch never match each other — intra-batch pairs
    * are q17's job, not the gate's), then the novel docs join the index
    * for every batch after. Candidates whose index entry carries an id
    * in THIS batch anti-join away — that covers a replayed doc's own
    * absorbed signature AND the signatures of its batch-mates absorbed
    * on the first run, so a replay reproduces the first run's verdicts
    * for the whole batch, intra-batch near-dup groups included
    * (ADVICE r15: self-exclusion alone let a replay report A as a dup
    * of batch-mate B). Sound because foreachBatch replays a checkpointed
    * batch with IDENTICAL contents — an id in both the batch and the
    * index is always a redelivery, never fresh data. The verdict SINK
    * stays at-least-once (downstream dedups by doc_id — the standard
    * foreachBatch posture), and rows it holds for one doc_id now agree;
    * the absorb itself is replay-proof.
    */
  def probeAndAbsorbBatch(tableBase: String,
      docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, shingleK: Int = 3, numPerms: Int = 128,
      bands: Int = 16, minJaccardPct: Int = 50, maxBucket: Int = 256,
      numBuckets: Int = 32): org.apache.spark.sql.DataFrame = {
    import graft.dedup.MinHashDedup
    val sigs = MinHashDedup.signatures(docs, idCol, textCol, shingleK,
      numPerms, bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cand = MinHashDedup.probePersisted(docs.sparkSession,
        tableBase, sigs, numPerms, minJaccardPct, maxBucket)
        .join(sigs.select(col("id").as("id_idx")), Seq("id_idx"),
          "left_anti")
      val verdicts = MinHashDedup.bestMatch(sigs, cand)
        .localCheckpoint(true)
      absorbNovel(tableBase, sigs, verdicts, numBuckets)
      verdicts
    } finally sigs.unpersist(false)
  }

  /** Wire a document stream through [[probeAndAbsorbBatch]] — the
    * CLOSED streaming loop: probe, emit verdicts, absorb novelties, so
    * the index grows with the stream and near-dups across micro-batches
    * are caught without any rebuild.
    */
  def startWithAbsorb(stream: org.apache.spark.sql.DataFrame,
      tableBase: String, idCol: String, textCol: String, outPath: String,
      checkpoint: String, shingleK: Int = 3, numPerms: Int = 128,
      bands: Int = 16, minJaccardPct: Int = 50, maxBucket: Int = 256,
      numBuckets: Int = 32)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        probeAndAbsorbBatch(tableBase, batch, idCol, textCol, shingleK,
          numPerms, bands, minJaccardPct, maxBucket, numBuckets)
          .write.mode("append").parquet(outPath)
      }
      .start()
}
