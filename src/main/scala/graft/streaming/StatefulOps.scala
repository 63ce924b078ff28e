package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.FlightEvent

/**
 * Stateful streaming operators beyond the reference's window accumulators —
 * the pieces a production event pipeline needs that the reference lacks:
 *
 *  - exact streaming dedup with bounded state (watermark + dropDuplicates):
 *    the streaming analogue of the batch dedup family in
 *    [[graft.operators.Dedup]];
 *  - running per-key totals via mapGroupsWithState (the
 *    `KeyValueGroupedDataset` custom-state path — Flink's
 *    KeyedProcessFunction analogue) with processing-time state timeout.
 *
 * State sizing at scale: dedup state is bounded by (watermark horizon ×
 * arrival rate); running totals are bounded by live key cardinality ×
 * timeout. Both live in the checkpointed StateStore (RocksDB on a real
 * cluster), spilling off-heap — no driver-side state anywhere.
 */
object StatefulOps {

  /** Exact dedup on `idCols` with state bounded by the watermark horizon:
    * events older than the watermark can no longer create duplicates, so
    * their keys age out of the store. */
  def dedupStream(parsed: DataFrame, timeCol: String, watermark: String,
      idCols: Seq[String]): DataFrame =
    parsed.withWatermark(timeCol, watermark)
      .dropDuplicates(idCols :+ timeCol)

  final case class RunningTotals(
      airline: String, total_flights: Long, delayed_flights: Long,
      total_delay_minutes: Long)

  /**
   * Running (non-windowed) per-airline totals — state the reference cannot
   * express at all (its aggregates reset every window). Emits the updated
   * totals for each airline seen in the micro-batch; state for airlines idle
   * past `timeout` is dropped.
   */
  def runningAirlineTotals(parsed: Dataset[FlightEvent],
      timeout: Option[String] = None): Dataset[RunningTotals] = {
    import parsed.sparkSession.implicits._
    // Note: a processing-time timeout makes the engine schedule continuous
    // no-data batches to fire expirations — correct in production, but it
    // never quiesces, so deterministic harnesses (processAllAvailable) use
    // NoTimeout. State then lives until the query stops.
    val mode = if (timeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
               else GroupStateTimeout.NoTimeout
    parsed.groupByKey(_.airline)
      .mapGroupsWithState[RunningTotals, RunningTotals](mode) {
        (airline: String, events: Iterator[FlightEvent], state: GroupState[RunningTotals]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val prev = state.getOption.getOrElse(RunningTotals(airline, 0L, 0L, 0L))
            val next = events.foldLeft(prev) { (acc, e) =>
              RunningTotals(airline,
                acc.total_flights + 1,
                acc.delayed_flights + e.is_delayed,
                acc.total_delay_minutes + e.delay_minutes)
            }
            state.update(next)
            timeout.foreach(state.setTimeoutDuration)
            next
          }
      }
  }

  final case class BucketMember(doc_id: Long, sig: Seq[Long])
  final case class BucketState(members: List[BucketMember])
  final case class NearDupHit(doc_a: Long, doc_b: Long, est_jaccard: Double)

  /**
   * Streaming near-duplicate detection — continuous-ingest dedup, the thing
   * batch LSH cannot give you without recomputing the corpus: each arriving
   * document is checked against previously seen documents IN ITS LSH BUCKETS
   * and collision pairs are emitted immediately, across micro-batch
   * boundaries.
   *
   * Dataflow: per-row MinHash signature ([[graft.operators.Dedup
   * .minhashSignatureArray]], a pure projection — no aggregation, so it
   * composes into an append stream) → posexplode per-band buckets → group by
   * (band, bucket) → flatMapGroupsWithState holding the bucket's members.
   * Similarity is estimated from signature agreement (the MinHash estimator);
   * verify exact Jaccard downstream if needed.
   *
   * State sizing: per bucket, at most `maxPerBucket` members (the hot-bucket
   * cap — overflow docs are still compared against the resident set but not
   * added); across buckets, total state = live bucket keys × that bound,
   * which grows with distinct content unless `timeout` is set. Pass a
   * processing-time `timeout` in production so idle buckets age out
   * (documents stop colliding with content older than the horizon — the
   * streaming analogue of a dedup lookback window); deterministic test
   * harnesses leave it None because a processing-time timeout schedules
   * no-data batches and never quiesces. The same pair can emit from multiple
   * bands — run `dropDuplicates("doc_a","doc_b")` downstream if exact-once
   * pairs matter.
   */
  def nearDupStream(docs: DataFrame, idCol: String, textCol: String,
      minEstJaccard: Double = 0.5, maxPerBucket: Int = 64,
      timeout: Option[String] = None): Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._
    val banded = docs
      // hashes and signature staged as separate projections: the signature
      // folds reference the hash array numPerms times, and only a bound
      // column reference is cheap to repeat (see Dedup.minhashHashes)
      .select(col(idCol).cast("long").as("doc_id"),
        graft.operators.Dedup.minhashHashes(col(textCol)).as("hs"))
      .select(col("doc_id"),
        graft.operators.Dedup.minhashSignatureArrayOfHashes(col("hs")).as("sig"))
      .select(col("doc_id"), col("sig"),
        posexplode(graft.operators.Dedup.bandBucketArray(col("sig")))
          .as(Seq("band", "bucket")))
      .select(concat_ws(":", col("band"), col("bucket")).as("bkey"),
        col("doc_id"), col("sig"))
      .as[(String, Long, Seq[Long])]
    val mode = if (timeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
               else GroupStateTimeout.NoTimeout
    banded.groupByKey(_._1)
      .flatMapGroupsWithState[BucketState, NearDupHit](OutputMode.Append, mode) {
        (_: String, rows: Iterator[(String, Long, Seq[Long])], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle bucket ages out of the store
            Iterator.empty
          } else {
            var members = state.getOption.getOrElse(BucketState(Nil)).members
            val out = List.newBuilder[NearDupHit]
            // deterministic processing order within the micro-batch
            rows.toSeq.sortBy(_._2).foreach { case (_, docId, sig) =>
              if (!members.exists(_.doc_id == docId)) {
                members.foreach { m =>
                  val agree = m.sig.zip(sig).count { case (x, y) => x == y }
                  val est = agree.toDouble / m.sig.length
                  if (est >= minEstJaccard) {
                    out += (if (m.doc_id < docId) NearDupHit(m.doc_id, docId, est)
                            else NearDupHit(docId, m.doc_id, est))
                  }
                }
                if (members.size < maxPerBucket) members = BucketMember(docId, sig) :: members
              }
            }
            state.update(BucketState(members))
            timeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  final case class CellMember(vec_id: Long, ve: Seq[Double], vnorm: Double)
  final case class CellState(members: List[CellMember])
  final case class SemVerdict(vec_id: Long, cell_id: Int, cell_cos: Double,
      sem_keep: Int)

  /**
   * Streaming semantic dedup — the continuous-ingest admission form of
   * [[graft.operators.Dedup.semanticDedup]] (SemDeDup, Abbas et al. 2023):
   * centroids are a batch-trained static artifact
   * ([[graft.operators.Similarity.kmeansCentroids]]); each arriving vector
   * is assigned to its nearest cell by a pure-projection literal fold
   * ([[graft.operators.Similarity.assignCellsStatic]] — no window, streams
   * in append mode) and then compared, IN ITS CELL ONLY, against the
   * vectors already admitted there. Cosine ≥ `tau` to any resident →
   * `sem_keep = 0` (rejected, not added); otherwise admitted.
   *
   * Semantics note (same trade as the batch incremental-admission path,
   * `Dedup.scala`): verdicts compare against the RETAINED set, not all
   * prior arrivals — a vector similar only to an already-rejected one is
   * admitted. Batch `semanticDedup`'s pair rule drops against any lower-id
   * mate; on chain-free data (no A~B~C with A!~C) the two agree row for
   * row, and the admission form is the one a continuously-growing corpus
   * actually wants (nothing is ever compared against discarded data).
   *
   * State sizing: per cell at most `maxPerCell` vectors (overflow arrivals
   * are still verdicted against the resident set but not added — the
   * nearDupStream anchor-cap trade); cells idle past `timeout` age out in
   * production, None under deterministic harnesses.
   */
  def semanticDedupStream(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: Array[(Int, Seq[Double])], tau: Double,
      maxPerCell: Int = 1024, timeout: Option[String] = None): Dataset[SemVerdict] = {
    import vecs.sparkSession.implicits._
    val assigned = graft.operators.Similarity
      .assignCellsStatic(vecs, centroids, idCol, vecCol)
      .select(col("vec_id").cast("long"), col("cell_id"), col("cell_cos"),
        col("ve"), col("vnorm"))
      .as[(Long, Int, Double, Seq[Double], Double)]
    val mode = if (timeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
               else GroupStateTimeout.NoTimeout
    assigned.groupByKey(_._2)
      .flatMapGroupsWithState[CellState, SemVerdict](OutputMode.Append, mode) {
        (cellId: Int, rows: Iterator[(Long, Int, Double, Seq[Double], Double)],
            state: GroupState[CellState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var members = state.getOption.getOrElse(CellState(Nil)).members
            val out = List.newBuilder[SemVerdict]
            // deterministic processing order within the micro-batch
            rows.toSeq.sortBy(_._1).foreach { case (vecId, _, cellCos, ve, vnorm) =>
              if (!members.exists(_.vec_id == vecId)) {
                val dup = members.exists { m =>
                  val dot = m.ve.lazyZip(ve).map(_ * _).sum
                  dot / (m.vnorm * vnorm) >= tau
                }
                out += SemVerdict(vecId, cellId, cellCos, if (dup) 0 else 1)
                if (!dup && members.size < maxPerCell)
                  members = CellMember(vecId, ve, vnorm) :: members
              }
            }
            state.update(CellState(members))
            timeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  final case class SessionState(startMs: Long, endMs: Long, n: Long)
  final case class UserSession(user_id: String, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  /**
   * Streaming gap sessionization: per key, consecutive events closer than
   * `gapMs` belong to one session; a session CLOSES (and emits exactly once,
   * append mode) when the event-time watermark passes its end + gap — the
   * event-time-timeout pattern, deterministic under test harnesses because
   * timeouts fire on watermark advance, not wall clock (unlike the
   * processing-time timeouts above). This is the hand-rolled analogue of the
   * built-in `session_window` aggregation, for when the session needs custom
   * state (distinct pages, funnels, abandonment flags) rather than plain
   * aggregates.
   *
   * Mechanics: a micro-batch's events for a key are folded in time order —
   * gaps inside the batch emit closed sessions immediately; the trailing
   * open session parks in state with `setTimeoutTimestamp(end + gap)`. The
   * timeout callback (fired once the watermark crosses it) emits and clears.
   * If new events arrive before the callback fires but beyond the gap, the
   * data path closes the stale session itself — both orders converge on the
   * same session set. State per key is O(1); keys age out at watermark+gap.
   */
  def sessionizeStream(events: DataFrame, keyCol: String, timeCol: String,
      watermark: String, gapMs: Long): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    // the watermarked event-time column must itself reach the stateful
    // operator (watermark metadata rides on the column — projecting it to a
    // long would fail the event-time-timeout analysis check)
    val keyed = events
      .withWatermark(timeCol, watermark)
      .select(col(keyCol).cast("string").as("k"), col(timeCol).as("t"))
      .as[(String, java.sql.Timestamp)]
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, java.sql.Timestamp)], state: GroupState[SessionState]) =>
          def emit(s: SessionState) = UserSession(key,
            new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs), s.n)
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator.single(emit(last))
          } else {
            // Timeline interval merge, mirroring the built-in session_window
            // exactly: the parked session (an interval) and this batch's
            // events (points), sorted by start, fold under the gap rule with
            // TRANSITIVE merges — a chain of stragglers bridges back into
            // the parked session only if every hop is within the gap. A late
            // event more than gapMs before the parked start forms its OWN
            // earlier session (windows [t, t+gap) and [start, end+gap)
            // don't overlap), so it cannot drag session_start arbitrarily
            // far back — reachable whenever watermark delay > gap.
            val items = (state.getOption.toSeq ++
              rows.map(r => SessionState(r._2.getTime, r._2.getTime, 1L)))
              .sortBy(s => (s.startMs, s.endMs))
            val merged = items.foldLeft(List.empty[SessionState]) { (acc, iv) =>
              acc match {
                case h :: tl if iv.startMs - h.endMs <= gapMs =>
                  SessionState(h.startMs, math.max(h.endMs, iv.endMs),
                    h.n + iv.n) :: tl
                case _ => iv :: acc
              }
            }.reverse
            // every interval but the last is gap-closed inside the data path
            // (or lies entirely behind the parked session) — emit now; the
            // last parks with an event-time timeout at end + gap.
            val out = merged.dropRight(1).map(emit)
            merged.lastOption.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            out.iterator
          }
      }
  }

  /** Typed view of the parsed stream for the stateful operators. */
  def typed(parsed: DataFrame): Dataset[FlightEvent] = {
    import parsed.sparkSession.implicits._
    parsed.select(
      col("flight_id"), col("flight_number"), col("airline"), col("origin"),
      col("destination"), col("scheduled_time"), col("actual_time"),
      col("is_delayed"), col("user_id"), col("delay_minutes")
    ).as[FlightEvent]
  }
}
