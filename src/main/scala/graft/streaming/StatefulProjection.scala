package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.eventstore.{Event, Fold, ProjRow}

/** The live execution of an arbitrary (possibly non-commutative)
  * projection fold — photon's core operator (reference streams.clj:
  * 125-161: one event at a time, in order, state in an STM ref) mapped to
  * flatMapGroupsWithState: state lives in Spark's state store, sharded by
  * stream_name, checkpointed (photon rebuilds state by re-folding the log
  * on restart, streams.clj:255-259; here the state store IS the resume
  * point — same capability, exactly-once).
  *
  * Ordering: events are folded in order_id order within each micro-batch
  * (in-batch sort below); across batches the append-only log guarantees
  * arrival order. Failure semantics mirror the reference (streams.clj:
  * 90-97): the first error freezes the state at the last good value and
  * the descriptor carries status=failed + the error.
  */
object StatefulProjection {

  final case class ProjState[S](
      value: S, processed: Long, error: Option[String], stepNs: Long = 0L)

  /** Product-encoded state (S concrete at the call site; with
    * `import spark.implicits._` the ProjState encoder derives). */
  def run[S](events: Dataset[Event], fold: Fold[S])(
      implicit stateEnc: Encoder[ProjState[S]],
      encRow: Encoder[ProjRow[S]]): Dataset[ProjRow[S]] =
    runWithEncoders(events, fold)

  /** Simpler entry: the state is encoded with the Kryo fallback (opaque
    * blob) — fine for projection state, which is only read back by this
    * operator. Use `run` with product encoders where S is a case class
    * and columnar state matters. */
  def runKryo[S](events: Dataset[Event], fold: Fold[S])(
      implicit encRow: Encoder[ProjRow[S]]): Dataset[ProjRow[S]] = {
    implicit val stateEnc: Encoder[ProjState[S]] = Encoders.kryo[ProjState[S]]
    runWithEncoders(events, fold)
  }

  private def runWithEncoders[S](events: Dataset[Event], fold: Fold[S])(
      implicit stateEnc: Encoder[ProjState[S]],
      encRow: Encoder[ProjRow[S]]): Dataset[ProjRow[S]] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.stream_name)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (stream: String, it: Iterator[Event], state: GroupState[ProjState[S]]) =>
          val prev = state.getOption.getOrElse(ProjState(fold.initial, 0L, None))
          var s = prev.value
          var n = prev.processed
          var ns = prev.stepNs
          var err = prev.error
          // in-batch replay order = order_id order (the reference's
          // single-threaded in-order guarantee)
          it.toArray.sortBy(_.order_id).foreach { e =>
            if (err.isEmpty) {
              val t0 = System.nanoTime()
              try { s = fold.step(s, e); n += 1 }
              catch { case ex if scala.util.control.NonFatal(ex) =>
                err = Some(s"${ex.getClass.getName}: ${ex.getMessage}")
              }
              ns += System.nanoTime() - t0
            }
          }
          state.update(ProjState(s, n, err, ns))
          val bytes = Option(s).map(_.toString.getBytes("UTF-8").length.toLong)
            .getOrElse(0L)
          Iterator.single(ProjRow(fold.name, stream, s, n,
            if (err.isDefined) "failed" else "running", err,
            if (n > 0) ns / 1000.0 / n else 0.0, bytes))
      }
  }
}
