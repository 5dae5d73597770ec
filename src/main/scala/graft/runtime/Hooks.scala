package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.spec.StreamSpec

/** Client hook surface (F9/F10/B7 — reference entity/hook.go, applied at
  * internal/pkg/engine/executor.go:202-234).
  *
  * The pre-transform hook runs per raw event BEFORE the compiled transform,
  * and can enrich (return modified JSON), skip the event (counted
  * successful), raise retryable/unretryable errors, or request stream
  * shutdown — the exact action algebra of the reference. It executes
  * distributed (a Dataset.map over the batch), so enrichment logic scales
  * with partitions; only the action tallies come back to the driver.
  *
  * The post-transform hook is a `DataFrame => DataFrame` stage per branch —
  * the idiomatic Spark form of mutating the Transformed output.
  */
object Hooks {
  sealed trait HookAction extends Serializable
  /** Continue with (possibly modified) event bytes. */
  final case class Proceed(event: String) extends HookAction
  /** Silently drop the event; counts as successfully processed. */
  case object Skip extends HookAction
  /** Transient failure: the engine re-applies the hook up to
    * maxEventProcessingRetries, then treats the event as unretryable.
    */
  case object RetryableError extends HookAction
  /** Permanent failure: event routed per the stream's houe policy. */
  case object UnretryableError extends HookAction
  /** Stop the stream after this batch (executor.go:253-280). */
  case object Shutdown extends HookAction

  type PreTransformHook = (String, String) => HookAction // (streamId, rawEventJson)
  type PostTransformStage = (StreamSpec, DataFrame) => DataFrame
}
