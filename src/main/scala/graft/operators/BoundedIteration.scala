package graft.operators

import org.apache.spark.sql.DataFrame

/** The shared driver for bounded iterative dataflows (PageRank q98, BFS
  * q104, connected components q47 — and any future WITH RECURSIVE-shaped
  * operator): cache-aware loop, eager `localCheckpoint` per round,
  * optional convergence predicate.
  *
  * Why a driver at all: Spark has no native bounded-recursion operator,
  * and naively looping `DataFrame => DataFrame` builds a k-join plan
  * tower that overwhelms Catalyst and pins the full lineage in memory.
  * The contract here is the one the three call sites converged on
  * independently:
  *
  *   - every round's state is `localCheckpoint(eager = true)`-ed:
  *     materialized, lineage truncated — so round k+1 plans against a
  *     checkpoint scan (O(1)-deep at any k) and AQE re-plans each round
  *     on REAL sizes (frontier shrink, label stabilization);
  *   - superseded rounds' blocks are released by the ContextCleaner once
  *     unreferenced (sessions run `spark.cleaner.periodicGC.interval`
  *     tuned down for long sweeps);
  *   - convergence is CHECKED against the materialized state (prev vs
  *     next), never assumed from theory; `requireConvergence` turns
  *     silent non-convergence into an error for algorithms (like label
  *     propagation) whose output is wrong if stopped early.
  *
  * State is ONE DataFrame by design: multi-piece loop state (e.g. BFS's
  * visited+frontier) rides along as columns (`hops` marks the frontier),
  * which is also what makes each round's state a single resumable
  * artifact at 100 TB — a killed job restarts from the last round's
  * table, not from scratch.
  */
object BoundedIteration {

  /** Iterate `step` up to `maxRounds` times from `init`.
    *
    * @param init      round-0 state (checkpointed before the first step)
    * @param maxRounds hard iteration bound (the "bounded" in the name)
    * @param converged (prev, next, round) => stop? — evaluated AFTER each
    *                  step on materialized state; default never stops early
    * @param requireConvergence error out if maxRounds elapse without
    *                  `converged` — for algorithms wrong when truncated
    * @param step      (state, round) => next state; round is 0-based
    * @return the final materialized state
    */
  def fixpoint(
      init: DataFrame,
      maxRounds: Int,
      converged: (DataFrame, DataFrame, Int) => Boolean = (_, _, _) => false,
      requireConvergence: Boolean = false)(
      step: (DataFrame, Int) => DataFrame): DataFrame = {
    var state = init.localCheckpoint(eager = true)
    var round = 0
    var done = false
    while (round < maxRounds && !done) {
      val next = step(state, round).localCheckpoint(eager = true)
      done = converged(state, next, round)
      state = next
      round += 1
    }
    require(!requireConvergence || done,
      s"iteration did not converge in $maxRounds rounds")
    state
  }
}
