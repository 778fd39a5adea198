"""Streaming data-quality gate with a real abort path.

A production CDC pipeline validates each micro-batch BEFORE it lands
(the reference fail-fast phase validators, reference
tools/master_orchestrator.py:552-630: every phase checks its output
and aborts the run on breach). This operator evaluates a set of
violation predicates per micro-batch inside ``foreachBatch``,
accumulates exact integer totals driver-side, and — when a budget is
given — RAISES on the first cumulative breach, stopping the stream
while preserving the partial totals for the post-mortem.

Semantics pinned here (each is a test in tests/test_streaming.py):

- **At-least-once safe**: Spark may re-execute a micro-batch after a
  failure; accumulation is keyed by ``batch_id`` and a replayed id is
  skipped, so totals never double-count (ADVICE r5).
- **Abort is an exception, not a comment**: a breached budget raises
  :class:`DQBudgetExceeded` inside the batch function; Spark surfaces
  it as ``StreamingQueryException`` at ``awaitTermination`` and this
  module unwraps it back to the typed error with ``totals`` attached.
- **Driver state is bounded**: one integer per check plus the seen-id
  set (one int per micro-batch) — nothing scales with data volume.

Scale notes: the per-batch work is ONE whole-stage-codegen aggregate
producing a single row (conditional sums — map-side combined), so the
gate adds no shuffle beyond the final 1-row agg; at 1000 executors
the batch aggregate is the same shape as any global agg.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryException


class DQBudgetExceeded(RuntimeError):
    """A cumulative violation count crossed its budget.

    Carries the breaching ``check``, its ``violations`` count, the
    ``budget``, and a snapshot of ALL partial ``totals`` at abort
    time — the post-mortem a production gate owes its operator.
    """

    def __init__(
        self, check: str, violations: int, budget: int,
        totals: dict[str, int],
    ) -> None:
        self.check = check
        self.violations = violations
        self.budget = budget
        self.totals = dict(totals)
        super().__init__(
            f"DQ gate abort: {check}={violations} exceeds budget {budget} "
            f"(totals at abort: {self.totals})"
        )


class DQGate:
    """The ``foreachBatch`` callable: per-batch conditional-sum
    aggregate, batch-id-guarded accumulation, budget enforcement.

    Separated from :func:`run_dq_gate` so the replay guard and abort
    arithmetic are unit-testable with plain static DataFrames —
    ``foreachBatch`` hands the function an ordinary DataFrame anyway.
    """

    def __init__(
        self,
        checks: Mapping[str, Column],
        budgets: Mapping[str, int] | None = None,
    ) -> None:
        self.checks = dict(checks)
        self.budgets = dict(budgets or {})
        unknown = set(self.budgets) - set(self.checks)
        if unknown:
            raise ValueError(f"budgets for unknown checks: {sorted(unknown)}")
        self.totals: dict[str, int] = {"rows_scanned": 0}
        self.totals.update({name: 0 for name in self.checks})
        self.seen: set[int] = set()
        # foreachBatch exceptions reach awaitTermination wrapped (and
        # py4j-mangled); the original is kept here so the caller gets
        # the typed error, not a string to parse.
        self.abort: DQBudgetExceeded | None = None

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self.seen:  # replayed batch — already counted
            return
        row = batch_df.agg(
            F.count("*").alias("rows_scanned"),
            *[
                F.sum(pred.cast("long")).alias(name)
                for name, pred in self.checks.items()
            ],
        ).first()  # one bounded row per batch
        for k in self.totals:
            self.totals[k] += row[k] or 0
        self.seen.add(batch_id)
        for name, budget in self.budgets.items():
            if self.totals[name] > budget:
                self.abort = DQBudgetExceeded(
                    name, self.totals[name], budget, self.totals
                )
                raise self.abort


def run_dq_gate(
    stream: DataFrame,
    checks: Mapping[str, Column],
    checkpoint: str,
    budgets: Mapping[str, int] | None = None,
) -> dict[str, int]:
    """Run ``stream`` to completion (availableNow) through a per-batch
    DQ gate; return exact violation totals plus ``rows_scanned``.

    ``checks`` maps check name -> BOOLEAN violation predicate (true =
    the row violates). ``budgets`` maps check name -> max cumulative
    violations tolerated; the first batch that pushes a check past its
    budget aborts the stream with :class:`DQBudgetExceeded` carrying
    the partial totals accumulated up to the abort.
    """
    gate = DQGate(checks, budgets)
    query = (
        stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination()
    except StreamingQueryException:
        if gate.abort is not None:
            raise gate.abort from None
        raise
    return gate.totals
