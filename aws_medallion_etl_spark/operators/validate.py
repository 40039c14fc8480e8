"""Rule-driven validation: reject-reason compilation, valid/invalid
split, and the rejection-rate circuit breaker.

Re-expresses the reference's bronze validation pattern
(``Meta_Guideline.md:930-986`` — a chained ``F.when`` building a
``reject_reason`` column, two filters, and a >10% circuit breaker,
gate rule ``requirements/meta/meta_module_06_requirements.md:58-60``).

Scale notes: the reference re-scans the input 3-5x by calling
``.count()`` per branch (SURVEY.md §7.4.4). Here all gate counts come
from ONE aggregate over the tagged frame, and the valid/reject split
re-uses the tagged frame so the whole path is two scans worst-case
(one if the caller persists); the when-chain itself is a narrow,
codegen'd projection — no shuffle at any SF.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REJECT_REASON = "reject_reason"


@dataclass(frozen=True)
class Rule:
    """A validation rule: rows matching ``predicate`` are rejected with ``reason``.

    Earlier rules win when several match (same first-match-wins semantics as
    the reference's when-chain).
    """

    reason: str
    predicate: Column


def null_or_blank(col: str) -> Column:
    """Required-string predicate: NULL or empty after trim."""
    return F.col(col).isNull() | (F.trim(F.col(col)) == "")


def compile_rules(rules: list[Rule]) -> Column:
    """Fold rules into a single first-match-wins ``reject_reason`` expression."""
    if not rules:
        return F.lit(None).cast("string")
    expr = F.when(rules[0].predicate, F.lit(rules[0].reason))
    for rule in rules[1:]:
        expr = expr.when(rule.predicate, F.lit(rule.reason))
    return expr.otherwise(F.lit(None))


def tag_rejects(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Add the ``reject_reason`` column (NULL = valid row)."""
    return df.withColumn(REJECT_REASON, compile_rules(rules))


def split_valid_invalid(df: DataFrame, rules: list[Rule]) -> tuple[DataFrame, DataFrame]:
    """(valid_rows_without_reason_col, rejected_rows_with_reason)."""
    tagged = tag_rejects(df, rules)
    valid = tagged.filter(F.col(REJECT_REASON).isNull()).drop(REJECT_REASON)
    rejects = tagged.filter(F.col(REJECT_REASON).isNotNull())
    return valid, rejects


def validation_stats(tagged: DataFrame) -> dict:
    """Single-pass gate metrics: total / valid / rejected (+ per-reason).

    ONE job — a groupBy on the reason column (NULL group = valid rows)
    collected once; totals derive driver-side. At most
    ``len(rules)+1`` rows reach the driver, and the input is scanned
    exactly once (the reference re-scans per ``.count()``,
    SURVEY.md §7.4.4).
    """
    per_reason = (
        tagged.groupBy(REJECT_REASON).agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    by_reason = {r[REJECT_REASON]: r["cnt"] for r in per_reason if r[REJECT_REASON]}
    nrej = sum(by_reason.values())
    total = sum(r["cnt"] for r in per_reason)
    return {
        "total": total,
        "valid": total - nrej,
        "rejected": nrej,
        "rejection_rate": (nrej / total) if total else 0.0,
        "by_reason": by_reason,
    }


class CircuitBreakerError(RuntimeError):
    """Raised when the rejection rate exceeds the gate threshold."""


def circuit_breaker(stats: dict, threshold: float = 0.10) -> None:
    """Fail the run BEFORE any downstream write if too many rows reject.

    Same gate as the reference (``Meta_Guideline.md:955-967``,
    threshold from ``boto3_deployment/config/dev.yaml:77-84``).
    """
    rate = stats["rejection_rate"]
    if rate > threshold:
        raise CircuitBreakerError(
            f"rejection rate {rate:.2%} exceeds threshold {threshold:.0%} "
            f"({stats['rejected']}/{stats['total']} rows): {stats['by_reason']}"
        )
