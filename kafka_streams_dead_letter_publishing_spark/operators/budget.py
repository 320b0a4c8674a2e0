"""Token-budget corpus sampling ([EXT]): select a deterministic subset of
a corpus whose cumulative token count fills a budget — the mixture-building
step of a pretraining data pipeline ("give me ~N tokens of this source,
chosen uniformly and reproducibly") — and, with ``group_col``, the full
mixture form ("40% web, 30% books, 30% code" as per-source budgets).

Semantics: order documents by ``md5(id)`` (a deterministic uniform
shuffle — no RNG, so re-runs and the DuckDB oracle agree byte-for-byte),
walk that order accumulating each document's token count, and keep every
document whose RUNNING total is still within the budget (greedy
take-until-budget; the first overflowing document is excluded).

Scale posture — the whole point of this operator: the naive form is a
global cumulative-sum window (``Window.orderBy(hash)``), which Spark
plans as ``Exchange SinglePartition`` — every row through ONE task, the
classic scale killer.  This implementation is the distributed two-phase
prefix-sum instead:

1. bucket every row by a PREFIX of its hash (``bucket_chars`` hex chars,
   e.g. 3 → 4096 buckets), so hash order == (bucket, hash) order;
2. one hash-aggregate computes per-bucket token sums — k rows of
   metadata collected to the driver (k = #buckets, like the k×d centroid
   collects in ``operators/kmeans.py``: bounded by config, not by data);
3. the driver prefix-sums the k bucket totals into per-bucket OFFSETS,
   broadcast back;
4. one window partitioned BY BUCKET computes within-bucket running sums
   in parallel; offset + within-bucket sum == the exact global running
   sum.

At 100 TB with 4096 buckets each bucket holds ~1/4096 of the corpus and
the windows run 4096-way parallel; raise ``bucket_chars`` to shrink
buckets further.  No reference counterpart (stateless-streams demo);
mandated by the driver's north-star LLM-pipeline surface.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.prefix import (
    bucketed_running_sum,
)


def hash_order_key(id_col: str) -> "F.Column":
    """The deterministic shuffle key: lowercase md5 hex of the id's
    decimal string — identical in Spark and DuckDB (``md5(CAST(id AS
    VARCHAR))``), so oracle and engine walk the same order."""
    return F.md5(F.col(id_col).cast("string").cast("binary"))


def token_budget_sample(
    docs: DataFrame,
    n_tokens_col: str,
    budget: int | Mapping[str, int],
    id_col: str = "doc_id",
    bucket_chars: int = 3,
    group_col: str | None = None,
) -> DataFrame:
    """Greedy hash-ordered sample: rows of ``docs`` (must carry a token
    count in ``n_tokens_col``) whose running token total in md5(id) order
    is ≤ ``budget``; output adds ``running_tokens``.

    With ``group_col`` (a STRING column, e.g. ``source``) the walk and
    the budget apply PER GROUP — the mixture-building form ("this many
    tokens of web, this many of books"); ``budget`` may then be a
    ``{group: budget}`` mapping (groups absent from the mapping get 0 —
    excluded) or a single int applied to every group.  Groups with a
    NULL key are excluded (no budget can name them).

    Plan shape (via ``operators/prefix.py``): one hash-aggregate
    ((group, bucket) sums) + a driver-side prefix over #groups × #buckets
    metadata rows + one window partitioned by (group, bucket).  Never a
    single-partition global window — gated by ``tests/test_budget.py``."""
    staged = docs.withColumn("_h", hash_order_key(id_col)).withColumn(
        "_bk", F.substring("_h", 1, bucket_chars)
    )
    gcols = [group_col] if group_col else []

    def _budget_for(g) -> int:
        if isinstance(budget, Mapping):
            return int(budget.get(g, 0))
        return int(budget)

    res = bucketed_running_sum(
        staged,
        n_tokens_col,
        order_col="_h",
        bucket_col="_bk",
        group_cols=gcols,
        out_col="running_tokens",
        extra_offset_cols={"_budget": _budget_for},
    )
    if res is None:  # empty input: no buckets, nothing to sample — but
        # the EMPTY frame must carry the same schema as the non-empty
        # path (all input columns + running_tokens): a narrower frame
        # appended to a parquet store would poison later schema inference
        return docs.withColumn(
            "running_tokens", F.lit(None).cast("long")
        ).limit(0)
    return res.filter(F.col("running_tokens") <= F.col("_budget")).drop(
        "_h", "_bk", "_off", "_budget"
    )


def hash_split(
    docs: DataFrame,
    fractions: Mapping[str, float],
    id_col: str = "doc_id",
    label_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split: each row gets the label whose
    cumulative-fraction interval contains its hash position — the first
    13 hex chars of md5(id) (52 bits) compared AS A STRING against the
    precomputed 13-char hex threshold ``floor(cum · 2^52)``.  Fixed-width
    lowercase hex compares identically to the integer it encodes, in
    Spark, DuckDB, and Python alike — no float arithmetic, no
    dialect-dependent hex-to-int parsing (see :func:`split_threshold_hex`
    for the shared constant).  Properties a pipeline relies on:
    reproducible across runs/partitionings (pure function of the id),
    disjoint + exhaustive (every row gets exactly one label; fractions
    must sum to 1 within 1e-9), and STABLE UNDER CORPUS GROWTH — a doc's
    label never changes when other docs are added, unlike randomSplit.
    Per-row narrow expression; no shuffle, no RNG state."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if not fractions:
        raise ValueError("need at least one split")
    h13 = F.substring(hash_order_key(id_col), 1, 13)
    expr = None
    cum = 0.0
    labels = list(fractions)
    for label in labels[:-1]:
        cum += fractions[label]
        cond = h13 < F.lit(split_threshold_hex(cum))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    # the last label takes the remainder — exhaustive by construction
    expr = (
        F.lit(labels[-1]) if expr is None else expr.otherwise(F.lit(labels[-1]))
    )
    return docs.withColumn(label_col, expr)


def split_threshold_hex(cum: float) -> str:
    """The 13-char lowercase-hex string encoding ``floor(cum · 2^52)`` —
    the boundary :func:`hash_split` compares md5 prefixes against.
    Shared with oracle SQL so both engines draw the identical line.
    ``cum ≥ 1`` returns ``'g'`` ( > every hex char): always-true."""
    n = int(cum * (1 << 52))
    if n >= (1 << 52):
        return "g"
    return format(n, "013x")


def source_cap(
    docs: DataFrame,
    cap: int | Mapping[str, int],
    id_col: str = "doc_id",
    group_col: str = "source",
    bucket_chars: int = 3,
    rank_col: str = "rank_in_group",
) -> DataFrame:
    """Keep at most *cap* documents per group (domain/source capping — the
    C4/anti-spam rule that no single domain may dominate the corpus),
    chosen deterministically as the first *cap* docs in each group's
    md5(id) order; adds ``rank_col`` (1-based rank within the group).

    This is :func:`token_budget_sample` with every document costing one
    token — i.e. a per-group dense RANK computed by the bucketed two-phase
    prefix COUNT, not a ``row_number() OVER (PARTITION BY group)`` window
    whose hot groups (exactly the spam domains being capped) would each
    funnel through a single task."""
    staged = docs.withColumn("_one", F.lit(1))
    capped = token_budget_sample(
        staged,
        "_one",
        cap,
        id_col=id_col,
        bucket_chars=bucket_chars,
        group_col=group_col,
    )
    return capped.withColumnRenamed("running_tokens", rank_col).drop("_one")


_TWO52 = 1 << 52


def quality_weighted_keep(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    keep_col: str = "kept",
) -> DataFrame:
    """Deterministic score-proportional sampling (the FineWeb-style SOFT
    quality filter: instead of a hard threshold, keep each document with
    probability ≈ its quality score in [0, 1] — mid-quality docs survive
    at reduced rate, preserving diversity a hard cutoff destroys).

    No RNG: a row is kept iff its md5(id) 13-hex-char position is below
    ``lpad(hex(floor(score · 2^52)))`` — the per-row threshold twin of
    :func:`hash_split`'s fixed thresholds, so the decision is a pure
    function of (id, score): reproducible across runs and partitionings,
    stable under corpus growth, and identically computable by the DuckDB
    oracle (float multiply and floor are IEEE exact-rounded; hex/lpad
    formatting verified byte-identical).  Scores are clamped to
    [0, (2^52-1)/2^52]; a clamped-to-max score keeps all but the
    2^-52-probability top hash.  Per-row narrow expression — no shuffle."""
    thr = F.expr(
        f"lpad(lower(hex(CAST(least(greatest(floor({score_col} * {float(_TWO52)}), 0),"
        f" {_TWO52 - 1}) AS BIGINT))), 13, '0')"
    )
    h13 = F.substring(hash_order_key(id_col), 1, 13)
    return df.withColumn(keep_col, h13 < thr)


def epoch_order(
    items: DataFrame,
    epoch: int,
    id_col: str = "seq_id",
    pos_col: str = "position",
    bucket_chars: int = 3,
) -> DataFrame:
    """Deterministic per-epoch global shuffle of training items (the
    multi-epoch data-ordering a trainer needs: every epoch visits all
    items in a DIFFERENT uniform order, reproducibly, without rewriting a
    byte of data — the order is a mapping table, not a data move).

    Position = 1-based rank of ``md5(epoch || ':' || id)`` — a fresh
    uniform permutation per epoch, pure function of (epoch, id).  The
    rank is the bucketed two-phase prefix COUNT (hash-prefix buckets →
    driver prefix over #buckets metadata rows → bucket-partitioned
    windows), never a SinglePartition global row_number."""
    h = F.md5(
        F.concat(F.lit(f"{int(epoch)}:"), F.col(id_col).cast("string")).cast(
            "binary"
        )
    )
    staged = (
        items.withColumn("_h", h)
        .withColumn("_bk", F.substring("_h", 1, bucket_chars))
        .withColumn("_one", F.lit(1))
    )
    res = bucketed_running_sum(
        staged,
        value_col="_one",
        order_col="_h",
        bucket_col="_bk",
        out_col=pos_col,
    )
    if res is None:
        return items.withColumn(
            "epoch", F.lit(int(epoch))
        ).withColumn(pos_col, F.lit(None).cast("long")).limit(0)
    return res.withColumn("epoch", F.lit(int(epoch))).drop("_h", "_bk", "_one", "_off")


def temperature_budgets(
    group_tokens: Mapping[str, int], total_budget: int
) -> dict[str, int]:
    """Per-group token budgets under sampling temperature alpha = 1/2
    (the standard multilingual/multi-source rebalancing: budget_g
    proportional to sqrt(tokens_g), so rare sources are upsampled
    relative to their mass and spam sources damped — the Gopher/
    XLM-R-style recipe).

    Exactness contract: weights are INTEGER sqrt (``math.isqrt``) and the
    allocation ``total_budget * w_g DIV sum(w)`` is integer arithmetic,
    so the oracle reproduces every budget bit-for-bit — a float
    sqrt-sum would differ in the last bit across engines depending on
    summation order and flip boundary documents.  floor allocation can
    leave up to ``len(groups)-1`` budget tokens unassigned (documented;
    the greedy walk underfills anyway on doc granularity).  NULL-keyed
    groups are excluded (consistent with :func:`token_budget_sample`).
    """
    import math

    weights = {
        g: math.isqrt(int(n)) for g, n in group_tokens.items() if g is not None
    }
    wsum = sum(weights.values())
    if wsum <= 0:
        return {g: 0 for g in weights}
    return {g: (int(total_budget) * w) // wsum for g, w in weights.items()}
